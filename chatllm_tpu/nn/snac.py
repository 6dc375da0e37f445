"""SNAC neural audio codec — decoder (TTS vocoder).

Reference: the ggml implementation in /root/reference/models/orpheus.{h,cpp}
(Snake1D :37, ResidualUnit :67, DecoderBlock :103, Decoder :133,
VectorQuantize :164, ResidualVectorQuantize dequantize :211, Codec :250) —
re-implemented as JAX ops; the 1-D convs map to `lax.conv_general_dilated`
(MXU implicit GEMM), the snake activation to VPU elementwise ops.

Weight names match the reference converter output
(OrpheusTTSConverter.get_weight_names, convert.py:8874-8920), so converted
Orpheus/SNAC GGMM files load unchanged.

Data layout: [T, C] (length in sublanes, channels in lanes).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SnacConfig:
    sampling_rate: int = 24000
    decoder_dim: int = 1024
    decoder_rates: tuple = (8, 8, 4, 2)
    codebook_size: int = 4096
    codebook_dim: int = 8
    vq_strides: tuple = (4, 2, 1)
    noise: bool = True
    depthwise: bool = True
    auto_output_padding: bool = True   # False: DAC (OuteTTS) — upsample
    #   ConvTranspose output_padding pinned to 0 (orpheus.h DecoderBlock)

    @property
    def frame_tokens(self) -> int:
        return 2 ** len(self.vq_strides) - 1   # 7 for 3 codebooks


def pyramid_order(n_levels: int) -> list[int]:
    """Pre-order traversal of the codebook pyramid: level index for each of
    the 2^n - 1 tokens in one frame (orpheus.cpp make_pyramid/transverse)."""
    order = []

    def walk(level):
        if level >= n_levels:
            return
        order.append(level)
        walk(level + 1)
        walk(level + 1)

    walk(0)
    return order


def snake1d(x, alpha):
    """x + (1/α)·sin²(αx) (Snake1D, orpheus.cpp:37)."""
    xf = x.astype(jnp.float32)
    a = alpha.astype(jnp.float32)
    return xf + jnp.square(jnp.sin(xf * a)) / (a + 1e-9)


def conv1d(x, w, b=None, *, stride=1, padding=0, dilation=1, groups=1):
    """x: [T, C_in]; w (torch layout): [C_out, C_in/groups, K] → [T', C_out]."""
    k = jnp.transpose(w, (2, 1, 0))                   # [K, Cin/g, Cout]
    y = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32), k.astype(jnp.float32),
        window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=("NHC", "HIO", "NHC"))[0]
    if b is not None:
        y = y + b
    return y


def conv_transpose1d(x, w, b=None, *, stride=1, padding=0, output_padding=0):
    """torch ConvTranspose1d semantics.  w (torch layout): [C_in, C_out, K]."""
    K = w.shape[2]
    # fractionally-strided conv: dilate input by stride, correlate with the
    # FLIPPED kernel, pad (K-1-p, K-1-p+output_padding)
    k = jnp.transpose(w[:, :, ::-1], (2, 0, 1))       # [K, Cin, Cout]
    y = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32), k.astype(jnp.float32),
        window_strides=(1,),
        padding=[(K - 1 - padding, K - 1 - padding + output_padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"))[0]
    if b is not None:
        y = y + b
    return y


def residual_unit(p, x, *, dilation, groups=1, kernel_size=7):
    pad = ((kernel_size - 1) * dilation) // 2
    y = snake1d(x, p["s0"])
    y = conv1d(y, p["c1_w"], p["c1_b"], padding=pad, dilation=dilation,
               groups=groups)
    y = snake1d(y, p["s2"])
    y = conv1d(y, p["c3_w"], p["c3_b"])
    crop = (x.shape[0] - y.shape[0]) // 2
    if crop > 0:
        x = x[crop:crop + y.shape[0]]
    return x + y


def decoder_block(p, x, *, stride, noise, groups, key=None,
                  auto_output_padding=True):
    y = snake1d(x, p["snake"])
    y = conv_transpose1d(y, p["up_w"], p["up_b"], stride=stride,
                         padding=(stride + 1) // 2,
                         output_padding=stride % 2 if auto_output_padding else 0)
    if noise:
        n = conv1d(y, p["noise_w"], None)
        if key is not None:
            eps = jax.random.normal(key, (y.shape[0], 1), jnp.float32)
        else:
            eps = jnp.zeros((y.shape[0], 1), jnp.float32)
        y = y + n * eps
    for i, dil in enumerate((1, 3, 9)):
        y = residual_unit(p[f"res{i}"], y, dilation=dil, groups=groups)
    return y


def snac_decode(cfg: SnacConfig, params, codes: list, key=None):
    """codes: per-codebook int arrays (coarse → fine) → waveform [T] f32 in
    [-1, 1] (orpheus.cpp Codec::run_model)."""
    # residual VQ dequantize
    z = None
    for i, ids in enumerate(codes):
        q = params["vq"][i]
        emb = jnp.take(q["codebook"], jnp.asarray(ids), axis=0)  # [Ti, cb_dim]
        zi = conv1d(emb, q["out_w"], q["out_b"])                 # [Ti, dim]
        if z is None:
            z = zi
        else:
            rep = zi.shape[0] // z.shape[0]
            z = jnp.repeat(z, rep, axis=0) + zi
    x = z

    p = params["decoder"]
    if cfg.depthwise:
        x = conv1d(x, p["in0_w"], p["in0_b"], padding=3, groups=x.shape[1])
        x = conv1d(x, p["in1_w"], p["in1_b"])
    else:
        x = conv1d(x, p["in0_w"], p["in0_b"], padding=3)

    ch = cfg.decoder_dim
    for i, rate in enumerate(cfg.decoder_rates):
        out_dim = ch // (1 << (i + 1))
        groups = out_dim if cfg.depthwise else 1
        sub = None if key is None else jax.random.fold_in(key, i)
        x = decoder_block(p[f"block{i}"], x, stride=rate, noise=cfg.noise,
                          groups=groups, key=sub,
                          auto_output_padding=cfg.auto_output_padding)
    x = snake1d(x, p["out_snake"])
    x = conv1d(x, p["out_w"], p["out_b"], padding=3)
    return jnp.tanh(x)[:, 0]


def load_snac_params(pb, cfg: SnacConfig, prefix: str = "snac.") -> dict:
    """Load from converter names (convert.py OrpheusTTSConverter)."""
    def conv(name, bias=True):
        w = pb.raw_f32(name + ".weight")
        b = pb.raw_f32(name + ".bias") if bias else None
        return w, b

    import jax.numpy as jnp

    def J(a):
        return jnp.asarray(a) if a is not None else None

    dec = {}
    li = 0
    w, b = conv(f"{prefix}decoder.model.layers.{li}")
    dec["in0_w"], dec["in0_b"] = J(w), J(b)
    li += 1
    if cfg.depthwise:
        w, b = conv(f"{prefix}decoder.model.layers.{li}")
        dec["in1_w"], dec["in1_b"] = J(w), J(b)
        li += 1
    for i in range(len(cfg.decoder_rates)):
        base = f"{prefix}decoder.model.layers.{li}.block.layers"
        blk = {
            "snake": J(pb.raw_f32(f"{base}.0.alpha")),
        }
        w, b = conv(f"{base}.1")
        blk["up_w"], blk["up_b"] = J(w), J(b)
        nxt = 2
        if cfg.noise:
            blk["noise_w"] = J(pb.raw_f32(f"{base}.2.linear.weight"))
            nxt = 3
        for r in range(3):
            rbase = f"{base}.{nxt + r}.block.layers"
            rw1, rb1 = conv(f"{rbase}.1")
            rw3, rb3 = conv(f"{rbase}.3")
            blk[f"res{r}"] = {
                "s0": J(pb.raw_f32(f"{rbase}.0.alpha")),
                "c1_w": J(rw1), "c1_b": J(rb1),
                "s2": J(pb.raw_f32(f"{rbase}.2.alpha")),
                "c3_w": J(rw3), "c3_b": J(rb3),
            }
        dec[f"block{i}"] = blk
        li += 1
    dec["out_snake"] = J(pb.raw_f32(f"{prefix}decoder.model.layers.{li}.alpha"))
    li += 1
    w, b = conv(f"{prefix}decoder.model.layers.{li}")
    dec["out_w"], dec["out_b"] = J(w), J(b)

    vq = []
    for i in range(len(cfg.vq_strides)):
        base = f"{prefix}quantizer.strides.{i}"
        ow, ob = conv(f"{base}.out_proj")
        iw, ib = conv(f"{base}.in_proj")
        vq.append({
            "codebook": J(pb.raw_f32(f"{base}.codebook.weight")),
            "out_w": J(ow), "out_b": J(ob),
            "in_w": J(iw), "in_b": J(ib),
        })
    return {"decoder": dec, "vq": vq}
