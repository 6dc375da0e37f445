"""Qwen3-TTS speech codec decoder + speaker encoder.

Reference: /root/reference/models/qwen_tts.{h,cpp} namespace chatllm::qwen::tts
— Qwen3TTSTokenizerV2Decoder (split residual VQ dequantize → causal pre-conv →
sliding-window pre-transformer with layer scales → ConvNeXt upsampling →
snake-activated HiFi-style decoder stack), and Qwen3TTSSpeakerEncoder
(ECAPA-TDNN x-vector: TDNN → SE-Res2Net blocks → multi-layer aggregation →
attentive statistics pooling).

Data layout: [T, C] time-major, like nn/snac.py.  All forwards are pure
functions over nested param dicts.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.norm import layer_norm, rms_norm
from ..ops.qmm import matmul
from ..ops.rope import apply_rope, precompute_rope_cache, RopeConfig, ROPE_NEOX
from .snac import conv1d, conv_transpose1d


@dataclass(frozen=True)
class QwenTTSDecoderConfig:
    """Qwen3TTSTokenizerV2DecoderConfig (qwen_tts.h:69-117)."""
    codebook_size: int = 2048
    hidden_size: int = 1024
    latent_dim: int = 1024
    codebook_dim: int = 512
    max_position_embeddings: int = 8000
    rope_theta: float = 10000.0
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    sliding_window: int = 72
    intermediate_size: int = 3072
    layer_scale_initial_scale: float = 0.01
    rms_norm_eps: float = 1e-5
    num_hidden_layers: int = 8
    num_quantizers: int = 16
    upsample_rates: tuple = (8, 5, 4, 3)
    upsampling_ratios: tuple = (2, 2)
    decoder_dim: int = 1536
    head_dim: int = 64

    @property
    def total_upsample(self) -> int:
        r = 1
        for x in self.upsample_rates:
            r *= x
        for x in self.upsampling_ratios:
            r *= x
        return r


def _causal_conv(p, x, *, stride=1, dilation=1, groups=1):
    """Qwen3TTSTokenizerV2CausalConvNet (qwen_tts.cpp:176-214): left-pad
    (k_eff - stride), right-pad to an ideal frame-aligned length."""
    k = p["w"].shape[-1]
    keff = (k - 1) * dilation + 1
    pad = keff - stride
    L = x.shape[0]
    n_frames = (L - keff + pad) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (keff - pad)
    extra = ideal - L
    x = jnp.pad(x, ((pad, max(extra, 0)), (0, 0)))
    return conv1d(x, p["w"], p.get("b"), stride=stride, dilation=dilation,
                  groups=groups)


def _causal_trans_conv(p, x, *, stride):
    """Qwen3TTSTokenizerV2CausalTransConvNet (qwen_tts.cpp:232-253):
    transposed conv then trim (k - stride) from both sides."""
    k = p["w"].shape[-1]
    trim = k - stride
    y = conv_transpose1d(x, p["w"], p.get("b"), stride=stride)
    if trim > 0:
        y = y[trim:y.shape[0] - trim]
    return y


def _snake_beta(p, x):
    """SnakeBeta (qwen_tts.cpp:316-337): x + β·sin²(αx); the loader folds
    α := exp(raw), β := 1/(exp(raw) + 1e-9)."""
    xf = x.astype(jnp.float32)
    s = jnp.sin(xf * p["alpha"])
    return (xf + s * s * p["beta"]).astype(jnp.float32)


def _convnext_block(cfg, p, x):
    """Qwen3TTSTokenizerV2ConvNeXtBlock (qwen_tts.cpp:270-286)."""
    h = _causal_conv(p["dwconv"], x, groups=x.shape[-1])
    h = layer_norm(h, p["norm"]["w"], p["norm"].get("b"))
    h = matmul(h, p["pwconv1"]).astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True)
    h = matmul(h, p["pwconv2"]).astype(jnp.float32)
    return x + h * p["gamma"]


def _residual_unit(p, x, dilation):
    """Qwen3TTSTokenizerV2DecoderDecoderResidualUnit (qwen_tts.cpp:367-388)."""
    h = _snake_beta(p["act1"], x)
    h = _causal_conv(p["conv1"], h, dilation=dilation)
    h = _snake_beta(p["act2"], h)
    h = _causal_conv(p["conv2"], h)
    return x + h


def _pre_transformer(cfg: QwenTTSDecoderConfig, p, x):
    """Qwen3TTSTokenizerV2DecoderTransformerModel (qwen_tts.cpp:607-636):
    sliding-window (72) causal attention, per-layer scales on the attention
    output and the MLP output (layer_scale .scale tensors), NeoX rope."""
    T = x.shape[0]
    nh, nkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    x = matmul(x, p["input_proj"]).astype(jnp.float32)
    pos = jnp.arange(T)[None, :]
    cos, sin = precompute_rope_cache(
        pos, RopeConfig(head_dim=d, freq_base=cfg.rope_theta, layout=ROPE_NEOX))
    q_pos = jnp.arange(T)[:, None]
    k_pos = jnp.arange(T)[None, :]
    valid = (k_pos <= q_pos) & (k_pos > q_pos - cfg.sliding_window)
    bias = jnp.where(valid, 0.0, -jnp.inf)

    for lp in p["layers"]:
        h = rms_norm(x, lp["attn_norm"]["w"], eps=cfg.rms_norm_eps)
        q = matmul(h, lp["attn"]["q"]).reshape(T, nh, d)
        k = matmul(h, lp["attn"]["k"]).reshape(T, nkv, d)
        v = matmul(h, lp["attn"]["v"]).reshape(T, nkv, d)
        q = apply_rope(q[None], cos, sin, layout=ROPE_NEOX)[0]
        k = apply_rope(k[None], cos, sin, layout=ROPE_NEOX)[0]
        if nh != nkv:
            k = jnp.repeat(k, nh // nkv, axis=1)
            v = jnp.repeat(v, nh // nkv, axis=1)
        scores = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * (d ** -0.5)
        probs = jax.nn.softmax(scores + bias[None], axis=-1)
        o = jnp.einsum("hqk,khd->qhd", probs, v.astype(jnp.float32))
        o = matmul(o.reshape(T, nh * d), lp["attn"]["o"]).astype(jnp.float32)
        x = x + o * lp["attn_scale"]
        h = rms_norm(x, lp["ffn_norm"]["w"], eps=cfg.rms_norm_eps)
        m = jax.nn.silu(matmul(h, lp["mlp"]["gate"]).astype(jnp.float32)) \
            * matmul(h, lp["mlp"]["up"]).astype(jnp.float32)
        m = matmul(m, lp["mlp"]["down"]).astype(jnp.float32)
        x = x + m * lp["mlp_scale"]
    x = rms_norm(x, p["norm"]["w"], eps=cfg.rms_norm_eps)
    return matmul(x, p["output_proj"]).astype(jnp.float32)


def _rvq_decode(cfg: QwenTTSDecoderConfig, p, codes):
    """SplitResidualVectorQuantizer dequantize (qwen_tts.cpp:144-169):
    group 0 through rvq_first (1 semantic codebook), groups 1..n through
    rvq_rest; each sums codebook rows then projects dim/2 → codebook_dim
    via a 1x1 conv."""
    def rvq(part, q):           # part [T, n_q] int32
        acc = 0.0
        for i in range(part.shape[1]):
            acc = acc + q["codebooks"][i][part[:, i]].astype(jnp.float32)
        return conv1d(acc, q["out_w"], None)

    first = rvq(codes[:, :1], p["rvq_first"])
    rest = rvq(codes[:, 1:], p["rvq_rest"])
    return first + rest


def qwen_tts_decode(cfg: QwenTTSDecoderConfig, params, codes):
    """codes [T, num_quantizers] int32 → waveform [samples] f32 in [-1, 1]
    (Qwen3TTSTokenizerV2Decoder::forward, qwen_tts.cpp:685-703)."""
    h = _rvq_decode(cfg, params["quantizer"], codes)       # [T, codebook_dim]
    h = _causal_conv(params["pre_conv"], h)                # [T, latent]
    h = _pre_transformer(cfg, params["pre_transformer"], h)
    for up in params["upsample"]:
        h = _causal_trans_conv(up["conv"], h,
                               stride=up["conv"]["w"].shape[-1])
        h = _convnext_block(cfg, up["convnext"], h)
    dec = params["decoder"]
    h = _causal_conv(dec["conv_in"], h)
    for bi, blk in enumerate(dec["blocks"]):
        h = _snake_beta(blk["snake"], h)
        h = _causal_trans_conv(blk["trans"], h, stride=cfg.upsample_rates[bi])
        for di, dil in enumerate((1, 3, 9)):
            h = _residual_unit(blk["units"][di], h, dil)
    h = _snake_beta(dec["snake_out"], h)
    h = _causal_conv(dec["conv_out"], h)
    return jnp.clip(h[:, 0], -1.0, 1.0)


def qwen_tts_chunked_decode(cfg: QwenTTSDecoderConfig, params, codes,
                            chunk_size: int = 300, left_context: int = 25):
    """chunked_decode (qwen_tts.cpp:704-740): decode in chunks with left
    context, dropping context_size*total_upsample leading samples."""
    T = codes.shape[0]
    out = []
    start = 0
    while start < T:
        end = min(start + chunk_size, T)
        ctx = min(start, left_context)
        wav = qwen_tts_decode(cfg, params, codes[start - ctx:end])
        out.append(np.asarray(wav)[ctx * cfg.total_upsample:])
        start = end
    return np.concatenate(out) if out else np.zeros((0,), np.float32)


def load_qwen_tts_decoder(pb, cfg: QwenTTSDecoderConfig,
                          prefix: str = "decoder.") -> dict:
    """On-disk names: raw HF names under `decoder.` (Qwen3TTSConverter keeps
    names as-is, convert.py:6076-6118; codebooks stored pre-divided by
    cluster_usage)."""
    def cc(name):
        p = {"w": pb.raw_f32(f"{name}.conv.weight")}
        if pb.has(f"{name}.conv.bias"):
            p["b"] = pb.array(f"{name}.conv.bias")
        return p

    def rvq(name, n_q):
        return {
            "codebooks": [jnp.asarray(pb.raw_f32(
                f"{name}.vq.layers.{i}._codebook.embedding_sum"))
                for i in range(n_q)],
            "out_w": pb.raw_f32(f"{name}.output_proj.conv.weight"),
        }

    pre = f"{prefix}pre_transformer."
    layers = []
    for i in range(cfg.num_hidden_layers):
        pfx = f"{pre}layers.{i}"
        layers.append({
            "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
            "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
            "attn": {
                "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                "o": pb.linear(f"{pfx}.self_attn.o_proj"),
            },
            "attn_scale": pb.array(f"{pfx}.self_attn_layer_scale.scale"),
            "mlp_scale": pb.array(f"{pfx}.mlp_layer_scale.scale"),
            "mlp": {"gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj")},
        })

    def snake(name):
        a = pb.raw_f32(f"{name}.alpha")
        b = pb.raw_f32(f"{name}.beta")
        return {"alpha": jnp.asarray(np.exp(a)),
                "beta": jnp.asarray(1.0 / (np.exp(b) + 1e-9))}

    upsample = []
    for i in range(len(cfg.upsampling_ratios)):
        base = f"{prefix}upsample.{i}"
        upsample.append({
            "conv": cc(f"{base}.0"),
            "convnext": {
                "dwconv": cc(f"{base}.1.dwconv"),
                "norm": pb.norm(f"{base}.1.norm", bias=True),
                "pwconv1": pb.linear(f"{base}.1.pwconv1"),
                "pwconv2": pb.linear(f"{base}.1.pwconv2"),
                "gamma": pb.array(f"{base}.1.gamma"),
            },
        })

    blocks = []
    for i in range(len(cfg.upsample_rates)):
        base = f"{prefix}decoder.{1 + i}.block"
        blocks.append({
            "snake": snake(f"{base}.0"),
            "trans": cc(f"{base}.1"),
            "units": [{
                "act1": snake(f"{base}.{2 + j}.act1"),
                "act2": snake(f"{base}.{2 + j}.act2"),
                "conv1": cc(f"{base}.{2 + j}.conv1"),
                "conv2": cc(f"{base}.{2 + j}.conv2"),
            } for j in range(3)],
        })
    nb = len(cfg.upsample_rates)
    return {
        "quantizer": {
            "rvq_first": rvq(f"{prefix}quantizer.rvq_first", 1),
            "rvq_rest": rvq(f"{prefix}quantizer.rvq_rest",
                            cfg.num_quantizers - 1),
        },
        "pre_conv": cc(f"{prefix}pre_conv"),
        "pre_transformer": {
            "input_proj": pb.linear(f"{pre}input_proj"),
            "output_proj": pb.linear(f"{pre}output_proj"),
            "norm": pb.norm(f"{pre}norm"),
            "layers": tuple(layers),
        },
        "upsample": tuple(upsample),
        "decoder": {
            "conv_in": cc(f"{prefix}decoder.0"),
            "blocks": tuple(blocks),
            "snake_out": snake(f"{prefix}decoder.{1 + nb}"),
            "conv_out": cc(f"{prefix}decoder.{2 + nb}"),
        },
    }


# ===========================================================================
# speaker encoder (ECAPA-TDNN x-vector)
# ===========================================================================

@dataclass(frozen=True)
class SpeakerEncoderConfig:
    """Qwen3TTSSpeakerEncoderConfig (qwen_tts.h:483-495)."""
    mel_dim: int = 128
    enc_dim: int = 1024
    enc_channels: tuple = (512, 512, 512, 512, 1536)
    enc_kernel_sizes: tuple = (5, 3, 3, 3, 1)
    enc_dilations: tuple = (1, 2, 3, 4, 1)
    enc_attention_channels: int = 128
    enc_res2net_scale: int = 8
    enc_se_channels: int = 128
    sample_rate: int = 24000


def _tdnn(p, x, dilation=1):
    """TimeDelayNetBlock (qwen_tts.cpp:941-952): same-pad reflect conv + ReLU."""
    k = p["w"].shape[-1]
    keff = (k - 1) * dilation + 1
    lp = (keff - 1) // 2
    rp = keff - 1 - lp
    if lp or rp:
        x = jnp.pad(x, ((lp, rp), (0, 0)), mode="reflect")
    return jax.nn.relu(conv1d(x, p["w"], p.get("b"), dilation=dilation))


def _res2net(p, x, scale, dilation):
    """Res2NetBlock (qwen_tts.cpp:974-1008)."""
    parts = jnp.split(x, scale, axis=1)
    outs = []
    out = None
    for i in range(scale):
        if i == 0:
            out = parts[0]
        elif i == 1:
            out = _tdnn(p["blocks"][0], parts[1], dilation)
        else:
            out = _tdnn(p["blocks"][i - 1], out + parts[i], dilation)
        outs.append(out)
    return jnp.concatenate(outs, axis=1)


def _se_block(p, x):
    """SqueezeExcitationBlock (qwen_tts.cpp:1028-1047): mean over time →
    1x1 convs → sigmoid gate."""
    m = jnp.mean(x, axis=0, keepdims=True)
    m = jnp.broadcast_to(m, x.shape)
    m = jax.nn.relu(conv1d(m, p["conv1"]["w"], p["conv1"].get("b")))
    m = jax.nn.sigmoid(conv1d(m, p["conv2"]["w"], p["conv2"].get("b")))
    return x * m


def _asp(p, x, eps=1e-12):
    """AttentiveStatisticsPooling (qwen_tts.cpp:1089-1127)."""
    T = x.shape[0]
    mean = jnp.mean(x, axis=0, keepdims=True)
    std = jnp.sqrt(jnp.mean((x - mean) ** 2, axis=0, keepdims=True))
    att = jnp.concatenate([x, jnp.broadcast_to(mean, x.shape),
                           jnp.broadcast_to(std, x.shape)], axis=1)
    att = _tdnn(p["tdnn"], att)
    att = jnp.tanh(att)
    att = conv1d(att, p["conv"]["w"], p["conv"].get("b"))
    att = jax.nn.softmax(att, axis=0)
    mean = jnp.sum(x * att, axis=0, keepdims=True)
    std = jnp.sqrt(jnp.sum(((x - mean) ** 2) * att, axis=0, keepdims=True))
    return jnp.concatenate([mean, std], axis=1)        # [1, 2C]


def speaker_encoder_forward(cfg: SpeakerEncoderConfig, params, mel):
    """mel [T, mel_dim] → x-vector [enc_dim]
    (Qwen3TTSSpeakerEncoder::forward, qwen_tts.cpp:1229-1263)."""
    x = mel.astype(jnp.float32)
    hs = []
    x = _tdnn(params["blocks"][0], x, cfg.enc_dilations[0])
    for i in range(1, len(cfg.enc_channels) - 1):
        p = params["blocks"][i]
        res = x
        h = _tdnn(p["tdnn1"], x)
        h = _res2net(p["res2net"], h, cfg.enc_res2net_scale,
                     cfg.enc_dilations[i])
        h = _tdnn(p["tdnn2"], h)
        h = _se_block(p["se"], h)
        x = h + res
        hs.append(x)
    x = jnp.concatenate(hs, axis=1)                    # MFA input
    x = _tdnn(params["mfa"], x, cfg.enc_dilations[-1])
    x = _asp(params["asp"], x)
    x = conv1d(x, params["fc"]["w"], params["fc"].get("b"))
    return x[0]


def load_speaker_encoder(pb, cfg: SpeakerEncoderConfig,
                         prefix: str = "speaker_encoder.") -> dict:
    def cv(name):
        p = {"w": pb.raw_f32(f"{name}.weight")}
        if pb.has(f"{name}.bias"):
            p["b"] = pb.array(f"{name}.bias")
        return p

    def tdnn(name):
        return cv(f"{name}.conv")

    blocks = [tdnn(f"{prefix}blocks.0")]
    for i in range(1, len(cfg.enc_channels) - 1):
        base = f"{prefix}blocks.{i}"
        blocks.append({
            "tdnn1": tdnn(f"{base}.tdnn1"),
            "tdnn2": tdnn(f"{base}.tdnn2"),
            "res2net": {"blocks": [tdnn(f"{base}.res2net_block.blocks.{j}")
                                   for j in range(cfg.enc_res2net_scale - 1)]},
            "se": {"conv1": cv(f"{base}.se_block.conv1"),
                   "conv2": cv(f"{base}.se_block.conv2")},
        })
    return {
        "blocks": blocks,
        "mfa": tdnn(f"{prefix}mfa"),
        "asp": {"tdnn": tdnn(f"{prefix}asp.tdnn"),
                "conv": cv(f"{prefix}asp.conv")},
        "fc": cv(f"{prefix}fc"),
    }
