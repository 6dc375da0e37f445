"""Gemma-4 multimodal towers (reference /root/reference/models/gemma4.cpp).

Three pieces:
 - vision ViT (gemma::vit, :926-1486): linear patch embed + learned x/y pos
   tables, sandwich-norm blocks with per-head qk RMS norms, weightless v-norm,
   halves-style 2-D rope (first half of head dims rotated by the w position,
   second half by h — ggml::rope_2d_inplace, src/layers.cpp:985), score scale
   1.0, avg-pool pooler, optional standardizer, MultimodalEmbedder projection.
 - audio conformer (gemma::aud, :60-926): 2×(conv3x3 s2 + channel-LN + ReLU)
   subsampler, conformer blocks (half-residual FFNs, chunked local attention
   with relative position embeddings and tanh logit cap, causal light conv),
   output projection + MultimodalEmbedder.
 - unified embedders (gemma::v4_unified, :2825-3187): raw-patch vision
   embedder and raw-PCM audio MultimodalEmbedder.

All forwards are pure jit-friendly functions over nested param dicts.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.norm import layer_norm, rms_norm
from ..ops.qmm import matmul
from ..ops.rope import apply_rope


from ..ops.norm import weightless_rms as _wrms


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


# ===========================================================================
# vision tower (gemma::vit)
# ===========================================================================

@dataclass
class Gemma4ViTConfig:
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: int
    intermediate_size: int
    patch_size: int
    pooling_kernel_size: int
    position_embedding_size: int
    rope_theta: float = 10000.0
    norm_eps: float = 1e-6
    max_patches: int = 4096


def _half_rope_tables(pos, half_dim: int, base: float):
    """NeoX rope table over `half_dim` dims (pairs (i, i+half/2) within the
    half), matching ggml::rope_ext with n_dims=head/2 on a half-view."""
    quarter = half_dim // 2
    inv = jnp.power(jnp.float32(base),
                    -2.0 * jnp.arange(quarter, dtype=jnp.float32) / half_dim)
    th = pos.astype(jnp.float32)[:, None] * inv
    return jnp.cos(th), jnp.sin(th)


def _rope_2d_halves(t, cw, sw, ch, sh):
    """rope_2d_inplace (src/layers.cpp:985): first half of head dims rotated
    with the w position, second half with h; each half NeoX-paired."""
    d = t.shape[-1]
    return jnp.concatenate(
        [apply_rope(t[..., :d // 2], cw, sw, layout="neox"),
         apply_rope(t[..., d // 2:], ch, sh, layout="neox")], axis=-1)


def gemma4_vit_forward(cfg: Gemma4ViTConfig, params, patches,
                       grid_w: int, grid_h: int):
    """patches [N, p*p*3] in [0,1] raster order → [N/pool², lm_hidden].

    VisionModel::forward (gemma4.cpp:1300-1317); the model scales pixels
    2x-1 itself (VisionPatchEmbedder::forward :1016: "applies no
    normalization and instead scales in model code")."""
    d = cfg.head_dim
    hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    x = (2.0 * patches.astype(jnp.float32) - 1.0)
    x = matmul(x, params["embed"]["input_proj"]).astype(jnp.float32)

    # learned x/y positional tables [2, posemb_size, hidden]
    table = params["embed"]["pos_table"]
    xs = jnp.tile(jnp.arange(grid_w, dtype=jnp.int32), grid_h)
    ys = jnp.repeat(jnp.arange(grid_h, dtype=jnp.int32), grid_w)
    x = x + table[0][xs].astype(jnp.float32) + table[1][ys].astype(jnp.float32)

    # w drives the FIRST rope half (TensorPosHelper::prepare p_w first,
    # gemma4.cpp:1063-1082)
    cw, sw = _half_rope_tables(xs, d // 2, cfg.rope_theta)
    ch, sh = _half_rope_tables(ys, d // 2, cfg.rope_theta)

    N = grid_w * grid_h
    for lp in params["layers"]:
        h = rms_norm(x, lp["attn_norm"]["w"], eps=cfg.norm_eps)
        q = matmul(h, lp["attn"]["q"]).reshape(N, hq, d)
        k = matmul(h, lp["attn"]["k"]).reshape(N, hkv, d)
        v = matmul(h, lp["attn"]["v"]).reshape(N, hkv, d)
        v = _wrms(v)
        q = rms_norm(q, lp["attn"]["q_norm"]["w"], eps=cfg.norm_eps)
        k = rms_norm(k, lp["attn"]["k_norm"]["w"], eps=cfg.norm_eps)
        q = _rope_2d_halves(q[None], cw, sw, ch, sh)[0]
        k = _rope_2d_halves(k[None], cw, sw, ch, sh)[0]
        if hq != hkv:
            rep = hq // hkv
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        # bidirectional, score scale 1.0 (VisionAttention ctor :1118)
        scores = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                            k.astype(jnp.float32))
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", probs, v.astype(jnp.float32))
        o = matmul(o.reshape(N, hq * d), lp["attn"]["o"]).astype(jnp.float32)
        x = x + rms_norm(o, lp["post_attn_norm"]["w"], eps=cfg.norm_eps)
        h = rms_norm(x, lp["ffn_norm"]["w"], eps=cfg.norm_eps)
        g = _gelu_tanh(matmul(h, lp["mlp"]["gate"]).astype(jnp.float32))
        u = matmul(h, lp["mlp"]["up"]).astype(jnp.float32)
        m = matmul(g * u, lp["mlp"]["down"]).astype(jnp.float32)
        x = x + rms_norm(m, lp["post_ffn_norm"]["w"], eps=cfg.norm_eps)

    # avg-pool the patch grid (VisionPooler::forward :1199)
    kk = cfg.pooling_kernel_size
    H = cfg.hidden_size
    x = x.reshape(grid_h // kk, kk, grid_w // kk, kk, H).mean(axis=(1, 3))
    x = x.reshape(-1, H)
    if "std_bias" in params:
        x = (x - params["std_bias"]) * params["std_scale"]
    # MultimodalEmbedder (gemma4.cpp:15-57): weightless RMS + projection
    x = _wrms(x)
    return matmul(x, params["embedding_projection"]).astype(jnp.float32)


def load_gemma4_vit_params(pb, cfg: Gemma4ViTConfig, prefix="visual.") -> dict:
    params = {
        "embed": {
            "input_proj": pb.linear(f"{prefix}patch_embedder.input_proj",
                                    bias=False),
            "pos_table": pb.array(f"{prefix}patch_embedder."
                                  "position_embedding_table"),
        },
        "embedding_projection": pb.linear(f"{prefix}embedding_projection",
                                          bias=False),
        "layers": [],
    }
    if pb.has(f"{prefix}std_bias"):
        params["std_bias"] = pb.array(f"{prefix}std_bias")
        params["std_scale"] = pb.array(f"{prefix}std_scale")
    for i in range(cfg.num_hidden_layers):
        pfx = f"{prefix}blocks.{i}"
        params["layers"].append({
            "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
            "post_attn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
            "ffn_norm": pb.norm(f"{pfx}.pre_feedforward_layernorm"),
            "post_ffn_norm": pb.norm(f"{pfx}.post_feedforward_layernorm"),
            "attn": {
                "q": pb.linear(f"{pfx}.self_attn.q_proj", bias=False),
                "k": pb.linear(f"{pfx}.self_attn.k_proj", bias=False),
                "v": pb.linear(f"{pfx}.self_attn.v_proj", bias=False),
                "o": pb.linear(f"{pfx}.self_attn.o_proj", bias=False),
                "q_norm": pb.norm(f"{pfx}.self_attn.q_norm"),
                "k_norm": pb.norm(f"{pfx}.self_attn.k_norm"),
            },
            "mlp": {"gate": pb.linear(f"{pfx}.mlp.gate_proj", bias=False),
                    "up": pb.linear(f"{pfx}.mlp.up_proj", bias=False),
                    "down": pb.linear(f"{pfx}.mlp.down_proj", bias=False)},
        })
    params["layers"] = tuple(params["layers"])
    return params


# ===========================================================================
# audio conformer (gemma::aud)
# ===========================================================================

@dataclass
class Gemma4AudioConfig:
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    conv_kernel_size: int
    attention_chunk_size: int
    attention_context_left: int
    attention_context_right: int
    attention_logit_cap: float
    attention_invalid_logits_value: float
    gradient_clipping: float
    residual_weight: float
    rms_norm_eps: float
    sscp_channels: tuple
    output_proj_dims: int
    feature_size: int = 128
    fft_length: int = 1024
    frame_length: int = 512
    hop_length: int = 160
    sampling_rate: int = 16000
    mel_floor: float = 0.001
    min_frequency: float = 125.0
    max_frequency: float = 7600.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def max_past(self) -> int:
        return self.attention_context_left - 1

    @property
    def context_size(self) -> int:
        return (self.attention_chunk_size + self.max_past
                + self.attention_context_right)

    def projected_length(self, mel_len: int) -> int:
        """Two conv3x3/s2/p1 passes (calc_projected_length, gemma4.cpp:183)."""
        l1 = (mel_len + 2 - 3) // 2 + 1
        return (l1 + 2 - 3) // 2 + 1


def _audio_ffw(cfg: Gemma4AudioConfig, p, x):
    """AudioFeedForward::forward (gemma4.cpp:252-268): clamp → pre-norm →
    fc×4 → silu → fc → clamp → post-norm → ×residual_weight, residual add."""
    gc = cfg.gradient_clipping
    res = x
    h = jnp.clip(x, -gc, gc)
    h = rms_norm(h, p["pre_norm"]["w"], eps=cfg.rms_norm_eps)
    h = jax.nn.silu(matmul(h, p["fc1"]).astype(jnp.float32))
    h = matmul(h, p["fc2"]).astype(jnp.float32)
    h = jnp.clip(h, -gc, gc)
    h = rms_norm(h, p["post_norm"]["w"], eps=cfg.rms_norm_eps)
    return res + h * cfg.residual_weight


def _audio_lconv(cfg: Gemma4AudioConfig, p, x):
    """AudioLightConv1D::forward (gemma4.cpp:345-363): pre-norm → 2× linear →
    sigmoid GLU → depthwise causal conv → clamp → norm → silu → linear."""
    gc = cfg.gradient_clipping
    res = x
    h = rms_norm(x, p["pre_norm"]["w"], eps=cfg.rms_norm_eps)
    h = matmul(h, p["linear_start"]).astype(jnp.float32)
    C = h.shape[-1] // 2
    h = h[..., :C] * jax.nn.sigmoid(h[..., C:])
    # depthwise causal conv over time: left-pad K-1 (AudioCausalConv1D :283)
    K = cfg.conv_kernel_size
    w = p["conv_w"]                                   # [C, 1, K] ggml layout
    seq = jnp.pad(h, ((K - 1, 0), (0, 0)))[None]      # [1, T+K-1, C]
    wj = jnp.transpose(w.astype(jnp.float32), (2, 1, 0))       # [K, 1, C]
    h = jax.lax.conv_general_dilated(
        seq, wj, window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C)[0]
    h = jnp.clip(h, -gc, gc)
    h = rms_norm(h, p["conv_norm"]["w"], eps=cfg.rms_norm_eps)
    h = jax.nn.silu(h)
    h = matmul(h, p["linear_end"]).astype(jnp.float32)
    return res + h


def _blocked(x, chunk: int):
    """[T, ...] → [U, chunk, ...] zero-padded (AudioAttention::
    _convert_to_block, gemma4.cpp:438)."""
    T = x.shape[0]
    U = -(-T // chunk)
    pad = U * chunk - T
    x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x.reshape((U, chunk) + x.shape[1:])


def _block_context(x, chunk: int, past: int, future: int):
    """[T, ...] → [U, context, ...] overlapping frames (gemma4.cpp:452)."""
    T = x.shape[0]
    U = -(-T // chunk)
    ctxs = chunk + past + future
    x = jnp.pad(x, ((past, future + chunk - 1 + (U * chunk - T)),)
                + ((0, 0),) * (x.ndim - 1))
    idx = (jnp.arange(U)[:, None] * chunk + jnp.arange(ctxs)[None, :])
    return x[idx]


def _rel_shift(bd, context: int):
    """[N, U, W, F] → [N, U, W, C] relative shift (gemma4.cpp:471-487)."""
    N, U, W, F = bd.shape
    bd = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (0, context + 1 - F)))
    bd = bd.reshape(N, U, W * (context + 1))[:, :, :W * context]
    return bd.reshape(N, U, W, context)


def gemma4_audio_attention(cfg: Gemma4AudioConfig, p, x, pos_emb):
    """AudioAttention::forward (gemma4.cpp:489-543).  q is pre-multiplied by
    softplus(per_dim_scale) × 1/(sqrt(hidden)·ln2) (folded at load,
    :383-393); k is scaled by softplus(1)/ln2."""
    T = x.shape[0]
    nh, d = cfg.num_attention_heads, cfg.head_dim
    chunk, past, fut = cfg.attention_chunk_size, cfg.max_past, cfg.attention_context_right
    ctxs = cfg.context_size

    q = matmul(x, p["q"]).astype(jnp.float32).reshape(T, nh, d)
    k = matmul(x, p["k"]).astype(jnp.float32).reshape(T, nh, d)
    v = matmul(x, p["v"]).astype(jnp.float32).reshape(T, nh, d)
    k_scale = math.log1p(math.e) / math.log(2.0)
    q = q * p["per_dim_scale"].astype(jnp.float32)
    k = k * k_scale

    qb = _blocked(q, chunk)                       # [U, W, N, H]
    kb = _block_context(k, chunk, past, fut)      # [U, C, N, H]
    vb = _block_context(v, chunk, past, fut)
    U = qb.shape[0]

    term_ac = jnp.einsum("uwnh,ucnh->nuwc", qb, kb)
    rel_k = matmul(pos_emb.astype(jnp.float32),
                   p["relative_k_proj"]).astype(jnp.float32)
    rel_k = rel_k.reshape(-1, nh, d)              # [F_span, N, H]
    term_bd = jnp.einsum("uwnh,fnh->nuwf", qb, rel_k)
    term_bd = _rel_shift(term_bd, ctxs)

    logits = term_ac + term_bd
    cap = cfg.attention_logit_cap
    logits = jnp.tanh(logits / cap) * cap

    # sliding-window validity (fill_sliding_window_mask + blocking,
    # gemma4.cpp:668-746): key global index kg = u*chunk - past + c must be
    # a real position inside (qg - past, qg + fut]
    qg = jnp.arange(U)[:, None, None] * chunk + jnp.arange(chunk)[None, :, None]
    kg = jnp.arange(U)[:, None, None] * chunk - past + jnp.arange(ctxs)[None, None, :]
    valid = (kg >= 0) & (kg < T) & (kg > qg - past - 1) & (kg <= qg + fut)
    logits = jnp.where(valid[None], logits, cfg.attention_invalid_logits_value)
    probs = jax.nn.softmax(logits, axis=-1)

    o = jnp.einsum("nuwc,ucnh->uwnh", probs, vb)
    o = o.reshape(U * chunk, nh * d)[:T]
    return matmul(o, p["post"]).astype(jnp.float32)


def gemma4_audio_layer(cfg: Gemma4AudioConfig, p, x, pos_emb):
    """AudioLayer::forward (gemma4.cpp:598-621)."""
    gc = cfg.gradient_clipping
    x = _audio_ffw(cfg, p["ffw1"], x)
    res = x
    h = jnp.clip(x, -gc, gc)
    h = rms_norm(h, p["norm_pre_attn"]["w"], eps=cfg.rms_norm_eps)
    h = gemma4_audio_attention(cfg, p["attn"], h, pos_emb)
    h = jnp.clip(h, -gc, gc)
    h = rms_norm(h, p["norm_post_attn"]["w"], eps=cfg.rms_norm_eps)
    x = res + h
    x = _audio_lconv(cfg, p["lconv"], x)
    x = _audio_ffw(cfg, p["ffw2"], x)
    x = jnp.clip(x, -gc, gc)
    return rms_norm(x, p["norm_out"]["w"], eps=cfg.rms_norm_eps)


def _sscp_block(cfg: Gemma4AudioConfig, p, x):
    """conv3x3 stride2 pad1 + channel LayerNorm (no bias) + ReLU
    (AudioSubSampleConvProjectionLayer::forward2, gemma4.cpp:124-144)."""
    w = jnp.transpose(p["conv_w"].astype(jnp.float32), (2, 3, 1, 0))  # HWIO
    x = jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = layer_norm(x, p["norm"]["w"], None, eps=cfg.rms_norm_eps)
    return jax.nn.relu(x)


def gemma4_audio_forward(cfg: Gemma4AudioConfig, params, mel):
    """mel [T, feature_size] → [T/4, lm_hidden] (AudioModel::forward,
    gemma4.cpp:748-778)."""
    x = mel.astype(jnp.float32)[None, :, :, None]          # [1, T, F, 1]
    x = _sscp_block(cfg, params["sscp0"], x)
    x = _sscp_block(cfg, params["sscp1"], x)
    # feature vector per frame: freq-major, channel-fastest (ggml permute
    # (1,2,0,3) + reshape, gemma4.cpp:199-205) = NHWC flatten of [F', C]
    _, T2, F2, C2 = x.shape
    x = x.reshape(T2, F2 * C2)
    x = matmul(x, params["input_proj"]).astype(jnp.float32)
    pos = params["pos_embed"]                              # [F_span, hidden]
    for lp in params["layers"]:
        x = gemma4_audio_layer(cfg, lp, x, pos)
    x = matmul(x, params["output_proj"]).astype(jnp.float32)
    x = _wrms(x)
    return matmul(x, params["embedding_projection"]).astype(jnp.float32)


def load_gemma4_audio_params(pb, cfg: Gemma4AudioConfig,
                             prefix="audio.") -> dict:
    qscale = 1.0 / math.sqrt(cfg.hidden_size) / math.log(2.0)
    sscp = f"{prefix}subsample_conv_projection."
    params = {
        "sscp0": {"conv_w": pb.raw_f32(f"{sscp}layer0.conv.weight"),
                  "norm": pb.norm(f"{sscp}layer0.norm")},
        "sscp1": {"conv_w": pb.raw_f32(f"{sscp}layer1.conv.weight"),
                  "norm": pb.norm(f"{sscp}layer1.norm")},
        "input_proj": pb.linear(f"{sscp}input_proj_linear", bias=False),
        "pos_embed": pb.array(f"{prefix}pos_embed.weight"),
        "output_proj": pb.linear(f"{prefix}output_proj"),
        "embedding_projection": pb.linear(f"{prefix}embedding_projection",
                                          bias=False),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pfx = f"{prefix}layers.{i}"
        pds = pb.raw_f32(f"{pfx}.self_attn.per_dim_scale")
        params["layers"].append({
            "ffw1": {
                "fc1": pb.linear(f"{pfx}.feed_forward1.ffw_layer_1", bias=False),
                "fc2": pb.linear(f"{pfx}.feed_forward1.ffw_layer_2", bias=False),
                "pre_norm": pb.norm(f"{pfx}.feed_forward1.pre_layer_norm"),
                "post_norm": pb.norm(f"{pfx}.feed_forward1.post_layer_norm"),
            },
            "ffw2": {
                "fc1": pb.linear(f"{pfx}.feed_forward2.ffw_layer_1", bias=False),
                "fc2": pb.linear(f"{pfx}.feed_forward2.ffw_layer_2", bias=False),
                "pre_norm": pb.norm(f"{pfx}.feed_forward2.pre_layer_norm"),
                "post_norm": pb.norm(f"{pfx}.feed_forward2.post_layer_norm"),
            },
            "attn": {
                "q": pb.linear(f"{pfx}.self_attn.q_proj", bias=False),
                "k": pb.linear(f"{pfx}.self_attn.k_proj", bias=False),
                "v": pb.linear(f"{pfx}.self_attn.v_proj", bias=False),
                "post": pb.linear(f"{pfx}.self_attn.post", bias=False),
                "relative_k_proj": pb.linear(f"{pfx}.self_attn.relative_k_proj",
                                             bias=False),
                # softplus + q_scale folded at load (AudioAttention::load,
                # gemma4.cpp:388-393)
                "per_dim_scale": jnp.asarray(
                    np.log1p(np.exp(pds)) * qscale, jnp.float32),
            },
            "lconv": {
                "linear_start": pb.linear(f"{pfx}.lconv1d.linear_start",
                                          bias=False),
                "linear_end": pb.linear(f"{pfx}.lconv1d.linear_end", bias=False),
                "conv_w": pb.raw_f32(f"{pfx}.lconv1d.depthwise_conv1d.weight"),
                "pre_norm": pb.norm(f"{pfx}.lconv1d.pre_layer_norm"),
                "conv_norm": pb.norm(f"{pfx}.lconv1d.conv_norm"),
            },
            "norm_pre_attn": pb.norm(f"{pfx}.norm_pre_attn"),
            "norm_post_attn": pb.norm(f"{pfx}.norm_post_attn"),
            "norm_out": pb.norm(f"{pfx}.norm_out"),
        })
    params["layers"] = tuple(params["layers"])
    return params


# ===========================================================================
# tower wrappers + loaders
# ===========================================================================

class Gemma4Vision:
    def __init__(self, cfg: Gemma4ViTConfig, params, image_mean, image_std):
        self.cfg = cfg
        self.params = params
        self.image_mean = image_mean
        self.image_std = image_std

    def encode_image(self, image):
        """image → [n_soft_tokens, lm_hidden].  The tower consumes raw [0,1]
        pixels (no mean/std — scaling happens in-model).

        Matches vision::image_load(PaddingMode::Black) + MaxPatchNum
        (gemma4.cpp:2710-2721): the image is downscaled (aspect preserved)
        only as needed to fit the position-embedding grid and the patch
        budget, then BLACK-PADDED out to the patch×pool multiple — never
        stretched."""
        from ..runtime.vision import load_image

        img = load_image(image)
        p = self.cfg.patch_size
        k = self.cfg.pooling_kernel_size
        step = p * k
        pe = self.cfg.position_embedding_size
        w0, h0 = img.size

        def grid(w, h):
            gw = max(k, min(-(-w // step) * k, pe))
            gh = max(k, min(-(-h // step) * k, pe))
            return gw, gh

        # downscale (aspect-preserving) until the padded grid fits both the
        # pos-embed table and the patch budget
        scale = min(1.0, (pe * p) / w0, (pe * p) / h0)
        gw, gh = grid(int(w0 * scale), int(h0 * scale))
        if gw * gh > self.cfg.max_patches:
            scale *= (self.cfg.max_patches / (gw * gh)) ** 0.5
            gw, gh = grid(int(w0 * scale), int(h0 * scale))
            while gw * gh > self.cfg.max_patches:
                scale *= 0.95
                gw, gh = grid(int(w0 * scale), int(h0 * scale))
        if scale < 1.0:
            img = img.resize((max(1, int(w0 * scale)),
                              max(1, int(h0 * scale))))
        # black-pad to the (gw*p, gh*p) canvas
        px = np.zeros((gh * p, gw * p, 3), np.float32)
        arr = np.asarray(img, np.float32) / 255.0
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        px[:arr.shape[0], :arr.shape[1], :] = arr[:gh * p, :gw * p, :3]
        patches = px.reshape(gh, p, gw, p, 3).transpose(0, 2, 1, 3, 4)
        patches = patches.reshape(gh * gw, p * p * 3)
        out = gemma4_vit_forward(self.cfg, self.params, jnp.asarray(patches),
                                 gw, gh)
        return out

    def token_count(self, n_patches: int) -> int:
        return n_patches // (self.cfg.pooling_kernel_size ** 2)


class Gemma4Audio:
    def __init__(self, cfg: Gemma4AudioConfig, params):
        self.cfg = cfg
        self.params = params

    def encode_audio(self, path):
        """audio file → [projected_len, lm_hidden]."""
        from ..runtime.audio import load_pcm, log_mel_gemma4

        pcm = load_pcm(path, self.cfg.sampling_rate)
        mel = log_mel_gemma4(pcm, self.cfg)                 # [T, F]
        return gemma4_audio_forward(self.cfg, self.params, jnp.asarray(mel))


def load_gemma4_vision(gf, rt, lm_hidden: int, meta: dict):
    cfg_json = meta.get("config.json", {})
    vis = cfg_json.get("vision_config", {})
    if not vis or not gf.has_tensor("visual.patch_embedder.input_proj.weight"):
        return None
    from ..models.base import ParamBuilder

    pe = int(vis.get("position_embedding_size", 64))
    pool = int(vis.get("pooling_kernel_size", 2))
    cfg = Gemma4ViTConfig(
        hidden_size=int(vis["hidden_size"]),
        num_hidden_layers=int(vis["num_hidden_layers"]),
        num_attention_heads=int(vis["num_attention_heads"]),
        num_key_value_heads=int(vis.get("num_key_value_heads",
                                        vis["num_attention_heads"])),
        head_dim=int(vis.get("head_dim",
                             int(vis["hidden_size"]) // int(vis["num_attention_heads"]))),
        intermediate_size=int(vis["intermediate_size"]),
        patch_size=int(vis["patch_size"]),
        pooling_kernel_size=pool,
        position_embedding_size=pe,
        rope_theta=float(vis.get("rope_parameters", {}).get("rope_theta", 1e4)),
        # projected-token budget (VisualEmbeddingGeneration::load_more,
        # gemma4.cpp:1419): min(max_projected_tokens · pool², pos_emb²);
        # max_projected_tokens = 2048·10 (v4 Prelude PadEmbedding)
        max_patches=min(20480 * pool * pool, pe * pe))
    pb = ParamBuilder(gf, rt)
    params = load_gemma4_vit_params(pb, cfg)
    pp = meta.get("processor_config.json", {}).get("video_processor", {})
    return Gemma4Vision(cfg, params, pp.get("image_mean", [0.5] * 3),
                        pp.get("image_std", [0.5] * 3))


def load_gemma4_audio(gf, rt, lm_hidden: int, meta: dict):
    cfg_json = meta.get("config.json", {})
    aud = cfg_json.get("audio_config", {})
    if not aud or not gf.has_tensor(
            "audio.subsample_conv_projection.input_proj_linear.weight"):
        return None
    from ..models.base import ParamBuilder

    fe = meta.get("processor_config.json", {}).get("feature_extractor", {})
    cfg = Gemma4AudioConfig(
        hidden_size=int(aud["hidden_size"]),
        num_hidden_layers=int(aud["num_hidden_layers"]),
        num_attention_heads=int(aud["num_attention_heads"]),
        conv_kernel_size=int(aud["conv_kernel_size"]),
        attention_chunk_size=int(aud["attention_chunk_size"]),
        attention_context_left=int(aud["attention_context_left"]),
        attention_context_right=int(aud["attention_context_right"]),
        attention_logit_cap=float(aud["attention_logit_cap"]),
        attention_invalid_logits_value=float(
            aud["attention_invalid_logits_value"]),
        gradient_clipping=float(aud["gradient_clipping"]),
        residual_weight=float(aud["residual_weight"]),
        rms_norm_eps=float(aud.get("rms_norm_eps", 1e-6)),
        sscp_channels=tuple(aud["subsampling_conv_channels"]),
        output_proj_dims=int(aud["output_proj_dims"]),
        feature_size=int(fe.get("feature_size", 128)),
        fft_length=int(fe.get("fft_length", 1024)),
        frame_length=int(fe.get("frame_length", 512)),
        hop_length=int(fe.get("hop_length", 160)),
        sampling_rate=int(fe.get("sampling_rate", 16000)),
        mel_floor=float(fe.get("mel_floor", 0.001)),
        min_frequency=float(fe.get("min_frequency", 125.0)),
        max_frequency=float(fe.get("max_frequency", 7600.0)))
    pb = ParamBuilder(gf, rt)
    params = load_gemma4_audio_params(pb, cfg)
    return Gemma4Audio(cfg, params)


# ===========================================================================
# unified embedders (gemma::v4_unified)
# ===========================================================================

class Gemma4UnifiedVision:
    """VisionEmbedder (gemma4.cpp:2869-2930): LN → dense → LN on raw patches,
    learned x/y pos rows, pos-norm, MultimodalEmbedder.  (The reference's
    project_image is a stub — kept loadable for parity.)"""

    def __init__(self, params, patch_size: int, posemb_size: int,
                 norm_eps: float = 1e-6):
        self.params = params
        self.patch_size = patch_size
        self.posemb_size = posemb_size
        self.norm_eps = norm_eps

    def forward(self, patches, grid_w: int, grid_h: int):
        p = self.params
        x = patches.astype(jnp.float32)
        x = layer_norm(x, p["patch_ln1"]["w"], p["patch_ln1"].get("b"),
                       eps=self.norm_eps)
        x = matmul(x, p["patch_dense"]).astype(jnp.float32)
        x = layer_norm(x, p["patch_ln2"]["w"], p["patch_ln2"].get("b"),
                       eps=self.norm_eps)
        xs = jnp.tile(jnp.arange(grid_w), grid_h)
        ys = jnp.repeat(jnp.arange(grid_h), grid_w)
        x = x + p["pos_x"][xs] + p["pos_y"][ys]
        x = layer_norm(x, p["pos_norm"]["w"], p["pos_norm"].get("b"),
                       eps=self.norm_eps)
        x = _wrms(x)
        return matmul(x, p["embedding_projection"]).astype(jnp.float32)


class Gemma4UnifiedAudio:
    """Raw-PCM chunks → MultimodalEmbedder (project_audio, gemma4.cpp:3062)."""

    def __init__(self, params, samples_per_token: int, sampling_rate: int):
        self.params = params
        self.samples_per_token = samples_per_token
        self.sampling_rate = sampling_rate

    def encode_audio(self, path):
        from ..runtime.audio import load_pcm

        pcm = load_pcm(path, self.sampling_rate)
        n = -(-len(pcm) // self.samples_per_token)
        pcm = np.pad(pcm, (0, n * self.samples_per_token - len(pcm)))
        chunks = jnp.asarray(pcm.reshape(n, self.samples_per_token))
        x = _wrms(chunks.astype(jnp.float32))
        return matmul(x, self.params["embedding_projection"]).astype(jnp.float32)


def load_gemma4_unified_mm(gf, rt, lm_hidden: int, meta: dict):
    from ..models.base import ParamBuilder

    cfg_json = meta.get("config.json", {})
    pb = ParamBuilder(gf, rt)
    vision = audio = None
    vis = cfg_json.get("vision_config", {})
    if vis and gf.has_tensor("model.vision_embedder.patch_dense.weight"):
        pfx = "model.vision_embedder."
        params = {
            "patch_ln1": pb.norm(f"{pfx}patch_ln1"),
            "patch_dense": pb.linear(f"{pfx}patch_dense"),
            "patch_ln2": pb.norm(f"{pfx}patch_ln2"),
            "pos_x": pb.array(f"{pfx}pos_embedding_x"),
            "pos_y": pb.array(f"{pfx}pos_embedding_y"),
            "pos_norm": pb.norm(f"{pfx}pos_norm"),
            "embedding_projection": pb.linear("visual.embedding_projection",
                                              bias=False),
        }
        vision = Gemma4UnifiedVision(params, int(vis["model_patch_size"]),
                                     int(vis["mm_posemb_size"]))
    fe = meta.get("processor_config.json", {}).get("feature_extractor", {})
    if fe and gf.has_tensor("audio.embedding_projection.weight"):
        params = {"embedding_projection":
                  pb.linear("audio.embedding_projection", bias=False)}
        audio = Gemma4UnifiedAudio(params,
                                   int(fe.get("audio_samples_per_token", 320)),
                                   int(fe.get("sampling_rate", 16000)))
    return vision, audio
