"""Whisper-style audio encoder (ASR tower).

Reference: the qwen_asr audio tower (/root/reference/models/qwen_asr.h:4-120
— conv subsampling + sinusoidal positions + pre-LN cacheless transformer +
projector) and qwen2-audio/glm-asr variants; all are Whisper-encoder
descendants.  This implements the Whisper encoder faithfully (HF-golden) as
the shared tower; per-model variants adjust the conv stack / projector.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.norm import layer_norm
from ..ops.qmm import matmul


@dataclass(frozen=True)
class AudioEncoderConfig:
    n_mels: int
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    max_source_positions: int = 1500
    norm_eps: float = 1e-5


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper sinusoidal position embedding."""
    log_timescale = np.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def _conv1d(x, w, b, stride: int, padding: int):
    """x: [B, T, C_in]; w: [k, C_in, C_out]."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + b


def audio_encoder_forward(cfg: AudioEncoderConfig, params, mel,
                          pool_stride: int = 0):
    """mel: [B, n_mels, frames] → hidden [B, frames//2(//pool), hidden]
    (whisper encoder: conv1(k3,s1) gelu → conv2(k3,s2) gelu → +pos → layers
    → [avg-pool] → final LN).

    `pool_stride=2` is the Qwen2-Audio variant: average-pool the sequence
    before the final norm (qwen.cpp AudioTransformer::forward:507 applies
    avg_pool_1d between the layers and layer_norm)."""
    x = jnp.transpose(mel, (0, 2, 1))                     # [B, T, n_mels]
    x = jax.nn.gelu(_conv1d(x, params["conv1_w"], params["conv1_b"], 1, 1),
                    approximate=False)
    x = jax.nn.gelu(_conv1d(x, params["conv2_w"], params["conv2_b"], 2, 1),
                    approximate=False)
    T = x.shape[1]
    x = x + params["pos"][None, :T]

    for p in params["layers"]:
        h = layer_norm(x, p["norm1"]["w"], p["norm1"]["b"], eps=cfg.norm_eps)
        attn = _audio_attention(cfg, p["attn"], h)
        x = x + attn
        h = layer_norm(x, p["norm2"]["w"], p["norm2"]["b"], eps=cfg.norm_eps)
        h = jax.nn.gelu(matmul(h, p["mlp"]["fc0"]).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        x = x + matmul(h, p["mlp"]["fc1"]).astype(x.dtype)
    if pool_stride > 1:
        Tp = (x.shape[1] // pool_stride) * pool_stride
        x = x[:, :Tp].reshape(x.shape[0], Tp // pool_stride, pool_stride,
                              x.shape[-1]).mean(axis=2)
    return layer_norm(x, params["post_norm"]["w"], params["post_norm"]["b"],
                      eps=cfg.norm_eps)


def load_audio_tower_params(pb, cfg: AudioEncoderConfig,
                            prefix: str = "audio.") -> dict:
    """Converter weight names (QWen2AudioConverter.get_weight_names,
    convert.py:4903-4936; k_proj has no bias)."""
    params = {
        "conv1_w": jnp.asarray(np.transpose(
            pb.raw_f32(f"{prefix}conv1.weight"), (2, 1, 0))),
        "conv1_b": pb.array(f"{prefix}conv1.bias"),
        "conv2_w": jnp.asarray(np.transpose(
            pb.raw_f32(f"{prefix}conv2.weight"), (2, 1, 0))),
        "conv2_b": pb.array(f"{prefix}conv2.bias"),
        "pos": pb.array(f"{prefix}embed_positions.weight"),
        "post_norm": {"w": pb.array(f"{prefix}layer_norm.weight"),
                      "b": pb.array(f"{prefix}layer_norm.bias")},
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pfx = f"{prefix}layers.{i}"
        params["layers"].append({
            "norm1": pb.norm(f"{pfx}.input_layernorm", bias=True),
            "norm2": pb.norm(f"{pfx}.post_attention_layernorm", bias=True),
            "attn": {
                "q": pb.linear(f"{pfx}.self_attn.q_proj", bias=True),
                "k": pb.linear(f"{pfx}.self_attn.k_proj", bias=False),
                "v": pb.linear(f"{pfx}.self_attn.v_proj", bias=True),
                "o": pb.linear(f"{pfx}.self_attn.o_proj", bias=True),
            },
            "mlp": {"fc0": pb.linear(f"{pfx}.mlp.fc1", bias=True),
                    "fc1": pb.linear(f"{pfx}.mlp.fc2", bias=True)},
        })
    params["layers"] = tuple(params["layers"])
    return params


def _audio_attention(cfg, p, x, mask=None):
    B, T, H = x.shape
    nh = cfg.num_attention_heads
    d = H // nh
    q = matmul(x, p["q"]).reshape(B, T, nh, d).astype(jnp.float32)
    k = matmul(x, p["k"]).reshape(B, T, nh, d).astype(jnp.float32)
    v = matmul(x, p["v"]).reshape(B, T, nh, d).astype(jnp.float32)
    scores = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (d ** -0.5)
    if mask is not None:
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
    pr = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", pr, v).reshape(B, T, H)
    return matmul(out.astype(x.dtype), p["o"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# GLM-ASR audio tower (reference: models/chatglm.cpp glm::audio_tower:723)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GlmAudioConfig:
    n_mels: int
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    intermediate_size: int
    max_positions: int
    rope_dim: int
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5


def glm_audio_encoder_forward(cfg: GlmAudioConfig, params, mel):
    """mel [n_mels, frames] → projected embeddings [T, lm_hidden].

    Whisper-style conv subsampling but NO learned positions — the layers use
    partial-rotary NeoX rope instead (AudioSelfAttention, chatglm.cpp:754);
    after the final LN, `intermediate/hidden` consecutive frames are stacked
    and fed through the fc0→GELU→fc1 projector (AudioTransformer::forward,
    chatglm.cpp:913-930)."""
    from ..ops.rope import ROPE_NEOX, RopeConfig, apply_rope, \
        precompute_rope_cache

    x = jnp.transpose(mel[None], (0, 2, 1))
    x = jax.nn.gelu(_conv1d(x, params["conv1_w"], params["conv1_b"], 1, 1),
                    approximate=False)
    x = jax.nn.gelu(_conv1d(x, params["conv2_w"], params["conv2_b"], 2, 1),
                    approximate=False)
    T = x.shape[1]
    d = cfg.hidden_size // cfg.num_attention_heads
    rope = RopeConfig(head_dim=d, rot_dim=cfg.rope_dim,
                      freq_base=cfg.rope_theta, layout=ROPE_NEOX)
    cos, sin = precompute_rope_cache(jnp.arange(T), rope)

    def attn(p, h):
        B, T_, H = h.shape
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        q = matmul(h, p["q"]).reshape(B, T_, nh, d)
        k = matmul(h, p["k"]).reshape(B, T_, nkv, d)
        v = matmul(h, p["v"]).reshape(B, T_, nkv, d).astype(jnp.float32)
        q = apply_rope(q, cos, sin, layout=ROPE_NEOX, rot_dim=cfg.rope_dim)
        k = apply_rope(k, cos, sin, layout=ROPE_NEOX, rot_dim=cfg.rope_dim)
        g = nh // nkv
        qg = q.reshape(B, T_, nkv, g, d).astype(jnp.float32)
        scores = jnp.einsum("bnkgd,bmkd->bkgnm", qg, k.astype(jnp.float32))
        pr = jax.nn.softmax(scores * (d ** -0.5), axis=-1)
        out = jnp.einsum("bkgnm,bmkd->bnkgd", pr, v).reshape(B, T_, nh * d)
        return matmul(out.astype(h.dtype), p["o"]).astype(h.dtype)

    for p in params["layers"]:
        h = layer_norm(x, p["norm1"]["w"], p["norm1"]["b"], eps=cfg.norm_eps)
        x = x + attn(p["attn"], h)
        h = layer_norm(x, p["norm2"]["w"], p["norm2"]["b"], eps=cfg.norm_eps)
        h = jax.nn.gelu(matmul(h, p["mlp"]["fc0"]).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        x = x + matmul(h, p["mlp"]["fc1"]).astype(x.dtype)
    x = layer_norm(x, params["post_norm"]["w"], params["post_norm"]["b"],
                   eps=cfg.norm_eps)[0]                   # [T, hidden]

    k = cfg.intermediate_size // cfg.hidden_size          # frame-stack factor
    Tk = (x.shape[0] // k) * k
    x = x[:Tk].reshape(Tk // k, k * cfg.hidden_size)
    x = jax.nn.gelu(matmul(x, params["proj_fc0"]).astype(jnp.float32),
                    approximate=False)
    return matmul(x, params["proj_fc1"])


def load_glm_audio_params(pb, cfg: GlmAudioConfig, prefix: str = "audio.") -> dict:
    """Converter names (GLM-ASR: audio.* tower, mlp fc naming shifted by one —
    file `.mlp.fc1/fc2` = internal fc0/fc1; projector `linear_1/linear_2`;
    chatglm.cpp:1145-1150)."""
    params = {
        "conv1_w": jnp.asarray(np.transpose(
            pb.raw_f32(f"{prefix}conv1.weight"), (2, 1, 0))),
        "conv1_b": pb.array(f"{prefix}conv1.bias"),
        "conv2_w": jnp.asarray(np.transpose(
            pb.raw_f32(f"{prefix}conv2.weight"), (2, 1, 0))),
        "conv2_b": pb.array(f"{prefix}conv2.bias"),
        "post_norm": {"w": pb.array(f"{prefix}norm.weight"),
                      "b": pb.array(f"{prefix}norm.bias")},
        "proj_fc0": pb.linear("multi_modal_projector.linear_1", bias=True),
        "proj_fc1": pb.linear("multi_modal_projector.linear_2", bias=True),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pfx = f"{prefix}layers.{i}"
        params["layers"].append({
            "norm1": pb.norm(f"{pfx}.input_layernorm", bias=True),
            "norm2": pb.norm(f"{pfx}.post_attention_layernorm", bias=True),
            "attn": {
                "q": pb.linear(f"{pfx}.self_attn.q_proj", bias=True),
                # GLM-ASR files carry no k_proj bias (GLMASRConverter
                # weight list, reference convert.py:4975)
                "k": pb.linear(f"{pfx}.self_attn.k_proj", bias="auto"),
                "v": pb.linear(f"{pfx}.self_attn.v_proj", bias=True),
                "o": pb.linear(f"{pfx}.self_attn.o_proj", bias=True),
            },
            "mlp": {"fc0": pb.linear(f"{pfx}.mlp.fc1", bias=True),
                    "fc1": pb.linear(f"{pfx}.mlp.fc2", bias=True)},
        })
    params["layers"] = tuple(params["layers"])
    return params


# ---------------------------------------------------------------------------
# Qwen3-ASR AuT tower (reference: models/qwen_asr.{h,cpp} — conv2d window
# subsampling ×8, per-chunk sinusoidal positions, windowed bidirectional
# attention; HF `Qwen3OmniMoeAudioEncoder` is the numeric oracle)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class AuTConfig:
    n_mels: int
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    output_dim: int                    # LLM hidden (projector out)
    downsample_hidden_size: int
    n_window: int = 50                 # chunk = 2*n_window mel frames
    n_window_infer: int = 800          # attention window, mel frames
    conv_chunksize: int = 500
    max_source_positions: int = 1500
    norm_eps: float = 1e-5


def aut_feat_out_len(mel_len: int) -> int:
    """Output tokens for a mel length (qwen_asr.cpp
    get_feat_extract_output_lengths: 13 per full 100-frame chunk +
    ceil8 of the tail)."""
    return (mel_len % 100 + 7) // 8 + (mel_len // 100) * 13


def _conv2d_s2(x, w, b):
    """x: [N, C, H, W]; w: [out, in, 3, 3]; stride 2, pad 1."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), jnp.asarray(w, jnp.float32),
        window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + jnp.asarray(b, jnp.float32)[None, :, None, None]


def aut_forward(cfg: AuTConfig, params, mel):
    """mel: [T, n_mels] f32 → projected embeddings [aut_feat_out_len(T),
    output_dim].

    Chunks of 2*n_window frames are independently conv-subsampled ×8
    (zero-padded tail), positions restart per chunk, and attention is
    bidirectional within segments of n_window_infer/(2*n_window) chunks
    (HF Qwen3OmniMoeAudioEncoder.forward cu_chunk_lens)."""
    T = mel.shape[0]
    w2 = 2 * cfg.n_window
    nc = -(-T // w2)
    x = jnp.pad(mel, ((0, nc * w2 - T), (0, 0)))
    # conv images are [1, H=mels, W=time] per chunk (HF pads chunks of the
    # [n_mels, T] features and convolves mel×time)
    x = jnp.transpose(x.reshape(nc, w2, cfg.n_mels), (0, 2, 1))[:, None]
    for name in ("conv1", "conv2", "conv3"):
        x = jax.nn.gelu(_conv2d_s2(x, params[name + "_w"], params[name + "_b"]),
                        approximate=False)
    nc_, ch, fq, tq = x.shape                         # tq = ceil(w2/8)
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(nc, tq, ch * fq)
    x = matmul(x.astype(jnp.float32), params["conv_out"])       # [nc, tq, hid]
    x = x + jnp.asarray(sinusoids(tq, cfg.hidden_size))[None]

    # per-chunk valid lengths (tail chunk produces fewer tokens)
    lens = np.full(nc, tq, np.int64)
    tail = T % w2
    if tail:
        lens[-1] = -(-tail // 8)
    valid = np.concatenate([np.arange(L) + i * tq
                            for i, L in enumerate(lens)])
    x = x.reshape(nc * tq, cfg.hidden_size)[jnp.asarray(valid)][None]

    # segment ids: window_aftercnn tokens attend to each other
    win = tq * max(1, cfg.n_window_infer // w2)
    seg = np.arange(valid.shape[0]) // win
    mask = jnp.asarray(seg[:, None] == seg[None, :])

    for p in params["layers"]:
        h = layer_norm(x, p["norm1"]["w"], p["norm1"]["b"], eps=cfg.norm_eps)
        x = x + _audio_attention(cfg, p["attn"], h, mask=mask)
        h = layer_norm(x, p["norm2"]["w"], p["norm2"]["b"], eps=cfg.norm_eps)
        h = jax.nn.gelu(matmul(h, p["mlp"]["fc0"]).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        x = x + matmul(h, p["mlp"]["fc1"]).astype(x.dtype)
    x = layer_norm(x, params["post_norm"]["w"], params["post_norm"]["b"],
                   eps=cfg.norm_eps)
    x = jax.nn.gelu(matmul(x, params["proj1"]).astype(jnp.float32),
                    approximate=False)
    return matmul(x, params["proj2"])[0]


def load_aut_params(pb, cfg: AuTConfig, prefix: str = "audio.") -> dict:
    """Converter names (Qwen3ASRConverter convert.py:6119: fc1/fc2 →
    mlp.fc0/fc1, out_proj → o_proj, proj1/proj2 under
    multi_modal_projector)."""
    params = {
        "conv_out": pb.linear(f"{prefix}conv_out", bias=False),
        "post_norm": {"w": pb.array(f"{prefix}ln_post.weight"),
                      "b": pb.array(f"{prefix}ln_post.bias")},
        "proj1": pb.linear("multi_modal_projector.proj1", bias=True),
        "proj2": pb.linear("multi_modal_projector.proj2", bias=True),
        "layers": [],
    }
    for j in (1, 2, 3):
        params[f"conv{j}_w"] = pb.raw_f32(f"{prefix}conv2d{j}.weight")
        params[f"conv{j}_b"] = pb.raw_f32(f"{prefix}conv2d{j}.bias")
    for i in range(cfg.num_hidden_layers):
        pfx = f"{prefix}layers.{i}"
        params["layers"].append({
            "norm1": pb.norm(f"{pfx}.input_layernorm", bias=True),
            "norm2": pb.norm(f"{pfx}.post_attention_layernorm", bias=True),
            "attn": {
                "q": pb.linear(f"{pfx}.self_attn.q_proj", bias=True),
                "k": pb.linear(f"{pfx}.self_attn.k_proj", bias=True),
                "v": pb.linear(f"{pfx}.self_attn.v_proj", bias=True),
                "o": pb.linear(f"{pfx}.self_attn.o_proj", bias=True),
            },
            "mlp": {"fc0": pb.linear(f"{pfx}.mlp.fc0", bias=True),
                    "fc1": pb.linear(f"{pfx}.mlp.fc1", bias=True)},
        })
    params["layers"] = tuple(params["layers"])
    return params
