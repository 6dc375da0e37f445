"""Rotary position embeddings, all scaling families used by the reference:

  - plain RoPE with freq_base/freq_scale (ggml_rope_ext semantics,
    /root/reference/ggml/src/ggml.c `ggml_rope_impl`; wired in
    src/layers.h:2018 `RoPESelfAttention`)
  - YaRN (reference `setup_yarn` src/layers.h:2070; math follows the ggml
    `rope_yarn` corr-dim ramp formula)
  - LongRoPE / Phi3-SU per-dim `freq_factors` (src/layers.h:3244-3274)
  - partial rotary dims (`rope_dim < head_dim`, e.g. GLM/Persimmon)
  - two lane layouts: NEOX (half-split, HF `rotate_half`) and NORMAL
    (adjacent interleaved pairs, ggml mode 0)

Design: cos/sin (with YaRN mscale folded in) are precomputed per position on
the host side of jit as a [T, rot/2] table; applying them is a fused
elementwise op on the VPU.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

ROPE_NEOX = "neox"        # rotate halves (HF convention)
ROPE_NORMAL = "normal"    # rotate adjacent pairs (ggml mode 0)
ROPE_GLM1 = "glm1"        # ChatGLM-6B 2D rope: two head halves, each
#                           NeoX-rotated with its own position channel
#                           (src/custom_ops.cpp ggml_compute_forward_
#                           chatglm1_rope:383-534)
ROPE_NEO3D = "neo3d"      # NeoChat 3-D rope: head split [t: d/2, h: d/4,
#                           w: d/4], each part NeoX-rotated with its own
#                           position stream; t uses freq_base, h/w use
#                           freq_base_2 (models/neochat.cpp
#                           BaseNeoAttention::split_norm_rope:635-679)


@dataclass(frozen=True)
class RopeConfig:
    head_dim: int
    rot_dim: int = -1                    # rotary dims (defaults to head_dim)
    freq_base: float = 10000.0
    freq_scale: float = 1.0              # 1/linear-scaling factor
    layout: str = ROPE_NEOX
    # YaRN (0 disables):
    ext_factor: float = 0.0
    attn_factor: float = 1.0
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    orig_ctx: int = 0                    # n_ctx_orig for YaRN ramp
    # LongRoPE per-dim factors (length rot_dim/2), optional:
    freq_factors: Optional[tuple] = None
    mscale_all: float = 1.0              # explicit attn-scale multiplier
    # M-RoPE (Qwen2-VL family): per-frequency axis sections over (t, h, w[, e])
    # in half-dim units (ggml_rope_multi GGML_ROPE_TYPE_MROPE semantics,
    # wired in /root/reference/models/qwen.cpp:1653).  None disables.
    mrope_sections: Optional[tuple] = None
    mrope_interleaved: bool = False      # IMROPE (Qwen3-VL)
    # Qwen-v1 dynamic NTK: per-position base stretch
    # alpha(p) = max(2^ceil(log2(p/orig_ctx)+1) - 1, 1),
    # base_p = freq_base * alpha^(rot/(rot-2))
    # (custom_ops.cpp ggml_compute_forward_ntk_dynamic_rope:79)
    ntk_dynamic: bool = False
    freq_base_2: float = 10000.0         # second base (neo3d h/w sections)

    def resolved_rot_dim(self) -> int:
        return self.head_dim if self.rot_dim <= 0 else self.rot_dim


def _yarn_corr_dim(n_dims: int, n_ctx_orig: int, beta: float, base: float) -> float:
    # inverse of theta_i = 2*pi*beta: dim index where rotations == beta
    return n_dims * math.log(n_ctx_orig / (beta * 2 * math.pi)) / (2 * math.log(base))


def rope_mscale(cfg: RopeConfig) -> float:
    """The attention magnitude scale folded into cos/sin tables."""
    m = cfg.attn_factor * cfg.mscale_all
    if cfg.ext_factor != 0.0 and cfg.orig_ctx > 0:
        m *= 1.0 + 0.1 * math.log(1.0 / cfg.freq_scale)
    return m


def precompute_rope_cache(positions: jax.Array, cfg: RopeConfig):
    """positions: int array [...]; returns (cos, sin): f32 [..., rot/2]."""
    rot = cfg.resolved_rot_dim()
    half = rot // 2
    dim_i = jnp.arange(half, dtype=jnp.float32)
    inv_freq = jnp.power(jnp.float32(cfg.freq_base), -2.0 * dim_i / rot)
    if cfg.freq_factors is not None:
        inv_freq = inv_freq / jnp.asarray(cfg.freq_factors, dtype=jnp.float32)

    pos = positions.astype(jnp.float32)[..., None]             # [..., 1]
    if cfg.ntk_dynamic and cfg.orig_ctx > 0:
        ctx_val = jnp.floor(jnp.log2(jnp.maximum(pos, 1.0) / cfg.orig_ctx)
                            + 1.0 - 1e-6) + 1.0     # ceil
        alpha = jnp.maximum(jnp.exp2(ctx_val) - 1.0, 1.0)
        base_p = jnp.float32(cfg.freq_base) * jnp.power(
            alpha, rot / (rot - 2.0))                          # [..., 1]
        inv_freq = jnp.power(base_p, -2.0 * dim_i / rot)       # [..., half]
    theta_extrap = pos * inv_freq                              # [..., half]
    mscale = cfg.attn_factor * cfg.mscale_all

    if cfg.ext_factor != 0.0 and cfg.orig_ctx > 0:
        # YaRN: interpolate between scaled and unscaled theta with a ramp
        low = max(0.0, math.floor(_yarn_corr_dim(rot, cfg.orig_ctx, cfg.beta_fast, cfg.freq_base)))
        high = min(rot - 1.0, math.ceil(_yarn_corr_dim(rot, cfg.orig_ctx, cfg.beta_slow, cfg.freq_base)))
        denom = max(0.001, high - low)
        # low/high from _yarn_corr_dim are half-dim indices; compare dim_i
        # (also a half-dim index) directly — ggml's ramp is (i0/2 - low)/denom
        # (ggml-cpu rope_yarn_ramp) and HF's yarn mask is (arange(dim//2)-low).
        ramp = jnp.clip((dim_i - low) / denom, 0.0, 1.0)
        ramp_mix = (1.0 - ramp) * cfg.ext_factor               # 1 near dim 0
        theta_interp = cfg.freq_scale * theta_extrap
        theta = theta_interp * (1.0 - ramp_mix) + theta_extrap * ramp_mix
        mscale *= 1.0 + 0.1 * math.log(1.0 / cfg.freq_scale)
    else:
        theta = cfg.freq_scale * theta_extrap

    return jnp.cos(theta) * mscale, jnp.sin(theta) * mscale


def mrope_axis_ids(cfg: RopeConfig) -> np.ndarray:
    """Static per-frequency axis selector [half] for M-RoPE.

    Non-interleaved (MROPE): frequency j uses axis t/h/w/e by cumulative
    section boundaries (modulo the section sum).  Interleaved (IMROPE,
    Qwen3-VL): axis cycles j%3 with per-axis bounds 3*sections[axis].
    Mirrors ggml's `ggml_mrope_cache_init` sector logic (behavioral spec;
    reference wires it via models/qwen.cpp:1653,2585).
    """
    half = cfg.resolved_rot_dim() // 2
    secs = list(cfg.mrope_sections) + [0] * (4 - len(cfg.mrope_sections))
    ids = np.zeros(half, dtype=np.int64)
    if cfg.mrope_interleaved:
        # out-of-bound slots fall back to the T stream when no 4th section
        # exists (HF Qwen3VLTextRotaryEmbedding.apply_interleaved_mrope
        # leaves the T base untouched there)
        fallback = 3 if secs[3] > 0 else 0
        for j in range(half):
            a = j % 3
            ids[j] = a if j < 3 * secs[a] else fallback
    else:
        total = max(1, sum(secs))
        bounds = np.cumsum(secs)
        for j in range(half):
            ids[j] = int(np.searchsorted(bounds, j % total, side="right"))
    return ids


def precompute_mrope_cache(positions: jax.Array, cfg: RopeConfig):
    """Multi-axis rope tables.  positions: int [A, ...] — one position stream
    per M-RoPE axis (t, h, w[, e]); returns (cos, sin) [..., half] where each
    frequency column takes its angle from the axis `mrope_axis_ids` assigns.

    When every stream is identical this reduces exactly to standard NeoX rope,
    so text-only decode needs no special casing.
    """
    cos, sin = precompute_rope_cache(positions, cfg)        # [A, ..., half]
    ids = np.minimum(mrope_axis_ids(cfg), positions.shape[0] - 1)
    onehot = jnp.asarray(np.eye(positions.shape[0], dtype=np.float32)[ids].T)
    sel = onehot.reshape((positions.shape[0],) + (1,) * (cos.ndim - 2) + (-1,))
    return (cos * sel).sum(0), (sin * sel).sum(0)


def vision_rope_cos_sin(pos_h: jax.Array, pos_w: jax.Array, head_dim: int,
                        freq_base: float = 10000.0):
    """2-D rope tables for the Qwen ViT towers (GGML_ROPE_TYPE_VISION with
    sections [d/4, d/4]; reference models/qwen.h:484 apply_2d_rope).

    Frequencies restart per section: column j of the [T, d/2] table uses
    pos_h for j < d/4 and pos_w otherwise, with angle
    pos * base^(-4*(j mod d/4)/d) — HF Qwen2-VL `VisionRotaryEmbedding`
    semantics.  Apply with `apply_rope(..., layout=ROPE_NEOX, rot_dim=d)`.
    """
    quarter = head_dim // 4
    inv_freq = jnp.power(jnp.float32(freq_base),
                         -4.0 * jnp.arange(quarter, dtype=jnp.float32) / head_dim)
    th = pos_h.astype(jnp.float32)[..., None] * inv_freq    # [T, d/4]
    tw = pos_w.astype(jnp.float32)[..., None] * inv_freq
    theta = jnp.concatenate([th, tw], axis=-1)              # [T, d/2]
    return jnp.cos(theta), jnp.sin(theta)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
               *, layout: str = ROPE_NEOX, rot_dim: int = -1) -> jax.Array:
    """x: [B, T, H, D]; cos/sin: [B, T, rot/2] (or [T, rot/2])."""
    d = x.shape[-1]
    rot = d if rot_dim <= 0 else rot_dim
    xr, xp = x[..., :rot], x[..., rot:]
    if cos.ndim == x.ndim - 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :].astype(jnp.float32)               # [B,T,1,half]
    sin = sin[:, :, None, :].astype(jnp.float32)
    xf = xr.astype(jnp.float32)
    if layout == ROPE_NEOX:
        x1, x2 = xf[..., : rot // 2], xf[..., rot // 2:]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.concatenate([o1, o2], axis=-1)
    elif layout == ROPE_NORMAL:
        x1 = xf[..., 0::2]
        x2 = xf[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.stack([o1, o2], axis=-1).reshape(xf.shape)
    elif layout == ROPE_GLM1:
        # halves rotated independently; pairing is WITHIN each half
        # ((i, i+rot/4) and (rot/2+i, 3rot/4+i) — custom_ops.cpp:424-447)
        q = rot // 4
        outs = []
        for h in range(2):
            xh = xf[..., h * 2 * q:(h + 1) * 2 * q]
            ch, sh = cos[..., h * q:(h + 1) * q], sin[..., h * q:(h + 1) * q]
            x1, x2 = xh[..., :q], xh[..., q:]
            outs.append(jnp.concatenate(
                [x1 * ch - x2 * sh, x2 * ch + x1 * sh], axis=-1))
        out = jnp.concatenate(outs, axis=-1)
    else:
        raise ValueError(f"rope layout {layout}")
    out = out.astype(x.dtype)
    if rot < d:
        out = jnp.concatenate([out, xp], axis=-1)
    return out


def neo3d_rope_cos_sin(positions: jax.Array, head_dim: int,
                       freq_base: float, freq_base_hw: float):
    """NeoChat 3-D rope tables (models/neochat.cpp split_norm_rope:635-679).

    positions: [3, B, T] streams (t, h, w).  Returns ((cos_t, cos_h, cos_w),
    (sin_t, sin_h, sin_w)) where the t tables are [B, T, d/4] (NeoX pairs of
    the d/2 t-section) and h/w tables are [B, T, d/8].  Apply each with
    `apply_rope(slice, ..., layout=ROPE_NEOX)` on the matching head slice.
    """
    def tab(pos, dims, base):
        half = dims // 2
        inv = jnp.power(jnp.float32(base),
                        -2.0 * jnp.arange(half, dtype=jnp.float32) / dims)
        th = pos.astype(jnp.float32)[..., None] * inv
        return jnp.cos(th), jnp.sin(th)

    ct, st = tab(positions[0], head_dim // 2, freq_base)
    ch, sh = tab(positions[1], head_dim // 4, freq_base_hw)
    cw, sw = tab(positions[2], head_dim // 4, freq_base_hw)
    return (ct, ch, cw), (st, sh, sw)
