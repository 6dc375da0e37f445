"""Normalization ops (reference: RMSNorm /root/reference/src/layers.h:929-982,
LayerNorm :828-864, ggml_rms_norm semantics in ggml/src/ggml.c).

All reductions run in f32 regardless of the activation dtype — matching ggml,
which computes norms in f32 even for f16 graphs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, *, eps: float = 1e-5,
             offset: float = 0.0) -> jax.Array:
    """RMSNorm.  `offset=1.0` gives the Gemma-style (1+w) variant
    (reference: RMSNormNonWeighted/`GemmaRMSNorm` family, src/layers.h:958)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32) + offset
    return (y * w).astype(x.dtype)


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array | None = None,
               *, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def l2_norm(x: jax.Array, *, eps: float = 1e-7) -> jax.Array:
    """L2 normalization over the last axis (reference `L2Norm`,
    src/layers.h:984)."""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.sum(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return (xf * inv).astype(x.dtype)


def group_norm(x: jax.Array, weight: jax.Array, bias: jax.Array, n_groups: int,
               *, eps: float = 1e-5) -> jax.Array:
    """GroupNorm over channel axis -1 (reference `GroupNorm`,
    src/layers.h:790)."""
    *lead, c = x.shape
    xf = x.astype(jnp.float32).reshape(*lead, n_groups, c // n_groups)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(*lead, c)
    return (y * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def weightless_rms(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMS normalization with no learned scale (ggml::rms_norm with a bare
    eps — Gemma4 v-norm, MultimodalEmbedder pre-projection norm,
    models/gemma4.cpp:1777 / :15-57)."""
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)).astype(x.dtype)
