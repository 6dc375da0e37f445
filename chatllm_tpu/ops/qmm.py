"""Matmul over dense / grouped-affine quantized linear layers.

Replaces ggml's `mul_mat` + per-format dot kernels
(/root/reference/ggml/src/ggml-quants.c, ggml-cuda/mmq*.cu) with:

  - an XLA path (`matmul`): dequantize the planar layout with elementwise ops
    and feed one large bf16/f32 dot to the MXU.  XLA fuses the int8→float
    widening + scale multiply into the matmul's operand read on TPU, so this
    is already near weight-bandwidth-bound for GEMM shapes;
  - a Pallas fused kernel (`ops/pallas/qmm_kernel.py`) for the decode GEMV
    hot path where the operand never round-trips through HBM as bf16.

Accumulation is f32 (`preferred_element_type`) to match the reference's
f32 accumulators for PPL parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .qtensor import DenseLinear, QuantLinear


def dequant_weight(lin: QuantLinear, dtype=jnp.bfloat16) -> jax.Array:
    """Materialize the full weight [out, in] from the planar layout."""
    out, cin = lin.q.shape
    g = lin.group_size
    q = lin.q.reshape(out, cin // g, g).astype(jnp.float32)
    w = q * lin.s[..., None]
    if lin.b is not None:
        w = w + lin.b[..., None]
    return w.reshape(out, cin).astype(dtype)


def matmul(x: jax.Array, lin, *, compute_dtype=jnp.bfloat16) -> jax.Array:
    """y = x @ W^T (+ bias).  x: [..., in] -> [..., out]."""
    if isinstance(lin, DenseLinear):
        y = jnp.dot(x.astype(lin.w.dtype), lin.w, preferred_element_type=jnp.float32)
    elif isinstance(lin, QuantLinear):
        w = dequant_weight(lin, compute_dtype)
        y = jnp.dot(x.astype(compute_dtype), w.T, preferred_element_type=jnp.float32)
    else:
        raise TypeError(f"not a linear: {type(lin)}")
    if lin.bias is not None:
        y = y + lin.bias
    return y
