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


def unpack_nibbles(q: jax.Array, group: int, zero: int = 0) -> jax.Array:
    """uint8 [K/2, N] (group-local row pairing) -> int-valued [K, N] f32."""
    k2, n = q.shape
    half = group // 2
    qg = q.reshape(k2 // half, half, n)
    lo = qg & jnp.uint8(0xF)
    hi = qg >> jnp.uint8(4)
    u = jnp.concatenate([lo, hi], axis=1).reshape(k2 * 2, n)
    return u.astype(jnp.float32) - float(zero)


def dequant_weight(lin: QuantLinear, dtype=jnp.bfloat16) -> jax.Array:
    """Materialize the full weight [in, out] from the planar layout."""
    qv = (unpack_nibbles(lin.q, lin.group_size, lin.zero_point)
          if lin.packed else lin.q)
    cin, out = qv.shape
    g = lin.group_size
    q = qv.reshape(cin // g, g, out).astype(jnp.float32)
    w = q * lin.s[:, None, :]
    if lin.b is not None:
        w = w + lin.b[:, None, :]
    return w.reshape(cin, out).astype(dtype)


def use_pallas_qmm() -> bool:
    """Pallas fused kernel on TPU; XLA fallback on CPU/interpret."""
    import os

    v = os.environ.get("CHATLLM_TPU_QMM", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    return jax.default_backend() not in ("cpu",)


def dense_weight(lin, dtype=jnp.float32) -> jax.Array:
    """Materialize a linear's weight matrix [in, out] (dense or dequantized)."""
    if isinstance(lin, DenseLinear):
        return lin.w.astype(dtype)
    return dequant_weight(lin, dtype)


def matmul(x: jax.Array, lin, *, compute_dtype=jnp.bfloat16) -> jax.Array:
    """y = x @ W (+ bias).  x: [..., in] -> [..., out]."""
    if isinstance(lin, DenseLinear):
        y = jnp.dot(x.astype(lin.w.dtype), lin.w, preferred_element_type=jnp.float32)
    elif isinstance(lin, QuantLinear):
        # Mosaic needs the output dim lane-aligned (scale tiles are
        # [groups, N]); oddball small N falls back to the XLA dequant path
        if use_pallas_qmm() and lin.q.shape[1] % 128 == 0:
            lead = x.shape[:-1]
            x2 = x.reshape(-1, x.shape[-1])
            import os

            if x2.shape[0] == 1 and os.environ.get("CHATLLM_TPU_GEMV", "1") != "0":
                # single-row decode GEMV: the MXU path is weight-LOAD bound
                # (~60 tok/s ceiling at 8B on v5e); the VPU dequant-MAC
                # kernel is bandwidth-bound instead (1.5x measured)
                from .pallas.gemv_kernel import qgemv_pallas

                y = qgemv_pallas(x2, lin.q, lin.s, lin.b, lin.bias,
                                 group=lin.group_size, packed=lin.packed,
                                 zero_point=lin.zero_point)
            else:
                from .pallas.qmm_kernel import qmm_pallas

                y = qmm_pallas(x2, lin.q, lin.s, lin.b, lin.bias,
                               group=lin.group_size, packed=lin.packed,
                               zero_point=lin.zero_point,
                               compute_dtype=compute_dtype)
            return y.reshape(*lead, y.shape[-1])
        w = dequant_weight(lin, compute_dtype)
        y = jnp.dot(x.astype(compute_dtype), w, preferred_element_type=jnp.float32)
    else:
        raise TypeError(f"not a linear: {type(lin)}")
    if lin.bias is not None:
        y = y + lin.bias
    return y
