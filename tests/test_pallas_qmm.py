"""Pallas fused dequant-matmul kernel vs the XLA reference path."""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from chatllm_tpu.ops.pallas.qmm_kernel import qmm_pallas
from chatllm_tpu.ops.qmm import dequant_weight, matmul
from chatllm_tpu.ops.qtensor import QuantLinear


@pytest.mark.parametrize("affine", [False, True])
@pytest.mark.parametrize("B,N,K", [(1, 256, 1024), (4, 512, 2048)])
def test_qmm_matches_xla(affine, B, N, K):
    rng = np.random.default_rng(0)
    G = 32
    q = rng.integers(-8, 8, (K, N), dtype=np.int8)
    s = (rng.random((K // G, N)).astype(np.float32) * 0.02)
    b = (rng.random((K // G, N)).astype(np.float32) * 0.1) if affine else None
    x = rng.standard_normal((B, K)).astype(np.float32)

    # exact f32 dequant reference
    w = (q.reshape(K // G, G, N).astype(np.float32) * s[:, None, :])
    if b is not None:
        w = w + b[:, None, :]
    ref = x @ w.reshape(K, N)

    lin = QuantLinear(q=jnp.asarray(q), s=jnp.asarray(s),
                      b=None if b is None else jnp.asarray(b))
    out = np.asarray(qmm_pallas(jnp.asarray(x), lin.q, lin.s, lin.b,
                                tile_n=128, tile_k=512, interpret=True))
    # the kernel computes with bf16 weights: check normalized error at the
    # bf16 level, like the XLA bf16 path
    xla = np.asarray(matmul(jnp.asarray(x), lin))
    for got, name in [(out, "pallas"), (xla, "xla")]:
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 5e-3, (name, rel)


def test_qmm_bias():
    rng = np.random.default_rng(1)
    B, N, K, G = 2, 128, 256, 32
    q = rng.integers(-8, 8, (K, N), dtype=np.int8)
    s = np.full((K // G, N), 0.01, np.float32)
    bias = rng.standard_normal(N).astype(np.float32)
    x = rng.standard_normal((B, K)).astype(np.float32)
    lin = QuantLinear(q=jnp.asarray(q), s=jnp.asarray(s), bias=jnp.asarray(bias))
    ref = np.asarray(matmul(jnp.asarray(x), lin))
    out = np.asarray(qmm_pallas(jnp.asarray(x), lin.q, lin.s, None, lin.bias,
                                tile_n=128, tile_k=256, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_packed_nibbles_roundtrip():
    """Packed int4 layout dequantizes identically to the unpacked layout."""
    import jax

    from chatllm_tpu.ggmm.quants import GGMLType, quantize
    from chatllm_tpu.ops.qtensor import linear_from_ggml
    from chatllm_tpu.ops.qmm import dequant_weight

    rng = np.random.default_rng(7)
    out_d, in_d = 64, 256
    w = rng.standard_normal((out_d, in_d)).astype(np.float32) * 0.1
    for t in (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K):
        raw = quantize(w, t)
        lin = linear_from_ggml(raw, t, (out_d, in_d))
        assert lin.packed, t
        from chatllm_tpu.ggmm.quants import dequantize

        ref = dequantize(raw, t, (out_d, in_d)).T
        got = np.asarray(dequant_weight(lin, jnp.float32))
        # q4_0/q4_1 scales are natively f16 -> exact; q4_k's superblock
        # layout keeps d/sc verbatim so its f32 products are exact too
        np.testing.assert_allclose(got, ref, atol=1e-6, rtol=5e-4)

        x = rng.standard_normal((2, in_d)).astype(np.float32)
        from chatllm_tpu.ops.pallas.qmm_kernel import qmm_pallas

        y = np.asarray(qmm_pallas(jnp.asarray(x), lin.q, lin.s, lin.b,
                                  group=lin.group_size, packed=True,
                                  zero_point=lin.zero_point, d=lin.d,
                                  dm=lin.dm, sb=lin.sb,
                                  tile_k=256 if lin.sb else 128, tile_n=64,
                                  interpret=True))
        expect = x @ ref
        rel = np.linalg.norm(y - expect) / np.linalg.norm(expect)
        # bf16-weight noise; affine formats see a bit more (u*s term is
        # larger than the centered weight before +b)
        assert rel < 1e-2, (t, rel)


def test_qmm_large_m_tiled():
    """Long-prefill shape: M is tiled so VMEM blocks stay bounded
    (regression: 2048-token prefill VMEM-OOM'd with untiled M)."""
    rng = np.random.default_rng(11)
    M, K, N, G = 520, 256, 384, 32   # M not a multiple of the tile
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    q = jnp.asarray(rng.integers(-8, 8, (K, N)).astype(np.int8))
    s = jnp.asarray(rng.standard_normal((K // G, N)).astype(np.float32) * 0.1)
    out = qmm_pallas(x, q, s, None, None, group=G, interpret=True)
    ref = jnp.dot(x, (q.astype(jnp.float32).reshape(K // G, G, N)
                      * s[:, None, :]).reshape(K, N))
    err = (np.linalg.norm(np.asarray(out) - np.asarray(ref))
           / np.linalg.norm(np.asarray(ref)))
    assert err < 5e-3, err   # bf16 compute vs f32 reference
