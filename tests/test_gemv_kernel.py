"""VPU-path dequant GEMV kernel (ops/pallas/gemv_kernel.py) numerics in
interpret mode, incl. packed int4, affine bias, zero-point folding, and the
matmul() dispatch for single-row decode."""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from chatllm_tpu.ops.pallas.gemv_kernel import qgemv_pallas
from chatllm_tpu.ops.qtensor import pack_nibbles


@pytest.mark.parametrize("K,N,G,packed,use_b", [
    (256, 384, 32, False, False),
    (256, 384, 32, False, True),
    (512, 256, 32, True, False),
    (512, 256, 32, True, True),
    (256, 128, 16, False, True),
])
def test_qgemv_matches_dense(K, N, G, packed, use_b):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, K)).astype(np.float32)
    qv = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
    s = (rng.random((K // G, N)).astype(np.float32) * 0.1 + 0.01)
    b = (rng.random((K // G, N)).astype(np.float32) * 0.05) if use_b else None
    bias = rng.standard_normal(N).astype(np.float32)
    w = (qv.astype(np.float32).reshape(K // G, G, N) * s[:, None, :]).reshape(K, N)
    if b is not None:
        w = w + np.repeat(b, G, axis=0)
    ref = x @ w + bias
    if packed:
        qp, zero = pack_nibbles(qv, G)
        y = qgemv_pallas(jnp.asarray(x), jnp.asarray(qp), jnp.asarray(s),
                         None if b is None else jnp.asarray(b),
                         jnp.asarray(bias), group=G, packed=True,
                         zero_point=zero, tile_n=128, tile_k=256,
                         interpret=True)
    else:
        y = qgemv_pallas(jnp.asarray(x), jnp.asarray(qv), jnp.asarray(s),
                         None if b is None else jnp.asarray(b),
                         jnp.asarray(bias), group=G, tile_n=128, tile_k=128,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-4)


def test_qgemv_odd_tiles():
    """K with a non-power-of-two group count exercises the unrolled-add
    reduction tail."""
    K, N, G = 96 * 32, 128, 32     # gs = 96 per tile if tile_k = K
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, K)).astype(np.float32)
    qv = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
    s = np.ones((K // G, N), np.float32) * 0.02
    ref = x @ (qv.astype(np.float32) * 0.02)
    y = qgemv_pallas(jnp.asarray(x), jnp.asarray(qv), jnp.asarray(s),
                     tile_n=128, tile_k=K, interpret=True)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-4)


def test_qgemv_f16_scales_interpret():
    """f16 device scales ride into the kernel as uint16 bit patterns and are
    decoded on the VPU (Mosaic has no f16 dtype)."""
    rng = np.random.default_rng(2)
    K, N, G = 256, 256, 32
    x = rng.standard_normal((1, K)).astype(np.float32)
    qv = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
    s16 = (rng.random((K // G, N)) * 0.1 + 1e-5).astype(np.float16)
    # include a subnormal f16 and zero to exercise the decode paths
    s16[0, 0] = np.float16(5e-8)
    s16[0, 1] = np.float16(0.0)
    w = (qv.astype(np.float32).reshape(K // G, G, N)
         * s16.astype(np.float32)[:, None, :]).reshape(K, N)
    ref = x @ w
    y = qgemv_pallas(jnp.asarray(x), jnp.asarray(qv), jnp.asarray(s16),
                     group=G, tile_n=128, tile_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-4)


def test_qmm_f16_scales_interpret():
    from chatllm_tpu.ops.pallas.qmm_kernel import qmm_pallas

    rng = np.random.default_rng(3)
    K, N, G = 256, 256, 32
    x = rng.standard_normal((4, K)).astype(np.float32)
    qv = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
    s16 = (rng.random((K // G, N)) * 0.1 + 1e-5).astype(np.float16)
    w = (qv.astype(np.float32).reshape(K // G, G, N)
         * s16.astype(np.float32)[:, None, :]).reshape(K, N)
    ref = x @ w
    y = qmm_pallas(jnp.asarray(x), jnp.asarray(qv), jnp.asarray(s16),
                   group=G, tile_n=128, tile_k=128,
                   compute_dtype=jnp.float32, interpret=True)
    rel = np.linalg.norm(np.asarray(y) - ref) / np.linalg.norm(ref)
    assert rel < 1e-5


def _superblock_fixture(rng, K, N, G=32, SB=8):
    """Random q4_k-shaped superblock arrays + the exact f32 weight."""
    qv = rng.integers(0, 16, size=(K, N)).astype(np.int8)
    sc = rng.integers(0, 64, size=(K // G, N)).astype(np.int8)
    m = rng.integers(0, 64, size=(K // G, N)).astype(np.int8)
    d = (rng.random((K // (G * SB), N)) * 0.02 + 1e-4).astype(np.float16)
    dm = (rng.random((K // (G * SB), N)) * 0.01 + 1e-4).astype(np.float16)
    s_eff = sc.astype(np.float32) * np.repeat(d.astype(np.float32), SB, axis=0)
    b_eff = -(m.astype(np.float32) * np.repeat(dm.astype(np.float32), SB, axis=0))
    w = (qv.astype(np.float32).reshape(K // G, G, N) * s_eff[:, None, :]
         + b_eff[:, None, :]).reshape(K, N)
    return qv, sc, m, d, dm, w


@pytest.mark.parametrize("tile_k", [256, 512])
def test_qgemv_superblock(tile_k):
    """q4_k superblock layout: int8 sc/m + f16 d/dmin composed in-kernel
    (s = d*sc, b = -(dmin*m)), affine term accumulated in-kernel too."""
    rng = np.random.default_rng(7)
    K, N, G, SB = 1024, 256, 32, 8
    x = rng.standard_normal((1, K)).astype(np.float32)
    qv, sc, m, d, dm, w = _superblock_fixture(rng, K, N, G, SB)
    bias = rng.standard_normal(N).astype(np.float32)
    ref = x @ w + bias
    qp, zero = pack_nibbles(qv, G)
    assert zero == 0
    y = qgemv_pallas(jnp.asarray(x), jnp.asarray(qp), jnp.asarray(sc),
                     jnp.asarray(m), jnp.asarray(bias), group=G, packed=True,
                     d=jnp.asarray(d), dm=jnp.asarray(dm), sb=SB,
                     tile_n=128, tile_k=tile_k, interpret=True)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-4)


def test_qmm_superblock():
    from chatllm_tpu.ops.pallas.qmm_kernel import qmm_pallas

    rng = np.random.default_rng(8)
    B, K, N, G, SB = 16, 1024, 256, 32, 8
    x = rng.standard_normal((B, K)).astype(np.float32)
    qv, sc, m, d, dm, w = _superblock_fixture(rng, K, N, G, SB)
    ref = x @ w
    qp, _ = pack_nibbles(qv, G)
    y = qmm_pallas(jnp.asarray(x), jnp.asarray(qp), jnp.asarray(sc),
                   jnp.asarray(m), None, group=G, packed=True,
                   d=jnp.asarray(d), dm=jnp.asarray(dm), sb=SB,
                   tile_n=128, tile_k=256, compute_dtype=jnp.float32,
                   interpret=True)
    rel = np.linalg.norm(np.asarray(y) - ref) / np.linalg.norm(ref)
    assert rel < 1e-5
