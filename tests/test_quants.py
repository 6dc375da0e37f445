"""Quant codec tests: encode/decode roundtrips + byte-exact golden comparison
against the reference converter's quantizers (used as a black-box oracle)."""
import numpy as np
import pytest

from chatllm_tpu.ggmm.quants import GGMLType, dequantize, quantize, nbytes_for
from conftest import has_reference, reference_convert

RNG = np.random.default_rng(0)


def rand(shape):
    return RNG.standard_normal(shape).astype(np.float32) * 0.3


@pytest.mark.parametrize("t", [GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K])
def test_roundtrip_error(t):
    x = rand((8, 512))
    raw = quantize(x, t)
    assert len(raw) == nbytes_for(t, x.size)
    y = dequantize(raw, t, x.shape)
    err = np.abs(x - y).max()
    tol = {GGMLType.Q8_0: 0.02, GGMLType.Q4_0: 0.2, GGMLType.Q4_1: 0.12, GGMLType.Q4_K: 0.12}[t]
    assert err < tol, f"{t}: max err {err}"


def test_f16_bf16_roundtrip():
    x = rand((4, 64))
    y16 = dequantize(quantize(x, GGMLType.F16), GGMLType.F16, x.shape)
    assert np.allclose(x, y16, atol=2e-3)
    yb = dequantize(quantize(x, GGMLType.BF16), GGMLType.BF16, x.shape)
    assert np.allclose(x, yb, atol=2e-2)
    y32 = dequantize(quantize(x, GGMLType.F32), GGMLType.F32, x.shape)
    assert np.array_equal(x, y32)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
@pytest.mark.parametrize("name,t", [
    ("quantize_q8_0", GGMLType.Q8_0),
    ("quantize_q4_0", GGMLType.Q4_0),
    ("quantize_q4_1", GGMLType.Q4_1),
])
def test_encode_bytes_match_reference(name, t):
    import torch
    ref = reference_convert()
    x = rand((16, 256))
    mine = quantize(x, t)
    theirs = getattr(ref, name)(torch.from_numpy(x)).numpy().tobytes()
    assert mine == theirs


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_encode_q4k_matches_reference():
    import torch
    ref = reference_convert()
    x = rand((8, 512))
    mine = quantize(x, GGMLType.Q4_K)
    theirs = ref.quantize_q4_k(torch.from_numpy(x), 256).numpy().tobytes()
    # bit-level float iteration differences can flip a rounded 4-bit level on
    # ties; require overwhelming byte agreement and identical dequant values
    mb = np.frombuffer(mine, np.uint8)
    tb = np.frombuffer(theirs, np.uint8)
    agreement = (mb == tb).mean()
    assert agreement > 0.99, f"byte agreement {agreement}"
    ymine = dequantize(mine, GGMLType.Q4_K, x.shape)
    ytheirs = dequantize(theirs, GGMLType.Q4_K, x.shape)
    assert np.abs(ymine - ytheirs).max() < 0.05


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_decode_5bit_6bit_shapes():
    # no reference encoder for q5/q6; check decode shape/val plumbing on
    # handcrafted blocks
    for t, bb in [(GGMLType.Q5_0, 22), (GGMLType.Q5_1, 24)]:
        raw = np.zeros((2, bb), np.uint8)
        raw[:, 0:2] = np.array([1.0], np.float16).view(np.uint8)  # d=1
        y = dequantize(raw.tobytes(), t, (2, 32))
        assert y.shape == (2, 32)
    raw = np.zeros((1, 210), np.uint8)
    raw[:, 208:210] = np.array([1.0], np.float16).view(np.uint8)
    y = dequantize(raw.tobytes(), GGMLType.Q6_K, (1, 256))
    assert y.shape == (1, 256)
    assert np.allclose(y, 0.0)  # scales all zero


def test_q3_k_dequant_oracle():
    """_deq_q3_k vs a direct transcription of the reference C loop
    (dequantize_row_q3_K, ggml/src/ggml-quants.c:1128-1175) on random
    block bytes."""
    import numpy as np
    from chatllm_tpu.ggmm.quants import GGMLType, dequantize

    rng = np.random.RandomState(11)
    nb = 5
    raw = rng.randint(0, 256, (nb, 110), dtype=np.uint8)
    # keep d sane: set the f16 exponent to something small
    d_f16 = np.float16(rng.randn(nb) * 0.01)
    raw[:, 108:110] = np.frombuffer(d_f16.tobytes(), np.uint8).reshape(nb, 2)

    got = dequantize(raw.tobytes(), GGMLType.Q3_K, (nb, 256))

    want = np.zeros((nb, 256), np.float32)
    for i in range(nb):
        hm = raw[i, 0:32]
        qs = raw[i, 32:96]
        aux = list(np.frombuffer(raw[i, 96:108].tobytes(), np.uint32))
        tmp = int(aux[2])
        k1, k2 = 0x03030303, 0x0F0F0F0F
        a = [0] * 4
        a[2] = ((int(aux[0]) >> 4) & k2) | (((tmp >> 4) & k1) << 4)
        a[3] = ((int(aux[1]) >> 4) & k2) | (((tmp >> 6) & k1) << 4)
        a[0] = (int(aux[0]) & k2) | (((tmp >> 0) & k1) << 4)
        a[1] = (int(aux[1]) & k2) | (((tmp >> 2) & k1) << 4)
        scales = np.frombuffer(np.asarray(a, np.uint32).tobytes(), np.int8)
        d_all = float(d_f16[i])
        y = []
        isx = 0
        qoff = 0
        m = 1
        for n in range(0, 256, 128):
            shift = 0
            for j in range(4):
                for half in range(2):
                    dl = d_all * (int(scales[isx]) - 32)
                    isx += 1
                    for l in range(16):
                        qv = (int(qs[qoff + l + 16 * half]) >> shift) & 3
                        hbit = int(hm[l + 16 * half]) & m
                        y.append(dl * (qv - (0 if hbit else 4)))
                shift += 2
                m <<= 1
            qoff += 32
        want[i] = np.asarray(y, np.float32)
    np.testing.assert_allclose(got.reshape(nb, 256), want, atol=1e-5)


def test_q4k_superblock_repack_parity():
    """The superblock planar layout (int8 sc/m + f16 d/dmin) reconstructs the
    SAME weights as dequantize(), and the native C++ repack produces byte-
    identical arrays to the numpy reference."""
    import jax.numpy as jnp

    from chatllm_tpu.native import native_repack_q4k_super
    from chatllm_tpu.ops.qmm import dequant_weight
    from chatllm_tpu.ops.qtensor import QuantLinear, repack_q4_k_super

    rng = np.random.default_rng(11)
    out_dim, in_dim = 64, 512
    w = (rng.standard_normal((out_dim, in_dim)) * 0.1).astype(np.float32)
    raw = quantize(w, GGMLType.Q4_K)
    ref = dequantize(raw, GGMLType.Q4_K, (out_dim, in_dim)).T  # [in, out]

    qp, sc, m, d, dmin = repack_q4_k_super(raw, (out_dim, in_dim))
    assert sc.min() >= 0 and sc.max() <= 63 and m.min() >= 0 and m.max() <= 63
    lin = QuantLinear(q=jnp.asarray(qp), s=jnp.asarray(sc), b=jnp.asarray(m),
                      group_size=32, packed=True, zero_point=0,
                      d=jnp.asarray(d), dm=jnp.asarray(dmin), sb=8)
    got = np.asarray(dequant_weight(lin, jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    nat = native_repack_q4k_super(raw, (out_dim, in_dim))
    if nat is not None:       # no toolchain -> numpy fallback covered above
        nqp, nsc, nm, nd, ndmin = nat
        np.testing.assert_array_equal(nqp, qp)
        np.testing.assert_array_equal(nsc, sc)
        np.testing.assert_array_equal(nm, m)
        np.testing.assert_array_equal(nd.view(np.uint16), d.view(np.uint16))
        np.testing.assert_array_equal(ndmin.view(np.uint16),
                                      dmin.view(np.uint16))


def test_q4k_loader_takes_superblock_layout():
    """linear_from_ggml builds the superblock layout for q4_k by default
    (CHATLLM_TPU_SB=0 restores the classic f16-scale layout)."""
    import jax.numpy as jnp

    from chatllm_tpu.ops.qmm import dequant_weight
    from chatllm_tpu.ops.qtensor import linear_from_ggml

    rng = np.random.default_rng(12)
    out_dim, in_dim = 32, 256
    w = (rng.standard_normal((out_dim, in_dim)) * 0.1).astype(np.float32)
    raw = quantize(w, GGMLType.Q4_K)
    lin = linear_from_ggml(raw, GGMLType.Q4_K, (out_dim, in_dim))
    assert lin.sb == 8 and lin.s.dtype == jnp.int8 and lin.d is not None
    ref = dequantize(raw, GGMLType.Q4_K, (out_dim, in_dim)).T
    got = np.asarray(dequant_weight(lin, jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("t", [GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q2_K])
def test_q5k_q6k_superblock_loader(t):
    """q5_k/q6_k/q2_k also load into the superblock layout and reconstruct
    the exact dequantize() weights (q6_k has no min term: b/dm stay None)."""
    import jax.numpy as jnp

    from chatllm_tpu.ops.qmm import dequant_weight
    from chatllm_tpu.ops.qtensor import linear_from_ggml

    rng = np.random.default_rng(13)
    out_dim, in_dim = 48, 512
    # no encoder for q5_k/q6_k: synthesize random raw blocks with sane f16
    # scale fields; dequantize() is the oracle for arbitrary block bytes
    nblk = out_dim * in_dim // 256
    bs = {GGMLType.Q5_K: 176, GGMLType.Q6_K: 210, GGMLType.Q2_K: 84}[t]
    raw = rng.integers(0, 256, nblk * bs, dtype=np.uint8)
    blocks = raw.reshape(nblk, bs)
    scale = (rng.random((nblk, 2)) * 0.02 + 1e-4).astype(np.float16)
    if t == GGMLType.Q5_K:
        blocks[:, 0:4] = scale.view(np.uint8)
    elif t == GGMLType.Q6_K:
        blocks[:, 208:210] = scale[:, :1].view(np.uint8)
    else:
        blocks[:, 80:84] = scale.view(np.uint8)
    raw = blocks.reshape(-1)
    lin = linear_from_ggml(raw, t, (out_dim, in_dim))
    assert lin.sb == (8 if t == GGMLType.Q5_K else 16)
    assert lin.packed == (t == GGMLType.Q2_K)
    assert (lin.b is None) == (t == GGMLType.Q6_K)
    ref = dequantize(raw, t, (out_dim, in_dim)).T
    got = np.asarray(dequant_weight(lin, jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    # and through both kernels in interpret mode
    from chatllm_tpu.ops.pallas.gemv_kernel import qgemv_pallas
    from chatllm_tpu.ops.pallas.qmm_kernel import qmm_pallas

    x = rng.standard_normal((1, in_dim)).astype(np.float32)
    expect = x @ ref
    y = np.asarray(qgemv_pallas(jnp.asarray(x), lin.q, lin.s, lin.b,
                                group=lin.group_size, packed=lin.packed,
                                d=lin.d, dm=lin.dm, sb=lin.sb,
                                tile_k=256, interpret=True))
    np.testing.assert_allclose(y, expect, rtol=2e-5, atol=2e-4)
    x4 = rng.standard_normal((4, in_dim)).astype(np.float32)
    y4 = np.asarray(qmm_pallas(jnp.asarray(x4), lin.q, lin.s, lin.b,
                               group=lin.group_size, packed=lin.packed,
                               d=lin.d, dm=lin.dm, sb=lin.sb, tile_k=256,
                               compute_dtype=jnp.float32, interpret=True))
    rel = np.linalg.norm(y4 - x4 @ ref) / np.linalg.norm(x4 @ ref)
    assert rel < 1e-5
