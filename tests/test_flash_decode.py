"""flash_decode (ops/pallas/flash_decode.py) vs the XLA reference attention
(ops/attention.py) — interpret mode on CPU.  Covers the in-kernel quantized
KV read (VERDICT r3 item #5), plain caches, per-row n_past (serving),
sliding window, logit softcap, sinks, and GQA row folding."""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from chatllm_tpu.ops.attention import attention_with_cache, quantize_kv
from chatllm_tpu.ops.pallas.flash_decode import flash_decode


def _mk(B=2, T=1, Hq=8, Hkv=4, D=64, S=1024, n_past=700, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    return q, k, v, n_past


# D=64 exercises the per-(b, h) fallback kernel, D=128 the batched
# all-heads kernel (contiguous native-layout DMA path)
@pytest.mark.parametrize("D", [64, 128])
@pytest.mark.parametrize("T", [1, 4])
@pytest.mark.parametrize("quant", [False, True])
def test_flash_decode_matches_xla(T, quant, D):
    q, k, v, n_past = _mk(T=T, D=D)
    scale = 1.0 / np.sqrt(q.shape[-1])
    kw = {}
    if quant:
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        k, v = kq, vq
        kw = dict(k_scale=ks, v_scale=vs)
    ref = attention_with_cache(q, k, v, n_past, T, scale=scale, **kw)
    got = flash_decode(q, k, v, n_past, T, scale=scale, interpret=True,
                       block_k=256, qk_dtype="float32", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_decode_per_row_npast():
    q, k, v, _ = _mk(B=4, T=1)
    scale = 1.0 / np.sqrt(q.shape[-1])
    n_past = jnp.asarray([10, 700, 256, 1023 - 1], jnp.int32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    ref = attention_with_cache(q, kq, vq, n_past, 1, scale=scale,
                               k_scale=ks, v_scale=vs)
    got = flash_decode(q, kq, vq, n_past, 1, scale=scale, k_scale=ks,
                       v_scale=vs, interpret=True, block_k=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_decode_sliding_window_and_softcap():
    q, k, v, n_past = _mk(T=2, seed=3)
    scale = 0.125
    ref = attention_with_cache(q, k, v, n_past, 2, scale=scale,
                               sliding_window=128, logit_softcap=30.0)
    got = flash_decode(q, k, v, n_past, 2, scale=scale, sliding_window=128,
                       logit_softcap=30.0, interpret=True, block_k=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_decode_sinks():
    q, k, v, n_past = _mk(T=1, seed=5)
    scale = 0.125
    sinks = jnp.asarray(np.random.default_rng(7).standard_normal(8), jnp.float32)
    ref = attention_with_cache(q, k, v, n_past, 1, scale=scale, sinks=sinks)
    got = flash_decode(q, k, v, n_past, 1, scale=scale, sinks=sinks,
                       interpret=True, block_k=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_decode_uneven_rows_pad():
    # Hq=6, Hkv=2 → G=3, T=1 → R=3 rows padded to 8
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.standard_normal((1, 1, 6, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 512, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 512, 2, 64)), jnp.float32)
    ref = attention_with_cache(q, k, v, 300, 1, scale=0.125)
    got = flash_decode(q, k, v, 300, 1, scale=0.125, interpret=True,
                       block_k=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_decode_batched_variants():
    """Batched all-heads kernel: sliding window + softcap + sinks + per-row
    n_past + B=8 serving shape, all at lane-aligned D=128."""
    q, k, v, _ = _mk(B=8, T=1, Hq=8, Hkv=4, D=128, S=512, seed=21)
    n_past = jnp.asarray([10, 500, 256, 511, 64, 300, 128, 1], jnp.int32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    sinks = jnp.asarray(
        np.random.default_rng(23).standard_normal(8), jnp.float32)
    ref = attention_with_cache(q, kq, vq, n_past, 1, scale=0.1,
                               sliding_window=192, logit_softcap=30.0,
                               sinks=sinks, k_scale=ks, v_scale=vs)
    got = flash_decode(q, kq, vq, n_past, 1, scale=0.1, sliding_window=192,
                       logit_softcap=30.0, sinks=sinks, k_scale=ks,
                       v_scale=vs, interpret=True, block_k=256,
                       qk_dtype="float32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_decode_batched_bf16_dots_default():
    """The shipped default runs the MXU dots in bf16 (f32 accumulate) —
    int8 cache values convert exactly; only q/p rounding.  Verify the
    error stays at bf16-rounding scale against the f32 XLA path."""
    q, k, v, n_past = _mk(B=2, T=1, Hq=8, Hkv=4, D=128, S=1024, seed=31)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    ref = attention_with_cache(q, kq, vq, n_past, 1, scale=0.0884,
                               k_scale=ks, v_scale=vs)
    got = flash_decode(q, kq, vq, n_past, 1, scale=0.0884, k_scale=ks,
                       v_scale=vs, interpret=True, block_k=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_flash_decode_batched_int8_dots():
    """qk_dtype=int8 (s8 MXU dots, ggml's q8 vec_dot strategy): q and p
    re-quantize per row, so the error budget is ~1% of the row max —
    far coarser than bf16 but bit-saving on both DMA and MXU retiling."""
    q, k, v, n_past = _mk(B=4, T=2, Hq=8, Hkv=4, D=128, S=1024, seed=37)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    ref = attention_with_cache(q, kq, vq, n_past, 2, scale=0.0884,
                               k_scale=ks, v_scale=vs)
    got = flash_decode(q, kq, vq, n_past, 2, scale=0.0884, k_scale=ks,
                       v_scale=vs, interpret=True, block_k=256,
                       qk_dtype="int8")
    r = np.asarray(ref)
    np.testing.assert_allclose(np.asarray(got), r,
                               atol=0.03 * np.abs(r).max(), rtol=0.05)


def test_flash_decode_batched_single_head_odd_dim():
    """Hkv=1 with a non-128-multiple head dim (MLA-compressed-latent shape)
    still takes the batched kernel (whole-array lane block)."""
    q, k, v, n_past = _mk(B=2, T=1, Hq=4, Hkv=1, D=192, S=512, seed=29)
    ref = attention_with_cache(q, k, v, n_past, 1, scale=0.08)
    got = flash_decode(q, k, v, n_past, 1, scale=0.08, interpret=True,
                       block_k=256, qk_dtype="float32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_routing_engages_in_attention_with_cache(monkeypatch):
    """With the env forced on, attention_with_cache routes small-Q long-S
    calls to the Pallas decode kernel (dispatch telemetry proves it) and the
    result still matches the XLA path."""
    from chatllm_tpu.ops import qmm

    q, k, v, n_past = _mk(T=1, seed=11)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    scale = 0.125
    monkeypatch.setenv("CHATLLM_TPU_FLASH_DECODE", "0")
    ref = attention_with_cache(q, kq, vq, n_past, 1, scale=scale,
                               k_scale=ks, v_scale=vs)
    monkeypatch.setenv("CHATLLM_TPU_FLASH_DECODE", "1")
    qmm.reset_kernel_dispatch_stats()
    got = attention_with_cache(q, kq, vq, n_past, 1, scale=scale,
                               k_scale=ks, v_scale=vs)
    stats = qmm.kernel_dispatch_stats()
    assert any(k_.startswith("flash_decode:pallas") for k_ in stats), stats
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_decode_sharded_on_mesh(monkeypatch):
    """The shard_map'd decode kernel on the virtual dp=2 x tp=4 mesh matches
    the unsharded XLA path (q8 cache, per-row n_past)."""
    import jax

    from chatllm_tpu.ops import qmm
    from chatllm_tpu.parallel.mesh import make_mesh

    q, k, v, _ = _mk(B=4, T=1, Hq=8, Hkv=4, seed=13)
    n_past = jnp.asarray([64, 700, 300, 1000], jnp.int32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    scale = 0.125
    monkeypatch.setenv("CHATLLM_TPU_FLASH_DECODE", "0")
    ref = attention_with_cache(q, kq, vq, n_past, 1, scale=scale,
                               k_scale=ks, v_scale=vs)
    monkeypatch.setenv("CHATLLM_TPU_FLASH_DECODE", "1")
    # per-shard Hkv=1 takes the batched kernel; force f32 dots so the
    # strict tolerance checks the sharding logic, not bf16 rounding
    monkeypatch.setenv("CHATLLM_TPU_FLASH_QK", "f32")
    mesh = make_mesh(tp=4, dp=2)
    qmm.reset_kernel_dispatch_stats()
    with qmm.kernel_mesh(mesh):
        got = attention_with_cache(q, kq, vq, n_past, 1, scale=scale,
                                   k_scale=ks, v_scale=vs)
    stats = qmm.kernel_dispatch_stats()
    assert stats.get("flash_decode:pallas_sharded"), stats
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
