"""Regression tests for the round-2 advisor findings (ADVICE.md):

  1. BatchedEngine accepted any config; out-of-scope models (SWA ring
     cache, compressed MLA, looped stacks, linear attention) exploded at
     decode TRACE time inside the worker thread and consumers blocked
     forever (runtime/batching.py).
  2. A worker exception left in-flight StreamHandle consumers blocked on
     q.get() with no None sentinel.
  3. The first token after prefill was sampled with a fresh key and never
     recorded in the slot's penalty ring (runtime/batching.py _admit).
  4. The vector-n_past KV write clamped out-of-range positions onto slot
     S-1, silently overwriting the newest cache entry (ops/attention.py).
  5. f16_bits_to_f32 decoded exp==31 (inf/NaN) bit patterns as finite
     ~2^16 values (ops/pallas/gemv_kernel.py).
"""
import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU + virtual devices)

import jax
import jax.numpy as jnp

from chatllm_tpu.models.synthetic import build_synthetic_params, tiny_config
from chatllm_tpu.nn.transformer import LayerSpec
from chatllm_tpu.ops.attention import update_kv_cache
from chatllm_tpu.ops.pallas.gemv_kernel import f16_bits_to_f32
from chatllm_tpu.ops.sampling import SamplerConfig
from chatllm_tpu.runtime.batching import BatchedEngine


def test_batched_engine_rejects_out_of_scope_configs():
    """SWA ring caches are IN scope since round 4 (vector-n_past ring
    writes; positive parity tests live in tests/test_batching.py) — the
    remaining rejections are looped stacks and linear attention."""
    import dataclasses

    cfg = tiny_config()

    looped = dataclasses.replace(cfg, num_loops=2)
    with pytest.raises(ValueError, match="looped"):
        BatchedEngine(looped, None, max_slots=2)

    lin = dataclasses.replace(
        cfg, layer_specs=tuple(
            dataclasses.replace(cfg.layer_spec(i), linear_attn=(i == 0))
            for i in range(cfg.num_hidden_layers)))
    with pytest.raises(ValueError, match="linear attention"):
        BatchedEngine(lin, None, max_slots=2)


def test_worker_exception_drains_consumers():
    cfg = tiny_config()
    params = build_synthetic_params(cfg, seed=0)
    eng = BatchedEngine(cfg, params, max_slots=2, decode_block=4)
    try:
        def boom():
            raise RuntimeError("injected decode failure")
        eng._decode_block_once = boom
        h = eng.submit([1, 2, 3], max_new=8)
        toks = []
        for t in h:          # must terminate (None sentinel), not hang
            toks.append(t)
        assert len(toks) <= 1   # at most the prefill token escaped
    finally:
        eng._worker.join(timeout=10)
        assert not eng._worker.is_alive()


def test_first_token_recorded_in_penalty_ring():
    cfg = tiny_config()
    params = build_synthetic_params(cfg, seed=0)
    eng = BatchedEngine(cfg, params, max_slots=1, decode_block=2,
                        scfg=SamplerConfig(do_sample=True, sampling="top_p",
                                           temperature=0.8, repeat_penalty=1.3))
    try:
        h = eng.submit([1, 2, 3, 4], max_new=3, seed=7)
        toks = list(h)
        assert toks, "no tokens produced"
        cnt = np.asarray(eng.penalty.token_count)[0]
        assert cnt[toks[0]] >= 1, "tok0 missing from the penalty ring"
    finally:
        eng.shutdown()


def test_vector_npast_kv_write_drops_out_of_range_rows():
    B, S, H, D = 2, 8, 1, 4
    k_cache = jnp.zeros((B, S, H, D), jnp.float32)
    v_cache = jnp.zeros((B, S, H, D), jnp.float32)
    k = jnp.ones((B, 1, H, D), jnp.float32)
    v = jnp.ones((B, 1, H, D), jnp.float32) * 2
    # row 0 writes in range at 3; row 1 is past capacity (S) -> dropped
    n_past = jnp.array([3, S], jnp.int32)
    kc, vc, _, _ = update_kv_cache(k_cache, v_cache, k, v, n_past)
    kc = np.asarray(kc)
    assert kc[0, 3].sum() == H * D
    assert kc[1].sum() == 0, "out-of-range row clobbered the cache"
    assert kc[1, S - 1].sum() == 0, "out-of-range row clamped onto slot S-1"


def test_f16_bits_decoder_propagates_inf_nan():
    vals = np.array([0x7C00,   # +inf
                     0xFC00,   # -inf
                     0x7E00,   # NaN
                     0x3C00,   # 1.0
                     0x0001,   # smallest subnormal
                     0x8000],  # -0.0
                    np.int32)
    out = np.asarray(f16_bits_to_f32(jnp.asarray(vals)))
    ref = np.array(vals, np.uint16).view(np.float16).astype(np.float32)
    assert np.isposinf(out[0]) and np.isneginf(out[1]) and np.isnan(out[2])
    np.testing.assert_array_equal(out[3:], ref[3:])
