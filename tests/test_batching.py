"""Continuous batching: per-slot correctness vs the single-stream engine.

The whole point of the batched engine is that interleaving N streams over
one shared [B, S] cache changes NOTHING about each stream's output — so
every test here is an exact-match against `InferenceEngine.generate`.
"""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from chatllm_tpu.models.synthetic import build_synthetic_params, tiny_config
from chatllm_tpu.nn.transformer import LayerSpec
from chatllm_tpu.ops.sampling import SamplerConfig
from chatllm_tpu.runtime.batching import BatchedEngine
from chatllm_tpu.runtime.generate import GenerationConfig, InferenceEngine


@pytest.fixture(scope="module")
def model():
    from dataclasses import replace

    cfg = tiny_config(vocab=128, hidden=64, layers=2, heads=4, kv_heads=2,
                      inter=96, max_length=192)
    cfg = replace(cfg, cache_dtype="float32")
    params = build_synthetic_params(cfg, fmt="f32", zeros=False,
                                    compute_dtype=jnp.float32)
    return cfg, params


def _single_stream(cfg, params, ids, max_new):
    eng = InferenceEngine(cfg, params)
    g = GenerationConfig(do_sample=False, sampling="greedy",
                        max_new_tokens=max_new, temperature=0.0)
    out, _, _ = eng.generate(ids, g)
    return out


def test_concurrent_streams_match_single(model):
    cfg, params = model
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, 128, n).tolist() for n in (9, 23, 40, 5, 31)]
    MAX_NEW = 20
    expect = [_single_stream(cfg, params, p, MAX_NEW) for p in prompts]

    eng = BatchedEngine(cfg, params, max_slots=3, decode_block=4,
                        scfg=SamplerConfig(do_sample=False, sampling="greedy"))
    try:
        handles = [eng.submit(p, max_new=MAX_NEW) for p in prompts]
        got = [list(h) for h in handles]
    finally:
        eng.shutdown()
    for i, (g, e) in enumerate(zip(got, expect)):
        assert g == e, f"stream {i}: {g} != {e}"


def test_early_termination_frees_slot(model):
    cfg, params = model
    rng = np.random.default_rng(8)
    p1 = rng.integers(0, 128, 12).tolist()
    full = _single_stream(cfg, params, p1, 30)
    # terminate at the first token value that hasn't appeared before it
    k = next(i for i in range(3, len(full)) if full[i] not in full[:i])
    stop_tok = full[k]

    eng = BatchedEngine(cfg, params, max_slots=2, decode_block=4,
                        scfg=SamplerConfig(do_sample=False, sampling="greedy"))
    try:
        h = eng.submit(p1, max_new=30, is_terminator=lambda t: t == stop_tok)
        got = list(h)
        assert got == full[:k]
        # slot is reusable afterwards with identical results
        h2 = eng.submit(p1, max_new=10)
        assert list(h2) == full[:10]
        assert all(s["state"] == 0 for s in eng.active_slots())
    finally:
        eng.shutdown()


# ---------------------------------------------------------------------------
# SWA ring caches under continuous batching (round-5 VERDICT item #1).
#
# The interesting failure surface is per-slot ring phase: with staggered
# arrivals each slot's n_past (and therefore its ring write position and
# per-row ring mask) differs inside ONE batched decode step.  Every config
# decodes past the ring size so the wrap path is exercised, and must match
# the single-slot engine token-for-token.  Reference semantics:
# src/layers.h:1973-2016 (partial cache = window + extra headroom).
# ---------------------------------------------------------------------------

def _swa_cfg(cache_dtype, *, mixed=False):
    from dataclasses import replace

    cfg = tiny_config(vocab=128, hidden=64, layers=2, heads=4, kv_heads=2,
                      inter=96, max_length=192)
    if mixed:
        # GPT-OSS pattern: even layers SWA, odd layers full attention
        specs = tuple(LayerSpec(sliding_window=8 if i % 2 == 0 else 0)
                      for i in range(cfg.num_hidden_layers))
    else:
        # mistral pattern: every layer sliding-window
        specs = tuple(LayerSpec(sliding_window=8)
                      for i in range(cfg.num_hidden_layers))
    return replace(cfg, layer_specs=specs, cache_dtype=cache_dtype)


@pytest.fixture()
def small_ring(monkeypatch):
    """Shrink the ring headroom so rings actually wrap within test-sized
    decodes (window 8 + extra 16 = 24-slot rings; decoding past token 24
    wraps).  Both engines read SWA_EXTRA at call time."""
    import chatllm_tpu.nn.transformer as tr

    monkeypatch.setattr(tr, "SWA_EXTRA", 16)


@pytest.mark.parametrize("cache_dtype", ["bfloat16", "q8_0"])
@pytest.mark.parametrize("mixed", [False, True], ids=["all-swa", "mixed-sinks"])
def test_swa_batched_matches_single(small_ring, cache_dtype, mixed):
    cfg = _swa_cfg(cache_dtype, mixed=mixed)
    params = build_synthetic_params(cfg, fmt="f32", zeros=False,
                                    compute_dtype=jnp.float32)
    if mixed:
        # per-head attention sinks on every layer (GPT-OSS self_attn.sinks)
        rng = np.random.default_rng(3)
        for lp in params["layers"]:
            lp["attn"]["sinks"] = jnp.asarray(
                rng.standard_normal(cfg.num_attention_heads), jnp.float32)

    rng = np.random.default_rng(11)
    # prompt lengths straddle the 24-slot ring; every stream decodes past
    # the wrap point (n_past up to ~55)
    prompts = [rng.integers(0, 128, n).tolist() for n in (15, 30, 7, 22)]
    MAX_NEW = 25
    expect = [_single_stream(cfg, params, p, MAX_NEW) for p in prompts]

    eng = BatchedEngine(cfg, params, max_slots=2, decode_block=4,
                        scfg=SamplerConfig(do_sample=False, sampling="greedy"))
    assert eng._chunk_cap == 16     # prefill chunks capped to ring headroom
    try:
        # staggered arrivals: 4 streams over 2 slots — later streams are
        # admitted while earlier ones sit mid-ring at a different phase
        hs = [eng.submit(p, max_new=MAX_NEW) for p in prompts]
        got = [list(h) for h in hs]
    finally:
        eng.shutdown()
    for i, (g, e) in enumerate(zip(got, expect)):
        assert g == e, f"stream {i} ({cache_dtype}, mixed={mixed}): {g} != {e}"


def test_swa_batched_mid_stream_arrival(small_ring):
    """A slot admitted while another is DEEP past its ring wrap: the
    prefill (scalar n_past, fresh slot) and the running slot's vector
    n_past decode must not disturb each other."""
    cfg = _swa_cfg("bfloat16")
    params = build_synthetic_params(cfg, fmt="f32", zeros=False,
                                    compute_dtype=jnp.float32)
    rng = np.random.default_rng(12)
    p1 = rng.integers(0, 128, 20).tolist()
    p2 = rng.integers(0, 128, 9).tolist()
    e1 = _single_stream(cfg, params, p1, 40)   # wraps the 24-ring twice
    e2 = _single_stream(cfg, params, p2, 12)

    eng = BatchedEngine(cfg, params, max_slots=2, decode_block=4,
                        scfg=SamplerConfig(do_sample=False, sampling="greedy"))
    try:
        h1 = eng.submit(p1, max_new=40)
        got1 = [next(iter_ := iter(h1))]
        while len(got1) < 30:                  # p1 well past the wrap
            got1.append(next(iter_))
        h2 = eng.submit(p2, max_new=12)        # arrives mid-stream
        got2 = list(h2)
        got1.extend(iter_)
    finally:
        eng.shutdown()
    assert got1 == e1
    assert got2 == e2


def test_more_requests_than_slots_queue(model):
    cfg, params = model
    rng = np.random.default_rng(9)
    prompts = [rng.integers(0, 128, 8 + i).tolist() for i in range(5)]
    expect = [_single_stream(cfg, params, p, 8) for p in prompts]
    eng = BatchedEngine(cfg, params, max_slots=2, decode_block=4,
                        scfg=SamplerConfig(do_sample=False, sampling="greedy"))
    try:
        hs = [eng.submit(p, max_new=8) for p in prompts]
        got = [list(h) for h in hs]
    finally:
        eng.shutdown()
    assert got == expect
