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
