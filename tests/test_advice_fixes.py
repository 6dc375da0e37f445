"""Regression tests for the round-1 advisor findings (ADVICE.md):

  1. YaRN corr-dim ramp compared the half-dim index at 2x scale
     (ops/rope.py) — golden vs HF `_compute_yarn_parameters`.
  2. SWA ring cache sized exactly `window` lost in-window keys to
     same-chunk writes (nn/transformer.py) — ring-vs-dense parity across
     a wraparound.
  3. Prefill bucket padding could exceed remaining cache slots near the
     context limit, and dynamic_update_slice's index clamping then
     silently corrupted older entries (runtime/generate.py).
  4. Quantized-cache scale tensors used the global n_kv head count for
     heterogeneous-GQA (DeciLM) layers (nn/transformer.py init_cache).
"""
import math

import numpy as np
import pytest

import conftest  # noqa: F401  (sets JAX_PLATFORMS=cpu + 8 virtual devices)

import jax.numpy as jnp

from chatllm_tpu.models.synthetic import build_synthetic_params, tiny_config
from chatllm_tpu.nn.transformer import (KVCache, LayerSpec, SWA_EXTRA,
                                        TransformerConfig, init_cache,
                                        transformer_forward)
from chatllm_tpu.ops.rope import ROPE_NEOX, RopeConfig, precompute_rope_cache

transformers = pytest.importorskip("transformers")


def test_yarn_rope_matches_hf():
    """Golden: HF `_compute_yarn_parameters` (ground truth for DeepSeek-V2/
    Qwen YaRN checkpoints) vs our per-position theta blend."""
    from transformers import PretrainedConfig
    from transformers import modeling_rope_utils as mru

    dim, factor, orig = 64, 4.0, 2048
    hf_cfg = PretrainedConfig()
    hf_cfg.rope_theta = 10000.0
    hf_cfg.hidden_size = dim * 4
    hf_cfg.num_attention_heads = 4
    hf_cfg.head_dim = dim
    hf_cfg.max_position_embeddings = int(orig * factor)
    hf_cfg.rope_scaling = {"rope_type": "yarn", "factor": factor,
                           "original_max_position_embeddings": orig,
                           "beta_fast": 32.0, "beta_slow": 1.0}
    inv_freq, att = mru._compute_yarn_parameters(hf_cfg, device="cpu")
    inv_freq = np.asarray(inv_freq, dtype=np.float64)

    cfg = RopeConfig(head_dim=dim, freq_base=10000.0, freq_scale=1.0 / factor,
                     layout=ROPE_NEOX, ext_factor=1.0, beta_fast=32.0,
                     beta_slow=1.0, orig_ctx=orig)
    positions = np.array([0, 1, 17, 2047, 5000, 8191], dtype=np.int32)
    cos, sin = precompute_rope_cache(jnp.asarray(positions), cfg)
    theta_hf = positions[:, None].astype(np.float64) * inv_freq[None, :]
    np.testing.assert_allclose(np.asarray(cos, np.float64),
                               np.cos(theta_hf) * att, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sin, np.float64),
                               np.sin(theta_hf) * att, rtol=2e-4, atol=2e-4)


def _full_cache_like(cfg: TransformerConfig, batch: int, s: int) -> KVCache:
    """A dense cache with `s` slots per layer (bypasses the ring sizing)."""
    d = cfg.resolved_head_dim()
    kv = cfg.num_key_value_heads
    dt = jnp.dtype(cfg.cache_dtype)
    ks = tuple(jnp.zeros((batch, s, kv, d), dt)
               for _ in range(cfg.num_hidden_layers))
    return KVCache(k=ks, v=ks)


def test_swa_ring_matches_dense_across_wraparound():
    window = 64
    max_len = SWA_EXTRA + window + 512          # ring alloc = window + EXTRA
    cfg = tiny_config(vocab=96, hidden=64, layers=2, heads=4, kv_heads=2,
                      inter=96, max_length=max_len)
    from dataclasses import replace
    cfg = replace(cfg, cache_dtype="float32",
                  layer_specs=tuple(LayerSpec(sliding_window=window)
                                    for _ in range(cfg.num_hidden_layers)))
    params = build_synthetic_params(cfg, fmt="f32", zeros=False,
                                    compute_dtype=jnp.float32)

    ring = init_cache(cfg, 1, max_len)
    assert ring.k[0].shape[1] == window + SWA_EXTRA      # headroom allocated
    dense = _full_cache_like(cfg, 1, max_len)            # dense SWA-masked path

    rng = np.random.default_rng(3)
    total = window + SWA_EXTRA + 130                     # forces a wrap
    ids = rng.integers(0, 96, (1, total)).astype(np.int32)
    chunk = 128
    n_past = 0
    for st in range(0, total, chunk):
        seg = jnp.asarray(ids[:, st:st + chunk])
        lr, ring = transformer_forward(cfg, params, seg, ring, n_past)
        ld, dense = transformer_forward(cfg, params, seg, dense, n_past)
        np.testing.assert_allclose(np.asarray(lr), np.asarray(ld),
                                   rtol=1e-4, atol=1e-4)
        n_past += seg.shape[1]


def test_prefill_pad_never_overflows_cache():
    """Near the context limit, padded prefill buckets must not clamp into
    (and corrupt) older cache slots: compare chunked-prefill logits against
    a one-shot forward with plenty of room."""
    from chatllm_tpu.runtime.generate import InferenceEngine

    cap = 150
    cfg = tiny_config(vocab=96, hidden=64, layers=2, heads=4, kv_heads=2,
                      inter=96, max_length=cap)
    from dataclasses import replace
    cfg = replace(cfg, cache_dtype="float32")
    params = build_synthetic_params(cfg, fmt="f32", zeros=False,
                                    compute_dtype=jnp.float32)
    eng = InferenceEngine(cfg, params)
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 96, (1, cap - 4)).astype(np.int32)

    logits, cache, n_past = eng.prefill(ids[0], eng.new_cache(1), 0, chunk=64)
    assert n_past == cap - 4

    ref_cache = _full_cache_like(replace(cfg, max_length=256), 1, 256)
    ref_logits, ref_cache = transformer_forward(cfg, params, jnp.asarray(ids),
                                                ref_cache, 0)
    np.testing.assert_allclose(np.asarray(logits[0]),
                               np.asarray(ref_logits[0, -1]),
                               rtol=1e-4, atol=1e-4)
    # the cache contents themselves must be uncorrupted
    np.testing.assert_allclose(np.asarray(cache.k[0][:, :n_past]),
                               np.asarray(ref_cache.k[0][:, :n_past]),
                               rtol=1e-4, atol=1e-4)


def test_quant_cache_heterogeneous_gqa():
    """q8 cache on a model with per-layer kv-head overrides (DeciLM) must
    allocate per-layer scale shapes and run."""
    cfg = tiny_config(vocab=64, hidden=64, layers=2, heads=4, kv_heads=4,
                      inter=96, max_length=64)
    from dataclasses import replace
    cfg = replace(cfg, cache_dtype="q8_0",
                  layer_specs=(LayerSpec(num_kv_heads=2), LayerSpec()))
    params = build_synthetic_params(cfg, fmt="f32", zeros=False,
                                    compute_dtype=jnp.float32)
    # the synthetic builder sizes k/v for the global kv count; shrink layer 0
    l0 = dict(params["layers"][0])
    attn0 = dict(l0["attn"])
    d = cfg.resolved_head_dim()
    for n in ("k", "v"):
        lin = attn0[n]
        attn0[n] = type(lin)(w=lin.w[:, : 2 * d], bias=None)
    l0["attn"] = attn0
    params["layers"] = (l0,) + params["layers"][1:]

    cache = init_cache(cfg, 1, 64)
    assert cache.k_scale[0].shape == (1, 64, 2)
    assert cache.k_scale[1].shape == (1, 64, 4)
    ids = jnp.asarray(np.arange(10, dtype=np.int32)[None, :])
    logits, cache = transformer_forward(cfg, params, ids, cache, 0)
    assert np.isfinite(np.asarray(logits)).all()
