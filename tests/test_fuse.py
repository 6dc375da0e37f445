"""fuse_decode_streams: fused q|k|v + gate|up weight streams are a pure
parameter transform — each output column's dot product is mathematically
unchanged (only weight-matrix column order is new), so logits must agree
to accumulation-order noise and greedy generation must be token-exact."""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from chatllm_tpu.models.synthetic import build_synthetic_params, tiny_config
from chatllm_tpu.nn.transformer import init_cache, transformer_forward
from chatllm_tpu.runtime.fuse import fuse_decode_streams
from chatllm_tpu.runtime.generate import GenerationConfig, InferenceEngine


@pytest.mark.parametrize("fmt", ["f32", "q4", "q4k"])
def test_fused_forward_close(fmt):
    cfg = tiny_config(vocab=128, hidden=256, layers=2, heads=4, kv_heads=2,
                      inter=256, max_length=64)
    dt = jnp.float32 if fmt == "f32" else jnp.bfloat16
    params = build_synthetic_params(cfg, fmt=fmt, zeros=False,
                                    compute_dtype=dt, qkv_bias=True)
    fused = fuse_decode_streams(cfg, params)
    lp = fused["layers"][0]
    assert "qkv" in lp["attn"] and "q" not in lp["attn"]
    assert "gate_up" in lp["mlp"] and "gate" not in lp["mlp"]

    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (1, 9)),
                      jnp.int32)
    la, _ = transformer_forward(cfg, params, ids, init_cache(cfg, 1, 64), 0)
    lb, _ = transformer_forward(cfg, fused, ids, init_cache(cfg, 1, 64), 0)
    tol = 1e-5 if fmt == "f32" else 2e-2   # bf16 compute for quant formats
    np.testing.assert_allclose(np.asarray(la, np.float32),
                               np.asarray(lb, np.float32),
                               rtol=tol, atol=tol)


def test_fused_generate_parity():
    cfg = tiny_config(vocab=128, hidden=64, layers=2, heads=4, kv_heads=2,
                      inter=96, max_length=96)
    params = build_synthetic_params(cfg, fmt="f32", zeros=False,
                                    compute_dtype=jnp.float32)
    ids = np.random.default_rng(1).integers(0, 128, 11).tolist()
    g = GenerationConfig(do_sample=False, sampling="greedy",
                         max_new_tokens=16, temperature=0.0)
    out_a, _, _ = InferenceEngine(cfg, params).generate(ids, g)
    out_b, _, _ = InferenceEngine(
        cfg, fuse_decode_streams(cfg, params)).generate(ids, g)
    assert out_a == out_b


def test_fuse_skips_out_of_scope():
    from dataclasses import replace

    # MoE layer keeps its router "gate"; expert trees untouched
    cfg = tiny_config(moe_layer=True)
    params = build_synthetic_params(cfg, fmt="f32", zeros=False,
                                    compute_dtype=jnp.float32)
    fused = fuse_decode_streams(cfg, params)
    moe_lp = fused["layers"][cfg.num_hidden_layers - 1]
    assert "gate" in moe_lp["mlp"] and "gate_up" not in moe_lp["mlp"]
    assert "qkv" in moe_lp["attn"]      # attention still fuses

    # unknown trees pass through
    assert fuse_decode_streams(cfg, {"foo": 1}) == {"foo": 1}
