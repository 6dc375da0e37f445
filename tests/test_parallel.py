"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 implication (d): the JAX-native analog of the reference's
localhost RPC multi-process testing)."""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_tp_sharded_forward_matches_single_device():
    from chatllm_tpu.models.synthetic import build_synthetic_params, tiny_config
    from chatllm_tpu.nn.transformer import init_cache, transformer_forward
    from chatllm_tpu.parallel.mesh import make_mesh, shard_cache, shard_params

    cfg = tiny_config(heads=8, kv_heads=4, hidden=128)
    params = build_synthetic_params(cfg, "q4", zeros=False, qkv_bias=False,
                                    compute_dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 16),
                                                        dtype=np.int32))
    cache = init_cache(cfg, 1, 32, dtype=jnp.float32)
    ref_logits, _ = transformer_forward(cfg, params, ids, cache, 0)

    mesh = make_mesh(tp=4, dp=1)   # batch=1 can't shard over dp
    with mesh:
        sp = shard_params(params, mesh)
        sc = shard_cache(init_cache(cfg, 1, 32, dtype=jnp.float32), mesh)

        @jax.jit
        def fwd(p, c, i):
            return transformer_forward(cfg, p, i, c, 0)[0]

        out = fwd(sp, sc, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_logits),
                               atol=2e-4, rtol=2e-4)


def test_tp_pallas_shard_map_matches_xla(monkeypatch):
    """The Pallas kernels under a sharded pjit (shard_map + psum, interpret
    mode on the virtual mesh) match the XLA dequant path.  VERDICT round-1
    gap: the kernels had only ever run unsharded; the mesh path silently
    fell back to XLA (ops/qmm.py use_pallas_qmm gating)."""
    from chatllm_tpu.models.synthetic import build_synthetic_params, tiny_config
    from chatllm_tpu.nn.transformer import init_cache, transformer_forward
    from chatllm_tpu.ops import qmm
    from chatllm_tpu.parallel.mesh import make_mesh, shard_cache, shard_params

    cfg = tiny_config(heads=8, kv_heads=4, hidden=128)
    params = build_synthetic_params(cfg, "q4", zeros=False, qkv_bias=False,
                                    compute_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16), dtype=np.int32))
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 1), dtype=np.int32))

    cache = init_cache(cfg, 1, 32, dtype=jnp.float32)
    ref1, cache = transformer_forward(cfg, params, ids, cache, 0)
    ref2, _ = transformer_forward(cfg, params, tok, cache, 16)

    monkeypatch.setenv("CHATLLM_TPU_QMM", "1")   # force the Pallas path
    mesh = make_mesh(tp=4, dp=1)
    with mesh, qmm.kernel_mesh(mesh):
        sp = shard_params(params, mesh)
        sc = shard_cache(init_cache(cfg, 1, 32, dtype=jnp.float32), mesh)

        @jax.jit
        def step(p, c, i, t):
            l1, c = transformer_forward(cfg, p, i, c, 0)
            l2, c = transformer_forward(cfg, p, t, c, i.shape[1])
            return l1, l2

        out1, out2 = step(sp, sc, ids, tok)
    # bf16 accumulation order differs across shards (K split + psum):
    # tolerance is bf16-epsilon-scale, far below any wiring error
    scale = float(np.abs(np.asarray(ref1)).max())
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                               atol=8e-3 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=8e-3 * scale, rtol=0)


def test_flash_shard_map_matches_dense(monkeypatch):
    """Pallas flash attention under shard_map (heads over tp) matches the
    dense XLA attention path on the virtual mesh."""
    from chatllm_tpu.ops import attention as A
    from chatllm_tpu.ops import qmm
    from chatllm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(2)
    B, T, Hq, Hkv, D, S = 1, 128, 8, 4, 32, 1024
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    n_past = 256

    monkeypatch.setenv("CHATLLM_TPU_FLASH", "0")
    ref = A.attention_with_cache(q, k, v, n_past, T, scale=D ** -0.5)

    monkeypatch.setenv("CHATLLM_TPU_FLASH", "1")
    mesh = make_mesh(tp=4, dp=1)
    with mesh, qmm.kernel_mesh(mesh):
        out = jax.jit(lambda q, k, v: A.attention_with_cache(
            q, k, v, n_past, T, scale=D ** -0.5))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("shard", ["out", "in"])
def test_superblock_shard_map(monkeypatch, shard):
    """q4_k superblock QuantLinear (int8 sc/m + f16 d/dmin) through the
    shard_map'd Pallas path in both TP roles matches the XLA dequant path."""
    from chatllm_tpu.ggmm.quants import GGMLType, quantize
    from chatllm_tpu.ops import qmm
    from chatllm_tpu.ops.qtensor import linear_from_ggml
    from chatllm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(5)
    K, N = 2048, 512
    w = (rng.standard_normal((N, K)) * 0.05).astype(np.float32)
    lin = linear_from_ggml(quantize(w, GGMLType.Q4_K), GGMLType.Q4_K, (N, K))
    assert lin.sb == 8
    x = jnp.asarray(rng.standard_normal((4, K)).astype(np.float32))
    ref = np.asarray(qmm.matmul(x, lin, compute_dtype=jnp.float32))

    monkeypatch.setenv("CHATLLM_TPU_QMM", "1")
    mesh = make_mesh(tp=4, dp=1)
    with mesh, qmm.kernel_mesh(mesh):
        qmm.reset_kernel_dispatch_stats()
        got = np.asarray(jax.jit(
            lambda xx: qmm.matmul(xx, lin, compute_dtype=jnp.float32,
                                  shard=shard))(x))
        assert qmm.kernel_dispatch_stats().get("pallas_shard_map", 0) == 1
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-5, rel


@pytest.mark.parametrize("arch", ["deepseek-v2-lite(MLA+MoE)",
                                  "qwen3.5-hybrid(GDN+MoE)",
                                  "gemma4(PLE+KVshared+cascadeMoE)",
                                  "grok-1(MoE)"])
def test_tp_real_arch_parity(arch):
    """Per-arch sharding rules (MLA latents/up-projs, GDN recurrence,
    Gemma4 PLE/KV-shared/cascade-MoE, Grok sandwich norms) keep the sharded
    forward numerically equal to single-device (round-4 VERDICT item #2)."""
    from chatllm_tpu.models.synthetic import REAL_ARCH_BUILDERS
    from chatllm_tpu.nn.transformer import init_cache, transformer_forward
    from chatllm_tpu.parallel.mesh import make_mesh, shard_cache, shard_params
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg, params = REAL_ARCH_BUILDERS[arch]()
    rng = np.random.default_rng(7)
    B, T = 4, 16
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T), dtype=np.int32))
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 1), dtype=np.int32))
    cache = init_cache(cfg, B, 64, dtype=jnp.float32)
    ref1, cache = transformer_forward(cfg, params, ids, cache, 0)
    ref2, _ = transformer_forward(cfg, params, tok, cache, T)

    mesh = make_mesh(tp=4, dp=2)
    with mesh:
        sp = shard_params(params, mesh)
        sc = shard_cache(init_cache(cfg, B, 64, dtype=jnp.float32), mesh, cfg)
        sids = jax.device_put(ids, NamedSharding(mesh, P("dp", None)))
        stok = jax.device_put(tok, NamedSharding(mesh, P("dp", None)))

        @jax.jit
        def step(p, c, i, t):
            l1, c = transformer_forward(cfg, p, i, c, 0)
            l2, _ = transformer_forward(cfg, p, t, c, i.shape[1])
            return l1, l2

        out1, out2 = step(sp, sc, sids, stok)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=2e-5, rtol=2e-5)


def test_tp_mla_compressed_cache_sharded():
    """The compressed (latent) MLA cache has no head axis: the sharding
    rules must replicate it over tp while still sharding the MLA up-projs;
    parity vs the single-device compressed path."""
    from dataclasses import replace as _replace

    from chatllm_tpu.models.synthetic import build_deepseek_v2_lite
    from chatllm_tpu.nn.transformer import init_cache, transformer_forward
    from chatllm_tpu.ops.qmm import dense_weight
    from chatllm_tpu.parallel.mesh import make_mesh, shard_cache, shard_params
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg, params = build_deepseek_v2_lite()
    m = cfg.mla
    cfg = _replace(cfg, mla_compressed=True)
    layers = []
    for lp in params["layers"]:
        attn = dict(lp["attn"])
        h = cfg.num_attention_heads
        attn["wk_abs"] = dense_weight(attn["u_k_nope"]).reshape(
            m.kv_lora_rank, h, m.qk_nope_head_dim)
        attn["wv_abs"] = dense_weight(attn["u_v"]).reshape(
            m.kv_lora_rank, h, m.v_head_dim)
        layers.append({**lp, "attn": attn})
    params = {**params, "layers": tuple(layers)}

    rng = np.random.default_rng(8)
    B, T = 4, 16
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T), dtype=np.int32))
    cache = init_cache(cfg, B, 64, dtype=jnp.float32)
    ref, _ = transformer_forward(cfg, params, ids, cache, 0)

    mesh = make_mesh(tp=4, dp=2)
    with mesh:
        sp = shard_params(params, mesh)
        sc = shard_cache(init_cache(cfg, B, 64, dtype=jnp.float32), mesh, cfg)
        sids = jax.device_put(ids, NamedSharding(mesh, P("dp", None)))
        out = jax.jit(
            lambda p, c, i: transformer_forward(cfg, p, i, c, 0)[0]
        )(sp, sc, sids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
