"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 implication (d): the JAX-native analog of the reference's
localhost RPC multi-process testing)."""
import numpy as np

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
