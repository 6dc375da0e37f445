"""Worker for the 2-process jax.distributed test (run via subprocess).

The JAX-native analog of the reference's localhost RPC smoke test
(/root/reference/docs/rpc.md: server `--serve_rpc` + client
`--rpc_endpoints 127.0.0.1:PORT` on one machine).  Here both processes run
the SAME program, form one global mesh over 2 processes x 4 virtual CPU
devices, shard the model with the production PartitionSpec rules
(parallel/mesh.py), and check the TP-sharded forward against the local
single-process reference.  Collectives cross the process boundary via Gloo.

Usage: distributed_worker.py <process_id> <num_processes> <port>
"""
import os
import sys

import jax

# the axon sitecustomize forces the tunneled TPU backend; must override
# AFTER import (JAX_PLATFORMS env is ignored)
jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from chatllm_tpu.models.synthetic import build_synthetic_params, tiny_config
    from chatllm_tpu.nn.transformer import init_cache, transformer_forward
    from chatllm_tpu.parallel import distributed
    from chatllm_tpu.parallel.mesh import shard_cache, shard_params

    # --- join the pod FIRST (no jax calls may touch the backend before) ----
    info = distributed.init_distributed(f"127.0.0.1:{port}", nprocs, pid)
    assert info["process_count"] == nprocs, info
    assert info["global_devices"] == nprocs * jax.local_device_count(), info
    print(f"proc {info['process_index']}/{info['process_count']} "
          f"global={info['global_devices']}", flush=True)

    # --- single-process reference on this process's local device -----------
    cfg = tiny_config(heads=8, kv_heads=4, hidden=128)
    params = build_synthetic_params(cfg, "q4", zeros=False, qkv_bias=False,
                                    compute_dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 16), dtype=np.int32))
    ref_logits = np.asarray(transformer_forward(
        cfg, params, ids, init_cache(cfg, 2, 32, dtype=jnp.float32), 0)[0])

    # dp=2 x tp=4: the dp axis spans the two processes, so the batch shards
    # cross the process boundary and collectives ride the (Gloo) transport
    mesh = distributed.global_mesh(tp=4, dp=2)
    with mesh:
        sp = shard_params(params, mesh)
        sc = shard_cache(init_cache(cfg, 2, 32, dtype=jnp.float32), mesh)
        ids_s = jax.device_put(ids, NamedSharding(mesh, P()))

        @jax.jit
        def fwd(p, c, i):
            logits, _ = transformer_forward(cfg, p, i, c, 0)
            return jax.lax.with_sharding_constraint(
                logits, NamedSharding(mesh, P()))

        out = fwd(sp, sc, ids_s)
        out.block_until_ready()

    # replicated output → every process holds the full array
    np.testing.assert_allclose(np.asarray(out), ref_logits,
                               atol=2e-4, rtol=2e-4)
    print(f"PARITY-OK {pid}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
