"""Multi-chip scaling-efficiency harness (driver metric: >=85% from 1 host
to N>=2 hosts on a Grok-1-class q4_k model — BASELINE.json config #5).

Measures decode tokens/s on a 1-device submesh vs the full tp mesh and
reports efficiency = (tok_s_full / tok_s_1) / n_devices for throughput-bound
shapes, or latency speedup for B=1.  On real multi-host pods launch one
process per host first (chatllm_tpu.parallel.distributed / main.py
--coordinator).  On this dev box it runs on the virtual CPU mesh
(validates mechanics, NOT a perf statement — say so in any report).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python experiments/scaling_bench.py --arch tiny --steps 16
  python experiments/scaling_bench.py --arch grok1 --steps 32   # real pod
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="tiny",
                    choices=["tiny", "llama8b", "deepseek", "grok1"])
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--ctx", type=int, default=1024)
    args = ap.parse_args()

    import jax

    # the axon sitecustomize ignores JAX_PLATFORMS env; honor this instead
    plat = os.environ.get("CHATLLM_TPU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from chatllm_tpu.models import synthetic
    from chatllm_tpu.nn.transformer import init_cache, transformer_forward
    from chatllm_tpu.parallel.mesh import shard_cache, shard_params

    if args.arch == "tiny":
        cfg = synthetic.tiny_config(heads=8, kv_heads=8, hidden=256,
                                    layers=4, inter=512,
                                    max_length=args.ctx)
        params = synthetic.build_synthetic_params(
            cfg, "q4", zeros=True, qkv_bias=False)
    elif args.arch == "llama8b":
        cfg = synthetic.llama3_8b_config(max_length=args.ctx)
        params = synthetic.build_synthetic_params(cfg, "q4k", zeros=True)
    elif args.arch == "deepseek":
        cfg, params = synthetic.build_deepseek_v2_lite()
    else:
        cfg, params = synthetic.build_grok1_moe()

    devs = jax.devices()
    n = len(devs)

    def bench(mesh_devs):
        tp = len(mesh_devs)
        mesh = Mesh(np.array(mesh_devs).reshape(1, tp), ("dp", "tp"))
        with mesh:
            sp = shard_params(params, mesh)
            sc = shard_cache(init_cache(cfg, args.batch, args.ctx), mesh, cfg)

            import functools

            @functools.partial(jax.jit, donate_argnums=(1,))
            def decode_n(p, c, tok, n_past):
                def body(carry, _):
                    tok, c, np_ = carry
                    logits, c = transformer_forward(cfg, p, tok, c, np_)
                    nxt = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
                    return (nxt, c, np_ + 1), None
                (tok, c, n_past), _ = jax.lax.scan(
                    body, (tok, c, n_past), None, length=args.steps)
                return tok, c

            tok = jnp.zeros((args.batch, 1), jnp.int32)
            t, sc = decode_n(sp, sc, tok, jnp.int32(0))
            _ = np.asarray(t)
            t0 = time.perf_counter()
            t, sc = decode_n(sp, sc, tok, jnp.int32(0))
            _ = np.asarray(t)
            dt = time.perf_counter() - t0
        return args.batch * args.steps / dt

    tok_1 = bench(devs[:1])
    tok_n = bench(devs)
    speedup = tok_n / tok_1
    eff = speedup / n
    print(json.dumps({
        "arch": args.arch, "devices": n, "batch": args.batch,
        "ctx": args.ctx, "tok_s_1dev": round(tok_1, 2),
        "tok_s_full_mesh": round(tok_n, 2),
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 4),
        "platform": jax.devices()[0].platform,
        "note": ("CPU virtual mesh: mechanics only, not a perf statement"
                 if jax.devices()[0].platform == "cpu" else
                 "real hardware"),
    }))


if __name__ == "__main__":
    main()
