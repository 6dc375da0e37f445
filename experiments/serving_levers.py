"""Round-5 serving levers, measured IN the decode loop (model level).

Variants over the bench.py B=32 shape (llama3-8B q4k, ctx 1024):
  base        — production path
  fused       — fuse_decode_streams (qkv + gate_up single weight streams)
per cache in {bfloat16, q8_0}; optional B env to change slot count.

Usage: python experiments/serving_levers.py [B] [ctx] [steps]
Prints one JSON line per variant.  In-loop A/B only — isolated per-op
timings carry the ~0.8 ms axon dispatch floor (BASELINE.md probe-noise
caveat).
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from chatllm_tpu.models.synthetic import (build_synthetic_params,
                                              llama3_8b_config)
    from chatllm_tpu.nn.transformer import init_cache, transformer_forward
    from chatllm_tpu.runtime.fuse import fuse_decode_streams

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ctx = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 48

    cfg0 = llama3_8b_config(max_length=ctx)
    params = build_synthetic_params(cfg0, "q4k", zeros=True)
    fused = fuse_decode_streams(cfg0, params)

    def run(cfg, p):
        @functools.partial(jax.jit, donate_argnums=(1,))
        def decode_n(p, cache, tok, n_past):
            def body(carry, _):
                tok, cache, n_past = carry
                logits, cache = transformer_forward(cfg, p, tok, cache, n_past)
                nxt = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
                return (nxt, cache, n_past + 1), None
            (tok, cache, n_past), _ = jax.lax.scan(
                body, (tok, cache, n_past), None, length=steps)
            return tok, cache

        cache = init_cache(cfg, B, ctx)
        tok = jnp.zeros((B, 1), jnp.int32)
        t, cache = decode_n(p, cache, tok, jnp.int32(0))
        _ = np.asarray(t)
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            t, cache = decode_n(p, cache, t, jnp.int32(0))
            _ = np.asarray(t)
            best = min(best, time.perf_counter() - t0)
        del cache
        return B * steps / best

    for cache_dtype in ("bfloat16", "q8_0"):
        cfg = dataclasses.replace(cfg0, cache_dtype=cache_dtype)
        for name, p in (("base", params), ("fused", fused)):
            try:
                tok_s = run(cfg, p)
            except Exception as e:
                print(json.dumps({"variant": name, "cache": cache_dtype,
                                  "error": f"{type(e).__name__}: {str(e)[:200]}"}))
                continue
            print(json.dumps({"variant": name, "cache": cache_dtype, "B": B,
                              "ctx": ctx, "tok_s": round(tok_s, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
