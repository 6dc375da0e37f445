"""Where do the q8-B=32 decode bytes go?  Compile the production decode
step and mine the optimized HLO for materialized temporaries (int8->float
converts, copies, relayouts) large enough to explain the ~2.1 GB/step gap
between measured (1085-1100 tok/s) and the composite ceiling (~1450).

Usage: python experiments/q8_hlo_probe.py [B] [ctx]
"""
import dataclasses
import functools
import re
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from chatllm_tpu.models.synthetic import build_synthetic_params, llama3_8b_config
from chatllm_tpu.nn.transformer import init_cache, transformer_forward


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ctx = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    cfg = dataclasses.replace(llama3_8b_config(max_length=ctx),
                              cache_dtype="q8_0")
    params = build_synthetic_params(cfg, "q4k", zeros=True)
    cache = init_cache(cfg, B, ctx)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def decode_n(p, cache, tok, n_past):
        def body(carry, _):
            tok, cache, n_past = carry
            logits, cache = transformer_forward(cfg, p, tok, cache, n_past)
            nxt = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
            return (nxt, cache, n_past + 1), None
        (tok, cache, n_past), _ = jax.lax.scan(
            body, (tok, cache, n_past), None, length=8)
        return tok, cache

    tok = jnp.zeros((B, 1), jnp.int32)
    lowered = decode_n.lower(params, cache, tok, jnp.int32(0))
    compiled = lowered.compile()
    try:
        ma = compiled.memory_analysis()
        print("temp MB:", ma.temp_size_in_bytes / 1e6,
              "output MB:", ma.output_size_in_bytes / 1e6,
              "arg MB:", ma.argument_size_in_bytes / 1e6)
    except Exception as e:
        print("memory_analysis unavailable:", e)

    txt = compiled.as_text()
    print("HLO chars:", len(txt))
    # find ops with big shapes in the while body
    big = []
    shape_re = re.compile(r"(s8|bf16|f32|u8|s32)\[([\d,]+)\]")
    for line in txt.splitlines():
        line = line.strip()
        if not ("= " in line):
            continue
        m = shape_re.search(line.split("=", 1)[1])
        if not m:
            continue
        dt, dims = m.groups()
        try:
            n = 1
            for d in dims.split(","):
                n *= int(d)
        except ValueError:
            continue
        sz = n * {"s8": 1, "u8": 1, "bf16": 2, "f32": 4, "s32": 4}[dt]
        if sz >= 16e6:   # >= 16 MB
            big.append((sz, dt, dims, line[:180]))
    big.sort(reverse=True)
    seen = {}
    for sz, dt, dims, line in big:
        # classify by op name
        opname = line.split("= ", 1)[1].split()[0] if "= " in line else "?"
        key = (opname.split(".")[0], dt, dims)
        seen[key] = seen.get(key, 0) + 1
    for (op, dt, dims), cnt in sorted(seen.items(),
                                      key=lambda kv: -kv[1]):
        n = 1
        for d in dims.split(","):
            n *= int(d)
        sz = n * {"s8": 1, "u8": 1, "bf16": 2, "f32": 4, "s32": 4}[dt]
        print(f"{cnt:4d} x {op:22s} {dt}[{dims}]  {sz/1e6:8.1f} MB each")
    # dump a few raw lines for the top entries
    print("\n--- sample big-op lines ---")
    shown = set()
    for sz, dt, dims, line in big:
        op = line.split("= ", 1)[1].split()[0]
        k = op.split(".")[0]
        if k in shown:
            continue
        shown.add(k)
        print(line[:400])
        if len(shown) >= 12:
            break


if __name__ == "__main__":
    main()
