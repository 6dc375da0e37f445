"""Locate the s8-cache relayout copies: inside the scan while-body (paid
per step) or at jit entry/exit (amortized)?  Dumps per-computation counts
of copy/bitcast-convert/transpose ops on >=16MB operands."""
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
    cache_dtype = sys.argv[3] if len(sys.argv) > 3 else "q8_0"
    cfg = dataclasses.replace(llama3_8b_config(max_length=ctx),
                              cache_dtype=cache_dtype)
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
    txt = decode_n.lower(params, cache, tok, jnp.int32(0)).compile().as_text()

    # split into computations
    comp = None
    in_body = {}
    order = []
    for line in txt.splitlines():
        m = re.match(r"(%?[\w.\-]+)\s*(\([^)]*\))?\s*->.*{$", line.strip())
        if line.startswith(("ENTRY", "%")) and "{" in line and "->" in line:
            comp = line.split()[0].lstrip("%")
            continue
        if line.startswith("ENTRY"):
            comp = "ENTRY"
            continue
        s = line.strip()
        if "copy" in s.split("=")[-1][:60] or "transpose(" in s:
            msh = re.search(r"(s8|bf16|f32|u8)\[([\d,]+)\]", s.split("=", 1)[-1])
            if not msh:
                continue
            dt, dims = msh.groups()
            n = 1
            for d in dims.split(","):
                n *= int(d)
            sz = n * {"s8": 1, "u8": 1, "bf16": 2, "f32": 4}[dt]
            if sz < 16e6:
                continue
            opname = s.split("= ", 1)[-1].split("(")[0].split()[-1]
            key = (comp, opname, f"{dt}[{dims}]")
            if key not in in_body:
                order.append(key)
            in_body[key] = in_body.get(key, 0) + 1
    for key in order:
        print(in_body[key], key)

    # Is the while body name known? print computations mentioning 'while'
    wb = set(re.findall(r"(%[\w.\-]*while[\w.\-]*)", txt))
    print("while-ish computation names:", list(wb)[:6])


if __name__ == "__main__":
    main()
