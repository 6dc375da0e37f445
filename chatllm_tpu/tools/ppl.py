"""Perplexity harness (the PPL-parity metric, SURVEY.md §4/§6).

Computes token-level negative log likelihood over a corpus in fixed-length
windows (wikitext-style evaluation: non-overlapping chunks of `ctx` tokens,
first token of each chunk unscored), using the same forward path as
generation.

Usage:
    python -m chatllm_tpu.tools.ppl -m model.bin -f wiki.test.raw [--ctx 512]
"""
from __future__ import annotations

import math
import sys

import numpy as np


def perplexity_from_ids(model, ids: list[int], ctx: int = 512,
                        progress=None) -> dict:
    import jax
    import jax.numpy as jnp

    from ..nn.transformer import init_cache, transformer_forward

    cfg = model.cfg
    total_nll = 0.0
    total_tokens = 0

    @jax.jit
    def nll_chunk(params, cache, chunk):
        logits, _ = transformer_forward(cfg, params, chunk[None, :-1], cache, 0)
        logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
        tgt = chunk[1:]
        picked = jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
        return -jnp.sum(picked)

    n_chunks = max(0, (len(ids) - 1) // (ctx - 1))
    for c in range(n_chunks):
        seg = ids[c * (ctx - 1): c * (ctx - 1) + ctx]
        if len(seg) < 2:
            break
        cache = init_cache(cfg, 1, len(seg))
        nll = float(nll_chunk(model.params, cache,
                              jnp.asarray(np.asarray(seg, np.int32))))
        total_nll += nll
        total_tokens += len(seg) - 1
        if progress:
            progress(c + 1, n_chunks, math.exp(total_nll / total_tokens))
    ppl = math.exp(total_nll / max(total_tokens, 1))
    return {"ppl": ppl, "tokens": total_tokens, "nll": total_nll}


def perplexity(model, text: str, ctx: int = 512, progress=None) -> dict:
    ids = model.tokenizer.encode(text)
    if model.tokenizer.bos_token_id >= 0:
        ids = [model.tokenizer.bos_token_id] + ids
    return perplexity_from_ids(model, ids, ctx, progress)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    model_path, text_path, ctx = None, None, 512
    i = 0
    while i < len(argv):
        if argv[i] in ("-m", "--model"):
            i += 1
            model_path = argv[i]
        elif argv[i] in ("-f", "--file"):
            i += 1
            text_path = argv[i]
        elif argv[i] == "--ctx":
            i += 1
            ctx = int(argv[i])
        i += 1
    assert model_path and text_path, "usage: ppl -m MODEL -f TEXT [--ctx N]"

    from ..models import RuntimeConfig, load_model

    model = load_model(model_path, RuntimeConfig())
    text = open(text_path, encoding="utf-8").read()

    def prog(done, total, ppl):
        print(f"[{done}/{total}] ppl={ppl:.4f}", file=sys.stderr)

    r = perplexity(model, text, ctx, prog)
    print(f"PPL = {r['ppl']:.4f} over {r['tokens']} tokens")


if __name__ == "__main__":
    main()
