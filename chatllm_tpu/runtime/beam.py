"""Beam-search pipeline.

Reference analog: BeamSearchPipeline (/root/reference/src/chat.h:1499,
src/chat.cpp:2652-2850), which forks per-beam KV snapshots via
ModelSessionMemory and evaluates beams sequentially.  TPU design: beams ARE
the batch dimension — one [n_beams, S, H, D] cache, one forward per step for
all beams, cache reordered with a gather after each top-k selection
(SURVEY.md §2.7 P7 "vmapped beams sharing a batched KV cache").
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.transformer import init_cache, transformer_forward
from .pipeline import Pipeline

NEG_INF = -1e30


class BeamSearchPipeline(Pipeline):
    def __init__(self, model, *, beam_size: int = 4, **kw):
        super().__init__(model, **kw)
        self.beam_size = beam_size

    def _decode_beams_host(self, input_ids, max_new_tokens, *, embeds=None,
                           positions=None):
        """Beam decode: device forward for all beams per step, host top-k
        bookkeeping, cache rows gathered to follow surviving beams.

        `embeds` [1, T, H] (optional): multimodal prefill — spliced media
        embeddings instead of token ids (tiled across beams).
        `positions` (optional): explicit prefill rope positions for M-RoPE
        models; decode then continues at eng.pos_delta past n_past (the VL
        rope offset the engine tracks — reference pos_delta threading,
        qwen.cpp TensorPosHelper3D)."""
        eng = self.model.engine
        cfg = self.model.cfg
        n = self.beam_size
        term = {t for t in (self.tokenizer.terminate_ids | {self.tokenizer.eos_token_id}) if t >= 0}

        T0 = embeds.shape[1] if embeds is not None else len(input_ids)
        max_len = min(eng.max_length, T0 + max_new_tokens + 1)
        cache = init_cache(cfg, n, max_len)
        # pos_delta: the VL rope offset (M-RoPE positions advance slower
        # than the KV index after image prefill; GLM1 carries its 2-D
        # boundary) — same semantics as runtime/generate.py:184-225
        pos_delta = int(getattr(eng, "pos_delta", 0) or 0)
        if embeds is not None:
            logits, cache, n_past = eng_prefill_batched_embeds(
                eng, cfg, embeds, n, cache, positions)
        else:
            ids = np.tile(np.asarray(input_ids, np.int32)[None, :], (n, 1))
            logits, cache, n_past = eng_prefill_batched(eng, cfg, ids, cache,
                                                        pos_delta)

        logp = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1))[0]
        order = np.argsort(-logp)[:n]
        beams = [{"toks": [int(t)], "score": float(logp[t]), "done": int(t) in term}
                 for t in order]
        toks = jnp.asarray(order[:, None].astype(np.int32))

        cfg_step = self._forward_step(cfg)
        while n_past < max_len - 1 and not all(b["done"] for b in beams):
            logits, cache = cfg_step(self.model.params, cache, toks,
                                     jnp.int32(n_past), jnp.int32(pos_delta))
            n_past += 1
            logp = np.asarray(jax.nn.log_softmax(
                logits[:, -1, :].astype(jnp.float32), axis=-1))
            cands = []
            for bi, b in enumerate(beams):
                if b["done"]:
                    cands.append((b["score"], bi, None))
                    continue
                top = np.argsort(-logp[bi])[: n + 1]
                for t in top:
                    cands.append((b["score"] + float(logp[bi][t]), bi, int(t)))
            cands.sort(key=lambda c: -c[0])
            picked = cands[:n]
            new_beams, src = [], []
            for score, bi, t in picked:
                b = beams[bi]
                if t is None:
                    new_beams.append(dict(b))
                    src.append(bi)
                else:
                    new_beams.append({"toks": b["toks"] + [t], "score": score,
                                      "done": t in term})
                    src.append(bi)
            beams = new_beams
            idx = jnp.asarray(np.asarray(src, np.int32))
            cache = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), cache)
            next_toks = [b["toks"][-1] for b in beams]
            toks = jnp.asarray(np.asarray(next_toks, np.int32)[:, None])
            if len(beams[0]["toks"]) >= max_new_tokens:
                break
        beams.sort(key=lambda b: -b["score"])
        return [(b["score"], b["toks"]) for b in beams]

    def _forward_step(self, cfg):
        @partial(jax.jit, donate_argnums=(1,))
        def fwd(params, cache, toks, n_past, pos_delta):
            B = toks.shape[0]
            if cfg.rope is not None and cfg.rope.layout == "glm1":
                # GLM1 2-D positions: stream 0 clamped at the boundary,
                # stream 1 the block position (generate.py decode fns)
                p = n_past + jnp.zeros((B, 1), jnp.int32)
                pos = jnp.stack([jnp.minimum(p, pos_delta),
                                 jnp.maximum(p - pos_delta, 0)])
            else:
                pos = jnp.broadcast_to((n_past + pos_delta)[None, None],
                                       (B, 1))
            return transformer_forward(cfg, params, toks, cache, n_past,
                                       positions=pos)

        return fwd

    def chat(self, user_input: str, streamer=None, gen_config=None) -> str:
        from .chat import MsgRole

        self.history.push_back(MsgRole.USER, user_input)
        ids = self.tokenizer.encode_history(self.history, self.model.cfg.max_length)
        gen_config = gen_config or self.gen_config
        max_new = gen_config.max_new_tokens if gen_config.max_new_tokens > 0 else 128
        results = self._decode_beams_host(ids, max_new)
        if streamer is not None:
            streamer.tokenizer = self.tokenizer
            for score, toks in results[1:]:
                from .streamer import TextType

                streamer.putln(f"{score:.4f}: {self.tokenizer.decode(toks)}",
                               TextType.BEAM_SEARCH)
        best = results[0][1]
        text = self.tokenizer.decode([t for t in best
                                      if not self.tokenizer.is_terminate_token(t)])
        self.history.push_back(MsgRole.ASSISTANT, text)
        if streamer is not None:
            streamer.put([t for t in best if not self.tokenizer.is_terminate_token(t)])
            streamer.end()
        return text


def eng_prefill_batched(eng, cfg, ids: np.ndarray, cache, pos_delta: int = 0):
    """Prefill for a [B, T] batch; returns last-token logits [B, V]."""
    import jax

    @partial(jax.jit, donate_argnums=(1,))
    def prefill(params, cache, ids, pos_delta):
        B, T = ids.shape
        if cfg.rope is not None and cfg.rope.layout == "glm1":
            p = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
            pos = jnp.stack([jnp.minimum(p, pos_delta),
                             jnp.maximum(p - pos_delta, 0)])
        else:
            pos = jnp.broadcast_to(pos_delta + jnp.arange(T)[None, :], (B, T))
        logits, cache = transformer_forward(cfg, params, ids, cache, 0,
                                            positions=pos)
        return logits[:, -1, :], cache

    logits, cache = prefill(eng.params, cache, jnp.asarray(ids),
                            jnp.int32(pos_delta))
    return logits, cache, ids.shape[1]


def eng_prefill_batched_embeds(eng, cfg, embeds, n_beams: int, cache,
                               positions=None):
    """Multimodal beam prefill: [1, T, H] spliced embeddings tiled across
    beams; `positions` optional [A, T] M-RoPE streams."""
    import jax

    @partial(jax.jit, donate_argnums=(1,))
    def prefill(params, cache, embeds, pos):
        logits, cache = transformer_forward(cfg, params, None, cache, 0,
                                            input_embeds=embeds,
                                            positions=pos)
        return logits[:, -1, :], cache

    T = embeds.shape[1]
    tiled = jnp.broadcast_to(jnp.asarray(embeds),
                             (n_beams,) + tuple(embeds.shape[1:]))
    pos = None
    if positions is not None:
        pos = np.atleast_2d(np.asarray(positions, np.int32))
        if pos.shape[0] == 1:       # plain 1-D positions → [B, T]
            pos = jnp.broadcast_to(jnp.asarray(pos[0])[None, :], (n_beams, T))
        else:                       # M-RoPE axis streams → [A, B, T]
            pos = jnp.broadcast_to(jnp.asarray(pos)[:, None, :],
                                   (pos.shape[0], n_beams, T))
    logits, cache = prefill(eng.params, cache, tiled, pos)
    return logits, cache, T