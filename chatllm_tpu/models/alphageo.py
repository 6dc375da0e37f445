"""AlphaGeometry LM (reference /root/reference/models/alphageo.cpp): a
Meliad-style transformer — queries attend ONLY to strictly-previous keys
(window-limited), q/k are L2-normalized per head, scores get a T5
relative-position bucket bias plus a learned per-head scale, and the
softmax is "safe" (a virtual min_x logit joins the denominator, so the
first token gets an all-zero context instead of NaN).

The reference runs it with batch_input=false (one token per step,
alphageo.cpp:560), so the engine here is a host loop over a jitted
single-token step.  Output terminates on the " ;" token.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norm import rms_norm
from ..ops.qmm import matmul
from .base import BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig, register_model
from .model_types import ModelType

MASK_VALUE = -1.0e6       # rel_pos_diag_mask_params.value (alphageo.cpp:215)
SOFTMAX_MIN_X = -1000.0   # safe_softmax_param.min_x


def rel_pos_bucket(dist, num_buckets: int, max_distance: int):
    """relative_position_bucket (alphageo.cpp:473, bidirectional=False):
    dist = query_pos - key_pos >= 0; exact buckets below num_buckets/2,
    log-spaced above."""
    max_exact = num_buckets // 2
    d = jnp.maximum(dist, 0)
    df = jnp.maximum(d.astype(jnp.float32), 1.0)
    large = max_exact + jnp.floor(
        jnp.log(df / max_exact) * (num_buckets - max_exact)
        / math.log(max_distance / max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return jnp.where(d < max_exact, d, large)


def _l2n(x):
    # meliad kq norm (alphageo.cpp:42): x / sqrt(sum(x^2) + eps)
    xf = x.astype(jnp.float32)
    return xf / jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-6)


@register_model(ModelType.ALPHAGEO_LM)
class AlphaGeoLM(BaseLLM):
    EXTRA_FMT = "3i"   # window_len, max_distance, num_buckets (alphageo.cpp:6)

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..nn.transformer import TransformerConfig
        from ..runtime.chat import ChatTokenizer
        from ..tokenizer.processor import (TextPrepAddLeadingSpace,
                                           UnigramProcessor)

        base, (window_len, max_distance, num_buckets) = BaseConfig.parse(
            gf, cls.EXTRA_FMT)
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=base.num_attention_heads,
            intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            act="relu", norm_eps=1e-6, rope=None, tie_lm_head=True,
            cache_dtype="float32")
        tp = UnigramProcessor(3)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.register_preprocessor(TextPrepAddLeadingSpace())
        tok = ChatTokenizer(tp, None, sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        tok.auto_add_bos = False
        tok.comma_tok_id = tp.piece_to_id(" ;")
        tok.terminate_ids.add(tok.comma_tok_id)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "layers": [],
        }
        for i in range(base.num_hidden_layers):
            pfx = f"model.layers.{i}"
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "attn": {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                    "scale": pb.array(f"{pfx}.self_attn.attention_scale.weight"),
                    "rel": pb.array(f"{pfx}.rel_embedding.weight"),  # [B_k, H]
                },
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": {
                    "up": pb.linear(f"{pfx}.mlp.hidden0"),
                    "down": pb.linear(f"{pfx}.mlp.output_layer"),
                },
            })
        params["layers"] = tuple(params["layers"])
        m = cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)
        m.window_len = window_len
        m.max_distance = max_distance
        m.num_buckets = num_buckets
        return m

    # -- custom single-token engine ------------------------------------------

    def _new_cache(self, max_len: int):
        cfg = self.cfg
        d = cfg.hidden_size // cfg.num_attention_heads
        z = jnp.zeros((cfg.num_hidden_layers, max_len,
                       cfg.num_attention_heads, d), jnp.float32)
        return (z, z)

    @partial(jax.jit, static_argnums=0)
    def _step(self, params, cache, tok_id, n_past):
        """One token forward.  tok_id: int32 scalar; returns (logits [V],
        new cache)."""
        cfg = self.cfg
        H = cfg.num_attention_heads
        d = cfg.hidden_size // H
        ks, vs = cache
        S = ks.shape[1]
        x = params["embed"][tok_id][None, :].astype(jnp.float32)  # [1, Hd]

        slot = jnp.arange(S)
        live = (slot < n_past) & (slot >= n_past - self.window_len)
        dist = n_past - slot                                      # >= 1 live
        bucket = rel_pos_bucket(dist, self.num_buckets, self.max_distance)

        new_ks, new_vs = [], []
        for i, p in enumerate(params["layers"]):
            h = rms_norm(x, p["attn_norm"]["w"], eps=cfg.norm_eps)
            a = p["attn"]
            q = matmul(h, a["q"]).reshape(H, d)
            k = matmul(h, a["k"]).reshape(H, d)
            v = matmul(h, a["v"]).reshape(H, d)
            kc = ks[i].at[n_past % S].set(k.astype(jnp.float32))
            vc = vs[i].at[n_past % S].set(v.astype(jnp.float32))
            new_ks.append(kc)
            new_vs.append(vc)
            qn = _l2n(q)                                          # [H, d]
            kn = _l2n(kc)                                         # [S, H, d]
            scores = jnp.einsum("hd,shd->hs", qn, kn)
            bias = a["rel"][bucket].T.astype(jnp.float32)         # [H, S]
            scores = (scores + bias) * a["scale"][:, None]
            scores = jnp.where(live[None, :], scores, MASK_VALUE)
            # safe softmax (alphageo.cpp:154): a virtual min_x logit joins
            # the denominator — all-masked rows give all-zero probs
            m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True),
                            SOFTMAX_MIN_X)
            e = jnp.exp(scores - m)
            denom = jnp.sum(e, axis=-1, keepdims=True) + jnp.exp(
                SOFTMAX_MIN_X - m)
            probs = e / denom
            ctx = jnp.einsum("hs,shd->hd", probs, vc)
            attn_out = matmul(ctx.reshape(1, H * d), a["o"])
            x = x + attn_out
            h2 = rms_norm(x, p["ffn_norm"]["w"], eps=cfg.norm_eps)
            mlp = matmul(jax.nn.relu(matmul(h2, p["mlp"]["up"])), p["mlp"]["down"])
            x = x + mlp
        x = rms_norm(x, params["final_norm"]["w"], eps=cfg.norm_eps)
        logits = jnp.dot(x, params["embed"].T.astype(x.dtype))[0]
        return logits, (jnp.stack(new_ks), jnp.stack(new_vs))

    def forward_logits(self, input_ids, n_past: int = 0, cache=None):
        ids = np.atleast_2d(np.asarray(input_ids, np.int32))[0]
        if cache is None:
            cache = self._new_cache(self.cfg.max_length)
        outs = []
        for t in ids:
            logits, cache = self._step(self.params, cache, jnp.int32(t),
                                       jnp.int32(n_past))
            n_past += 1
            outs.append(logits)
        return jnp.stack(outs)[None], cache

    def generate(self, input_ids, gen_cfg, *, is_terminator=lambda t: False,
                 on_token=None, perf=None, cache=None, n_past=0,
                 completion_limit=-1, should_stop=lambda: False,
                 terminate_seq=None, **_kw):
        import time

        from ..ops.sampling import PenaltyState, penalty_accept, sample_token

        scfg = gen_cfg.sampler_config()
        max_len = self.cfg.max_length if gen_cfg.max_length <= 0 else min(
            gen_cfg.max_length, self.cfg.max_length)
        max_new = completion_limit if completion_limit > 0 else (
            gen_cfg.max_new_tokens if gen_cfg.max_new_tokens > 0 else max_len)
        if cache is None:
            cache = self._new_cache(max_len)
        penalty = PenaltyState.init(self.cfg.vocab_size, scfg.penalty_window)
        key = jax.random.key(gen_cfg.seed or 0)
        t0 = time.perf_counter()
        logits = None
        for t in input_ids:
            logits, cache = self._step(self.params, cache, jnp.int32(int(t)),
                                       jnp.int32(n_past))
            n_past += 1
        if perf:
            perf.prompt_tokens += len(input_ids)
            perf.prompt_ms += (time.perf_counter() - t0) * 1000
        out: list[int] = []
        while len(out) < max_new and n_past < max_len and not should_stop():
            key, sub = jax.random.split(key)
            tok, _ = sample_token(logits, scfg, sub, penalty)
            t = int(tok)
            penalty = penalty_accept(penalty, tok)
            if is_terminator(t):
                break
            out.append(t)
            if on_token:
                on_token(t)
            logits, cache = self._step(self.params, cache, jnp.int32(t),
                                       jnp.int32(n_past))
            n_past += 1
        if perf:
            perf.gen_tokens += len(out)
        return out, cache, n_past
