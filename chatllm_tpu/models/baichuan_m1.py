"""Baichuan-M1 (reference /root/reference/models/baichuan.cpp:116 m1).

Alternating full/SWA(8192) attention layers with DIFFERENT head counts per
layer kind (num_swa_attention_heads vs num_attention_heads), plus a 2-tap
causal FIR filter on the rotated keys and raw values before caching
(FIR2, src/layers.cpp:2253: y_t = w0·x_{t-1} + w1·x_t with per-kv-head
scalar taps).

The reference runs this one token at a time (batch_input=false,
baichuan.cpp:404); here the forward is chunked TPU-style: the FIR uses a
time-shifted concat, and the pre-FIR k/v of a chunk's last position is
carried between chunks in one extra cache slot per layer (slot S of the
[B, S+1, H, D] cache), keeping the cache pytree uniform.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import attention_with_cache, update_kv_cache
from ..ops.norm import rms_norm
from ..ops.qmm import matmul
from ..ops.rope import ROPE_NORMAL, RopeConfig, apply_rope, precompute_rope_cache
from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor1
from .base import BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig, register_model
from .model_types import ModelType


class BaichuanM1Encoder(HistoryEncoder):
    """<B_SYS>{sys}<C_Q>{user}<C_A>{ai} (baichuan.cpp m1
    ChatHistoryEncoder; ids 71-76 fallback when added_tokens absent)."""

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if tok.sys_prompt:
            ids.append(tok.b_sys_token_id)
            ids.extend(tok.encode(tok.sys_prompt))

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        ids.append(tok.c_q_token_id)
        ids.extend(tok.encode(user))

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        ids.extend(self.tokenizer.encode(ai))

    def append_ai_opening(self, round_idx, ids):
        ids.append(self.tokenizer.c_a_token_id)


@register_model(ModelType.BAICHUAN_M1)
class BaichuanM1(BaseLLM):
    # BaseConfig + {n_kv, conv_window, n_swa_heads, n_swa_kv,
    # sliding_window, swa_pattern} + rope_theta (baichuan.cpp:118-128)
    EXTRA_FMT = "6if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..nn.transformer import TransformerConfig

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, conv_window, n_swa_heads, n_swa_kv, window, pattern) = extra[:6]
        rope_theta = extra[6]
        assert conv_window == 2, "FIR2 requires conv_window == 2"
        head_dim = base.hidden_size // base.num_attention_heads
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv,
            intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            norm_eps=1e-6,
            rope=RopeConfig(head_dim=head_dim, freq_base=rope_theta,
                            layout=ROPE_NORMAL),
            cache_dtype=rt.cache_dtype)
        tp = BPEProcessor1()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        rid = tp.piece_to_id("<reserved_147>")
        if rid >= 0:
            tp.override_token_decoding(rid, "<think>")
        rid = tp.piece_to_id("<reserved_148>")
        if rid >= 0:
            tp.override_token_decoding(rid, "</think>")
        tok = ChatTokenizer(tp, BaichuanM1Encoder(),
                            sys_prompt="You are a helpful assistant.")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        tok.terminate_ids.add(base.eos_token_id)
        for name, fb in (("b_sys", 71), ("b_usys", 72), ("c_q", 73),
                         ("c_a", 74), ("b_func", 75), ("b_code", 76)):
            tid = tp.piece_to_id(f"<{name.upper()}>")
            setattr(tok, f"{name}_token_id", tid if tid >= 0 else fb)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "lm_head": pb.linear("lm_head"),
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
                    # [n_kv_l, 2] per-head FIR taps
                    "conv_k": pb.array(f"{pfx}.self_attn.conv_k"),
                    "conv_v": pb.array(f"{pfx}.self_attn.conv_v"),
                },
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                },
            })
        params["layers"] = tuple(params["layers"])
        m = cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)
        m.swa_heads = (n_swa_heads, n_swa_kv)
        m.sliding_window = window
        m.swa_pattern = max(pattern, 1)
        return m

    def is_swa_layer(self, i: int) -> bool:
        # baichuan.cpp:410 is_swa_layer: layer_index % pattern == 1
        return i % self.swa_pattern == 1

    def _new_cache(self, batch: int, max_len: int):
        cfg = self.cfg
        d = cfg.hidden_size // cfg.num_attention_heads
        ks, vs = [], []
        for i in range(cfg.num_hidden_layers):
            hkv = self.swa_heads[1] if self.is_swa_layer(i) else cfg.num_key_value_heads
            # +1 slot: pre-FIR k/v of the previous chunk's last position
            ks.append(jnp.zeros((batch, max_len + 1, hkv, d), jnp.float32))
            vs.append(jnp.zeros((batch, max_len + 1, hkv, d), jnp.float32))
        return (tuple(ks), tuple(vs))

    @staticmethod
    def _fir2(x, state, taps):
        """y_t = w0·x_{t-1} + w1·x_t over the time axis (FIR2,
        src/layers.cpp:2253).  x: [B,T,H,D]; state: [B,1,H,D] (x_{-1});
        taps: [H,2] broadcast over D."""
        prev = jnp.concatenate([state, x[:, :-1]], axis=1)
        w0 = taps[:, 0][None, None, :, None]
        w1 = taps[:, 1][None, None, :, None]
        return w0 * prev + w1 * x

    @partial(jax.jit, static_argnums=(0, 4))
    def _forward(self, params, cache, ids, T: int, n_past):
        cfg = self.cfg
        d = cfg.hidden_size // cfg.num_attention_heads
        B = ids.shape[0]
        x = jnp.take(params["embed"], ids, axis=0).astype(jnp.float32)
        positions = jnp.broadcast_to(n_past + jnp.arange(T)[None, :], (B, T))
        cos, sin = precompute_rope_cache(positions, cfg.rope)
        ks, vs = list(cache[0]), list(cache[1])
        S = ks[0].shape[1] - 1
        for i, p in enumerate(params["layers"]):
            swa = self.is_swa_layer(i)
            hq = self.swa_heads[0] if swa else cfg.num_attention_heads
            hkv = self.swa_heads[1] if swa else cfg.num_key_value_heads
            a = p["attn"]
            h = rms_norm(x, p["attn_norm"]["w"], eps=cfg.norm_eps)
            q = matmul(h, a["q"]).reshape(B, T, hq, d)
            k = matmul(h, a["k"]).reshape(B, T, hkv, d)
            v = matmul(h, a["v"]).reshape(B, T, hkv, d)
            q = apply_rope(q, cos, sin, layout=cfg.rope.layout)
            k = apply_rope(k, cos, sin, layout=cfg.rope.layout)
            # FIR over rotated k / raw v; state slot S holds x_{-1}
            k_state = ks[i][:, S:S + 1]
            v_state = vs[i][:, S:S + 1]
            kf = self._fir2(k.astype(jnp.float32), k_state, a["conv_k"])
            vf = self._fir2(v.astype(jnp.float32), v_state, a["conv_v"])
            kc, vc, _, _ = update_kv_cache(
                ks[i][:, :S], vs[i][:, :S], kf, vf, n_past)
            out = attention_with_cache(
                q.astype(jnp.float32), kc, vc, n_past, T,
                scale=d ** -0.5, causal=True,
                sliding_window=self.sliding_window if swa else 0)
            # stash this chunk's last pre-FIR k/v into the state slot
            ks[i] = jnp.concatenate([kc, k[:, -1:].astype(jnp.float32)], axis=1)
            vs[i] = jnp.concatenate([vc, v[:, -1:].astype(jnp.float32)], axis=1)
            out = out.reshape(B, T, hq * d)
            x = x + matmul(out, a["o"])
            h2 = rms_norm(x, p["ffn_norm"]["w"], eps=cfg.norm_eps)
            g = matmul(h2, p["mlp"]["gate"])
            u = matmul(h2, p["mlp"]["up"])
            x = x + matmul(jax.nn.silu(g) * u, p["mlp"]["down"])
        x = rms_norm(x, params["final_norm"]["w"], eps=cfg.norm_eps)
        logits = matmul(x, params["lm_head"])
        return logits, (tuple(ks), tuple(vs))

    def forward_logits(self, input_ids, n_past: int = 0, cache=None):
        ids = np.atleast_2d(np.asarray(input_ids, np.int32))
        if cache is None:
            cache = self._new_cache(ids.shape[0], self.cfg.max_length)
        return self._forward(self.params, cache, jnp.asarray(ids),
                             ids.shape[1], jnp.int32(n_past))

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
            cache = self._new_cache(1, max_len)
        penalty = PenaltyState.init(self.cfg.vocab_size, scfg.penalty_window)
        key = jax.random.key(gen_cfg.seed or 0)
        t0 = time.perf_counter()
        ids = np.asarray(input_ids, np.int32)[None, :]
        logits, cache = self._forward(self.params, cache, jnp.asarray(ids),
                                      ids.shape[1], jnp.int32(n_past))
        n_past += ids.shape[1]
        if perf:
            perf.prompt_tokens += ids.shape[1]
            perf.prompt_ms += (time.perf_counter() - t0) * 1000
        out: list[int] = []
        last = np.asarray(logits)[0, -1]
        while len(out) < max_new and n_past < max_len and not should_stop():
            key, sub = jax.random.split(key)
            tok, _ = sample_token(last, scfg, sub, penalty)
            t = int(tok)
            penalty = penalty_accept(penalty, tok)
            if is_terminator(t):
                break
            out.append(t)
            if on_token:
                on_token(t)
            logits, cache = self._forward(
                self.params, cache, jnp.full((1, 1), t, jnp.int32), 1,
                jnp.int32(n_past))
            n_past += 1
            last = np.asarray(logits)[0, -1]
        if perf:
            perf.gen_tokens += len(out)
        return out, cache, n_past
