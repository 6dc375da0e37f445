"""Llama family (reference: /root/reference/models/llama.{h,cpp}).

On-disk notes: the converter permutes q/k projection rows into ggml's
interleaved rope layout (/root/reference/convert.py:1360 `permute`,
LlamaConverter.pp:1587), so RoPE here uses the interleaved ("normal") lane
layout and weights load unmodified.
"""
from __future__ import annotations

import math
from dataclasses import replace

from ..nn.transformer import TransformerConfig
from ..ops.rope import ROPE_NEOX, ROPE_NORMAL, RopeConfig
from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor1, BPEProcessor2
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .model_types import ModelType

LLAMA3_REGEX = [
    r"(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+",
]

DEFAULT_V2_SYS_PROMPT = (
    "You are a helpful, respectful and honest assistant. Always answer as "
    "helpfully as possible, while being safe.  Your answers should not include"
    " any harmful, unethical, racist, sexist, toxic, dangerous, or illegal "
    "content. Please ensure that your responses are socially unbiased and "
    "positive in nature.\n\nIf a question does not make any sense, or is not "
    "factually coherent, explain why instead of answering something not "
    "correct. If you don't know the answer to a question, please don't share "
    "false information.")


class Llama2Encoder(HistoryEncoder):
    """[INST] ... [/INST] template (models/llama.cpp:53-85)."""

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if tok.sys_prompt:
            ids.append(tok.bos_token_id)
            ids.extend(tok.encode(f"<<SYS>>\n{tok.sys_prompt}\n<</SYS>>\n\n"))

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        ids.extend(tok.encode(f"[INST] {user}[/INST] "))

    def append_ai(self, round_idx, ai, ids):
        tok = self.tokenizer
        ids.extend(tok.encode(ai))
        ids.append(tok.eos_token_id)

    def append_ai_opening(self, round_idx, ids):
        pass


class Llama3Encoder(HistoryEncoder):
    """<|start_header_id|>role<|end_header_id|> template
    (models/llama.cpp:143-215)."""

    def _header(self, role, ids):
        tok = self.tokenizer
        if tok.start_header_id >= 0:
            ids.append(tok.start_header_id)
            ids.extend(tok.encode(role))
            ids.append(tok.end_header_id)
            ids.append(tok.nl_token_id)
        else:
            ids.append(tok.bos_token_id)
            ids.extend(tok.encode(role))
            ids.append(tok.nl_token_id)

    def _content(self, text, ids):
        tok = self.tokenizer
        ids.extend(tok.encode(text))
        ids.append(tok.eot_id if tok.eot_id >= 0 else tok.eos_token_id)

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        if tok.sys_prompt:
            self._header("system", ids)
            self._content(tok.sys_prompt, ids)

    def append_user(self, round_idx, user, ids):
        self._header("user", ids)
        self._content(user, ids)

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        ids.extend(self.tokenizer.encode(ai))
        ids.append(self.tokenizer.eot_id)

    def append_ai_opening(self, round_idx, ids):
        self._header("assistant", ids)

    def append_user_opening(self, round_idx, ids):
        self._header("user", ids)

    def append_tool(self, round_idx, content, ids):
        self._header("ipython", ids)
        self._content(content, ids)


def make_llama2_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    tp = BPEProcessor1()
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tok = ChatTokenizer(tp, Llama2Encoder(), sys_prompt=DEFAULT_V2_SYS_PROMPT)
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.pad_token_id = tp.piece_to_id("<pad>")
    return tok


def make_llama3_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    tp = BPEProcessor2(LLAMA3_REGEX)
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tok = ChatTokenizer(tp, Llama3Encoder(), sys_prompt="")
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.start_header_id = tp.piece_to_id("<|start_header_id|>")
    tok.end_header_id = tp.piece_to_id("<|end_header_id|>")
    tok.eot_id = tp.piece_to_id("<|eot_id|>")
    tok.nl_token_id = tp.encode("\n")[0]
    if tok.eot_id >= 0:
        tok.terminate_ids.add(tok.eot_id)
    tok.is_special_id = lambda i: i in (tok.start_header_id, tok.end_header_id, tok.eot_id)
    return tok


def _llama31_factors(rot: int, base: float, factor: float, low_f: float,
                     high_f: float, orig_ctx: int) -> tuple:
    """Llama-3.1 'llama3' rope scaling as per-dim frequency divisors
    (inv_freq / factor_i); same formula as HF `_compute_llama3_parameters`."""
    factors = []
    low_wavelen = orig_ctx / low_f
    high_wavelen = orig_ctx / high_f
    for i in range(rot // 2):
        freq = base ** (-2.0 * i / rot)
        wavelen = 2.0 * math.pi / freq
        if wavelen < high_wavelen:
            factors.append(1.0)
        elif wavelen > low_wavelen:
            factors.append(factor)
        else:
            smooth = (orig_ctx / wavelen - low_f) / (high_f - low_f)
            factors.append(1.0 / ((1.0 - smooth) / factor + smooth))
    return tuple(factors)


def build_dense_config(base: BaseConfig, *, num_key_value_heads=None,
                       rope_theta=10000.0, rope_layout=ROPE_NORMAL,
                       head_dim=-1, tie_lm_head=False, norm_eps=1e-5,
                       freq_factors=None, qkv_bias=False, max_length=-1,
                       sliding_window=0, qk_norm="none",
                       cache_dtype="bfloat16") -> TransformerConfig:
    rope = RopeConfig(
        head_dim=(head_dim if head_dim > 0 else base.hidden_size // base.num_attention_heads),
        freq_base=rope_theta, layout=rope_layout, freq_factors=freq_factors)
    specs = ()
    if sliding_window > 0:
        from ..nn.transformer import LayerSpec
        specs = tuple(LayerSpec(sliding_window=sliding_window)
                      for _ in range(base.num_hidden_layers))
    return TransformerConfig(
        vocab_size=base.vocab_size,
        hidden_size=base.hidden_size,
        num_hidden_layers=base.num_hidden_layers,
        num_attention_heads=base.num_attention_heads,
        num_key_value_heads=num_key_value_heads or base.num_attention_heads,
        intermediate_size=base.intermediate_size,
        max_length=max_length if max_length > 0 else base.max_length,
        head_dim=head_dim,
        norm_eps=norm_eps,
        rope=rope,
        qkv_bias=qkv_bias,
        tie_lm_head=tie_lm_head,
        qk_norm=qk_norm,
        layer_specs=specs,
        cache_dtype=cache_dtype,
    )


@register_model(ModelType.LLAMA2, ModelType.CODELLAMA)
class Llama2(BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, _ = BaseConfig.parse(gf)
        cfg = build_dense_config(base, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tok = make_llama2_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.LLAMA3, ModelType.LLAMA3_GROQ_TOOL)
class Llama3(BaseLLM):
    EXTRA_FMT = "if"   # num_key_value_heads, rope_theta (models/llama.h:103)

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tok = make_llama3_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.LLAMA3_1)
class Llama31(BaseLLM):
    # v3 config + rope_scaling {orig_max_pos, factor, low_freq, high_freq}
    # (models/llama.h:154-160)
    EXTRA_FMT = "ififff"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        n_kv, rope_theta, orig_ctx, factor, low_f, high_f = extra
        rot = base.hidden_size // base.num_attention_heads
        ff = _llama31_factors(rot, rope_theta, factor, low_f, high_f, orig_ctx)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, freq_factors=ff,
                                 max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        tok = make_llama3_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.LLAMA3_2)
class Llama32(Llama31):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        # v3_1 fields + i32 tie_word_embeddings (models/llama.h:211-214)
        base, extra = BaseConfig.parse(gf, "ififffi")
        n_kv, rope_theta, orig_ctx, factor, low_f, high_f, tie_flag = extra
        rot = base.hidden_size // base.num_attention_heads
        ff = _llama31_factors(rot, rope_theta, factor, low_f, high_f, orig_ctx)
        tie = bool(tie_flag) or not gf.has_tensor("lm_head.weight")
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, freq_factors=ff,
                                 tie_lm_head=tie, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tok = make_llama3_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers, tie_lm_head=tie)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.DEEPSEEK_R1_DISTILL_LLAMA)
class DSR1DistillLlama(Llama32):
    """DeepSeek-R1-Distill-Llama: llama v3_2 config + the DeepSeek chat
    template/tokenizer (llama.cpp ds_r1_distill:611-700)."""

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .qwen import make_ds_r1_tokenizer

        base, extra = BaseConfig.parse(gf, "ififffi")
        n_kv, rope_theta, orig_ctx, factor, low_f, high_f, tie_flag = extra
        rot = base.hidden_size // base.num_attention_heads
        ff = _llama31_factors(rot, rope_theta, factor, low_f, high_f, orig_ctx)
        tie = bool(tie_flag) or not gf.has_tensor("lm_head.weight")
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, freq_factors=ff,
                                 tie_lm_head=tie, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tok = make_ds_r1_tokenizer(gf, base, llama=True)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers,
                                          tie_lm_head=tie)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


class Llama4Encoder(HistoryEncoder):
    """<|header_start|>role<|header_end|>\\n\\n{content}<|eot|> (llama.cpp v4
    tokenizer reuses the v3 encoder with renamed specials)."""

    def _header(self, role, ids):
        tok = self.tokenizer
        ids.append(tok.start_header_id)
        ids.extend(tok.encode(role))
        ids.append(tok.end_header_id)
        ids.extend(tok.encode("\n\n"))

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        if tok.sys_prompt:
            self._header("system", ids)
            ids.extend(tok.encode(tok.sys_prompt))
            ids.append(tok.eot_id)

    def append_user(self, round_idx, user, ids):
        self._header("user", ids)
        ids.extend(self.tokenizer.encode(user))
        ids.append(self.tokenizer.eot_id)

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        ids.extend(self.tokenizer.encode(ai))
        ids.append(self.tokenizer.eot_id)

    def append_ai_opening(self, round_idx, ids):
        self._header("assistant", ids)


@register_model(ModelType.LLAMA4)
class Llama4(BaseLLM):
    """Llama-4 Scout/Maverick text model (models/llama.h v4:347-600):
    interleaved MoE layers (sigmoid top-k with PRE-weighting + shared
    expert), NoPE every 4th layer, optional weightless post-rope qk L2 norm,
    llama3-style per-dim rope factors.  Long-context attn temperature
    tuning matches the reference (unsupported; context capped at 8192 -
    use --max_length)."""
    # v2 config + 8i {n_kv, attention_chunk_size, head_dim, interleave_step,
    # inter_mlp, experts_per_tok, n_routed, use_qk_norm} + f aux + f theta +
    # i orig + 3f {factor, low_f, high_f}
    EXTRA_FMT = "8i2fi3f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..nn.transformer import LayerSpec
        from ..tokenizer.processor import BPEProcessor2
        from .base import load_moe_experts

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, _chunk, head_dim, interleave, inter_mlp, n_active, n_routed,
         use_qk_norm) = extra[:8]
        (_aux, rope_theta) = extra[8:10]
        orig_max = extra[10]
        factor, low_f, high_f = extra[11:14]
        n_layers = base.num_hidden_layers
        rot = head_dim if head_dim > 0 else base.hidden_size // base.num_attention_heads
        ff = (_llama31_factors(rot, rope_theta, factor, low_f, high_f, orig_max)
              if orig_max > 0 else None)

        def is_moe(i):
            return (i + 1) % max(interleave, 1) == 0

        specs = tuple(
            LayerSpec(is_moe=is_moe(i), use_rope=((i + 1) % 4 != 0))
            for i in range(n_layers))
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 head_dim=head_dim, rope_theta=rope_theta,
                                 freq_factors=ff,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        # HF Llama4 rotates ADJACENT pairs (complex view) — ROPE_NORMAL with
        # unpermuted weights
        cfg = replace(cfg, layer_specs=specs,
                      qk_norm="l2norm_post" if use_qk_norm else "none",
                      moe_num_experts=n_routed, moe_top_k=n_active,
                      moe_score_func="sigmoid", moe_norm_topk_prob=False,
                      moe_pre_weighting=True)
        tp = BPEProcessor2(LLAMA3_REGEX)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tok = ChatTokenizer(tp, Llama4Encoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        tok.start_header_id = tp.piece_to_id("<|header_start|>")
        tok.end_header_id = tp.piece_to_id("<|header_end|>")
        tok.eot_id = tp.piece_to_id("<|eot|>")
        if tok.eot_id >= 0:
            tok.terminate_ids.add(tok.eot_id)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "lm_head": pb.linear("lm_head"),
            "layers": [],
        }
        for i in range(n_layers):
            pfx = f"model.layers.{i}"
            if is_moe(i):
                mlp = {
                    "gate": pb.linear(f"{pfx}.mlp.gate", bias=False),
                    "experts": load_moe_experts(pb, f"{pfx}.mlp", n_routed),
                    "shared": {
                        "gate": pb.linear(f"{pfx}.mlp.shared_expert.gate_proj"),
                        "up": pb.linear(f"{pfx}.mlp.shared_expert.up_proj"),
                        "down": pb.linear(f"{pfx}.mlp.shared_expert.down_proj"),
                    },
                }
            else:
                mlp = {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                }
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "attn": {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                },
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": mlp,
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# LLAMA_MULTI: multi-token prediction (reference models/llama.h:245
# MultiPredModel).  Trunk = layers 0..L-2; prediction heads = layer L-1 plus
# `n_future_tokens - 1` extra llama blocks ("model.extra_heads.N."), each fed
# the trunk output and emitting one future token's logits per step.  The
# generate loop samples all head logits in order and feeds them back as the
# next step's input (reference src/models.cpp:1029-1037 samples
# logits.size()/vocab tokens per forward).
# ---------------------------------------------------------------------------

@register_model(ModelType.LLAMA_MULTI)
class LlamaMulti(BaseLLM):
    EXTRA_FMT = "ifi"   # n_kv, rope_theta, n_future_tokens (llama.h:248)

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_theta, n_future) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tok = make_llama2_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        extra = []
        for j in range(n_future - 1):
            pfx = f"model.extra_heads.{j}"
            extra.append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "attn": {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                },
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                },
            })
        params["extra_heads"] = tuple(extra)
        m = cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)
        m.n_future_tokens = n_future
        # --set n_future_tokens N limits how many heads run
        # (reference set_additional_args / set_n_future_tokens)
        eff = int(rt.additional.get("n_future_tokens", n_future))
        m.effective_n = max(1, min(eff, n_future))
        return m

    def _multi_cache(self, batch, max_len):
        from dataclasses import replace as _rep

        from ..nn.transformer import init_cache

        n_heads = self.n_future_tokens
        c = init_cache(_rep(self.cfg, num_hidden_layers=(
            self.cfg.num_hidden_layers - 1 + n_heads)), batch, max_len)
        return c

    def _multi_step(self, params, cache, ids, n_past):
        """One forward: trunk + all effective heads.  Returns
        (logits [n_eff, V] f32, new cache)."""
        import jax.numpy as jnp

        from ..nn.transformer import (KVCache, _norm, decoder_layer,
                                      embed_tokens, lm_logits)
        from ..ops.rope import precompute_rope_cache

        cfg = self.cfg
        L = cfg.num_hidden_layers
        B, T = ids.shape
        x = embed_tokens(cfg, params, ids)
        positions = jnp.broadcast_to(n_past + jnp.arange(T)[None, :], (B, T))
        cos, sin = precompute_rope_cache(positions, cfg.rope)
        ks, vs = list(cache.k), list(cache.v)
        spec = cfg.layer_spec(0)
        for i in range(L - 1):
            x, ks[i], vs[i], _, _ = decoder_layer(
                cfg, spec, params["layers"][i], x, cos, sin, ks[i], vs[i],
                n_past)
        heads = [params["layers"][L - 1]] + list(params["extra_heads"])
        outs = []
        for j in range(self.effective_n):
            ci = L - 1 + j
            h, ks[ci], vs[ci], _, _ = decoder_layer(
                cfg, spec, heads[j], x, cos, sin, ks[ci], vs[ci], n_past)
            h = _norm(cfg, h[:, -1:, :], params["final_norm"])
            outs.append(lm_logits(cfg, params, h)[:, 0])
        return jnp.stack(outs, axis=1)[0], KVCache(k=tuple(ks), v=tuple(vs))

    def forward_logits(self, input_ids, n_past: int = 0, cache=None):
        """Head-0 full-sequence logits are not defined for this model;
        return the per-head last-token logits instead (testing)."""
        import numpy as np

        ids = np.atleast_2d(np.asarray(input_ids, np.int32))
        if cache is None:
            cache = self._multi_cache(ids.shape[0], self.cfg.max_length)
        return self._multi_step(self.params, cache, ids, n_past)

    def generate(self, input_ids, gen_cfg, *, is_terminator=lambda t: False,
                 on_token=None, perf=None, cache=None, n_past=0,
                 completion_limit=-1, should_stop=lambda: False,
                 terminate_seq=None, **_kw):
        import time

        import jax
        import numpy as np

        from ..ops.sampling import (PenaltyState, penalty_accept,
                                    sample_token)

        scfg = gen_cfg.sampler_config()
        max_len = self.cfg.max_length if gen_cfg.max_length <= 0 else min(
            gen_cfg.max_length, self.cfg.max_length)
        max_new = completion_limit if completion_limit > 0 else (
            gen_cfg.max_new_tokens if gen_cfg.max_new_tokens > 0 else max_len)
        if cache is None:
            cache = self._multi_cache(1, max_len)
        step = jax.jit(lambda p, c, i, n: self._multi_step(p, c, i, n))
        penalty = PenaltyState.init(self.cfg.vocab_size, scfg.penalty_window)
        key = jax.random.key(gen_cfg.seed or 0)
        out: list[int] = []
        cur = list(input_ids)
        t0 = time.perf_counter()
        first = True
        done = False
        while not done and cur and len(out) < max_new and \
                n_past + len(cur) < max_len and not should_stop():
            logits, cache = step(self.params, cache,
                                 np.asarray(cur, np.int32)[None, :],
                                 np.int32(n_past))
            n_past += len(cur)
            if first and perf:
                perf.prompt_tokens += len(cur)
                perf.prompt_ms += (time.perf_counter() - t0) * 1000
            first = False
            cur = []
            lh = np.asarray(logits)
            for j in range(lh.shape[0]):
                key, sub = jax.random.split(key)
                tok, _ = sample_token(lh[j], scfg, sub, penalty)
                t = int(tok)
                penalty = penalty_accept(penalty, tok)
                if is_terminator(t) or len(out) >= max_new:
                    done = True
                    break
                cur.append(t)
                out.append(t)
                if on_token:
                    on_token(t)
        if perf:
            perf.gen_tokens += len(out)
        return out, cache, n_past
