"""Round-2 small-arch wave: Apriel, Reka-Flash-3, RNJ-1, JiuTian,
CodeFuse-DeepSeek (reference models/{apriel,reka,rnj,jiutian,codefuse}.cpp).

Each is a config/template variant over an existing block family; the rope
setups are reproduced from their ConditionalGeneration ctors."""
from __future__ import annotations

from dataclasses import replace

import numpy as np

from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor2
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .llama import build_dense_config
from .model_types import ModelType

APRIEL_REGEX = [
    r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*[\p{Ll}\p{Lm}\p{Lo}\p{M}]+|[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+[\p{Ll}\p{Lm}\p{Lo}\p{M}]*|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n/]*|\s*[\r\n]+|\s+(?!\S)|\s+",
]

REKA_REGEX = [
    r"(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+",
]


class BracketRoleEncoder(HistoryEncoder):
    """<|system|>\\n.. / <|user|>\\n.. / <|assistant|>\\n.. turns
    (reference HistoryEncoderBracketRole, src/chat_encoders.cpp:104-151)
    with per-model role endings."""

    ending = ""
    auto_add_bos = True

    def _end(self, ids):
        if self.ending:
            ids.extend(self.tokenizer.encode(self.ending))

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if self.auto_add_bos and tok.bos_token_id >= 0:
            ids.append(tok.bos_token_id)
        if tok.sys_prompt:
            ids.extend(tok.encode(f"<|system|>\n{tok.sys_prompt}"))
            self._end(ids)

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode(f"<|user|>\n{user}"))
        self._end(ids)

    def append_ai(self, round_idx, ai, ids):
        ids.extend(self.tokenizer.encode(f"<|assistant|>\n{ai}"))
        self._end(ids)

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("<|assistant|>\n"))


class AprielEncoder(BracketRoleEncoder):
    ending = "\n<|end|>\n"


@register_model(ModelType.APRIEL)
class Apriel(BaseLLM):
    """Apriel: llama-v3 blocks + YaRN + bracket-role template with
    <|end|> endings (models/apriel.cpp)."""
    # llama v3 {n_kv, rope_theta} + {head_dim, orig_max} i +
    # {beta_fast, beta_slow, factor} f
    EXTRA_FMT = "if2i3f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, rope_theta, head_dim, orig_max, beta_fast, beta_slow,
         factor) = extra
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, head_dim=head_dim,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        if factor > 1.0 and orig_max > 0:
            cfg = replace(cfg, rope=replace(
                cfg.rope, freq_scale=1.0 / factor, ext_factor=1.0,
                attn_factor=1.0, beta_fast=beta_fast, beta_slow=beta_slow,
                orig_ctx=orig_max))
        tp = BPEProcessor2(APRIEL_REGEX)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        tok = ChatTokenizer(tp, AprielEncoder(),
                            sys_prompt="You are a helpful AI assistant that "
                            "provides accurate and concise information.")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        end = tp.piece_to_id("<|end|>")
        if end >= 0:
            tok.terminate_ids.add(end)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


class RekaEncoder(HistoryEncoder):
    """'human: ... <sep> assistant: ... <sep>' plain-text turns
    (models/reka.cpp:6-37)."""

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        text = "human: "
        if round_idx == 0 and tok.sys_prompt:
            text += tok.sys_prompt + " "
        ids.extend(tok.encode(text + user + " <sep> "))

    def append_ai(self, round_idx, ai, ids):
        ids.extend(self.tokenizer.encode(f"assistant: {ai} <sep> "))

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("assistant: "))


@register_model(ModelType.REKA_FLASH3)
class RekaFlash3(BaseLLM):
    """Reka-Flash-3: llama-v3 arch; generation terminates on the token
    SEQUENCE ' <sep>' (models/reka.cpp is_output_terminated:82-108 — the
    engine's terminate_seq holdback reproduces it)."""
    EXTRA_FMT = "if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tp = BPEProcessor2(REKA_REGEX)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tok = ChatTokenizer(tp, RekaEncoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        tok.terminate_seq = tp.encode(" <sep>")
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.RNJ_1)
class RNJ1(BaseLLM):
    """RNJ-1 (Essential AI): gemma3 arch + YaRN + attention/final softcaps
    (models/rnj.cpp)."""
    # gemma3 "5i3f" + {attn_factor, beta_fast, beta_slow,
    # extrapolation_factor, factor} 5f + orig_max i + {final_cap, attn_cap} 2f
    EXTRA_FMT = "5i3f5fi2f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .gemma import Gemma3

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (attn_factor, beta_fast, beta_slow, ext_factor, factor) = extra[8:13]
        orig_max = extra[13]
        final_cap, attn_cap = extra[14:16]
        model = Gemma3.load(gf, rt)
        cfg = model.cfg
        if factor > 1.0 and orig_max > 0:
            cfg = replace(cfg, rope=replace(
                cfg.rope, freq_scale=1.0 / factor, ext_factor=ext_factor,
                attn_factor=attn_factor, beta_fast=beta_fast,
                beta_slow=beta_slow, orig_ctx=orig_max))
        cfg = replace(cfg,
                      logit_softcap=max(0.0, attn_cap),
                      final_logit_softcap=max(0.0, final_cap))
        tok = model.tokenizer
        tok.sys_prompt = "You are rnj-1, a foundation model trained by Essential AI.\n"
        m = cls(gf.model_type, cfg, model.params, tok,
                native_config=base, meta=gf.meta)
        return m


@register_model(ModelType.JIUTIAN)
class JiuTian(BaseLLM):
    """JiuTian: qwen2 arch with an explicit tie flag (models/jiutian.cpp)."""
    EXTRA_FMT = "2if"   # n_kv, tie, rope_theta

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .qwen import make_qwen_tokenizer

        base, (n_kv, tie_flag, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, rope_layout="neox",
                                 qkv_bias=True, tie_lm_head=bool(tie_flag),
                                 norm_eps=1e-6, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tok = make_qwen_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers,
                                          tie_lm_head=bool(tie_flag))
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


class CodeFuseDeepSeekEncoder(HistoryEncoder):
    """'<s>role\\n{content}\\n' turns, ai ends with eos; bos terminates
    (models/codefuse.cpp:12-94)."""

    def _seg(self, text, ids, bos=True, eos=False):
        tok = self.tokenizer
        if bos and tok.bos_token_id >= 0:
            ids.append(tok.bos_token_id)
        ids.extend(tok.encode(text))
        if eos and tok.eos_token_id >= 0:
            ids.append(tok.eos_token_id)

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if tok.sys_prompt:
            self._seg(f"system\n{tok.sys_prompt}\n", ids)

    def append_user(self, round_idx, user, ids):
        self._seg(f"human\n{user}\n", ids)

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        self._seg(ai, ids, bos=False, eos=True)

    def append_ai_opening(self, round_idx, ids):
        self._seg("bot\n", ids)


@register_model(ModelType.CODEFUSE_DEEPSEEK)
class CodeFuseDeepSeek(BaseLLM):
    """CodeFuse-DeepSeek-33B: llama-v2 blocks, deepseek-coder vocab,
    role-word template, terminates on bos (models/codefuse.cpp)."""
    EXTRA_FMT = "iff"   # n_kv, rope_scaling, rope_theta

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_scaling, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, norm_eps=1e-6,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        if rope_scaling > 0 and rope_scaling != 1.0:
            cfg = replace(cfg, rope=replace(cfg.rope,
                                            freq_scale=1.0 / rope_scaling))
        tp = BPEProcessor2()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tok = ChatTokenizer(tp, CodeFuseDeepSeekEncoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        tok.terminate_ids.add(base.bos_token_id)
        tok.terminate_ids.add(base.eos_token_id)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)
