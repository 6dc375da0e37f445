"""DeepSeek family (reference: /root/reference/models/deepseek.{h,cpp}).

v1 dense (+coder), v1 MoE, and the V2/V3 MLA+grouped-MoE generations.
"""
from __future__ import annotations

from dataclasses import replace

from ..nn.transformer import LayerSpec, TransformerConfig
from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor1
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .llama import build_dense_config
from .model_types import ModelType


class DeepSeekV1Encoder(HistoryEncoder):
    """User:/Assistant: template (models/deepseek.cpp v1)."""

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        if tok.sys_prompt:
            ids.extend(tok.encode(tok.sys_prompt + "\n\n"))

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        ids.extend(tok.encode("User:"))
        ids.extend(tok.encode(" " + user + "\n\n"))

    def append_ai(self, round_idx, ai, ids):
        tok = self.tokenizer
        self.append_ai_opening(round_idx, ids)
        ids.extend(tok.encode(ai))
        ids.append(tok.eos_token_id)

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("Assistant:"))


def make_deepseek_v1_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    tp = BPEProcessor1()
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tok = ChatTokenizer(tp, DeepSeekV1Encoder(), sys_prompt="")
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.pad_token_id = base.pad_token_id
    return tok


@register_model(ModelType.DEEPSEEK)
class DeepSeekV1(BaseLLM):
    # plain BaseConfig (models/deepseek.h:9-11)
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, _ = BaseConfig.parse(gf)
        cfg = build_dense_config(base, max_length=rt.max_length,
                                 norm_eps=1e-6, cache_dtype=rt.cache_dtype)
        tok = make_deepseek_v1_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.DEEPSEEK_CODER, ModelType.NUMINAMATH)
class DeepSeekCoder(BaseLLM):
    # + {rope_scaling:f, rope_theta:f} (models/deepseek.h:44-48)
    EXTRA_FMT = "ff"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (rope_scaling, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, rope_theta=rope_theta,
                                 norm_eps=1e-6, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        if rope_scaling > 0 and rope_scaling != 1.0:
            cfg = replace(cfg, rope=replace(cfg.rope, freq_scale=1.0 / rope_scaling))
        tok = make_deepseek_v1_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)
