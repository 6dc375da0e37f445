"""InternLM family (reference: /root/reference/models/internlm.cpp).

InternLM2/2.5: llama-like blocks after the converter splits attention.wqkv
and permutes q/k to interleaved rope (InternLM2Converter.state_dict_pp,
convert.py:1474); SP tokenizer with a ChatML template over <|im_start|>.
"""
from __future__ import annotations

from ..runtime.chat import ChatMLEncoder, ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor1
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .llama import build_dense_config
from .model_types import ModelType


def make_internlm2_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    tp = BPEProcessor1()
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tok = ChatTokenizer(tp, ChatMLEncoder(), sys_prompt="")
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.im_start_token_id = tp.piece_to_id("<|im_start|>")
    tok.im_end_token_id = tp.piece_to_id("<|im_end|>")
    if tok.im_start_token_id < 0:
        # old internlm2 files: special ids counted back from vocab end
        # (models/internlm.cpp:260-266)
        nid = tp.get_piece_size()
        tok.im_start_token_id = nid - 1
        tok.im_end_token_id = nid - 2
        tp.add_added_token("<|im_start|>", tok.im_start_token_id)
        tp.add_added_token("<|im_end|>", tok.im_end_token_id)
    ids = tp.encode("\n")
    tok.nl_token_id = ids[0] if ids else -1
    tok.terminate_ids.add(tok.im_end_token_id)
    tok.is_special_id = lambda i: i in (tok.bos_token_id, tok.eos_token_id,
                                        tok.im_start_token_id, tok.im_end_token_id)
    return tok


@register_model(ModelType.INTERNLM2, ModelType.INTERNLM2_1)
class InternLM2(BaseLLM):
    # BaseConfig + {num_key_value_heads} + {rope_theta, rope_scaling}
    # (models/internlm.cpp:161-166)
    EXTRA_FMT = "iff"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_theta, rope_scaling) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=rope_theta,
            max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        if rope_scaling > 0 and rope_scaling != 1.0:
            from dataclasses import replace

            cfg = replace(cfg, rope=replace(cfg.rope, freq_scale=1.0 / rope_scaling))
        tok = make_internlm2_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


class InternLM1Encoder(HistoryEncoder):
    """<s>[<|System|>:{sys}\\n] <s><|User|>:{user}[<eoh>]\\n <|Bot|>:{ai}<eoa>\\n
    (models/internlm.cpp ChatHistoryEncoder:110-157)."""

    insert_eoh = True

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        text = "<s>"
        if tok.sys_prompt:
            text += f"<|System|>:{tok.sys_prompt}\n"
        ids.extend(tok.encode(text))

    def append_user(self, round_idx, user, ids):
        eoh = "<eoh>" if self.insert_eoh else ""
        ids.extend(self.tokenizer.encode(f"<s><|User|>:{user}{eoh}\n"))

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        ids.extend(self.tokenizer.encode(f"{ai}<eoa>\n"))

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("<|Bot|>:"))


@register_model(ModelType.INTERNLM)
class InternLM1(BaseLLM):
    """InternLM v1: BaseConfig only, biased MHA attention, theta 10000
    (models/internlm.cpp GenericConditionalGeneration<true> + v1:191-216)."""

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, _ = BaseConfig.parse(gf)
        cfg = build_dense_config(base, num_key_value_heads=base.num_attention_heads,
                                 rope_theta=10000.0, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tp = BPEProcessor1()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tok = ChatTokenizer(tp, InternLM1Encoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        eoa = tp.piece_to_id("<eoa>")
        tok.eoa_token_id = eoa
        if eoa >= 0:
            tok.terminate_ids.add(eoa)
        tok.is_special_id = lambda i: i in (eoa, tok.bos_token_id,
                                            tok.eos_token_id)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.INTERNLM3)
class InternLM3(BaseLLM):
    """InternLM v3: v2.1 arch with the rope base stretched once at load
    (dynamic-NTK formula over original_max_position_embeddings,
    models/internlm.cpp v3:417-449)."""
    EXTRA_FMT = "iffi"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_theta, rope_scaling, orig_max) = BaseConfig.parse(
            gf, cls.EXTRA_FMT)
        max_len = rt.max_length if rt.max_length > 0 else base.max_length
        seq_len = max(max_len, orig_max)
        dim = base.hidden_size // base.num_attention_heads
        factor = rope_scaling if rope_scaling > 0 else 1.0
        theta = rope_theta * (factor * seq_len / max(orig_max, 1)
                              - (factor - 1.0)) ** (dim / (dim - 2))
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=theta,
            max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        tok = make_internlm2_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)
