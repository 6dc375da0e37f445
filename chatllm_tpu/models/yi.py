"""Yi / 01.AI (reference: /root/reference/models/yi.{h,cpp}) — llama-like
with SP tokenizer and a ChatML-style template over fixed special ids."""
from __future__ import annotations

from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor1
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .llama import build_dense_config
from .model_types import ModelType


class YiEncoder(HistoryEncoder):
    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if tok.sys_prompt:
            ids.append(tok.im_start_token_id)
            ids.extend(tok.encode("system" + tok.sys_prompt))
            ids.append(tok.im_end_token_id)
            ids.extend(tok.encode("\n"))

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        ids.append(tok.im_start_token_id)
        ids.extend(tok.encode("user\n" + user))
        ids.append(tok.im_end_token_id)
        ids.extend(tok.encode("\n"))

    def append_ai(self, round_idx, ai, ids):
        tok = self.tokenizer
        self.append_ai_opening(round_idx, ids)
        ids.extend(tok.encode(ai))
        ids.append(tok.im_end_token_id)
        ids.extend(tok.encode("\n"))

    def append_ai_opening(self, round_idx, ids):
        tok = self.tokenizer
        ids.append(tok.im_start_token_id)
        ids.extend(tok.encode("assistant\n"))


@register_model(ModelType.YI, ModelType.MAP_NEO)
class Yi(BaseLLM):
    # llama v2 config + {num_key_value_heads, rope_scaling:f, rope_theta:f}
    # (models/yi.h:5-10)
    EXTRA_FMT = "iff"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_scaling, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=rope_theta,
            max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        if rope_scaling > 0 and rope_scaling != 1.0:
            from dataclasses import replace

            cfg = replace(cfg, rope=replace(cfg.rope, freq_scale=1.0 / rope_scaling))

        tp = BPEProcessor1()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tok = ChatTokenizer(tp, YiEncoder(), sys_prompt="")
        tok.bos_token_id = tp.get_piece_size()
        tok.eos_token_id = tok.bos_token_id + 1
        tok.im_start_token_id = 6
        tok.im_end_token_id = 7
        tok.terminate_ids.add(tok.im_end_token_id)
        tok.is_special_id = lambda i: i in (6, 7, 8)

        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)
