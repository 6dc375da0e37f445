"""Mistral family (reference: /root/reference/models/mistral.{h,cpp}).

q/k permuted to interleaved rope at conversion (MistralConverter.pp,
/root/reference/convert.py:2866).
"""
from __future__ import annotations

from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor1
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .llama import build_dense_config
from .model_types import ModelType


class MistralEncoder(HistoryEncoder):
    """[INST] ... [/INST] (models/mistral.cpp ChatHistoryEncoder; simplified
    v3/v7 tool tags handled as plain text)."""

    def append_sys_prompt(self, ids):
        if self.tokenizer.bos_token_id >= 0:
            ids.append(self.tokenizer.bos_token_id)

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        sys = tok.sys_prompt
        if sys and round_idx == 0:
            ids.extend(tok.encode(f"[INST] {sys}\n{user} [/INST]"))
        else:
            ids.extend(tok.encode(f"[INST] {user} [/INST]"))

    def append_ai(self, round_idx, ai, ids):
        tok = self.tokenizer
        ids.extend(tok.encode(ai))
        ids.append(tok.eos_token_id)

    def append_ai_opening(self, round_idx, ids):
        pass


def make_mistral_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    tp = BPEProcessor1()
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tok = ChatTokenizer(tp, MistralEncoder(), sys_prompt="")
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.pad_token_id = base.pad_token_id
    return tok


@register_model(ModelType.MISTRAL)
class Mistral(BaseLLM):
    # BaseConfig + {num_key_value_heads, sliding_window} + rope_theta
    # (models/mistral.h:5-10)
    EXTRA_FMT = "2if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, sliding_window, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=rope_theta,
            sliding_window=max(0, sliding_window),
            max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        tok = make_mistral_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.MIXTRAL, ModelType.WIZARDLM2_MOE)
class Mixtral(BaseLLM):
    # mistral config + {num_experts_per_tok, num_local_experts}
    # (models/mistral.h:45-49); experts named block_sparse_moe.experts.{j}.w1/w2/w3
    EXTRA_FMT = "2if2i"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from dataclasses import replace

        from ..nn.transformer import LayerSpec
        from .base import load_moe_experts

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        n_kv, sliding_window, rope_theta, n_active, n_experts = extra
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=rope_theta,
            sliding_window=max(0, sliding_window),
            max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        sw = max(0, sliding_window)
        specs = tuple(LayerSpec(sliding_window=sw, is_moe=True)
                      for _ in range(base.num_hidden_layers))
        cfg = replace(cfg, layer_specs=specs, moe_num_experts=n_experts,
                      moe_top_k=n_active, moe_norm_topk_prob=True)
        tok = make_mistral_tokenizer(gf, base)
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
                },
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.block_sparse_moe.gate"),
                    "experts": load_moe_experts(
                        pb, f"{pfx}.block_sparse_moe", n_experts,
                        names=("w1", "w3", "w2")),  # w1=gate, w3=up, w2=down
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.MISTRAL2)
class Mistral2(BaseLLM):
    # + head_dim (models/mistral.h:153-159)
    EXTRA_FMT = "3if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, head_dim, sliding_window, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, head_dim=head_dim,
            rope_theta=rope_theta, sliding_window=max(0, sliding_window),
            max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        tok = make_mistral_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)
