"""GPT-OSS (reference /root/reference/models/gpt.cpp, 375 LoC).

Arch: per-layer alternating sliding-window(128)/full attention (layer_type
array in the config), attention sinks, YaRN rope, and an all-layer MoE with
biased router + biased experts using the clamped `swiglu_oai` activation
(ggml-cpu/ops.cpp:3319-3324).  Router scores are softmax over the top-k
*logits* (gpt.cpp OssSparseMoE::forward), not a full softmax.

YaRN attention scaling follows HF (one 0.1*ln(factor)+1 concentration
factor); the reference's setup_yarn(gpt.cpp:233) composes a second
get_mscale on top of ggml's internal one — HF is ground truth (the
HF-golden test pins it).
"""
from __future__ import annotations

import datetime

import jax.numpy as jnp
import numpy as np

from ..nn.transformer import LayerSpec, TransformerConfig
from ..ops.rope import ROPE_NEOX, RopeConfig
from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor2
from .base import BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig, register_model
from .model_types import ModelType

MAX_LAYERS = 128  # gpt.cpp:8

# o200k_harmony pre-split regexes (gpt.cpp Tokenizer::load)
GPT_OSS_REGEX = [
    r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*[\p{Ll}\p{Lm}\p{Lo}\p{M}]+(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])?",
    r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+[\p{Ll}\p{Lm}\p{Lo}\p{M}]*(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])?",
    r"\p{N}{1,3}",
    r" ?[^\s\p{L}\p{N}]+[\r\n/]*|\s*[\r\n]+",
    r"\s+(?!\S)|\s+",
]


class HarmonyEncoder(HistoryEncoder):
    """<|start|>{role}<|message|>{content}<|end|> turns (gpt.cpp
    ChatHistoryEncoder / Tokenizer::encode_item)."""

    def _item(self, tag: str, ids: list[int], content: str | None = None):
        tok = self.tokenizer
        ids.append(tok.start_token_id)
        ids.extend(tok.encode(tag))
        ids.append(tok.message_token_id)
        if content is not None:
            ids.extend(tok.encode(content))
            ids.append(tok.end_token_id)

    def append_sys_prompt(self, ids):
        self._item("system", ids, self.tokenizer.sys_prompt)

    def append_user(self, round_idx, user, ids):
        self._item("user", ids, user)

    def append_ai(self, round_idx, ai, ids):
        self._item("assistant", ids, ai)

    def append_ai_opening(self, round_idx, ids):
        self._item("assistant", ids)

    def append_user_opening(self, round_idx, ids):
        self._item("user", ids)


def _default_sys_prompt() -> str:
    # gpt.cpp Tokenizer ctor (with utils::now() date)
    today = datetime.date.today().isoformat()
    return (
        "You are ChatGPT, a large language model trained by OpenAI.\n"
        "Knowledge cutoff: 2024-06\n"
        f"Current date: {today}\n\n"
        "Reasoning: medium\n"
    )


@register_model(ModelType.GPT_OSS)
class GPTOSS(BaseLLM):
    # BaseConfig + 6i {n_kv, head_dim, experts_per_token, num_experts_per_tok,
    # num_local_experts, sliding_window} + 128i layer_type + 7f
    # {router_aux_loss_coef, swiglu_limit, rope_theta, orig_max_pos,
    # beta_fast, beta_slow, factor}   (convert.py GPTOSSConverter.dump_config)
    EXTRA_FMT = f"{6 + MAX_LAYERS}i7f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, head_dim, _experts_per_token, top_k, n_experts,
         sliding_window) = extra[:6]
        layer_type = extra[6:6 + MAX_LAYERS]
        (_aux_loss, swiglu_limit, rope_theta, orig_max_pos,
         beta_fast, beta_slow, factor) = extra[6 + MAX_LAYERS:]

        max_length = rt.max_length if rt.max_length > 0 else base.max_length
        specs = tuple(
            LayerSpec(sliding_window=sliding_window if layer_type[i] else 0,
                      is_moe=True)
            for i in range(base.num_hidden_layers))
        rope = RopeConfig(
            head_dim=head_dim, freq_base=rope_theta, layout=ROPE_NEOX,
            freq_scale=1.0 / factor if factor > 1.0 else 1.0,
            ext_factor=1.0 if factor > 1.0 else 0.0,
            beta_fast=beta_fast, beta_slow=beta_slow,
            orig_ctx=int(orig_max_pos))
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv, head_dim=head_dim,
            intermediate_size=base.intermediate_size,
            max_length=max_length, rope=rope, layer_specs=specs,
            qkv_bias=True, o_bias=True,
            moe_num_experts=n_experts, moe_top_k=top_k,
            moe_score_func="softmax_topk", moe_act="swiglu_oai",
            moe_swiglu_limit=swiglu_limit,
            cache_dtype=rt.cache_dtype)

        tok = cls.make_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = cls.load_params(pb, base.num_hidden_layers, n_experts)
        return cls(gf.model_type, cfg, params, tok, native_config=base,
                   meta=gf.meta)

    @staticmethod
    def load_params(pb: ParamBuilder, n_layers: int, n_experts: int) -> dict:
        dt = pb.compute_dtype
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "lm_head": pb.linear("lm_head"),
            "layers": [],
        }
        for i in range(n_layers):
            pfx = f"model.layers.{i}"
            attn = {
                "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                "sinks": pb.array(f"{pfx}.self_attn.sinks"),
            }
            gates, ups, downs = [], [], []
            gbs, ubs, dbs = [], [], []
            for j in range(n_experts):
                e = f"{pfx}.mlp.experts.{j}"
                gates.append(pb.raw_f32(f"{e}.gate_proj.weight").T)
                ups.append(pb.raw_f32(f"{e}.up_proj.weight").T)
                downs.append(pb.raw_f32(f"{e}.down_proj.weight").T)
                gbs.append(pb.raw_f32(f"{e}.gate_proj.bias"))
                ubs.append(pb.raw_f32(f"{e}.up_proj.bias"))
                dbs.append(pb.raw_f32(f"{e}.down_proj.bias"))
            mlp = {
                "gate": pb.linear(f"{pfx}.mlp.router", bias=False),
                "gate_linear_bias": pb.array(f"{pfx}.mlp.router.bias"),
                "experts": {
                    "gate": jnp.asarray(np.stack(gates), dtype=dt),
                    "up": jnp.asarray(np.stack(ups), dtype=dt),
                    "down": jnp.asarray(np.stack(downs), dtype=dt),
                    "gate_b": jnp.asarray(np.stack(gbs), dtype=dt),
                    "up_b": jnp.asarray(np.stack(ubs), dtype=dt),
                    "down_b": jnp.asarray(np.stack(dbs), dtype=dt),
                },
            }
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "attn": attn,
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": mlp,
            })
        params["layers"] = tuple(params["layers"])
        return params

    @classmethod
    def make_tokenizer(cls, gf, base):
        tp = BPEProcessor2(GPT_OSS_REGEX)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        tok = ChatTokenizer(tp, HarmonyEncoder(),
                            sys_prompt=_default_sys_prompt())
        tok.start_token_id = tp.piece_to_id("<|start|>")
        tok.message_token_id = tp.piece_to_id("<|message|>")
        tok.end_token_id = tp.piece_to_id("<|end|>")
        tok.channel_token_id = tp.piece_to_id("<|channel|>")
        tok.return_token_id = tp.piece_to_id("<|return|>")
        tok.bos_token_id = tp.piece_to_id("<|startoftext|>")
        tok.eos_token_id = tok.end_token_id
        for t in (tok.end_token_id, tok.return_token_id):
            if t >= 0:
                tok.terminate_ids.add(t)
        return tok
