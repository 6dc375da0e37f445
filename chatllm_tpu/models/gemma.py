"""Gemma family (reference: /root/reference/models/gemma.{h,cpp}).

The converter pre-bakes Gemma quirks (GemmaConverter.pp,
/root/reference/convert.py:6501): embeddings ×sqrt(hidden), norm weights
stored as 1+w, q/k permuted to interleaved rope — so loading is llama-like
with gated-GELU MLPs.
"""
from __future__ import annotations

from dataclasses import replace

from ..nn.transformer import LayerSpec, TransformerConfig
from ..ops.rope import ROPE_NORMAL, RopeConfig
from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor1
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .model_types import ModelType


class GemmaEncoder(HistoryEncoder):
    """<start_of_turn>user\\n...<end_of_turn>\\n (models/gemma.cpp v1)."""

    def _turn(self, role, text, ids, close=True):
        tok = self.tokenizer
        ids.append(tok.start_of_turn_token_id)
        ids.extend(tok.encode(f"{role}\n{text}" if text else f"{role}\n"))
        if close:
            ids.append(tok.end_of_turn_token_id)
            ids.extend(tok.encode("\n"))

    def append_sys_prompt(self, ids):
        if self.tokenizer.bos_token_id >= 0:
            ids.append(self.tokenizer.bos_token_id)

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        sys = tok.sys_prompt
        text = f"{sys}\n\n{user}" if sys and round_idx == 0 else user
        self._turn("user", text, ids)

    def append_ai(self, round_idx, ai, ids):
        self._turn("model", ai, ids)

    def append_ai_opening(self, round_idx, ids):
        self._turn("model", "", ids, close=False)


def make_gemma_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    tp = BPEProcessor1()
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tok = ChatTokenizer(tp, GemmaEncoder(), sys_prompt="")
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    pad = tp.piece_to_id("<pad>")
    tok.pad_token_id = pad if pad >= 0 else base.pad_token_id
    tok.start_of_turn_token_id = tp.piece_to_id("<start_of_turn>")
    tok.end_of_turn_token_id = tp.piece_to_id("<end_of_turn>")
    tok.terminate_ids.add(tok.end_of_turn_token_id)
    tok.is_special_id = lambda i: i in (tok.pad_token_id, tok.start_of_turn_token_id,
                                        tok.end_of_turn_token_id)
    return tok


@register_model(ModelType.GEMMA)
class Gemma(BaseLLM):
    # BaseConfig + {num_key_value_heads, head_dim} + rope_theta
    # (models/gemma.h:9-14)
    EXTRA_FMT = "2if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, head_dim, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv, intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            head_dim=head_dim, act="gelu_tanh", norm_eps=1e-6,
            rope=RopeConfig(head_dim=head_dim, freq_base=rope_theta,
                            layout=ROPE_NORMAL),
            tie_lm_head=True,
            # the converter bakes ×sqrt(H) into the embedding (input path);
            # the tied unembedding must not carry it
            logit_scale=base.hidden_size ** -0.5,
            cache_dtype=rt.cache_dtype)
        tok = make_gemma_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers, tie_lm_head=True)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.GEMMA3)
class Gemma3(BaseLLM):
    """Gemma3 text (models/gemma.h:255-266): qk-norm (weights 1+w folded by
    the converter), 5:1 local/global SWA pattern with separate rope bases,
    sandwich norms; no softcaps.  No q/k permutation → NeoX rope."""

    # BaseConfig + {n_kv, head_dim, query_pre_attn_scalar, sliding_window,
    # sliding_window_pattern} + {rope_local_base, rope_theta, rope_factor}
    EXTRA_FMT = "5i3f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..ops.rope import ROPE_NEOX

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, head_dim, query_pre_attn_scalar, sliding_window, swa_pattern,
         rope_local_base, rope_theta, rope_factor) = extra
        n_layers = base.num_hidden_layers
        # ((layer+1) % pattern) != 0 → sliding (models/gemma.cpp:833)
        specs = tuple(
            LayerSpec(sliding_window=sliding_window, local_rope=True)
            if ((i + 1) % max(swa_pattern, 1)) != 0 else LayerSpec()
            for i in range(n_layers))
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=n_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv, intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            head_dim=head_dim, act="gelu_tanh", norm_eps=1e-6,
            rope=RopeConfig(head_dim=head_dim, freq_base=rope_theta,
                            freq_scale=1.0 / rope_factor if rope_factor > 0 else 1.0,
                            layout=ROPE_NEOX),
            rope_local=RopeConfig(head_dim=head_dim, freq_base=rope_local_base,
                                  layout=ROPE_NEOX),
            attention_scale=float(query_pre_attn_scalar) ** -0.5,
            qk_norm="rmsnorm", post_norms=True, layer_specs=specs,
            tie_lm_head=True, logit_scale=base.hidden_size ** -0.5,
            cache_dtype=rt.cache_dtype)
        tok = make_gemma_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "layers": [],
        }
        for i in range(n_layers):
            pfx = f"model.layers.{i}"
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "attn": {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                    "q_norm": pb.norm(f"{pfx}.self_attn.q_norm"),
                    "k_norm": pb.norm(f"{pfx}.self_attn.k_norm"),
                },
                "post_attn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "ffn_norm": pb.norm(f"{pfx}.pre_feedforward_layernorm"),
                "post_ffn_norm": pb.norm(f"{pfx}.post_feedforward_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.GEMMA2)
class Gemma2(BaseLLM):
    # BaseConfig + {n_kv, head_dim, query_pre_attn_scalar, sliding_window}
    # + {rope_theta, final_softcap, attn_softcap} (models/gemma.h:59-69)
    EXTRA_FMT = "4i3f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, head_dim, query_pre_attn_scalar, sliding_window,
         rope_theta, final_softcap, attn_softcap) = extra
        n_layers = base.num_hidden_layers
        # odd layers use SWA (models/gemma.h:123 `layer_id % 2`)
        specs = tuple(LayerSpec(sliding_window=sliding_window if (i % 2) else 0)
                      for i in range(n_layers))
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=n_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv, intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            head_dim=head_dim, act="gelu_tanh", norm_eps=1e-6,
            rope=RopeConfig(head_dim=head_dim, freq_base=rope_theta,
                            layout=ROPE_NORMAL),
            attention_scale=float(query_pre_attn_scalar) ** -0.5,
            logit_softcap=attn_softcap, final_logit_softcap=final_softcap,
            post_norms=True, layer_specs=specs, tie_lm_head=True,
            logit_scale=base.hidden_size ** -0.5,
            cache_dtype=rt.cache_dtype)
        tok = make_gemma_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "layers": [],
        }
        for i in range(n_layers):
            pfx = f"model.layers.{i}"
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "attn": {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                },
                "post_attn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "ffn_norm": pb.norm(f"{pfx}.pre_feedforward_layernorm"),
                "post_ffn_norm": pb.norm(f"{pfx}.post_feedforward_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)
