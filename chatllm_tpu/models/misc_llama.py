"""Breadth wave: llama-architecture variants with per-arch quirks.

Falcon3 (models/falcon.cpp), SmolLM/SmolLM3 (models/smol.cpp), OLMo2
(models/allenai.{h,cpp} — post-norm-only blocks, full-projection qk-norm),
StarCoder2 (models/starcoder.cpp — LayerNorm+bias, biased simple GELU MLP,
SWA), Cohere Command-R/Aya-23 (models/cohere.cpp — parallel residual,
LayerNorm-no-bias, logit scale, tied head), Granite (models/granite.cpp —
attention/residual/logit multipliers).
"""
from __future__ import annotations

from dataclasses import replace

from ..nn.transformer import LayerSpec, TransformerConfig
from ..ops.rope import ROPE_NEOX, ROPE_NORMAL, RopeConfig
from ..runtime.chat import ChatMLEncoder, ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor1, BPEProcessor2
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .llama import build_dense_config
from .model_types import ModelType


class BracketRoleEncoder(HistoryEncoder):
    """<|user|>\\n... template (reference HistoryEncoderBracketRole,
    src/chat_encoders.cpp:104-152)."""

    auto_add_bos = True
    ai_ending_eos = False
    ai_ending_nl = False

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if self.auto_add_bos and tok.bos_token_id >= 0:
            ids.append(tok.bos_token_id)
        if tok.sys_prompt:
            ids.extend(tok.encode(f"<|system|>\n{tok.sys_prompt}"))

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode(f"<|user|>\n{user}"))

    def append_ai(self, round_idx, ai, ids):
        tok = self.tokenizer
        ids.extend(tok.encode(f"<|assistant|>\n{ai}"))
        if self.ai_ending_eos and tok.eos_token_id >= 0:
            ids.append(tok.eos_token_id)
        if self.ai_ending_nl:
            ids.extend(tok.encode("\n"))

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("<|assistant|>\n"))


def _bpe2_tokenizer(gf, base, encoder, *, sys_prompt=""):
    tp = BPEProcessor2()
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tp.enable_return_special_token(True)
    tok = ChatTokenizer(tp, encoder, sys_prompt=sys_prompt)
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.pad_token_id = base.pad_token_id
    return tok


@register_model(ModelType.FALCON3)
class Falcon3(BaseLLM):
    """llama::v3 config with a bracket-role template + eos ending
    (models/falcon.cpp:4-55)."""
    EXTRA_FMT = "if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, norm_eps=1e-6,
                                 max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        enc = BracketRoleEncoder()
        enc.ai_ending_eos = True
        tok = _bpe2_tokenizer(gf, base, enc)
        nl = tok.tp.piece_to_id("Ċ")
        if nl >= 0:
            tok.tp.override_token_decoding(nl, "\n")
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.SMOLLM)
class SmolLM(BaseLLM):
    """SmolLM 1/2: llama-v3 config + ChatML (models/smol.cpp lm)."""
    EXTRA_FMT = "if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        tie = not gf.has_tensor("lm_head.weight")
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, tie_lm_head=tie,
                                 max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        tok = _bpe2_tokenizer(gf, base, ChatMLEncoder())
        tok.im_start_token_id = tok.tp.piece_to_id("<|im_start|>")
        tok.im_end_token_id = tok.tp.piece_to_id("<|im_end|>")
        tok.terminate_ids.add(tok.im_end_token_id)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers, tie_lm_head=tie)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.SMOLLM3)
class SmolLM3(BaseLLM):
    """SmolLM3: + periodic rope-less layers (models/smol.h:193-199,
    `no_rope_layer_interval`)."""
    EXTRA_FMT = "3if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, no_rope_interval, tie_flag, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        tie = bool(tie_flag)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, tie_lm_head=tie,
                                 norm_eps=1e-6,
                                 max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        if no_rope_interval > 0:
            specs = tuple(
                LayerSpec(use_rope=((i + 1) % no_rope_interval != 0))
                for i in range(base.num_hidden_layers))
            cfg = replace(cfg, layer_specs=specs)
        tok = _bpe2_tokenizer(gf, base, ChatMLEncoder())
        tok.im_start_token_id = tok.tp.piece_to_id("<|im_start|>")
        tok.im_end_token_id = tok.tp.piece_to_id("<|im_end|>")
        tok.terminate_ids.add(tok.im_end_token_id)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers, tie_lm_head=tie)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.OLMo2)
class OLMo2(BaseLLM):
    """OLMo-2: post-norm-only blocks (LMBlock4<Identity,...>,
    models/allenai.h:138-143), full-projection qk-norm, NEOX rope."""
    EXTRA_FMT = "if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, rope_layout=ROPE_NEOX,
                                 norm_eps=1e-6, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = replace(cfg, pre_norm=False, post_norms=True, qk_norm="rmsnorm_full")
        enc = BracketRoleEncoder()
        enc.ai_ending_eos = True
        enc.ai_ending_nl = True
        tok = _bpe2_tokenizer(gf, base, enc)
        tok.bos_token_id = tok.eos_token_id  # allenai.cpp Tokenizer::load
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
                "attn_norm": {"w": pb.array(f"{pfx}.post_attention_layernorm.weight")},
                "attn": {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                    "q_norm": pb.norm(f"{pfx}.self_attn.q_norm"),
                    "k_norm": pb.norm(f"{pfx}.self_attn.k_norm"),
                },
                "post_attn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "ffn_norm": {"w": pb.array(f"{pfx}.post_feedforward_layernorm.weight")},
                "post_ffn_norm": pb.norm(f"{pfx}.post_feedforward_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.STARCODER2)
class StarCoder2(BaseLLM):
    """StarCoder2: LayerNorm+bias, biased GELU simple MLP, SWA 4k, NEOX rope
    (models/starcoder.cpp; block src/layers.h:3283-3292)."""
    EXTRA_FMT = "2if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, sliding_window, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        tie = not gf.has_tensor("lm_head.weight")
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv,
            intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            act="gelu_tanh", norm_type="layernorm", norm_eps=1e-5,
            rope=RopeConfig(head_dim=base.hidden_size // base.num_attention_heads,
                            freq_base=rope_theta, layout=ROPE_NEOX),
            qkv_bias=True, o_bias=True, tie_lm_head=tie,
            layer_specs=tuple(LayerSpec(sliding_window=max(0, sliding_window))
                              for _ in range(base.num_hidden_layers)),
            cache_dtype=rt.cache_dtype)
        tok = _bpe2_tokenizer(gf, base, None)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm", bias=True),
            "layers": [],
        }
        for i in range(base.num_hidden_layers):
            pfx = f"model.layers.{i}"
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm", bias=True),
                "attn": {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj", bias=True),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj", bias=True),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj", bias=True),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj", bias=True),
                },
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm", bias=True),
                "mlp": {
                    "up": pb.linear(f"{pfx}.mlp.c_fc", bias=True),
                    "down": pb.linear(f"{pfx}.mlp.c_proj", bias=True),
                },
            })
        params["layers"] = tuple(params["layers"])
        if not tie:
            params["lm_head"] = pb.linear("lm_head")
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


class CohereEncoder(HistoryEncoder):
    """<|START_OF_TURN_TOKEN|><|USER_TOKEN|>... (models/cohere.cpp)."""

    def _turn(self, role_tok, text, ids, close=True):
        tok = self.tokenizer
        ids.append(tok.start_of_turn_token_id)
        ids.append(role_tok)
        ids.extend(tok.encode(text))
        if close:
            ids.append(tok.end_of_turn_token_id)

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if tok.bos_token_id >= 0:
            ids.append(tok.bos_token_id)
        if tok.sys_prompt:
            self._turn(tok.system_token_id, tok.sys_prompt, ids)

    def append_user(self, round_idx, user, ids):
        self._turn(self.tokenizer.user_token_id, user, ids)

    def append_ai(self, round_idx, ai, ids):
        self._turn(self.tokenizer.chatbot_token_id, ai, ids)

    def append_ai_opening(self, round_idx, ids):
        tok = self.tokenizer
        ids.append(tok.start_of_turn_token_id)
        ids.append(tok.chatbot_token_id)


COHERE_REGEX = [
    r"\p{N}",
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)",
]


def make_cohere_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    tp = BPEProcessor2(COHERE_REGEX)
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tp.enable_return_special_token(True)
    tok = ChatTokenizer(tp, CohereEncoder(),
                        sys_prompt="You are a powerful conversational AI "
                                   "trained by Cohere to help people.")
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.start_of_turn_token_id = tp.piece_to_id("<|START_OF_TURN_TOKEN|>")
    tok.end_of_turn_token_id = tp.piece_to_id("<|END_OF_TURN_TOKEN|>")
    tok.user_token_id = tp.piece_to_id("<|USER_TOKEN|>")
    tok.chatbot_token_id = tp.piece_to_id("<|CHATBOT_TOKEN|>")
    tok.system_token_id = tp.piece_to_id("<|SYSTEM_TOKEN|>")
    tok.terminate_ids.add(tok.end_of_turn_token_id)
    tok.is_special_id = lambda i: i in (
        tok.start_of_turn_token_id, tok.end_of_turn_token_id,
        tok.user_token_id, tok.chatbot_token_id, tok.system_token_id)
    return tok


@register_model(ModelType.COHERE_COMMAND_R, ModelType.COHERE_AYA_23)
class CohereCommandR(BaseLLM):
    """Command-R: parallel residual, LayerNorm (no bias), interleaved rope,
    logit scale, tied head (models/cohere.cpp:6-120)."""
    EXTRA_FMT = "iff"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_theta, logit_scale) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv,
            intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            norm_type="layernorm", norm_eps=1e-5,
            rope=RopeConfig(head_dim=base.hidden_size // base.num_attention_heads,
                            freq_base=rope_theta, layout=ROPE_NORMAL),
            parallel_residual=True, tie_lm_head=True, logit_scale=logit_scale,
            cache_dtype=rt.cache_dtype)
        tok = make_cohere_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm", bias=False),
            "layers": [],
        }
        for i in range(base.num_hidden_layers):
            pfx = f"model.layers.{i}"
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm", bias=False),
                "attn": {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                },
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


class ExaoneEncoder(HistoryEncoder):
    """[|system|]/[|user|]/[|assistant|] template (models/exaone.cpp)."""

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if tok.sys_prompt:
            ids.extend(tok.encode(f"[|system|]{tok.sys_prompt}[|endofturn|]\n"))

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode(f"[|user|]{user}\n"))

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        ids.extend(self.tokenizer.encode(f"{ai}[|endofturn|]\n"))

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("[|assistant|]"))


@register_model(ModelType.EXAONE)
class Exaone(BaseLLM):
    """EXAONE 3.x (models/exaone.cpp:5-86): llama arch + llama3.1-style
    rope scaling + [|role|] template.  Config IS llama::v3_2::Config
    (exaone.cpp:7 `typedef llama::v3_2::Config Config`): {n_kv}i {theta}f
    {orig_max}i {factor,low,high}3f {tie}i."""
    EXTRA_FMT = "ifi3fi"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .llama import _llama31_factors

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, rope_theta, orig_max, factor, low_f, high_f, tie_flag) = extra
        tie = bool(tie_flag)
        ff = None
        if factor > 1.0 and orig_max > 0:
            rot = base.hidden_size // base.num_attention_heads
            ff = _llama31_factors(rot, rope_theta, factor, low_f, high_f, orig_max)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, freq_factors=ff,
                                 tie_lm_head=tie, norm_eps=1e-5,
                                 max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        tok = _bpe2_tokenizer(
            gf, base, ExaoneEncoder(),
            sys_prompt="You are EXAONE model from LG AI Research, a helpful assistant.")
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers, tie_lm_head=tie)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.EXAONE4)
class Exaone4(BaseLLM):
    """EXAONE 4.0 (models/exaone.cpp:89-246): post-norm-only blocks
    (LMBlock4<Identity, attn, RMSNorm, Identity, SiLUMLP, RMSNorm>), per-head
    qk RMSNorm before rope, hybrid layout where sliding layers carry
    llama3.1-scaled rope and global layers are NoPE (when sliding_window>0).
    Weight layout = OLMo2 converter names (convert.py:3355), non-permuted."""
    MAX_LAYERS = 128
    EXTRA_FMT = "3ifi3f128i"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .llama import _llama31_factors

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, sliding_window, tie_flag, rope_theta, orig_max,
         factor, low_f, high_f) = extra[:8]
        is_sliding = extra[8:8 + base.num_hidden_layers]
        tie = bool(tie_flag)
        rot = base.hidden_size // base.num_attention_heads
        ff = _llama31_factors(rot, rope_theta, factor, low_f, high_f, orig_max)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, rope_layout=ROPE_NEOX,
                                 freq_factors=ff, tie_lm_head=tie,
                                 norm_eps=1e-5, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        specs = ()
        if sliding_window > 0:
            specs = tuple(
                LayerSpec(sliding_window=sliding_window) if is_sliding[i]
                else LayerSpec(use_rope=False)
                for i in range(base.num_hidden_layers))
        cfg = replace(cfg, pre_norm=False, post_norms=True,
                      qk_norm="rmsnorm", layer_specs=specs)
        tok = _bpe2_tokenizer(
            gf, base, ExaoneEncoder(),
            sys_prompt="You are EXAONE model from LG AI Research, a helpful assistant.")
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "layers": [],
        }
        if not tie:
            params["lm_head"] = pb.linear("lm_head")
        for i in range(base.num_hidden_layers):
            pfx = f"model.layers.{i}"
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "attn": {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                    "q_norm": pb.norm(f"{pfx}.self_attn.q_norm"),
                    "k_norm": pb.norm(f"{pfx}.self_attn.k_norm"),
                },
                "post_attn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "ffn_norm": pb.norm(f"{pfx}.post_feedforward_layernorm"),
                "post_ffn_norm": pb.norm(f"{pfx}.post_feedforward_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


class MiniCPMEncoder(HistoryEncoder):
    """<用户>...<AI>... template (models/minicpm.cpp)."""

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if tok.bos_token_id >= 0:
            ids.append(tok.bos_token_id)
        if tok.sys_prompt:
            ids.extend(tok.encode(tok.sys_prompt))

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode(f"<用户>{user}"))

    def append_ai(self, round_idx, ai, ids):
        ids.extend(self.tokenizer.encode(f"<AI>{ai}"))

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("<AI>"))


@register_model(ModelType.MINICPM)
class MiniCPM(BaseLLM):
    """MiniCPM v1 (models/minicpm.cpp:11-17): llama arch + μP residual
    scaling (converter stores scale_depth/sqrt(L), applied to both residual
    branches; embed×scale_emb and tied-head scaling baked by the
    converter)."""
    EXTRA_FMT = "i3f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_scaling, rope_theta, scale_depth) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        tie = not gf.has_tensor("lm_head.weight")
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, tie_lm_head=tie,
                                 norm_eps=1e-5, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = replace(cfg, residual_scale=scale_depth)
        if rope_scaling > 0 and rope_scaling != 1.0:
            cfg = replace(cfg, rope=replace(cfg.rope, freq_scale=1.0 / rope_scaling))
        tp = BPEProcessor1()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tok = ChatTokenizer(tp, MiniCPMEncoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers, tie_lm_head=tie)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.ERNIE_DENSE)
class ErnieDense(BaseLLM):
    """ERNIE 4.5 dense (models/ernie.h:10-16): llama arch, interleaved rope
    (q/k permuted by the converter), SP llama2 tokenizer."""
    EXTRA_FMT = "3if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .mistral import make_mistral_tokenizer

        base, (n_kv, head_dim, tie_flag, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        tie = bool(tie_flag)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 head_dim=head_dim, rope_theta=rope_theta,
                                 tie_lm_head=tie, norm_eps=1e-5,
                                 max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        tok = make_mistral_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers, tie_lm_head=tie)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.GRANITE)
class Granite(BaseLLM):
    """Granite 3.x dense: attention/residual/logit multipliers
    (models/granite.cpp:277-290; q/k permuted to interleaved rope)."""
    EXTRA_FMT = "2i4f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, tie_flag, attention_multiplier, logits_scaling,
         residual_multiplier, rope_theta) = extra
        tie = bool(tie_flag)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, tie_lm_head=tie,
                                 norm_eps=1e-6, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = replace(cfg, attention_scale=attention_multiplier,
                      residual_scale=residual_multiplier,
                      logit_scale=1.0 / logits_scaling)
        tok = _bpe2_tokenizer(gf, base, BracketRoleEncoder())
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers, tie_lm_head=tie)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)