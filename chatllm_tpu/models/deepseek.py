"""DeepSeek family (reference: /root/reference/models/deepseek.{h,cpp}).

v1 dense (+coder), v1 MoE, and the V2/V3 MLA+grouped-MoE generations.
"""
from __future__ import annotations

from dataclasses import replace

from ..nn.transformer import LayerSpec, TransformerConfig
from ..runtime.chat import ChatTokenizer, HistoryEncoder
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .llama import build_dense_config
from .model_types import ModelType


class DeepSeekV1Encoder(HistoryEncoder):
    """User:/Assistant: template (models/deepseek.cpp v1:38-84)."""

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
        ids.extend(tok.encode(" " + ai))     # leading space: deepseek.cpp:44
        ids.append(tok.eos_token_id)

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("Assistant:"))


# reference deepseek::v1 Tokenizer::load regex set (models/deepseek.cpp:24-33)
# — shared by v1 dense, v1-MoE, and the whole V2/V3 MLA family
# (deepseek.h:97,325,499,519 typedef v1::Tokenizer)
DEEPSEEK_V1_REGEX = [
    "[\r\n]",
    "\\s?[A-Za-z\\u00B5\\u00C0-\\u00D6\\u00D8-\\u00F6\\u00F8-\\u01BA\\u01BC-\\u01BF\\u01C4-\\u0293\\u0295-\\u02AF\\u0370-\\u0373\\u0376\\u0377\\u037B-\\u037D\\u037F\\u0386\\u0388-\\u038A\\u038C\\u038E-\\u03A1\\u03A3-\\u03F5\\u03F7-\\u0481\\u048A-\\u052F\\u0531-\\u0556\\u10A0-\\u10C5\\u13A0-\\u13F5\\u13F8-\\u13FD\\u1C90-\\u1CBA\\u1CBD-\\u1CBF\\u1D00-\\u1D2B\\u1D6B-\\u1D77\\u1D79-\\u1D9A\\u1E00-\\u1F15\\u1F18-\\u1F1D\\u1F20-\\u1F45\\u1F48-\\u1F4D\\u1F50-\\u1F57\\u1F59\\u1F5B\\u1F5D\\u1F5F-\\u1F7D\\u1F80-\\u1FB4\\u1FB6-\\u1FBC\\u1FBE\\u1FC2-\\u1FC4\\u1FC6-\\u1FCC\\u1FD0-\\u1FD3\\u1FD6-\\u1FDB\\u1FE0-\\u1FEC\\u1FF2-\\u1FF4\\u1FF6-\\u1FFC\\u2102\\u2107\\u210A-\\u2113\\u2115\\u2119-\\u211D\\u2124\\u2126\\u2128\\u212A-\\u212D\\u212F-\\u2134\\u2139\\u213C-\\u213F\\u2145-\\u2149\\u214E\\u2183\\u2184\\u2C00-\\u2C7B\\u2C7E-\\u2CE4\\u2CEB-\\u2CEE\\u2CF2\\u2CF3\\uA640-\\uA66D\\uA680-\\uA69B\\uA722-\\uA76F\\uA771-\\uA787\\uA78B-\\uA78E\\uAB70-\\uABBF\\uFB00-\\uFB06\\uFB13-\\uFB17\\uFF21-\\uFF3A\\uFF41-\\uFF5A\\U00010400-\\U0001044F\\U000104B0-\\U000104D3\\U000104D8-\\U000104FB\\U00010C80-\\U00010CB2\\U00010CC0-\\U00010CF2\\U000118A0-\\U000118DF\\U0001E900-\\U0001E943]+",
    "\\s?[!-/:-~！-／：-～‘-‟　-。]+",
    "\\s+$",
    "[一-龥ࠀ-一가-퟿]+",
    "\\p{N}+",
]

# reference deepseek::coder regex set (models/deepseek.cpp:122-129)
DEEPSEEK_CODER_REGEX = [
    "[\r\n]",
    "\\s?\\p{L}+",
    "\\s?\\p{P}+",
    "[一-龥ࠀ-一가-퟿]+",
    "\\p{N}",
]


def make_deepseek_v1_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    """Byte-BPE with merges, NOT a scored-SP vocab: the reference's whole
    deepseek family loads BPEProcessor2 (models/deepseek.cpp:22-36; the
    previous BPEProcessor1 here misread real converted files — caught by
    the round-5 cross-binary matrix)."""
    from ..tokenizer.processor import BPEProcessor2

    tp = BPEProcessor2(DEEPSEEK_V1_REGEX)
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


@register_model(ModelType.DEEPSEEK_V1_MoE)
class DeepSeekV1MoE(BaseLLM):
    # v1 config + {n_kv, first_k_dense, moe_inter, moe_layer_freq,
    # n_routed, n_shared, norm_topk, n_active} + rope_theta
    # (models/deepseek.h:83-95; converter convert.py:7737-7763)
    EXTRA_FMT = "8if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig, *, skip_tokenizer=False):
        from .base import load_moe_experts

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, first_k_dense, moe_inter, moe_freq, n_routed, n_shared,
         norm_topk, n_active, rope_theta) = extra
        n_layers = base.num_hidden_layers

        def is_moe(i):
            return i >= first_k_dense and i % max(moe_freq, 1) == 0

        specs = tuple(LayerSpec(is_moe=is_moe(i)) for i in range(n_layers))
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=rope_theta,
            norm_eps=1e-6, max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        cfg = replace(cfg, layer_specs=specs, moe_num_experts=n_routed,
                      moe_top_k=n_active, moe_norm_topk_prob=bool(norm_topk))
        # GigaChat reuses the arch with a BPE2 vocab — its loader owns the
        # tokenizer then (misc_llama2.py GigaChat.load)
        tok = None if skip_tokenizer else make_deepseek_v1_tokenizer(gf, base)
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
                    "gate": pb.linear(f"{pfx}.mlp.gate"),
                    "experts": load_moe_experts(pb, f"{pfx}.mlp", n_routed),
                    "shared": {
                        "gate": pb.linear(f"{pfx}.mlp.shared_experts.gate_proj"),
                        "up": pb.linear(f"{pfx}.mlp.shared_experts.up_proj"),
                        "down": pb.linear(f"{pfx}.mlp.shared_experts.down_proj"),
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


def yarn_get_mscale(scale: float, mscale: float) -> float:
    """models/deepseek.h:329"""
    import math

    if scale <= 1.0:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


@register_model(ModelType.DEEPSEEK_V2_LIGHT, ModelType.DEEPSEEK_V2)
class DeepSeekV2(BaseLLM):
    """MLA + grouped MoE (reference models/deepseek.h:299-490; weights
    pre-split by DeepSeekV2Converter, convert.py:7971)."""

    # v1 config + 14i (n_kv..v_head_dim) + 7f (beta_fast..routed_scaling)
    # [+ 2i q_lora_rank, topk_group for non-light]
    EXTRA_FMT = "14i7f"
    SCORE_FUNC = "softmax"
    HAS_GATE_BIAS = False

    @classmethod
    def make_tokenizer(cls, gf, base):
        return make_deepseek_v1_tokenizer(gf, base)

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..nn.transformer import MLAConfig
        from ..ops.rope import ROPE_NORMAL, RopeConfig
        from .base import load_moe_experts

        # "light" configs (no q_lora_rank/topk_group trailing fields):
        # V2-Lite, and every v3_light-derived arch — the V3 converter emits
        # the two extra ints only when q_lora_rank is set
        # (convert.py:8188-8194; deepseek.h:513 v3_light::Config =
        # v2_light::Config, moonshot.h/moonshot.cpp:524 reuse it)
        light = gf.model_type in (int(ModelType.DEEPSEEK_V2_LIGHT),
                                  int(ModelType.DEEPSEEK_V3_LIGHT),
                                  int(ModelType.MOONLIGHT),
                                  int(ModelType.KIMI_VL))
        fmt = cls.EXTRA_FMT + ("" if light else "2i")
        base, extra = BaseConfig.parse(gf, fmt)
        (n_kv, first_k_dense, kv_lora_rank, moe_inter, moe_freq, n_group,
         n_routed, n_shared, norm_topk, n_active, qk_nope, qk_rope,
         orig_max_pos, v_head_dim) = extra[:14]
        (beta_fast, beta_slow, factor, mscale, mscale_all, rope_theta,
         routed_scale) = extra[14:21]
        q_lora_rank, topk_group = (0, 1) if light else extra[21:23]

        n_layers = base.num_hidden_layers

        def is_moe(i):
            return i >= first_k_dense and i % max(moe_freq, 1) == 0

        dk = qk_nope + qk_rope
        has_yarn = factor > 1.0
        m = yarn_get_mscale(factor, mscale) / yarn_get_mscale(factor, mscale_all) if has_yarn else 1.0
        mscale_ad = yarn_get_mscale(factor, mscale_all) if has_yarn else 1.0
        attn_scale = (mscale_ad * mscale_ad) / (dk ** 0.5)
        rope = RopeConfig(
            head_dim=qk_rope, rot_dim=qk_rope, freq_base=rope_theta,
            freq_scale=1.0 / factor if has_yarn else 1.0,
            layout=ROPE_NORMAL, ext_factor=1.0 if has_yarn else 0.0,
            attn_factor=m, beta_fast=beta_fast, beta_slow=beta_slow,
            orig_ctx=orig_max_pos)

        specs = tuple(LayerSpec(is_moe=is_moe(i)) for i in range(n_layers))
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=n_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=base.num_attention_heads,
            intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            norm_eps=1e-6, rope=rope, attention_scale=attn_scale,
            layer_specs=specs, moe_num_experts=n_routed, moe_top_k=n_active,
            moe_norm_topk_prob=bool(norm_topk), moe_n_group=max(1, n_group),
            moe_topk_group=max(1, topk_group), moe_routed_scale=routed_scale,
            moe_score_func=cls.SCORE_FUNC,
            mla=MLAConfig(q_lora_rank=q_lora_rank, kv_lora_rank=kv_lora_rank,
                          qk_nope_head_dim=qk_nope, qk_rope_head_dim=qk_rope,
                          v_head_dim=v_head_dim),
            mla_compressed=(rt.mla_cache == "memory"),
            cache_dtype=rt.cache_dtype)

        tok = cls.make_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "lm_head": pb.linear("lm_head"),
            "layers": [],
        }
        for i in range(n_layers):
            pfx = f"model.layers.{i}"
            attn = {
                "d_kv": pb.linear(f"{pfx}.self_attn.d_kv_proj"),
                "k_pe": pb.linear(f"{pfx}.self_attn.k_pe_proj"),
                "kv_norm": pb.norm(f"{pfx}.self_attn.kv_norm"),
                "u_k_nope": pb.linear(f"{pfx}.self_attn.u_k_nope_proj"),
                "u_v": pb.linear(f"{pfx}.self_attn.u_v_proj"),
                "o": pb.linear(f"{pfx}.self_attn.o_proj"),
            }
            if cfg.mla_compressed:
                # absorb the up-projections for latent-space attention
                # (_mla_compressed_block): [rank, h, dn] / [rank, h, dv]
                import jax.numpy as jnp

                from ..ops.qmm import dense_weight

                h_ = base.num_attention_heads
                adt = jnp.dtype(rt.compute_dtype)
                attn["wk_abs"] = dense_weight(attn["u_k_nope"]).reshape(
                    kv_lora_rank, h_, qk_nope).astype(adt)
                attn["wv_abs"] = dense_weight(attn["u_v"]).reshape(
                    kv_lora_rank, h_, v_head_dim).astype(adt)
            if q_lora_rank > 0:
                attn["d_q"] = pb.linear(f"{pfx}.self_attn.d_q_proj")
                attn["q_norm"] = pb.norm(f"{pfx}.self_attn.q_norm")
                attn["u_q"] = pb.linear(f"{pfx}.self_attn.u_q_proj")
            else:
                attn["q"] = pb.linear(f"{pfx}.self_attn.q_proj")
            if is_moe(i):
                mlp = {
                    "gate": pb.linear(f"{pfx}.mlp.gate"),
                    "experts": load_moe_experts(pb, f"{pfx}.mlp", n_routed),
                    "shared": {
                        "gate": pb.linear(f"{pfx}.mlp.shared_experts.gate_proj"),
                        "up": pb.linear(f"{pfx}.mlp.shared_experts.up_proj"),
                        "down": pb.linear(f"{pfx}.mlp.shared_experts.down_proj"),
                    },
                }
                if cls.HAS_GATE_BIAS:
                    # V3 e_score_correction_bias (selection-only bias)
                    mlp["gate_bias"] = pb.array(
                        f"{pfx}.mlp.gate.e_score_correction_bias")
            else:
                mlp = {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                }
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "attn": attn,
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": mlp,
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.DEEPSEEK_V3, ModelType.MOONLIGHT,
                ModelType.DEEPSEEK_V3_LIGHT)
class DeepSeekV3(DeepSeekV2):
    """DeepSeek-V3 / Moonlight: V2's MLA layout + sigmoid scoring with
    e_score_correction_bias (noaux_tc top-k) — converter convert.py:8127."""
    SCORE_FUNC = "sigmoid"
    HAS_GATE_BIAS = True


class DeepSeekCoderEncoder(HistoryEncoder):
    """### Instruction:/### Response: template with <|EOT|> turns
    (models/deepseek.cpp coder namespace :155-190)."""

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if tok.sys_prompt:
            ids.append(tok.bos_token_id)
            ids.extend(tok.encode(tok.sys_prompt))

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        ids.extend(tok.encode("\n### Instruction:\n" + user))

    def append_ai(self, round_idx, ai, ids):
        tok = self.tokenizer
        self.append_ai_opening(round_idx, ids)
        ids.extend(tok.encode(ai + "\n<|EOT|>"))

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("\n### Response:\n"))


CODER_SYS_PROMPT = (
    "You are an AI programming assistant, utilizing the DeepSeek Coder "
    "model, developed by DeepSeek Company, and you only answer questions "
    "related to computer science. For politically sensitive questions, "
    "security and privacy issues, and other non-computer science questions, "
    "you will refuse to answer.")


def make_deepseek_coder_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    """Coder regex set + <|EOT|> terminator (models/deepseek.cpp:120-145)."""
    from ..tokenizer.processor import BPEProcessor2

    tp = BPEProcessor2(DEEPSEEK_CODER_REGEX)
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tok = ChatTokenizer(tp, DeepSeekCoderEncoder(),
                        sys_prompt=CODER_SYS_PROMPT)
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.pad_token_id = base.pad_token_id
    eot = tp.piece_to_id("<|EOT|>")
    if eot >= 0:
        tok.terminate_ids.add(eot)
    return tok


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
        tok = make_deepseek_coder_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


class BailingEncoder(HistoryEncoder):
    """<role>HUMAN</role>… turns (models/bailing.cpp:79-96)."""

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode("<role>HUMAN</role>"))
        ids.extend(self.tokenizer.encode(user))

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("<role>ASSISTANT</role>"))


BAILING_REGEX = [
    r"(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])",
    r"[^\r\n\p{L}\p{N}]?\p{L}+",
    r"\p{N}",
    r" ?[^\s\p{L}\p{N}]+[\r\n]*",
    r"\s*[\r\n]",
    r"\s+(?!\S)",
    r"\s+",
]


@register_model(ModelType.BAILINGMOE)
class BailingMoE(BaseLLM):
    """Ling/Ring (models/bailing.cpp moe): deepseek-v1-MoE arch + explicit
    head_dim, role-marker template."""
    EXTRA_FMT = "8ifi"   # v1-moe fields + rope_theta + head_dim

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..tokenizer.processor import BPEProcessor2
        from .base import load_moe_experts

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, first_k_dense, moe_inter, moe_freq, n_routed, n_shared,
         norm_topk, n_active, rope_theta, head_dim) = extra
        n_layers = base.num_hidden_layers

        def is_moe(i):
            return i >= first_k_dense and i % max(moe_freq, 1) == 0

        specs = tuple(LayerSpec(is_moe=is_moe(i)) for i in range(n_layers))
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=rope_theta,
            head_dim=head_dim if head_dim > 0 else -1,
            norm_eps=1e-6, max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        cfg = replace(cfg, layer_specs=specs, moe_num_experts=n_routed,
                      moe_top_k=n_active, moe_norm_topk_prob=bool(norm_topk))
        tp = BPEProcessor2(BAILING_REGEX)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        tok = ChatTokenizer(tp, BailingEncoder(),
                            sys_prompt="You are Ling, an assistant created by inclusionAI")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        role_open = tp.piece_to_id("<role>")
        if role_open >= 0:
            tok.terminate_ids.add(role_open)
        if tp.piece_to_id("<think>") >= 0:
            tok.sys_prompt = "You are Ring, an assistant created by inclusionAI"
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
                    "gate": pb.linear(f"{pfx}.mlp.gate"),
                    "experts": load_moe_experts(pb, f"{pfx}.mlp", n_routed),
                    "shared": {
                        "gate": pb.linear(f"{pfx}.mlp.shared_experts.gate_proj"),
                        "up": pb.linear(f"{pfx}.mlp.shared_experts.up_proj"),
                        "down": pb.linear(f"{pfx}.mlp.shared_experts.down_proj"),
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


@register_model(ModelType.BAILING_MOE2)
class BailingMoE2(BaseLLM):
    """Ling/Ring 2.0 (models/bailing.cpp moe2:107-300): qk-normed partial
    rope, grouped sigmoid top-k with score-correction bias + routed scaling,
    shared expert, dense first-k layers."""
    # moe config "8ifi" + {rope_dim, n_group, topk_group} 3i + routed_scale f
    EXTRA_FMT = "8ifi3if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..tokenizer.processor import BPEProcessor2
        from .base import load_moe_experts

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, first_k_dense, moe_inter, moe_freq, n_routed, n_shared,
         norm_topk, n_active, rope_theta, head_dim, rope_dim, n_group,
         topk_group, routed_scale) = extra
        n_layers = base.num_hidden_layers

        def is_moe(i):
            return i >= first_k_dense and i % max(moe_freq, 1) == 0

        specs = tuple(LayerSpec(is_moe=is_moe(i)) for i in range(n_layers))
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=rope_theta,
            head_dim=head_dim if head_dim > 0 else -1, qk_norm="rmsnorm",
            norm_eps=1e-6, max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        cfg = replace(cfg, layer_specs=specs, moe_num_experts=n_routed,
                      moe_top_k=n_active, moe_norm_topk_prob=bool(norm_topk),
                      moe_score_func="sigmoid", moe_n_group=max(n_group, 1),
                      moe_topk_group=max(topk_group, 1),
                      moe_routed_scale=routed_scale,
                      rope=replace(cfg.rope, rot_dim=rope_dim if rope_dim > 0 else -1))
        tp = BPEProcessor2(BAILING_REGEX)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        tok = ChatTokenizer(tp, BailingEncoder(),
                            sys_prompt="You are Ling, an assistant created by inclusionAI")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        role_open = tp.piece_to_id("<role>")
        if role_open >= 0:
            tok.terminate_ids.add(role_open)
        if tp.piece_to_id("<think>") >= 0:
            tok.sys_prompt = "You are Ring, an assistant created by inclusionAI"
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
                        "gate": pb.linear(f"{pfx}.mlp.shared_experts.gate_proj"),
                        "up": pb.linear(f"{pfx}.mlp.shared_experts.up_proj"),
                        "down": pb.linear(f"{pfx}.mlp.shared_experts.down_proj"),
                    },
                }
                if pb.has(f"{pfx}.mlp.gate.expert_bias"):
                    mlp["gate_bias"] = pb.array(f"{pfx}.mlp.gate.expert_bias")
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
                    "q_norm": pb.norm(f"{pfx}.self_attn.q_norm"),
                    "k_norm": pb.norm(f"{pfx}.self_attn.k_norm"),
                },
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": mlp,
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)
