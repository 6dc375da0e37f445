"""Round-2 zoo wave 3: Solar-Pro, Llama-2-Plus, GLM-MoE-Lite, Hunyuan-V3,
Youtu (Tencent MLA dense).

Reference files: /root/reference/models/solar.cpp, models/llama.{h,cpp}
(v2_plus), models/chatglm.cpp (glm::moe_lite), models/hunyuan.cpp (v3,
youtu::llm).
"""
from __future__ import annotations

from dataclasses import replace as _replace

from ..nn.transformer import LayerSpec, MLAConfig, TransformerConfig
from ..ops.rope import ROPE_NEOX, ROPE_NORMAL, RopeConfig
from ..runtime.chat import ChatMLEncoder, ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor1, BPEProcessor2
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .deepseek import DeepSeekV2
from .llama import build_dense_config
from .model_types import ModelType


# ---------------------------------------------------------------------------
# Solar-Pro (models/solar.cpp): llama + 2048-window SWA + depth-up-scaling
# skip connections (bskcn): layer pairs (src, dst) with blend alpha
# ---------------------------------------------------------------------------

SOLAR_MAX_PAIRS = 20  # solar.cpp:6 MAX_LEN


class SolarEncoder(HistoryEncoder):
    """ChatML-shaped turns over a sentencepiece vocab (solar.cpp
    ChatHistoryEncoder:96-133): bos <|im_start|>system\\n{sys}<|im_end|>\\n
    <|im_start|>user\\n... — the role word is plain text after im_start."""

    def _role(self, role, ids):
        tok = self.tokenizer
        ids.append(tok.im_start_token_id)
        ids.extend(tok.encode(role))
        ids.append(tok.nl_token_id)

    def _close(self, ids):
        tok = self.tokenizer
        ids.append(tok.im_end_token_id)
        ids.append(tok.nl_token_id)

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        self._role("system", ids)
        ids.extend(tok.encode(tok.sys_prompt))
        self._close(ids)

    def append_user(self, round_idx, user, ids):
        self._role("user", ids)
        ids.extend(self.tokenizer.encode(user))
        self._close(ids)

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        ids.extend(self.tokenizer.encode(ai))
        self._close(ids)

    def append_ai_opening(self, round_idx, ids):
        self._role("assistant", ids)

    def append_user_opening(self, round_idx, ids):
        self._role("user", ids)


@register_model(ModelType.SOLARPRO)
class SolarPro(BaseLLM):
    # BaseConfig + {n_kv, sliding_window, pairs_num, fwd_ids[40]} +
    # {rope_theta, layer_alpha} (solar.cpp:8-16)
    EXTRA_FMT = f"{3 + 2 * SOLAR_MAX_PAIRS}i2f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        n_kv, window, pairs_num = extra[:3]
        fwd_ids = extra[3:3 + 2 * SOLAR_MAX_PAIRS]
        rope_theta, layer_alpha = extra[3 + 2 * SOLAR_MAX_PAIRS:]
        pairs = tuple((fwd_ids[2 * i], fwd_ids[2 * i + 1])
                      for i in range(pairs_num))
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta,
                                 sliding_window=window + 1,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = _replace(cfg, layer_fwd=pairs, layer_fwd_alpha=layer_alpha)
        tp = BPEProcessor1()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        tok = ChatTokenizer(tp, SolarEncoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        tok.im_start_token_id = tp.piece_to_id("<|im_start|>")
        tok.im_end_token_id = tp.piece_to_id("<|im_end|>")
        tok.nl_token_id = tp.encode("\n")[0]
        tok.terminate_ids.add(tok.im_end_token_id)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# Llama-2-Plus (models/llama.h:226 v2_plus): llama-v3 config with the v2
# sentencepiece tokenizer; switches to ChatML when the checkpoint's HF
# chat_template uses <|im_start|> (llama.cpp:407-430)
# ---------------------------------------------------------------------------

@register_model(ModelType.LLAMA2PLUS)
class Llama2Plus(BaseLLM):
    EXTRA_FMT = "if"   # n_kv, rope_theta (v3::Config)

    NANBEIGE_SYS = ("你是南北阁，一款由BOSS直聘自主研发并训练的专业大语言"
                    "模型。")

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .llama import DEFAULT_V2_SYS_PROMPT, Llama2Encoder

        base, (n_kv, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tp = BPEProcessor1()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        meta = gf.meta or {}
        tmpl = str((meta.get("tokenizer_config.json") or {})
                   .get("chat_template", ""))
        name = str(meta.get("model_name", "")).lower()
        if "<|im_start|>" in tmpl:
            tp.enable_return_special_token(True)
            sys_prompt = cls.NANBEIGE_SYS if name.startswith("nanbeige") else ""
            tok = ChatTokenizer(tp, ChatMLEncoder(), sys_prompt=sys_prompt)
            tok.im_start_token_id = tp.piece_to_id("<|im_start|>")
            tok.im_end_token_id = tp.piece_to_id("<|im_end|>")
            tok.nl_token_id = tp.encode("\n")[0]
            tok.terminate_ids.add(tok.im_end_token_id)
        else:
            tok = ChatTokenizer(tp, Llama2Encoder(),
                                sys_prompt=DEFAULT_V2_SYS_PROMPT)
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# GLM-MoE-Lite (models/chatglm.cpp:1273): DeepSeek-V2 MLA + 64-expert
# sigmoid MoE with score-correction bias, GLM4 chat template with a
# <think>/</think> ai prefix
# ---------------------------------------------------------------------------

@register_model(ModelType.GLM_MOE_LITE)
class GLMMoELite(DeepSeekV2):
    """glm::moe_lite (chatglm.cpp:1286): v2_light arch + q_lora_rank with
    ScoreFunc::Sigmoid, gate bias, always_scaling; GLM-4-0414 tokenizer
    (no nl after role) and a thinking prefix on the ai turn."""

    SCORE_FUNC = "sigmoid"
    HAS_GATE_BIAS = True

    @classmethod
    def make_tokenizer(cls, gf, base):
        from .glm import GLM4Encoder, make_glm4_tokenizer

        class Encoder(GLM4Encoder):
            add_nl_token = False

            def append_ai_opening(self, round_idx, ids):
                super().append_ai_opening(round_idx, ids)
                # default non-thinking: prefix the closed think tag
                # (chatglm.cpp get_ai_prefix)
                think = "<think>" if getattr(
                    self.tokenizer, "enable_thinking", False) else "</think>"
                ids.extend(self.tokenizer.encode(think))

        tok = make_glm4_tokenizer(gf, base)
        tok.chat_encoder = Encoder()
        tok.chat_encoder.tokenizer = tok
        tok.enable_thinking = False
        return tok


# ---------------------------------------------------------------------------
# Hunyuan-V3 (models/hunyuan.cpp:2106): dense_v1 attention (explicit
# head_dim, post-rope qk norm) + first_k_dense dense layers then 128-expert
# sigmoid MoE with shared experts and always-on routed scaling
# ---------------------------------------------------------------------------

@register_model(ModelType.HUNYUAN_V3)
class HunyuanV3(BaseLLM):
    # BaseConfig + {n_kv, head_dim, first_k_dense, n_experts, n_shared,
    # expert_hidden, moe_inter, n_active, tie} + {rope_theta, router_scale}
    EXTRA_FMT = "9i2f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .base import load_moe_experts
        from .misc_wave2 import HUNYUAN_V1_REGEX, HunyuanV1Encoder

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, head_dim, first_k_dense, n_experts, n_shared, _expert_hidden,
         moe_inter, n_active, tie) = extra[:9]
        rope_theta, router_scale = extra[9:]
        n_layers = base.num_hidden_layers
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, rope_layout=ROPE_NEOX,
                                 head_dim=head_dim, tie_lm_head=bool(tie),
                                 qk_norm="rmsnorm_post",
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        specs = tuple(LayerSpec(is_moe=(i >= first_k_dense))
                      for i in range(n_layers))
        cfg = _replace(cfg, layer_specs=specs,
                       moe_num_experts=n_experts, moe_top_k=n_active,
                       moe_norm_topk_prob=True, moe_score_func="sigmoid",
                       moe_routed_scale=router_scale)
        tp = BPEProcessor2(HUNYUAN_V1_REGEX)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        tok = ChatTokenizer(tp, HunyuanV1Encoder(), sys_prompt="")
        tok.hy_user_token_id = tp.piece_to_id("<｜hy_User｜>")
        tok.hy_assistant_token_id = tp.piece_to_id("<｜hy_Assistant｜>")
        tok.bos_token_id = base.bos_token_id
        eos = tp.piece_to_id("<eos:6124c78e>")   # hunyuan.cpp v3 Tokenizer
        tok.eos_token_id = eos if eos >= 0 else base.eos_token_id
        tok.terminate_ids.add(tok.eos_token_id)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "layers": [],
        }
        if not tie:
            params["lm_head"] = pb.linear("lm_head")
        for i in range(n_layers):
            pfx = f"model.layers.{i}"
            attn = {
                "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                # HYV3 GGMM files store q_norm/k_norm (reference
                # HunYuanV3Converter.get_weight_names:8712)
                "q_norm": pb.norm(f"{pfx}.self_attn.q_norm"),
                "k_norm": pb.norm(f"{pfx}.self_attn.k_norm"),
            }
            if i < first_k_dense:
                mlp = {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                }
            else:
                mlp = {
                    "gate": pb.linear(f"{pfx}.mlp.gate"),
                    "gate_bias": pb.array(f"{pfx}.mlp.expert_bias"),
                    "experts": load_moe_experts(pb, f"{pfx}.mlp", n_experts),
                    "shared": {
                        "gate": pb.linear(f"{pfx}.mlp.shared_expert.gate_proj"),
                        "up": pb.linear(f"{pfx}.mlp.shared_expert.up_proj"),
                        "down": pb.linear(f"{pfx}.mlp.shared_expert.down_proj"),
                    },
                }
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "attn": attn,
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": mlp,
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# Youtu (models/hunyuan.cpp:926 youtu::llm): dense MLA (DeepSeek2Block, no
# MoE) with a DeepSeek-R1-style <|User|>/<|Assistant|> template
# ---------------------------------------------------------------------------

YOUTU_REGEX = [
    "[\r\n]",
    r"\s?\p{L}+",
    r"\s?\p{P}+",
    "[一-龥ࠀ-一가-퟿]+",
    r"\p{N}",
]


class YoutuEncoder(HistoryEncoder):
    """bos {sys} <|User|>{user}eos<|Assistant|>{ai}eos
    (hunyuan.cpp:995-1026)."""

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        if tok.sys_prompt:
            ids.extend(tok.encode(tok.sys_prompt))

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        ids.append(tok.user_token_id)
        ids.extend(tok.encode(user))
        ids.append(tok.eos_token_id)

    def append_ai(self, round_idx, ai, ids):
        tok = self.tokenizer
        self.append_ai_opening(round_idx, ids)
        ids.extend(tok.encode(ai))
        ids.append(tok.eos_token_id)

    def append_ai_opening(self, round_idx, ids):
        ids.append(self.tokenizer.assistant_token_id)


@register_model(ModelType.YOUTU)
class Youtu(BaseLLM):
    # BaseConfig + {n_kv, kv_lora_rank, q_lora_rank, qk_nope, qk_rope,
    # v_head_dim, tie} + rope_theta (hunyuan.cpp:928-940)
    EXTRA_FMT = "7if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, kv_lora_rank, q_lora_rank, qk_nope, qk_rope, v_head_dim,
         tie) = extra[:7]
        rope_theta = extra[7]
        n_layers = base.num_hidden_layers
        dk = qk_nope + qk_rope
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=n_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=base.num_attention_heads,
            intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            norm_eps=1e-6, tie_lm_head=bool(tie),
            rope=RopeConfig(head_dim=qk_rope, rot_dim=qk_rope,
                            freq_base=rope_theta, layout=ROPE_NORMAL),
            attention_scale=dk ** -0.5,
            mla=MLAConfig(q_lora_rank=q_lora_rank, kv_lora_rank=kv_lora_rank,
                          qk_nope_head_dim=qk_nope, qk_rope_head_dim=qk_rope,
                          v_head_dim=v_head_dim),
            mla_compressed=(rt.mla_cache == "memory"),
            cache_dtype=rt.cache_dtype)
        tp = BPEProcessor2(YOUTU_REGEX)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        tok = ChatTokenizer(tp, YoutuEncoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        tok.user_token_id = tp.piece_to_id("<|User|>")
        tok.assistant_token_id = tp.piece_to_id("<|Assistant|>")
        tok.terminate_ids.add(tok.eos_token_id)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "layers": [],
        }
        if not tie:
            params["lm_head"] = pb.linear("lm_head")
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
            if q_lora_rank > 0:
                attn["d_q"] = pb.linear(f"{pfx}.self_attn.d_q_proj")
                attn["q_norm"] = pb.norm(f"{pfx}.self_attn.q_norm")
                attn["u_q"] = pb.linear(f"{pfx}.self_attn.u_q_proj")
            else:
                attn["q"] = pb.linear(f"{pfx}.self_attn.q_proj")
            if cfg.mla_compressed:
                import jax.numpy as jnp

                from ..ops.qmm import dense_weight

                h_ = base.num_attention_heads
                adt = jnp.dtype(rt.compute_dtype)
                attn["wk_abs"] = dense_weight(attn["u_k_nope"]).reshape(
                    kv_lora_rank, h_, qk_nope).astype(adt)
                attn["wv_abs"] = dense_weight(attn["u_v"]).reshape(
                    kv_lora_rank, h_, v_head_dim).astype(adt)
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "attn": attn,
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)
