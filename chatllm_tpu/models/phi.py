"""Phi family (reference: /root/reference/models/phi.{h,cpp}).

Phi-3 (+Phi-3-SU LongRoPE, Phi-4): llama-like blocks after the converter
splits qkv_proj/gate_up_proj and permutes q/k to interleaved rope
(Phi3Converter.state_dict_pp, convert.py:4483).
"""
from __future__ import annotations

from dataclasses import replace

from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor1
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, load_moe_experts, register_model)
from .llama import build_dense_config
from .model_types import ModelType

MAX_FACTOR_LEN = 128  # models/phi.h:189


class Phi3Encoder(HistoryEncoder):
    """<|user|>\\n ... <|end|>\\n template (models/phi.cpp Phi3Tokenizer)."""

    add_bos = True

    def _msg(self, ids, text, type_tok, end_tok=True):
        tok = self.tokenizer
        if type_tok >= 0:
            ids.append(type_tok)
            if tok.nl_token_id >= 0:
                ids.append(tok.nl_token_id)
        ids.extend(tok.encode(text))
        if end_tok:
            ids.append(tok.end_token_id)
            ids.append(tok.nl_token_id)

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if self.add_bos and tok.bos_token_id >= 0:
            ids.append(tok.bos_token_id)
        if tok.sys_prompt:
            self._msg(ids, tok.sys_prompt, tok.system_token_id)

    def append_user(self, round_idx, user, ids):
        self._msg(ids, user, self.tokenizer.user_token_id)

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        tok = self.tokenizer
        ids.extend(tok.encode(ai))
        ids.append(tok.end_token_id)
        ids.append(tok.nl_token_id)

    def append_ai_opening(self, round_idx, ids):
        tok = self.tokenizer
        ids.append(tok.assistant_token_id)
        if tok.nl_token_id >= 0:
            ids.append(tok.nl_token_id)


def make_phi3_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    tp = BPEProcessor1()
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tok = ChatTokenizer(tp, Phi3Encoder(), sys_prompt="")
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.system_token_id = tp.piece_to_id("<|system|>")
    tok.user_token_id = tp.piece_to_id("<|user|>")
    tok.assistant_token_id = tp.piece_to_id("<|assistant|>")
    tok.end_token_id = tp.piece_to_id("<|end|>")
    tok.nl_token_id = tp.piece_to_id("\n")
    if tok.system_token_id < 0 and tp.get_piece_size() == 32000:
        tok.system_token_id, tok.user_token_id = 32006, 32010
        tok.assistant_token_id, tok.end_token_id = 32001, 32007
    tok.pad_token_id = tok.eos_token_id
    if tok.end_token_id >= 0:
        tok.terminate_ids.add(tok.end_token_id)
    tok.is_special_id = lambda i: i in (tok.system_token_id, tok.user_token_id,
                                        tok.assistant_token_id, tok.end_token_id)
    return tok


@register_model(ModelType.PHI2_V2, ModelType.DOLPHINPHI2_V2)
class Phi2(BaseLLM):
    """Phi-2 (HF-format files, models/phi.h v2 namespace): parallel residual
    (LMBlock2, src/layers.h:2861), LayerNorm+bias, partial NEOX rotary,
    biased gelu MLP, biased lm_head."""

    # BaseConfig + rope_dim + rope_theta (models/phi.h:85-89)
    EXTRA_FMT = "if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..nn.transformer import TransformerConfig
        from ..ops.rope import ROPE_NEOX, RopeConfig

        base, (rope_dim, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        head_dim = base.hidden_size // base.num_attention_heads
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=base.num_attention_heads,
            intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            act="gelu_tanh", norm_type="layernorm", norm_eps=1e-5,
            rope=RopeConfig(head_dim=head_dim, rot_dim=rope_dim,
                            freq_base=rope_theta, layout=ROPE_NEOX),
            qkv_bias=True, o_bias=True, parallel_residual=True,
            cache_dtype=rt.cache_dtype)
        from ..tokenizer.processor import BPEProcessor2

        tp = BPEProcessor2()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        from ..runtime.chat import ChatTokenizer

        tok = ChatTokenizer(tp, None, sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.final_layernorm", bias=True),
            "lm_head": pb.linear("lm_head", bias=True),
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
                    "o": pb.linear(f"{pfx}.self_attn.dense", bias=True),
                },
                "mlp": {
                    "up": pb.linear(f"{pfx}.mlp.fc1", bias=True),
                    "down": pb.linear(f"{pfx}.mlp.fc2", bias=True),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.PHI3)
class Phi3(BaseLLM):
    # BaseConfig + {n_kv, orig_max_pos, sliding_window} + rope_theta
    # (models/phi.h:110-116)
    EXTRA_FMT = "3if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, orig_max, sliding_window, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=rope_theta,
            sliding_window=max(0, sliding_window + 1),
            max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        tok = make_phi3_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.PHI3_SU, ModelType.PHI3_SU2, ModelType.PHI3_SU3,
                ModelType.PHI4_MINI)
class Phi3SU(BaseLLM):
    """Phi-3 small/medium 128k with SU (LongRoPE) per-dim factors
    (models/phi.h:191-201; Phi3SUSelfAttention src/layers.h:3257)."""

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        import math

        # layout (models/phi.h:191-201): {max_position_embeddings, n_kv,
        # original_max_pos, sliding_window, rope_scaling} i + rope_theta f
        # + short_factor[64] + long_factor[64]
        fmt = "5if" + f"{MAX_FACTOR_LEN}f{MAX_FACTOR_LEN}f"
        if gf.model_type in (ModelType.PHI3_SU3, ModelType.PHI4_MINI):
            fmt += "ff"   # short_mscale, long_mscale (models/phi.h:230-234)
        base, extra = BaseConfig.parse(gf, fmt)
        (max_pos, n_kv, orig_max, sliding_window, rope_scaling) = extra[:5]
        rope_theta = float(extra[5])
        long_factor = extra[6 + MAX_FACTOR_LEN:6 + 2 * MAX_FACTOR_LEN]
        rot = base.hidden_size // base.num_attention_heads
        half = rot // 2
        # use the long factors (contexts beyond orig_max use them; the
        # reference switches dynamically — long covers the serving case)
        ff = tuple(float(f) for f in long_factor[:half])
        scale = max_pos / max(orig_max, 1)
        if len(extra) > 6 + 2 * MAX_FACTOR_LEN:
            mscale = float(extra[6 + 2 * MAX_FACTOR_LEN + 1])  # long_mscale
        else:
            mscale = (1.0 if scale <= 1.0
                      else math.sqrt(1.0 + math.log(scale) / math.log(max(orig_max, 2))))
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=rope_theta,
            freq_factors=ff, sliding_window=max(0, sliding_window + 1),
            max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        cfg = replace(cfg, rope=replace(cfg.rope, mscale_all=mscale))
        tok = make_phi3_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.PHI2, ModelType.DOLPHINPHI2)
class Phi2V1(BaseLLM):
    """Phi-2 v1 file layout (models/phi.h v1 namespace): same arch as v2 but
    GPT-style tensor names (transformer.h.{i}.mixer.* / lm_head.ln) and a
    fixed rotary_dim of 32 (Phi2CrossAttention, src/layers.h:2855)."""

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..nn.transformer import TransformerConfig
        from ..ops.rope import ROPE_NEOX, RopeConfig
        from ..runtime.chat import ChatMLEncoder, ChatTokenizer
        from ..tokenizer.processor import BPEProcessor2

        base, _ = BaseConfig.parse(gf)
        head_dim = base.hidden_size // base.num_attention_heads
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=base.num_attention_heads,
            intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            act="gelu_tanh", norm_type="layernorm", norm_eps=1e-5,
            rope=RopeConfig(head_dim=head_dim, rot_dim=32,
                            freq_base=10000.0, layout=ROPE_NEOX),
            qkv_bias=True, o_bias=True, parallel_residual=True,
            cache_dtype=rt.cache_dtype)
        tp = BPEProcessor2()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        is_dolphin = gf.model_type == int(ModelType.DOLPHINPHI2)
        enc = ChatMLEncoder() if is_dolphin else None
        tok = ChatTokenizer(tp, enc,
                            sys_prompt="You are Dolphin, a helpful AI assistant." if is_dolphin else "")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        if is_dolphin:
            tok.im_start_token_id = tp.piece_to_id("<|im_start|>")
            tok.im_end_token_id = tp.piece_to_id("<|im_end|>")
            if tok.im_end_token_id >= 0:
                tok.terminate_ids.add(tok.im_end_token_id)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("transformer.embd.wte.weight"),
            "final_norm": pb.norm("lm_head.ln", bias=True),
            "lm_head": pb.linear("lm_head.linear", bias=True),
            "layers": [],
        }
        for i in range(base.num_hidden_layers):
            pfx = f"transformer.h.{i}"
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.ln", bias=True),
                "attn": {
                    "q": pb.linear(f"{pfx}.mixer.q_proj", bias=True),
                    "k": pb.linear(f"{pfx}.mixer.k_proj", bias=True),
                    "v": pb.linear(f"{pfx}.mixer.v_proj", bias=True),
                    "o": pb.linear(f"{pfx}.mixer.out_proj", bias=True),
                },
                "mlp": {
                    "up": pb.linear(f"{pfx}.mlp.fc1", bias=True),
                    "down": pb.linear(f"{pfx}.mlp.fc2", bias=True),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


class Phi4Encoder(HistoryEncoder):
    """<|im_start|>{role}<|im_sep|>{content}<|im_end|> (models/phi.cpp v4
    ChatHistoryEncoder:536-570)."""

    def _role(self, role, ids):
        tok = self.tokenizer
        ids.append(tok.im_start_token_id)
        ids.extend(tok.encode(role))
        ids.append(tok.im_sep_token_id)

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if tok.sys_prompt:
            self._role("system", ids)
            ids.extend(tok.encode(tok.sys_prompt))
            ids.append(tok.im_end_token_id)

    def append_user(self, round_idx, user, ids):
        self._role("user", ids)
        ids.extend(self.tokenizer.encode(user))
        ids.append(self.tokenizer.im_end_token_id)

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        ids.extend(self.tokenizer.encode(ai))
        ids.append(self.tokenizer.im_end_token_id)

    def append_ai_opening(self, round_idx, ids):
        self._role("assistant", ids)


def make_phi4_tokenizer(gf, base):
    from ..tokenizer.processor import BPEProcessor2

    tp = BPEProcessor2()
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tp.enable_return_special_token(True)
    tok = ChatTokenizer(tp, Phi4Encoder(), sys_prompt="")
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.pad_token_id = base.eos_token_id
    tok.im_start_token_id = tp.piece_to_id("<|im_start|>")
    tok.im_sep_token_id = tp.piece_to_id("<|im_sep|>")
    tok.im_end_token_id = tp.piece_to_id("<|im_end|>")
    if tok.im_end_token_id >= 0:
        tok.terminate_ids.add(tok.im_end_token_id)
    return tok


@register_model(ModelType.PHI4)
class Phi4(BaseLLM):
    """Phi-4: llama-v3 arch + ChatML-with-<|im_sep|> template
    (models/phi.cpp v4:492-573)."""
    EXTRA_FMT = "if"    # llama v3 config (models/llama.h:103)

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .llama import build_dense_config

        base, (n_kv, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tok = make_phi4_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.PHI3_MOE)
class Phi3MoE(BaseLLM):
    """Phi-3.5-MoE: SU-rope biased attention, LayerNorm blocks, sparsemixer
    top-2 routing (models/phi.h:246-380; HF modeling_phimoe is ground truth
    for the router since the reference custom op is WIP)."""
    EXTRA_FMT = "5if" + f"{MAX_FACTOR_LEN}f{MAX_FACTOR_LEN}f" + "ff" + "2i"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        import math as _math

        from ..nn.transformer import LayerSpec, TransformerConfig
        from ..ops.rope import ROPE_NEOX, RopeConfig

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (max_pos, n_kv, orig_max, sliding_window, rope_scaling) = extra[:5]
        rope_theta = float(extra[5])
        long_factor = extra[6 + MAX_FACTOR_LEN:6 + 2 * MAX_FACTOR_LEN]
        short_mscale, long_mscale = extra[6 + 2 * MAX_FACTOR_LEN:
                                          6 + 2 * MAX_FACTOR_LEN + 2]
        n_active, n_experts = extra[-2:]
        rot = base.hidden_size // base.num_attention_heads
        half = rot // 2
        scale = max_pos / max(orig_max, 1)
        ff = tuple(float(f) for f in long_factor[:half]) if rope_scaling else None
        mscale = (long_mscale if rope_scaling and long_mscale > 0 else 1.0)
        max_len = rt.max_length if rt.max_length > 0 else base.max_length
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv,
            intermediate_size=base.intermediate_size,
            max_length=max_len, norm_type="layernorm", norm_eps=1e-5,
            rope=RopeConfig(head_dim=rot, freq_base=rope_theta,
                            layout=ROPE_NEOX, freq_factors=ff,
                            mscale_all=mscale, orig_ctx=orig_max),
            qkv_bias=True, o_bias=True,
            layer_specs=tuple(LayerSpec(is_moe=True)
                              for _ in range(base.num_hidden_layers)),
            moe_num_experts=n_experts, moe_top_k=n_active,
            moe_score_func="sparsemixer",
            # the sparsemixer mask threshold is the HF config's
            # router_jitter_noise (PhimoeSparseMoeBlock passes it as
            # jitter_eps); 0.01 is Phi-3.5-MoE's shipped value
            moe_jitter_eps=float(((gf.meta or {}).get("config.json") or {})
                                 .get("router_jitter_noise", 0.01)),
            cache_dtype=rt.cache_dtype)
        tok = make_phi3_tokenizer(gf, base)
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
                    "gate": pb.linear(f"{pfx}.block_sparse_moe.gate",
                                      bias=False),
                    # w1=gate, w3=up, w2=down
                    "experts": load_moe_experts(
                        pb, f"{pfx}.block_sparse_moe", n_experts,
                        names=("w1", "w3", "w2")),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)
