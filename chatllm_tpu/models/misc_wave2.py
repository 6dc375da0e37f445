"""Round-2 small-arch wave: Apriel, Reka-Flash-3, RNJ-1, JiuTian,
CodeFuse-DeepSeek (reference models/{apriel,reka,rnj,jiutian,codefuse}.cpp).

Each is a config/template variant over an existing block family; the rope
setups are reproduced from their ConditionalGeneration ctors."""
from __future__ import annotations

from dataclasses import replace

import numpy as np

from ..ops.rope import ROPE_NEOX
from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor2
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .llama import build_dense_config
from .model_types import ModelType

APRIEL_REGEX = [
    r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*[\p{Ll}\p{Lm}\p{Lo}\p{M}]+|[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+[\p{Ll}\p{Lm}\p{Lo}\p{M}]*|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n/]*|\s*[\r\n]+|\s+(?!\S)|\s+",
]

REKA_REGEX = [
    r"(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+",
]


class BracketRoleEncoder(HistoryEncoder):
    """<|system|>\\n.. / <|user|>\\n.. / <|assistant|>\\n.. turns
    (reference HistoryEncoderBracketRole, src/chat_encoders.cpp:104-151)
    with per-model role endings."""

    ending = ""
    auto_add_bos = True

    def _end(self, ids):
        if self.ending:
            ids.extend(self.tokenizer.encode(self.ending))

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if self.auto_add_bos and tok.bos_token_id >= 0:
            ids.append(tok.bos_token_id)
        if tok.sys_prompt:
            ids.extend(tok.encode(f"<|system|>\n{tok.sys_prompt}"))
            self._end(ids)

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode(f"<|user|>\n{user}"))
        self._end(ids)

    def append_ai(self, round_idx, ai, ids):
        ids.extend(self.tokenizer.encode(f"<|assistant|>\n{ai}"))
        self._end(ids)

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("<|assistant|>\n"))


class AprielEncoder(BracketRoleEncoder):
    ending = "\n<|end|>\n"


@register_model(ModelType.APRIEL)
class Apriel(BaseLLM):
    """Apriel: llama-v3 blocks + YaRN + bracket-role template with
    <|end|> endings (models/apriel.cpp)."""
    # llama v3 {n_kv, rope_theta} + {head_dim, orig_max} i +
    # {beta_fast, beta_slow, factor} f
    EXTRA_FMT = "if2i3f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, rope_theta, head_dim, orig_max, beta_fast, beta_slow,
         factor) = extra
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, head_dim=head_dim,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        if factor > 1.0 and orig_max > 0:
            cfg = replace(cfg, rope=replace(
                cfg.rope, freq_scale=1.0 / factor, ext_factor=1.0,
                attn_factor=1.0, beta_fast=beta_fast, beta_slow=beta_slow,
                orig_ctx=orig_max))
        tp = BPEProcessor2(APRIEL_REGEX)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        tok = ChatTokenizer(tp, AprielEncoder(),
                            sys_prompt="You are a helpful AI assistant that "
                            "provides accurate and concise information.")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        end = tp.piece_to_id("<|end|>")
        if end >= 0:
            tok.terminate_ids.add(end)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


class RekaEncoder(HistoryEncoder):
    """'human: ... <sep> assistant: ... <sep>' plain-text turns
    (models/reka.cpp:6-37)."""

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        text = "human: "
        if round_idx == 0 and tok.sys_prompt:
            text += tok.sys_prompt + " "
        ids.extend(tok.encode(text + user + " <sep> "))

    def append_ai(self, round_idx, ai, ids):
        ids.extend(self.tokenizer.encode(f"assistant: {ai} <sep> "))

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("assistant: "))


@register_model(ModelType.REKA_FLASH3)
class RekaFlash3(BaseLLM):
    """Reka-Flash-3: llama-v3 arch; generation terminates on the token
    SEQUENCE ' <sep>' (models/reka.cpp is_output_terminated:82-108 — the
    engine's terminate_seq holdback reproduces it)."""
    EXTRA_FMT = "if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tp = BPEProcessor2(REKA_REGEX)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tok = ChatTokenizer(tp, RekaEncoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        tok.terminate_seq = tp.encode(" <sep>")
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.RNJ_1)
class RNJ1(BaseLLM):
    """RNJ-1 (Essential AI): gemma3 arch + YaRN + attention/final softcaps
    (models/rnj.cpp)."""
    # gemma3 "5i3f" + {attn_factor, beta_fast, beta_slow,
    # extrapolation_factor, factor} 5f + orig_max i + {final_cap, attn_cap} 2f
    EXTRA_FMT = "5i3f5fi2f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .gemma import Gemma3

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (attn_factor, beta_fast, beta_slow, ext_factor, factor) = extra[8:13]
        orig_max = extra[13]
        final_cap, attn_cap = extra[14:16]
        model = Gemma3.load(gf, rt)
        cfg = model.cfg
        if factor > 1.0 and orig_max > 0:
            cfg = replace(cfg, rope=replace(
                cfg.rope, freq_scale=1.0 / factor, ext_factor=ext_factor,
                attn_factor=attn_factor, beta_fast=beta_fast,
                beta_slow=beta_slow, orig_ctx=orig_max))
        cfg = replace(cfg,
                      logit_softcap=max(0.0, attn_cap),
                      final_logit_softcap=max(0.0, final_cap))
        tok = model.tokenizer
        tok.sys_prompt = "You are rnj-1, a foundation model trained by Essential AI.\n"
        m = cls(gf.model_type, cfg, model.params, tok,
                native_config=base, meta=gf.meta)
        return m


@register_model(ModelType.JIUTIAN)
class JiuTian(BaseLLM):
    """JiuTian: qwen2 arch with an explicit tie flag (models/jiutian.cpp)."""
    EXTRA_FMT = "2if"   # n_kv, tie, rope_theta

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .qwen import make_qwen_tokenizer

        base, (n_kv, tie_flag, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, rope_layout="neox",
                                 qkv_bias=True, tie_lm_head=bool(tie_flag),
                                 norm_eps=1e-6, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tok = make_qwen_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers,
                                          tie_lm_head=bool(tie_flag))
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


class CodeFuseDeepSeekEncoder(HistoryEncoder):
    """'<s>role\\n{content}\\n' turns, ai ends with eos; bos terminates
    (models/codefuse.cpp:12-94)."""

    def _seg(self, text, ids, bos=True, eos=False):
        tok = self.tokenizer
        if bos and tok.bos_token_id >= 0:
            ids.append(tok.bos_token_id)
        ids.extend(tok.encode(text))
        if eos and tok.eos_token_id >= 0:
            ids.append(tok.eos_token_id)

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if tok.sys_prompt:
            self._seg(f"system\n{tok.sys_prompt}\n", ids)

    def append_user(self, round_idx, user, ids):
        self._seg(f"human\n{user}\n", ids)

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        self._seg(ai, ids, bos=False, eos=True)

    def append_ai_opening(self, round_idx, ids):
        self._seg("bot\n", ids)


@register_model(ModelType.CODEFUSE_DEEPSEEK)
class CodeFuseDeepSeek(BaseLLM):
    """CodeFuse-DeepSeek-33B: llama-v2 blocks, deepseek-coder vocab,
    role-word template, terminates on bos (models/codefuse.cpp)."""
    EXTRA_FMT = "iff"   # n_kv, rope_scaling, rope_theta

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_scaling, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, norm_eps=1e-6,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        if rope_scaling > 0 and rope_scaling != 1.0:
            cfg = replace(cfg, rope=replace(cfg.rope,
                                            freq_scale=1.0 / rope_scaling))
        tp = BPEProcessor2()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tok = ChatTokenizer(tp, CodeFuseDeepSeekEncoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        tok.terminate_ids.add(base.bos_token_id)
        tok.terminate_ids.add(base.eos_token_id)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.COHERE_COMMAND_R7B)
class CohereCommandR7B(BaseLLM):
    """Command-R7B (cohere v2, models/cohere.cpp:197-336): parallel-residual
    LayerNorm blocks; SWA layers carry rope, every `pattern`-th layer is
    global attention with NO positional encoding (NoPE)."""
    EXTRA_FMT = "3iff"  # n_kv, sliding_window, pattern, rope_theta, logit_scale

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..nn.transformer import LayerSpec, TransformerConfig
        from ..ops.rope import ROPE_NORMAL, RopeConfig

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        n_kv, sliding_window, pattern, rope_theta, logit_scale = extra
        n_layers = base.num_hidden_layers
        # layer % pattern < pattern-1 -> SWA(+rope); else global NoPE
        specs = tuple(
            LayerSpec(sliding_window=sliding_window)
            if (i % max(pattern, 1)) < pattern - 1 else
            LayerSpec(use_rope=False)
            for i in range(n_layers))
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=n_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv,
            intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            norm_type="layernorm", norm_eps=1e-5,
            rope=RopeConfig(head_dim=base.hidden_size // base.num_attention_heads,
                            freq_base=rope_theta, layout=ROPE_NORMAL),
            parallel_residual=True, tie_lm_head=True, logit_scale=logit_scale,
            layer_specs=specs, cache_dtype=rt.cache_dtype)
        from .misc_llama import make_cohere_tokenizer

        tok = make_cohere_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm", bias=False),
            "layers": [],
        }
        for i in range(n_layers):
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
        return cls(gf.model_type, cfg, params, tok,
                   native_config=base, meta=gf.meta)


@register_model(ModelType.INSTELLA)
class Instella(BaseLLM):
    """AMD Instella (models/instella.cpp): llama blocks with full-projection
    qk-norm, pre_attention/pre_feedforward norm names, ChatML-ish OLMo
    tokenizer."""
    EXTRA_FMT = "if"    # n_kv, rope_theta

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..runtime.chat import ChatMLEncoder

        base, (n_kv, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, rope_layout="neox",
                                 qk_norm="rmsnorm_full",
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tp = BPEProcessor2()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        tok = ChatTokenizer(tp, ChatMLEncoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        tok.im_start_token_id = tp.piece_to_id("<|im_start|>")
        tok.im_end_token_id = tp.piece_to_id("<|im_end|>")
        if tok.im_end_token_id >= 0:
            tok.terminate_ids.add(tok.im_end_token_id)
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
                "attn_norm": pb.norm(f"{pfx}.pre_attention_layernorm"),
                "ffn_norm": pb.norm(f"{pfx}.pre_feedforward_layernorm"),
                "attn": {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                    "q_norm": pb.norm(f"{pfx}.self_attn.q_norm"),
                    "k_norm": pb.norm(f"{pfx}.self_attn.k_norm"),
                },
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


class PanguEncoder(HistoryEncoder):
    """[unused9]{role}：{content}[unused10] turns (models/pangu.cpp:5-82)."""

    def _item(self, tag, ids, content=None):
        tok = self.tokenizer
        ids.append(tok.unused9_token_id)
        text = f"{tag}："
        if content is not None:
            ids.extend(tok.encode(text + content))
            ids.append(tok.unused10_token_id)
        else:
            ids.extend(tok.encode(text))

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        self._item("系统", ids, tok.sys_prompt)

    def append_user(self, round_idx, user, ids):
        self._item("用户", ids, user)

    def append_ai(self, round_idx, ai, ids):
        self._item("助手", ids, ai)

    def append_ai_opening(self, round_idx, ids):
        self._item("助手", ids)

    def append_user_opening(self, round_idx, ids):
        self._item("用户", ids)


PANGU_SYS = ("你必须严格遵守法律法规和社会道德规范。生成任何内容时，都应避免涉及暴力、色情、"
             "恐怖主义、种族歧视、性别歧视等不当内容。一旦检测到输入或输出有此类倾向，应拒绝"
             "回答并发出警告。例如，如果输入内容包含暴力威胁或色情描述，应返回错误信息："
             "“您的输入包含不当内容，无法处理。")


def make_pangu_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    from ..tokenizer.processor import BPEProcessor1

    tp = BPEProcessor1()
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tok = ChatTokenizer(tp, PanguEncoder(), sys_prompt=PANGU_SYS)
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.pad_token_id = tp.piece_to_id("<pad>")
    tok.unused9_token_id = tp.piece_to_id("[unused9]")
    tok.unused10_token_id = tp.piece_to_id("[unused10]")
    ts, te = tp.piece_to_id("[unused16]"), tp.piece_to_id("[unused17]")
    if ts >= 0:
        tp.override_token_decoding(ts, "<think>")
        tp.override_token_decoding(te, "</think>")
    return tok


@register_model(ModelType.PANGU_EMBEDDED)
class PanguEmbedded(BaseLLM):
    """openPangu-Embedded: llama blocks with fully-biased attention
    (models/pangu.cpp embedded:180-224)."""
    EXTRA_FMT = "2if"   # n_kv, tie, rope_theta

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, tie_flag, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        # FullBiasedSelfAttention hardcodes RoPEMode::Original (NEOX,
        # layers.h:2505) and PanguEmbeddedConverter does NOT permute q/k —
        # file-format parity requires the NEOX layout here
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, rope_layout=ROPE_NEOX,
                                 tie_lm_head=bool(tie_flag),
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        from dataclasses import replace as _r
        cfg = _r(cfg, qkv_bias=True, o_bias=True)
        tok = make_pangu_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers,
                                          tie_lm_head=bool(tie_flag))
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


HUNYUAN_V1_REGEX = [
    r"(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+",
]


class HunyuanV1Encoder(HistoryEncoder):
    """<hy_User>{user}<hy_Assistant>{ai}eos turns (hunyuan.cpp dense_v1
    ChatHistoryEncoder:220-253)."""

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        if tok.sys_prompt:
            ids.extend(tok.encode(tok.sys_prompt))

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        ids.append(tok.hy_user_token_id)
        ids.extend(tok.encode(user))

    def append_ai(self, round_idx, ai, ids):
        tok = self.tokenizer
        self.append_ai_opening(round_idx, ids)
        ids.extend(tok.encode(ai))
        ids.append(tok.eos_token_id)

    def append_ai_opening(self, round_idx, ids):
        ids.append(self.tokenizer.hy_assistant_token_id)


class HunyuanV1Extra04Encoder(HistoryEncoder):
    """{user}<|extra_0|>{ai}eos, sys ends with <|extra_4|>
    (hunyuan.cpp:255-288)."""

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        if tok.sys_prompt:
            ids.extend(tok.encode(tok.sys_prompt))
            ids.append(tok.extra_4_token_id)

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        ids.extend(tok.encode(user))
        ids.append(tok.extra_0_token_id)

    def append_ai(self, round_idx, ai, ids):
        tok = self.tokenizer
        ids.extend(tok.encode(ai))
        ids.append(tok.eos_token_id)


@register_model(ModelType.HUNYUAN_DENSE_V1)
class HunyuanDenseV1(BaseLLM):
    """Hunyuan dense v1 (hy_User template generation) — hunyuan dense arch
    + explicit head_dim (models/hunyuan.cpp:145-300)."""
    EXTRA_FMT = "ifi"   # n_kv, rope_theta, head_dim

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_theta, head_dim) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, rope_layout="neox",
                                 head_dim=head_dim, tie_lm_head=True,
                                 qk_norm="rmsnorm_post",
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tp = BPEProcessor2(HUNYUAN_V1_REGEX)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        hy_user = tp.piece_to_id("<｜hy_User｜>")
        if hy_user >= 0:
            tok = ChatTokenizer(tp, HunyuanV1Encoder(), sys_prompt="")
            tok.hy_user_token_id = hy_user
            tok.hy_assistant_token_id = tp.piece_to_id("<｜hy_Assistant｜>")
            tok.bos_token_id = tp.piece_to_id("<｜hy_begin▁of▁sentence｜>")
            tok.eos_token_id = tp.piece_to_id("<｜hy_place▁holder▁no▁2｜>")
        else:
            tok = ChatTokenizer(tp, HunyuanV1Extra04Encoder(), sys_prompt="")
            tok.bos_token_id = base.bos_token_id
            tok.eos_token_id = base.eos_token_id
            tok.extra_0_token_id = tp.piece_to_id("<|extra_0|>")
            tok.extra_4_token_id = tp.piece_to_id("<|extra_4|>")
        tok.terminate_ids.add(tok.eos_token_id)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers,
                                          tie_lm_head=True)
        for i, layer in enumerate(params["layers"]):
            pfx = f"model.layers.{i}.self_attn"
            if pb.has(f"{pfx}.query_layernorm.weight"):
                layer["attn"]["q_norm"] = pb.norm(f"{pfx}.query_layernorm")
                layer["attn"]["k_norm"] = pb.norm(f"{pfx}.key_layernorm")
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


class ApertusChatEncoder(HistoryEncoder):
    """<|system_start|>..<|system_end|> <|developer_start|>..<|developer_end|>
    <|user_start|>..<|user_end|> <|assistant_start|>..<|assistant_end|>
    (models/apertus.cpp:110-157)."""

    def _seg(self, content, start, end, ids):
        if start >= 0:
            ids.append(start)
        ids.extend(self.tokenizer.encode(content))
        if end >= 0:
            ids.append(end)

    def append_sys_prompt(self, ids):
        import datetime

        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        if not tok.sys_prompt:
            s = ("You are Apertus, a helpful assistant created by the SwissAI "
                 "initiative.\nKnowledge cutoff: 2024-04\nCurrent date: "
                 + datetime.date.today().isoformat())
            self._seg(s, tok.system_token_id, tok.end_system_token_id, ids)
            thinking = "enabled" if getattr(tok, "enable_thinking", False) else "disabled"
            self._seg(f"Deliberation: {thinking}\nTool Capabilities: disabled",
                      tok.developer_token_id, tok.end_developer_token_id, ids)
        else:
            s = tok.sys_prompt
            if not s.startswith("<|system_start|>"):
                ids.append(tok.system_token_id)
            ids.extend(tok.encode(s))
            if "<|system_end|>" not in s:
                ids.append(tok.end_system_token_id)

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        self._seg(user, tok.user_token_id, tok.end_user_token_id, ids)

    def append_ai(self, round_idx, ai, ids):
        tok = self.tokenizer
        self._seg(ai, tok.assistant_token_id, tok.end_assistant_token_id, ids)

    def append_ai_opening(self, round_idx, ids):
        ids.append(self.tokenizer.assistant_token_id)

    def append_user_opening(self, round_idx, ids):
        ids.append(self.tokenizer.user_token_id)


def _softplus(x: float) -> float:
    import math

    return math.log1p(math.exp(-abs(x))) + max(x, 0.0)


@register_model(ModelType.APERTUS)
class Apertus(BaseLLM):
    """Apertus (SwissAI): llama blocks with per-head qk-norm, llama3-style
    per-dim rope factors, and the xIELU MLP with per-layer learned scalars
    (models/apertus.cpp; xielu op src/custom_ops.cpp:1210)."""
    EXTRA_FMT = "ifi3f"  # n_kv, theta, orig_max, factor, low_f, high_f

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .llama import _llama31_factors

        base, (n_kv, theta, orig_max, factor, low_f,
               high_f) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        rot = base.hidden_size // base.num_attention_heads
        ff = _llama31_factors(rot, theta, factor, low_f, high_f, orig_max)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=theta, freq_factors=ff,
                                 rope_layout="neox", qk_norm="rmsnorm",
                                 norm_eps=1e-6, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tp = BPEProcessor2(APRIEL_REGEX)   # same pre-split as apriel
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        tok = ChatTokenizer(tp, ApertusChatEncoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        for name in ("system", "end_system", "developer", "end_developer",
                     "user", "end_user", "assistant", "end_assistant"):
            piece = f"<|{name.replace('end_', '')}_{'end' if name.startswith('end_') else 'start'}|>"
            setattr(tok, f"{name}_token_id", tp.piece_to_id(piece))
        if tok.end_assistant_token_id >= 0:
            tok.terminate_ids.add(tok.end_assistant_token_id)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "lm_head": pb.linear("lm_head"),
            "layers": [],
        }
        for i in range(base.num_hidden_layers):
            pfx = f"model.layers.{i}"
            raw = {k: float(pb.raw_f32(f"{pfx}.mlp.act_fn.{k}").reshape(-1)[0])
                   for k in ("alpha_n", "alpha_p", "beta", "eps")}
            # XIEMLP::load transforms (apertus.cpp:222-223)
            xie = {
                "beta": raw["beta"], "eps": raw["eps"],
                "alpha_p": _softplus(raw["alpha_p"]),
                "alpha_n": raw["beta"] + _softplus(raw["alpha_n"]),
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
                "mlp": {
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                    "xielu": xie,
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)

    def set_additional_args(self, args: dict):
        v = args.get("enable-thinking")
        if v is not None:
            self.tokenizer.enable_thinking = v not in ("0", "false", "False")


@register_model(ModelType.MELLUM)
class Mellum(BaseLLM):
    """JetBrains Mellum-MoE (models/mellum.cpp): every layer is a qwen3-style
    qk-normed MoE; full-attention layers run YaRN rope, SWA layers run a
    separate plain rope base (dual rope tables via rope_local)."""
    MAXL = 128
    # 8i {n_kv, head_dim, sliding_window, moe_inter, experts_per_tok,
    # n_experts, norm_topk, tie} + 7f {full_theta, factor, orig_max(f),
    # beta_fast, beta_slow, attn_factor, swa_theta} + 128i swa + 128i sparse
    EXTRA_FMT = f"8i7f{MAXL}i{MAXL}i"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..nn.transformer import LayerSpec
        from ..ops.rope import ROPE_NEOX, RopeConfig
        from .base import load_moe_experts
        from .qwen import make_qwen_tokenizer

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, head_dim, sliding_window, moe_inter, n_active, n_experts,
         norm_topk, tie_flag) = extra[:8]
        (full_theta, factor, orig_max_f, beta_fast, beta_slow, attn_factor,
         swa_theta) = extra[8:15]
        layer_is_swa = extra[15:15 + cls.MAXL]
        n_layers = base.num_hidden_layers
        tie = bool(tie_flag)
        specs = tuple(
            LayerSpec(is_moe=True, sliding_window=sliding_window,
                      local_rope=True)
            if layer_is_swa[i] else LayerSpec(is_moe=True)
            for i in range(n_layers))
        rope_full = RopeConfig(
            head_dim=head_dim, freq_base=full_theta, layout=ROPE_NEOX,
            freq_scale=1.0 / factor if factor > 1.0 else 1.0,
            ext_factor=1.0 if factor > 1.0 else 0.0,
            attn_factor=attn_factor if factor > 1.0 else 1.0,
            beta_fast=beta_fast, beta_slow=beta_slow,
            orig_ctx=int(orig_max_f))
        rope_swa = RopeConfig(head_dim=head_dim, freq_base=swa_theta,
                              layout=ROPE_NEOX)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 head_dim=head_dim, qk_norm="rmsnorm",
                                 norm_eps=1e-6, tie_lm_head=tie,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = replace(cfg, rope=rope_full, rope_local=rope_swa,
                      layer_specs=specs, moe_num_experts=n_experts,
                      moe_top_k=n_active, moe_norm_topk_prob=bool(norm_topk))
        tok = make_qwen_tokenizer(gf, base)
        tok.sys_prompt = ""
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
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate"),
                    "experts": load_moe_experts(pb, f"{pfx}.mlp", n_experts),
                },
            })
        params["layers"] = tuple(params["layers"])
        if not tie:
            params["lm_head"] = pb.linear("lm_head")
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.NANBEIGE)
class Nanbeige(BaseLLM):
    """Nanbeige4 looped-layer llama (models/nanbeige.cpp): the layer stack
    runs num_loops times with shared weights, per-loop KV caches, and the
    final norm applied between loops unless skip_loop_final_norm."""
    # {n_kv, head_dim, num_loops, skip_loop_final_norm, tie} + f rope_theta
    EXTRA_FMT = "5if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..runtime.chat import ChatMLEncoder
        from ..tokenizer.processor import BPEProcessor1

        base, (n_kv, head_dim, num_loops, skip_norm, tie_flag,
               rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        num_loops = int(rt.additional.get("num_loops", num_loops))
        tie = bool(tie_flag)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 head_dim=head_dim, rope_theta=rope_theta,
                                 tie_lm_head=tie, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = replace(cfg, num_loops=max(1, num_loops),
                      skip_loop_final_norm=bool(skip_norm))
        tok_sys = "你是南北阁，一款由BOSS直聘自主研发并训练的专业大语言模型。"
        tp = BPEProcessor1()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        # added tokens come from the JSON meta (tokenizer_config.json)
        added = ((gf.meta or {}).get("tokenizer_config.json") or {}).get(
            "added_tokens_decoder") or {}
        for tid, entry in added.items():
            tp.add_added_token(entry.get("content", ""), int(tid))
        tok = ChatTokenizer(tp, ChatMLEncoder(), sys_prompt=tok_sys)
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        tok.im_start_token_id = tp.piece_to_id("<|im_start|>")
        tok.im_end_token_id = tp.piece_to_id("<|im_end|>")
        if tok.im_end_token_id >= 0:
            tok.terminate_ids.add(tok.im_end_token_id)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers,
                                          tie_lm_head=tie)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.OURO)
class Ouro(BaseLLM):
    """Ouro looped/universal transformer (models/ouro.cpp): full-sandwich
    norm blocks re-run total_ut_steps times (shared weights, per-step KV
    caches, final norm between steps), with an early-exit gate head.

    The reference evaluates the gate on host and can exit early
    (run_model_steps:196-255); under jit all steps run and the final step's
    output is used — identical results at the default exit_threshold=1.0."""
    EXTRA_FMT = "if"    # n_kv, rope_theta

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .qwen import make_qwen_tokenizer

        base, (n_kv, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        steps = int(rt.additional.get("total_ut_steps", 4))
        # ouro.cpp uses LlamaSelfAttention (Interleaved rope) and the
        # reference OuroConverter permutes q/k (Llama3Converter.pp) — the
        # on-disk layout is therefore the permuted/interleaved one
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta,
                                 norm_eps=1e-6, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = replace(cfg, num_loops=max(1, steps), post_norms=True)
        tok = make_qwen_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "lm_head": pb.linear("lm_head"),
            "exit_gate": pb.linear("model.early_exit_gate"),
            "layers": [],
        }
        for i in range(base.num_hidden_layers):
            pfx = f"model.layers.{i}"
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "post_attn_norm": pb.norm(f"{pfx}.input_layernorm_2"),
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "post_ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm_2"),
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


@register_model(ModelType.PANGU_MOE)
class PanguMoE(BaseLLM):
    """openPangu-MoE (models/pangu.cpp moe:83-180): softmax router with
    grouped-argmax selection (one expert per group of E/K), learned
    per-expert router_scale, shared expert, fully-biased attention."""
    EXTRA_FMT = "4if"   # n_kv, moe_inter, experts_per_tok, n_experts, theta

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..nn.transformer import LayerSpec
        from .base import load_moe_experts

        base, (n_kv, moe_inter, n_active, n_experts,
               rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        n_layers = base.num_hidden_layers
        # NEOX rope: see PanguEmbedded (FullBiasedSelfAttention,
        # layers.h:2505; converter does not permute)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, rope_layout="neox",
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = replace(cfg, qkv_bias=True, o_bias=True,
                      layer_specs=tuple(LayerSpec(is_moe=True)
                                        for _ in range(n_layers)),
                      moe_num_experts=n_experts, moe_top_k=n_active,
                      moe_norm_topk_prob=False, moe_grouped_argmax=True)
        tok = make_pangu_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "lm_head": pb.linear("lm_head"),
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
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate", bias=False),
                    "router_scale": pb.array(f"{pfx}.mlp.router_scale"),
                    "experts": load_moe_experts(pb, f"{pfx}.mlp", n_experts),
                    "shared": {
                        "gate": pb.linear(f"{pfx}.mlp.shared_expert.gate_proj"),
                        "up": pb.linear(f"{pfx}.mlp.shared_expert.up_proj"),
                        "down": pb.linear(f"{pfx}.mlp.shared_expert.down_proj"),
                    },
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.GROVE_MOE)
class GroveMoE(BaseLLM):
    """GroveMoE (models/grove.cpp): qwen3-style qk-normed attention + MoE
    where every selected expert also adds its group's small "chunk" expert
    (big/little experts, same routing weights)."""
    EXTRA_FMT = "2if5if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        import numpy as _np

        from ..nn.transformer import LayerSpec
        from .base import load_moe_experts
        from .qwen import make_qwen_tokenizer

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, head_dim, rope_theta, moe_inter, n_active, n_experts,
         experts_per_group, small_inter, _small_weight) = extra
        n_layers = base.num_hidden_layers
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 head_dim=head_dim, rope_theta=rope_theta,
                                 rope_layout="neox", qk_norm="rmsnorm",
                                 norm_eps=1e-6, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = replace(cfg, layer_specs=tuple(LayerSpec(is_moe=True)
                                             for _ in range(n_layers)),
                      moe_num_experts=n_experts, moe_top_k=n_active)
        tok = make_qwen_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "lm_head": pb.linear("lm_head"),
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
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate", bias=False),
                    "experts": load_moe_experts(pb, f"{pfx}.mlp", n_experts),
                    "small_experts": load_moe_experts(
                        pb, f"{pfx}.mlp",
                        n_experts // max(experts_per_group, 1),
                        names=("gate_proj", "up_proj", "down_proj"),
                        container="chunk_experts"),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


class ErnieEncoder(HistoryEncoder):
    """<|im_start|>{role}\\n{content}<|im_end|>\\n\\n turns (models/ernie.cpp
    Tokenizer::encode_role:55-70)."""

    def _role(self, role, ids, content=None):
        tok = self.tokenizer
        ids.append(tok.im_start_token_id)
        ids.extend(tok.encode(role))
        if content is None:
            return
        ids.append(tok.nl_token_id)
        ids.extend(tok.encode(content))
        ids.append(tok.im_end_token_id)
        ids.extend([tok.nl_token_id, tok.nl_token_id])

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if tok.sys_prompt:
            self._role("system", ids, tok.sys_prompt)

    def append_user(self, round_idx, user, ids):
        self._role("user", ids, user)

    def append_ai(self, round_idx, ai, ids):
        self._role("assistant", ids, ai)

    def append_ai_opening(self, round_idx, ids):
        self._role("assistant", ids)


def make_ernie_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    from ..tokenizer.processor import BPEProcessor1

    tp = BPEProcessor1()
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tok = ChatTokenizer(tp, ErnieEncoder(), sys_prompt="")
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.im_start_token_id = tp.piece_to_id("<|im_start|>")
    tok.im_end_token_id = tp.piece_to_id("<|im_end|>")
    ids = tp.encode("\n")
    tok.nl_token_id = ids[0] if ids else -1
    if tok.im_end_token_id >= 0:
        tok.terminate_ids.add(tok.im_end_token_id)
    return tok


@register_model(ModelType.ERNIE_MOE)
class ErnieMoE(BaseLLM):
    """ERNIE-4.5-MoE (models/ernie.cpp moe:175-300): softmax norm-topk
    routing, shared experts, moe layers from moe_layer_start_index at
    moe_layer_interval; use_correction_bias ignored like the reference."""
    # 12i {n_kv, tie, n_experts, n_shared, start, moe_inter, capacity[3],
    # moe_k, interval, use_correction_bias} + f theta
    EXTRA_FMT = "12if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..nn.transformer import LayerSpec
        from .base import load_moe_experts

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, tie_flag, n_experts, n_shared, start, moe_inter,
         _c0, _c1, _c2, moe_k, interval, _bias) = extra[:12]
        rope_theta = extra[12]
        tie = bool(tie_flag)
        n_layers = base.num_hidden_layers

        def is_moe(i):
            return i >= start and i % max(interval, 1) == 0

        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, tie_lm_head=tie,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = replace(cfg,
                      layer_specs=tuple(LayerSpec(is_moe=is_moe(i))
                                        for i in range(n_layers)),
                      moe_num_experts=n_experts, moe_top_k=moe_k,
                      moe_norm_topk_prob=True)
        tok = make_ernie_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "layers": [],
        }
        for i in range(n_layers):
            pfx = f"model.layers.{i}"
            if is_moe(i):
                mlp = {
                    "gate": pb.linear(f"{pfx}.mlp.gate", bias=False),
                    "experts": load_moe_experts(pb, f"{pfx}.mlp", n_experts),
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
        if not tie:
            params["lm_head"] = pb.linear("lm_head")
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.MEGREZ_MOE)
class MegrezMoE(BaseLLM):
    """Megrez2-MoE (models/megrez.cpp moe:146-380): grouped sigmoid top-k
    with score-correction bias; SharedMoE layers REUSE the expert weights of
    the previous MoE layer (cross-layer expert sharing) while keeping their
    own router + shared expert."""
    # v1-moe 8i + f theta + {experts_shared_frequency, n_group, topk_group}
    # 3i + routed_scaling f
    EXTRA_FMT = "8if3if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..nn.transformer import LayerSpec
        from ..tokenizer.processor import BPEProcessor2
        from .base import load_moe_experts
        from .llama import LLAMA3_REGEX
        from .misc_llama2 import MegrezEncoder

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, first_k_dense, moe_inter, moe_freq, n_routed, n_shared,
         norm_topk, n_active) = extra[:8]
        rope_theta = extra[8]
        shared_freq, n_group, topk_group = extra[9:12]
        routed_scale = extra[12]
        n_layers = base.num_hidden_layers

        def layer_type(i):
            if i < first_k_dense or i % max(moe_freq, 1) != 0:
                return "dense"
            return ("moe" if (i - first_k_dense) % max(shared_freq, 1) == 0
                    else "shared_moe")

        specs = tuple(LayerSpec(is_moe=layer_type(i) != "dense")
                      for i in range(n_layers))
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, norm_eps=1e-6,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = replace(cfg, layer_specs=specs, moe_num_experts=n_routed,
                      moe_top_k=n_active, moe_norm_topk_prob=bool(norm_topk),
                      moe_score_func="sigmoid",
                      # reference sets n_group = n_routed / config.n_group
                      moe_n_group=max(n_routed // max(n_group, 1), 1),
                      moe_topk_group=max(topk_group, 1),
                      moe_routed_scale=routed_scale,
                      moe_group_select="per_group_topk",
                      # each MoE layer routes on the PREVIOUS layer's
                      # ffn-norm output (megrez.cpp:359-384)
                      moe_pre_gate=True)
        tp = BPEProcessor2(LLAMA3_REGEX)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        rs = tp.piece_to_id("<|role_start|>")
        re_ = tp.piece_to_id("<|role_end|>")
        te = tp.piece_to_id("<|turn_end|>")
        from .misc_llama2 import MEGREZ_SYS_PROMPT
        tok = ChatTokenizer(tp, MegrezEncoder(rs, re_, te),
                            sys_prompt=MEGREZ_SYS_PROMPT)
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        if te >= 0:
            tok.terminate_ids.add(te)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "lm_head": pb.linear("lm_head"),
            "layers": [],
        }
        last_experts = None
        for i in range(n_layers):
            pfx = f"model.layers.{i}"
            lt = layer_type(i)
            if lt == "dense":
                mlp = {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                }
            else:
                if lt == "moe":
                    last_experts = load_moe_experts(pb, f"{pfx}.mlp", n_routed)
                mlp = {
                    "gate": pb.linear(f"{pfx}.mlp.gate", bias=False),
                    "experts": last_experts,     # aliased for shared_moe
                    "shared": {
                        "gate": pb.linear(f"{pfx}.mlp.shared_experts.gate_proj"),
                        "up": pb.linear(f"{pfx}.mlp.shared_experts.up_proj"),
                        "down": pb.linear(f"{pfx}.mlp.shared_experts.down_proj"),
                    },
                }
                if pb.has(f"{pfx}.mlp.gate.e_score_correction_bias"):
                    mlp["gate_bias"] = pb.array(
                        f"{pfx}.mlp.gate.e_score_correction_bias")
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
