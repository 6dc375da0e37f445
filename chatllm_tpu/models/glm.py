"""ChatGLM/GLM family (reference: /root/reference/models/chatglm.{h,cpp}).

GLM2-architecture generations (ChatGLM2/3, GLM-4, CodeGeeX): consolidated
qkv with bias, fused gate+up swiglu MLP, partial rotary (head_dim/2,
interleaved), tied=false.
"""
from __future__ import annotations

from ..nn.transformer import TransformerConfig
from ..ops.rope import ROPE_NORMAL, RopeConfig
from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor2
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   register_model)
from .model_types import ModelType

GLM4_REGEX = [
    r"[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+",
]


class GLM4Encoder(HistoryEncoder):
    """[gMASK]<sop><|role|>\\n content template (models/chatglm.cpp v4)."""

    add_nl_token = True

    def _role(self, ids, role_tok):
        tok = self.tokenizer
        ids.append(role_tok)
        if self.add_nl_token:
            ids.append(tok.nl_token_id)

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        ids.extend([tok.gmask_token_id, tok.sop_token_id])
        if tok.sys_prompt:
            self._role(ids, tok.system_token_id)
            ids.extend(tok.encode(tok.sys_prompt))

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        self._role(ids, tok.user_token_id)
        ids.extend(tok.encode(user))

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        ids.extend(self.tokenizer.encode(ai))

    def append_ai_opening(self, round_idx, ids):
        self._role(ids, self.tokenizer.assistant_token_id)


def make_glm4_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    """models/chatglm.cpp v4 Tokenizer::do_load: special ids assigned
    sequentially after <|endoftext|>."""
    tp = BPEProcessor2(GLM4_REGEX)
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tp.enable_return_special_token(True)
    tok = ChatTokenizer(tp, GLM4Encoder(), sys_prompt="")
    eos = base.eos_token_id
    if eos < 0:
        eos = tp.piece_to_id("<|endoftext|>")
    tok.eos_token_id = eos
    tok.bos_token_id = base.bos_token_id
    sid = eos + 1
    tok.mask_token_id = sid; sid += 1
    tok.gmask_token_id = sid; sid += 1
    tok.smask_token_id = sid; sid += 1
    tok.sop_token_id = sid; sid += 1
    tok.eop_token_id = sid; sid += 1
    tok.system_token_id = sid; sid += 1
    tok.user_token_id = sid; sid += 1
    tok.assistant_token_id = sid; sid += 1
    tok.observation_token_id = sid; sid += 1
    tok.nl_token_id = tp.encode("\n")[0]
    tok.terminate_ids |= {eos, tok.user_token_id, tok.observation_token_id}
    specials = {tok.mask_token_id, tok.gmask_token_id, tok.smask_token_id,
                tok.sop_token_id, tok.eop_token_id, tok.system_token_id,
                tok.user_token_id, tok.assistant_token_id,
                tok.observation_token_id, eos}
    tok.is_special_id = lambda i: i in specials
    return tok


def load_glm2_params(pb: ParamBuilder, n_layers: int) -> dict:
    """ChatGLM2Converter weight names (convert.py:3999)."""
    params = {
        "embed": pb.embedding("transformer.embedding.word_embeddings.weight"),
        "final_norm": pb.norm("transformer.encoder.final_layernorm"),
        "lm_head": pb.linear("transformer.output_layer"),
        "layers": [],
    }
    for i in range(n_layers):
        pfx = f"transformer.encoder.layers.{i}"
        params["layers"].append({
            "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
            "attn": {
                "qkv": pb.linear(f"{pfx}.self_attention.query_key_value"),
                "o": pb.linear(f"{pfx}.self_attention.dense"),
            },
            "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
            "mlp": {
                "gate_up": pb.linear(f"{pfx}.mlp.dense_h_to_4h"),
                "down": pb.linear(f"{pfx}.mlp.dense_4h_to_h"),
            },
        })
    params["layers"] = tuple(params["layers"])
    return params


class GLM2Encoder(HistoryEncoder):
    """ChatGLM2 template: every encode is prefixed [gMASK] sop; rounds use
    "[Round N]\\n\\n问：.../答：..." (models/chatglm.cpp v2)."""

    def _enc(self, text, ids):
        tok = self.tokenizer
        ids.extend([tok.gmask_token_id, tok.sop_token_id])
        ids.extend(tok.encode(text))

    def append_user(self, round_idx, user, ids):
        self._enc(f"[Round {round_idx + 1}]\n\n问：{user}\n\n", ids)

    def append_ai(self, round_idx, ai, ids):
        self._enc(f"答：{ai}\n\n", ids)

    def append_ai_opening(self, round_idx, ids):
        self._enc("答：", ids)


@register_model(ModelType.CHATGLM2, ModelType.CODEGEEX2, ModelType.CHATGLM3)
class ChatGLM2(BaseLLM):
    """ChatGLM2/3, CodeGeeX2 (GLM2 arch; models/chatglm.cpp v2/v3).
    Config: BaseConfig + num_kv_heads (models/chatglm.h:46-49)."""
    EXTRA_FMT = "i"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..tokenizer.processor import BPEProcessor1

        base, (n_kv,) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        head_dim = base.hidden_size // base.num_attention_heads
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv,
            intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            norm_eps=1e-5,
            rope=RopeConfig(head_dim=head_dim, rot_dim=head_dim // 2,
                            freq_base=10000.0, layout=ROPE_NORMAL),
            cache_dtype=rt.cache_dtype)
        tp = BPEProcessor1()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tok = ChatTokenizer(tp, GLM2Encoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        sid = tp.get_piece_size()
        tok.mask_token_id = sid
        tok.gmask_token_id = sid + 1
        tok.smask_token_id = sid + 2
        tok.sop_token_id = sid + 3
        tok.eop_token_id = sid + 4
        tok.is_special_id = lambda i: i >= sid
        pb = ParamBuilder(gf, rt)
        params = load_glm2_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.GLM4_0414)
class GLM40414(BaseLLM):
    """GLM-4-0414 generation (HF Glm4ForCausalLM): separate q/k/v, partial
    interleaved rotary, sandwich norms (LMBlock4, models/chatglm.h
    glm4_0414 namespace; converter convert.py:4083 GLM4Converter)."""

    # BaseConfig + {n_kv, use_attention_bias, rope_dim} + rope_theta:f
    EXTRA_FMT = "3if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, attn_bias, rope_dim, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        head_dim = base.hidden_size // base.num_attention_heads
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv,
            intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            norm_eps=1e-5, post_norms=True,
            qkv_bias=bool(attn_bias),
            rope=RopeConfig(head_dim=head_dim, rot_dim=rope_dim,
                            freq_base=rope_theta, layout=ROPE_NORMAL),
            cache_dtype=rt.cache_dtype)
        tok = make_glm4_tokenizer(gf, base)
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
                "post_attn_norm": pb.norm(f"{pfx}.post_self_attn_layernorm"),
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "post_ffn_norm": pb.norm(f"{pfx}.post_mlp_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


@register_model(ModelType.GLM4, ModelType.CODEGEEX4)
class GLM4(BaseLLM):
    # v4 Config: BaseConfig + num_kv_heads + rope_ratio:f
    # (models/chatglm.h:46-49, 123-126)
    EXTRA_FMT = "if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_ratio) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        head_dim = base.hidden_size // base.num_attention_heads
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv,
            intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            norm_eps=1e-5,
            # partial rotary: head_dim/2 dims, interleaved; freq_base scaled
            # by rope_ratio (models/chatglm.cpp v4 ctor)
            rope=RopeConfig(head_dim=head_dim, rot_dim=head_dim // 2,
                            freq_base=10000.0 * rope_ratio,
                            layout=ROPE_NORMAL),
            cache_dtype=rt.cache_dtype)
        tok = make_glm4_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_glm2_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


class CharacterGLMEncoder(HistoryEncoder):
    """Persona dialogue framing (models/characterglm.cpp:44-110)."""

    def __init__(self):
        super().__init__()
        self.user_name, self.bot_name = "Human", "CharacterGLM"
        self.user_info, self.bot_info = "", ""

    def append_sys_prompt(self, ids):
        oss = f"以下是一段{self.user_name}和{self.bot_name}之间的对话。\n"
        if self.bot_info:
            oss += f"关于{self.bot_name}的信息：{self.bot_info}\n"
        if self.user_info:
            oss += f"关于{self.user_name}的信息：{self.user_info}\n"
        ids.extend(self.tokenizer.encode(oss))

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode(f"[{self.user_name}]{user}\n"))

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        ids.extend(self.tokenizer.encode(ai + "\n"))

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode(f"[{self.bot_name}]"))


@register_model(ModelType.CHARACTERGLM)
class CharacterGLM(BaseLLM):
    """chatglm2 arch + persona template; `--set user_name/bot_name/
    user_info/bot_info` map onto the encoder (characterglm.cpp
    set_additional_args)."""

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        lm = ChatGLM2.load.__func__(ChatGLM2, gf, rt)
        self = cls(gf.model_type, lm.cfg, lm.params, lm.tokenizer,
                   native_config=lm.native_config, meta=gf.meta)
        enc = CharacterGLMEncoder()
        enc.tokenizer = self.tokenizer
        self.tokenizer.chat_encoder = enc
        return self

    def set_additional_args(self, args: dict):
        enc = self.tokenizer.chat_encoder
        for k in ("user_name", "bot_name", "user_info", "bot_info"):
            if k in args:
                setattr(enc, k, args[k])


# ---------------------------------------------------------------------------
# ChatGLM-6B (v1): 2D rope + alpha-scaled GLM residual
# ---------------------------------------------------------------------------

import re as _re


class GLM1Tokenizer(ChatTokenizer):
    """ChatGLM-6B text transforms (chatglm.cpp Tokenizer::preprocess /
    postprocess:89-162): \\n -> <n>, \\t -> <|tab|>, space runs ->
    <|blank_N|>; inverse + CJK punctuation mapping on decode.  Every encode
    prepends [gMASK] <sop> (Tokenizer::encode:44-48)."""

    _PUNCT = [("，", ","), ("！", "!"), ("：", ":"), ("；", ";"), ("？", "?")]

    def encode(self, text: str) -> list[int]:
        out = text.replace("\n", "<n>").replace("\t", "<|tab|>")
        out = _re.sub(r"[ ]{2,80}", lambda m: f"<|blank_{len(m.group())}|>", out)
        return [self.gmask_token_id, self.bos_token_id] + self.tp.encode(out)

    def decode(self, ids) -> str:
        text = super().decode(ids)
        text = text.replace("<n>", "\n").replace("<|tab|>", "\t")
        text = _re.sub(r"<\|blank_(\d+)\|>", lambda m: " " * int(m.group(1)), text)
        for zh, en in self._PUNCT:
            text = _re.sub(rf"([一-鿿]){_re.escape(en)}", rf"\1{zh}", text)
            text = _re.sub(rf"{_re.escape(en)}([一-鿿])", rf"{zh}\1", text)
        return text


class GLM1Encoder(HistoryEncoder):
    """[Round N]\\n问：{user}\\n答：{ai}\\n (chatglm.cpp v1:50-74)."""

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode(f"[Round {round_idx + 1}]\n问：{user}\n"))

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        ids.extend(self.tokenizer.encode(ai + "\n"))

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("答："))


@register_model(ModelType.CHATGLM)
class ChatGLM1(BaseLLM):
    """ChatGLM-6B: 2D rope (clamped + block position channels, the
    chatglm1_rope custom op src/custom_ops.cpp:383-534), fused biased qkv,
    GELU MLP, and the GLM residual x = norm(x)*sqrt(2L) + sublayer(norm(x))
    (GLMBlock::forward src/layers.cpp:2385)."""

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from ..tokenizer.processor import BPEProcessor1

        base, _ = BaseConfig.parse(gf)
        d = base.hidden_size // base.num_attention_heads
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=base.num_attention_heads,
            intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            act="gelu", norm_type="layernorm", norm_eps=1e-5,
            rope=RopeConfig(head_dim=d, freq_base=10000.0, layout="glm1"),
            qkv_bias=True, o_bias=True, mlp_bias=True,
            glm1_residual=True, tie_lm_head=True,
            cache_dtype=rt.cache_dtype)
        tp = BPEProcessor1()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tok = GLM1Tokenizer(tp, GLM1Encoder(), sys_prompt="")
        tok.bos_token_id = tp.piece_to_id("<sop>")
        tok.eos_token_id = tp.piece_to_id("<eop>")
        tok.mask_token_id = tp.piece_to_id("[MASK]")
        tok.gmask_token_id = tp.piece_to_id("[gMASK]")
        tok.pad_token_id = tp.piece_to_id("<pad>")
        tok.terminate_ids.add(tok.eos_token_id)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("transformer.word_embeddings.weight"),
            "final_norm": pb.norm("transformer.final_layernorm"),
            "layers": [],
        }
        for i in range(base.num_hidden_layers):
            pfx = f"transformer.layers.{i}"
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "attn": {
                    "qkv": pb.linear(f"{pfx}.attention.query_key_value"),
                    "o": pb.linear(f"{pfx}.attention.dense"),
                },
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": {
                    "up": pb.linear(f"{pfx}.mlp.dense_h_to_4h"),
                    "down": pb.linear(f"{pfx}.mlp.dense_4h_to_h"),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)
