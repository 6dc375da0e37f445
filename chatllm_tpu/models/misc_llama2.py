"""Long-tail llama-like families, part 2: Baichuan (7B rope / 13B ALiBi),
XVERSE, Orion, TeleChat2, Aquila2, Zhinao, Hunyuan-Dense.

References: /root/reference/models/{baichuan,xverse,orion,telechat,aquila,
zhinao,hunyuan}.cpp — each is a thin config + template variation over the
shared decoder core (nn/transformer.py).
"""
from __future__ import annotations

from dataclasses import replace as _replace

from ..nn.transformer import LayerSpec
from ..ops.rope import ROPE_NEOX, ROPE_NORMAL, RopeConfig
from ..runtime.chat import ChatMLEncoder, ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor1, BPEProcessor3, BPEProcessor2
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .llama import build_dense_config
from .model_types import ModelType
from .qwen import QWEN_REGEX


# ---------------------------------------------------------------------------
# Baichuan (models/baichuan.cpp)
# ---------------------------------------------------------------------------

class BaichuanEncoder(HistoryEncoder):
    """user/assistant marker tokens (baichuan.cpp _7b::ChatHistoryEncoder)."""

    def __init__(self, user_id: int, assistant_id: int):
        super().__init__()
        self.user_id = user_id
        self.assistant_id = assistant_id

    def append_sys_prompt(self, ids):
        sys = self.tokenizer.sys_prompt
        if sys:
            ids.extend(self.tokenizer.encode(sys))

    def append_user(self, round_idx, user, ids):
        ids.append(self.user_id)
        ids.extend(self.tokenizer.encode(user))

    def append_ai_opening(self, round_idx, ids):
        ids.append(self.assistant_id)


def _baichuan_tokenizer(gf, base, user_id, assistant_id):
    tp = BPEProcessor1()
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tok = ChatTokenizer(tp, BaichuanEncoder(user_id, assistant_id), sys_prompt="")
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.pad_token_id = base.pad_token_id
    return tok


@register_model(ModelType.BAICHUANLLAMA)
class Baichuan7B(BaseLLM):
    # llama config + user/assistant token ids (BaiChuanConverter.dump_config,
    # convert.py:3459; baichuan.cpp:5-9)
    EXTRA_FMT = "2i"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (user_id, assistant_id) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = cls.build_config(base, rt)
        tok = _baichuan_tokenizer(gf, base, user_id, assistant_id)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)

    @classmethod
    def build_config(cls, base, rt):
        return build_dense_config(base, max_length=rt.max_length,
                                  cache_dtype=rt.cache_dtype)


@register_model(ModelType.BAICHUAN)
class Baichuan13B(Baichuan7B):
    """13B: ALiBi position bias, no rope (BaichuanBlock = ALiBiSelfAttention,
    src/layers.h:2903)."""

    @classmethod
    def build_config(cls, base, rt):
        cfg = build_dense_config(base, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        specs = tuple(LayerSpec(use_rope=False)
                      for _ in range(base.num_hidden_layers))
        return _replace(cfg, use_alibi=True, layer_specs=specs)


# ---------------------------------------------------------------------------
# XVERSE (models/xverse.cpp — llama2 arch, "Human:/Assistant:" template)
# ---------------------------------------------------------------------------

class XverseEncoder(HistoryEncoder):
    def append_sys_prompt(self, ids):
        if self.tokenizer.sys_prompt:
            ids.extend(self.tokenizer.encode(self.tokenizer.sys_prompt))

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode(f"Human: {user}\n\n"))

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        ids.extend(self.tokenizer.encode(ai))
        ids.append(self.tokenizer.eos_token_id)

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("Assistant: "))


@register_model(ModelType.XVERSE)
class Xverse(BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, _ = BaseConfig.parse(gf)
        cfg = build_dense_config(base, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        # reference xverse loads BPEProcessor3 with a digit-split regex
        # (models/xverse.cpp:33), NOT a scored-SP processor
        tp = BPEProcessor3(["[0-9]"])
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tok = ChatTokenizer(tp, XverseEncoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# Orion (models/orion.cpp — LayerNorm llama)
# ---------------------------------------------------------------------------

class OrionEncoder(HistoryEncoder):
    def append_sys_prompt(self, ids):
        ids.append(self.tokenizer.bos_token_id)

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode(f"Human: {user}\n\n"))
        ids.append(self.tokenizer.eos_token_id)

    def append_ai_opening(self, round_idx, ids):
        # the reference emits "Assistant: </s>" before the reply
        # (orion.cpp append_ai_opening with add_eos=true)
        ids.extend(self.tokenizer.encode("Assistant: "))
        ids.append(self.tokenizer.eos_token_id)


@register_model(ModelType.ORION)
class Orion(BaseLLM):
    # config + n_kv + rope_scaling + rope_theta (OrionConverter.dump_config,
    # convert.py:2447)
    EXTRA_FMT = "i2f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, _scaling, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = _replace(cfg, norm_type="layernorm")
        tp = BPEProcessor1()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tok = ChatTokenizer(tp, OrionEncoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# TeleChat2 (models/telechat.cpp — marker-token template, o/down biases)
# ---------------------------------------------------------------------------

class TeleChatEncoder(HistoryEncoder):
    def __init__(self, user_id, bot_id, system_id):
        super().__init__()
        self.user_id, self.bot_id, self.system_id = user_id, bot_id, system_id

    def append_sys_prompt(self, ids):
        if self.tokenizer.sys_prompt:
            ids.append(self.system_id)
            ids.extend(self.tokenizer.encode(self.tokenizer.sys_prompt))

    def append_user(self, round_idx, user, ids):
        ids.append(self.user_id)
        ids.extend(self.tokenizer.encode(user))

    def append_ai_opening(self, round_idx, ids):
        ids.append(self.bot_id)


TELECHAT_SYS = ("你是中国电信星辰语义大模型，英文名是TeleChat，你是由中电信人工智能"
                "科技有限公司和中国电信人工智能研究院（TeleAI）研发的人工智能助手。")


@register_model(ModelType.TELECHAT2)
class TeleChat2(BaseLLM):
    # config + n_kv + base_seqlen (TeleChat2Converter.dump_config,
    # convert.py:2148)
    EXTRA_FMT = "2i"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, _base_seqlen) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tp = BPEProcessor1()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        pad = base.pad_token_id
        tok = ChatTokenizer(tp, TeleChatEncoder(pad + 1, pad + 2, pad + 3),
                            sys_prompt=TELECHAT_SYS)
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        tok.pad_token_id = pad
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# Aquila2 (models/aquila.cpp — llama arch + linear rope scaling)
# ---------------------------------------------------------------------------

class AquilaEncoder(HistoryEncoder):
    """'aquila-chat' style: ###Human: ...###Assistant: (aquila.cpp setup)."""

    def append_sys_prompt(self, ids):
        if self.tokenizer.sys_prompt:
            ids.extend(self.tokenizer.encode(self.tokenizer.sys_prompt))

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode(f"###Human: {user}"))

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("###Assistant:"))


AQUILA_SYS = ("A chat between a curious human and an artificial intelligence "
              "assistant. The assistant gives helpful, detailed, and polite "
              "answers to the human's questions.")


@register_model(ModelType.AQUILA2)
class Aquila2(BaseLLM):
    # config + n_kv + rope_theta + rope_scaling_factor (convert.py:8808)
    EXTRA_FMT = "iff"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_theta, factor) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        if factor > 0:
            cfg = _replace(cfg, rope=_replace(cfg.rope, freq_scale=1.0 / factor))
        # reference aquila loads default-regex BPEProcessor2
        # (models/aquila.cpp:185), not a scored-SP processor
        tp = BPEProcessor2()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tok = ChatTokenizer(tp, AquilaEncoder(), sys_prompt=AQUILA_SYS)
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# Zhinao (models/zhinao.cpp — qwen2 arch, tiktoken BPE + appended specials)
# ---------------------------------------------------------------------------

@register_model(ModelType.ZHINAO)
class Zhinao(BaseLLM):
    EXTRA_FMT = "if"   # n_kv, rope_theta (zhinao.cpp:6-11)

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, rope_layout=ROPE_NEOX,
                                 qkv_bias=True, norm_eps=1e-6,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tp = BPEProcessor2(QWEN_REGEX)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        tok = ChatTokenizer(tp, ChatMLEncoder(), sys_prompt="You are a helpful assistant.")
        n = tp.get_piece_size()
        # appended specials (zhinao.cpp Tokenizer::load): pad, unk, mask, eod,
        # eop, 4 space runs, im_start, im_end
        tok.pad_token_id = n
        tok.im_start_token_id = n + 9
        tok.im_end_token_id = n + 10
        tok.eos_token_id = tok.im_end_token_id
        tok.nl_token_id = tp.encode("\n")[0]
        tok.terminate_ids.add(tok.im_end_token_id)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# Hunyuan dense (models/hunyuan.cpp — post-rope per-head qk-norm, tied head)
# ---------------------------------------------------------------------------

class HunyuanEncoder(HistoryEncoder):
    """<sot>sys<extra4> / <sot>user<extra0> ... <eot> (hunyuan.cpp
    dense::ChatHistoryEncoder)."""

    def __init__(self, sot, eot, extra0, extra4):
        super().__init__()
        self.sot, self.eot, self.extra0, self.extra4 = sot, eot, extra0, extra4

    def append_sys_prompt(self, ids):
        if self.tokenizer.sys_prompt:
            ids.append(self.sot)
            ids.extend(self.tokenizer.encode(self.tokenizer.sys_prompt))
            ids.append(self.extra4)

    def append_user(self, round_idx, user, ids):
        if round_idx > 0 or not self.tokenizer.sys_prompt:
            ids.append(self.sot)
        ids.extend(self.tokenizer.encode(user))
        ids.append(self.extra0)

    def append_ai(self, round_idx, ai, ids):
        ids.extend(self.tokenizer.encode(ai))
        ids.append(self.eot)


HUNYUAN_REGEX = [
    r"(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+",
]


@register_model(ModelType.HUNYUAN_DENSE)
class HunyuanDense(BaseLLM):
    EXTRA_FMT = "if"   # n_kv, rope_theta (pre-folded dynamic-NTK alpha,
    #                    HunYuanDenseConverter.dump_config convert.py:8509)

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        # HF applies rope (NeoX rotate_half) then per-head qk RMSNorm
        # (HunYuanDenseV1Attention.forward); converter does not permute q/k
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta,
                                 rope_layout=ROPE_NEOX,
                                 tie_lm_head=True, qk_norm="rmsnorm_post",
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tp = BPEProcessor2(HUNYUAN_REGEX)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        n = tp.get_piece_size()
        sot, eot = n + 1, n          # start_of_text, end_of_text
        extra0, extra4 = n + 5, n + 9
        tok = ChatTokenizer(tp, HunyuanEncoder(sot, eot, extra0, extra4),
                            sys_prompt="")
        tok.bos_token_id = n + 2
        tok.eos_token_id = n + 3
        tok.pad_token_id = n + 4
        tok.terminate_ids.add(eot)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers,
                                          tie_lm_head=True)
        for i, layer in enumerate(params["layers"]):
            pfx = f"model.layers.{i}.self_attn"
            layer["attn"]["q_norm"] = pb.norm(f"{pfx}.query_layernorm")
            layer["attn"]["k_norm"] = pb.norm(f"{pfx}.key_layernorm")
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# BlueLM (models/bluelm.cpp — llama2 arch + NTK-mix rope)
# ---------------------------------------------------------------------------

def ntk_mix_freq_factors(dim: int, k: float, b: float) -> tuple:
    """NTK-mix per-dim frequency dividers (custom_ops.cpp
    build_ntk_mixed_inv_freq:369): inv_freq[j] = base^(-2j/dim) / e^(a(j+1)^b),
    a = ln(k)/(dim/2)^b — expressed as RopeConfig.freq_factors."""
    import math

    a = math.log(k) / (dim / 2) ** b
    return tuple(math.exp(a * (j + 1) ** b) for j in range(dim // 2))


class BlueLMEncoder(HistoryEncoder):
    def __init__(self, human_id, ai_id):
        super().__init__()
        self.human_id, self.ai_id = human_id, ai_id

    def append_user(self, round_idx, user, ids):
        # the reference pushes bos before EVERY user turn (bluelm.cpp:86-93)
        ids.append(self.tokenizer.bos_token_id)
        ids.append(self.human_id)
        ids.extend(self.tokenizer.encode(user))

    def append_ai_opening(self, round_idx, ids):
        ids.append(self.ai_id)


@register_model(ModelType.BLUELM)
class BlueLM(BaseLLM):
    # {n_kv}i + {rope_theta, rope_scaling_factor, rope_scaling_power}3f —
    # the reference BlueLMConverter writes num_key_value_heads as the 12th
    # int before the three floats (convert.py:3628-3648)
    EXTRA_FMT = "i3f"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, theta, factor, power) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        ff = None
        if power > 0:
            d = base.hidden_size // base.num_attention_heads
            ff = ntk_mix_freq_factors(d, factor, power)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=theta, freq_factors=ff,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tp = BPEProcessor1()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        human = tp.piece_to_id("[|Human|]:")
        ai = tp.piece_to_id("[|AI|]:")
        tok = ChatTokenizer(tp, BlueLMEncoder(human, ai), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        # marker ids never display (reference is_special_id, bluelm.cpp:101)
        tok.special_ids.update(
            i for i in (base.pad_token_id, human, ai) if i >= 0)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# Index (bilibili; models/index.cpp — llama3 arch, reserved-token template)
# ---------------------------------------------------------------------------

class IndexEncoder(HistoryEncoder):
    def append_sys_prompt(self, ids):
        if self.tokenizer.sys_prompt:
            ids.append(self.tokenizer.pad_token_id)
            ids.extend(self.tokenizer.encode(self.tokenizer.sys_prompt))

    def append_user(self, round_idx, user, ids):
        ids.append(3)     # resevered_0 (index.cpp:26)
        ids.extend(self.tokenizer.encode(user))

    def append_ai_opening(self, round_idx, ids):
        ids.append(4)     # resevered_1


@register_model(ModelType.INDEX)
class Index(BaseLLM):
    EXTRA_FMT = "if"   # llama v3 config (index.cpp typedef llama::v3::Config)

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=theta, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tp = BPEProcessor1()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tok = ChatTokenizer(tp, IndexEncoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        tok.pad_token_id = base.pad_token_id
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# Megrez dense (models/megrez.cpp — llama3 arch, role-marker template)
# ---------------------------------------------------------------------------

# default system prompt baked into the reference tokenizer ctor
# (models/megrez.cpp chat::Tokenizer:33)
MEGREZ_SYS_PROMPT = "你是Megrez-3B-Instruct，将针对用户的问题给出详细的、积极的回答。"


class MegrezEncoder(HistoryEncoder):
    def __init__(self, role_start, role_end, turn_end):
        super().__init__()
        self.role_start, self.role_end, self.turn_end = role_start, role_end, turn_end

    def _role(self, name, ids):
        ids.append(self.role_start)
        ids.extend(self.tokenizer.encode(name))
        ids.append(self.role_end)

    def append_sys_prompt(self, ids):
        # the reference emits the system block UNCONDITIONALLY — even an
        # empty sys prompt yields role markers + turn_end
        # (models/megrez.cpp ChatHistoryEncoder::append_sys_prompt:102-108)
        self._role("system", ids)
        ids.extend(self.tokenizer.encode(self.tokenizer.sys_prompt))
        ids.append(self.turn_end)

    def append_user(self, round_idx, user, ids):
        self._role("user", ids)
        ids.extend(self.tokenizer.encode(user))
        ids.append(self.turn_end)

    def append_ai_opening(self, round_idx, ids):
        self._role("assistant", ids)


@register_model(ModelType.MEGREZ)
class Megrez(BaseLLM):
    EXTRA_FMT = "if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .llama import LLAMA3_REGEX

        base, (n_kv, theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=theta, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tp = BPEProcessor2(LLAMA3_REGEX)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        rs = tp.piece_to_id("<|role_start|>")
        re_ = tp.piece_to_id("<|role_end|>")
        te = tp.piece_to_id("<|turn_end|>")
        tok = ChatTokenizer(tp, MegrezEncoder(rs, re_, te),
                            sys_prompt=MEGREZ_SYS_PROMPT)
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id if base.eos_token_id >= 0 else tp.piece_to_id("<|eos|>")
        tok.terminate_ids.add(te)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# StableLM (models/stablelm.cpp — LayerNorm llama, partial rotary)
# ---------------------------------------------------------------------------

class PlainEncoder(HistoryEncoder):
    """No chat markers (reference passes a null encoder): the default
    path encodes the LAST message and inserts bos at the front when
    auto_add_bos and bos >= 0 (src/chat.cpp:839-846)."""

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if tok.bos_token_id is not None and tok.bos_token_id >= 0:
            ids.append(tok.bos_token_id)

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode(user))


@register_model(ModelType.STABLELM)
class StableLM(BaseLLM):
    EXTRA_FMT = "2i2f"   # n_kv, rope_dim, rope_theta, rope_scaling
    #                      (stablelm.cpp:5-11)

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_dim, theta, scaling) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=theta, rope_layout=ROPE_NEOX,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = _replace(cfg, norm_type="layernorm",
                       rope=_replace(cfg.rope, rot_dim=rope_dim,
                                     freq_scale=1.0 / scaling if scaling > 0 else 1.0))
        tp = BPEProcessor2(HUNYUAN_REGEX)   # gpt-2 pretokenizer regex
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        tok = ChatTokenizer(tp, PlainEncoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# Grok-1 (models/grok.cpp — sandwich-norm MoE, tanh score cap)
# ---------------------------------------------------------------------------

@register_model(ModelType.GROK_1)
class Grok1(BaseLLM):
    EXTRA_FMT = "3i2f"   # n_kv, n_experts, n_selected, rope_theta,
    #                      output_multiplier_scale (grok.cpp:6-13)

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .base import load_moe_experts

        base, (n_kv, n_experts, n_sel, theta, out_scale) = BaseConfig.parse(
            gf, cls.EXTRA_FMT)
        n_layers = base.num_hidden_layers
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=theta, tie_lm_head=True,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = _replace(
            # ggml's ActFunc::GELU is the TANH approximation (ggml_gelu,
            # f16-tabulated) — erf-exact gelu diverges from the only
            # available oracle (the reference binary)
            cfg, act="gelu_tanh", post_norms=True, logit_softcap=30.0,
            logit_scale=out_scale,
            layer_specs=tuple(LayerSpec(is_moe=True) for _ in range(n_layers)),
            moe_num_experts=n_experts, moe_top_k=n_sel,
            # the reference NORMALIZES top-k weights: GenericSparseMLP's
            # default is norm_topk_prob=true (src/layers.cpp:3727) and grok
            # never overrides it — caught by the cross-binary matrix
            moe_norm_topk_prob=True)
        tp = BPEProcessor1()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tok = ChatTokenizer(tp, PlainEncoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "layers": [],
        }
        for i in range(n_layers):
            pfx = f"model.layers.{i}"
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.rms_norm"),
                "post_attn_norm": pb.norm(f"{pfx}.rms_norm_1"),
                "ffn_norm": pb.norm(f"{pfx}.rms_norm_2"),
                "post_ffn_norm": pb.norm(f"{pfx}.rms_norm_3"),
                "attn": {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                },
                "mlp": {
                    "gate": pb.linear(f"{pfx}.router"),
                    # grok expert naming: w1=gate, w3=up, w2=down
                    "experts": load_moe_experts(pb, pfx, n_experts,
                                                names=("w1", "w3", "w2")),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# Hunyuan MoE v1 / A13B (models/hunyuan.cpp moe_v1 — dense arch + shared-
# expert MoE, norm_topk)
# ---------------------------------------------------------------------------

@register_model(ModelType.HUNYUAN_MOE_V1)
class HunyuanMoEV1(BaseLLM):
    EXTRA_FMT = "5if"   # n_kv, n_experts, moe_inter, moe_topk, n_shared,
    #                     rope_theta (hunyuan.h:69-78)

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .base import load_moe_experts

        base, (n_kv, n_experts, moe_inter, moe_topk, n_shared,
               rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        n_layers = base.num_hidden_layers
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta,
                                 rope_layout=ROPE_NEOX,
                                 tie_lm_head=True, qk_norm="rmsnorm_post",
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = _replace(
            cfg,
            layer_specs=tuple(LayerSpec(is_moe=True) for _ in range(n_layers)),
            moe_num_experts=n_experts, moe_top_k=moe_topk,
            moe_norm_topk_prob=True)
        tp = BPEProcessor2(HUNYUAN_REGEX)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        n = tp.get_piece_size()
        sot, eot = n + 1, n
        tok = ChatTokenizer(tp, HunyuanEncoder(sot, eot, n + 5, n + 9),
                            sys_prompt="")
        tok.bos_token_id, tok.eos_token_id, tok.pad_token_id = n + 2, n + 3, n + 4
        tok.terminate_ids.add(eot)
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
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "attn": {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                    "q_norm": pb.norm(f"{pfx}.self_attn.query_layernorm"),
                    "k_norm": pb.norm(f"{pfx}.self_attn.key_layernorm"),
                },
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate"),
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


# ---------------------------------------------------------------------------
# DeciLM / Nemotron-51B (models/decilm.cpp — heterogeneous layers: variable
# GQA per layer + attention-free layers)
# ---------------------------------------------------------------------------

@register_model(ModelType.DECILM)
class DeciLM(BaseLLM):
    # llama-3.1 config + 100×{n_heads_in_group, intermediate_size}
    # (decilm.cpp:5-17)
    EXTRA_FMT = "ififff" + "200i"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .llama import (_llama31_factors, load_llama_family_params,
                            make_llama3_tokenizer)

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        n_kv, rope_theta, orig_ctx, factor, low_f, high_f = extra[:6]
        layer_cfgs = extra[6:]
        n_layers = base.num_hidden_layers
        rot = base.hidden_size // base.num_attention_heads
        ff = _llama31_factors(rot, rope_theta, factor, low_f, high_f, orig_ctx)
        specs = []
        for i in range(n_layers):
            group = layer_cfgs[2 * i]
            specs.append(LayerSpec(
                no_attn=group <= 0,
                num_kv_heads=(base.num_attention_heads // group) if group > 0 else 0))
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, freq_factors=ff,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = _replace(cfg, layer_specs=tuple(specs))
        tok = make_llama3_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "lm_head": pb.linear("lm_head"),
            "layers": [],
        }
        for i in range(n_layers):
            pfx = f"model.layers.{i}"
            layer = {
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                },
            }
            if not specs[i].no_attn:
                layer["attn_norm"] = pb.norm(f"{pfx}.input_layernorm")
                layer["attn"] = {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                }
            params["layers"].append(layer)
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# OLMoE (models/allenai.{h,cpp} moe — full-projection qk-norm + MoE)
# ---------------------------------------------------------------------------

@register_model(ModelType.OLMoE)
class OLMoE(BaseLLM):
    EXTRA_FMT = "4if"   # n_kv, experts_per_tok, n_experts, norm_topk,
    #                     rope_theta (allenai.h:7-14)

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .base import load_moe_experts

        base, (n_kv, n_active, n_experts, norm_topk,
               rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        n_layers = base.num_hidden_layers
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, rope_layout=ROPE_NEOX,
                                 qk_norm="rmsnorm_full",
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = _replace(
            cfg,
            layer_specs=tuple(LayerSpec(is_moe=True) for _ in range(n_layers)),
            moe_num_experts=n_experts, moe_top_k=n_active,
            moe_norm_topk_prob=bool(norm_topk))
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
        for i in range(n_layers):
            pfx = f"model.layers.{i}"
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "attn": {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                    "q_norm": pb.norm(f"{pfx}.self_attn.q_norm"),
                    "k_norm": pb.norm(f"{pfx}.self_attn.k_norm"),
                },
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate"),
                    "experts": load_moe_experts(pb, f"{pfx}.mlp", n_experts),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# Granite 3.x MoE (models/granite.cpp moe:3-70 — granite multipliers + MoE)
# ---------------------------------------------------------------------------

@register_model(ModelType.GRANITE_MoE)
class GraniteMoE(BaseLLM):
    EXTRA_FMT = "4i4f"  # n_kv, tie, experts_per_tok, n_experts;
    #                     attn_mult, logits_scaling, residual_mult, theta

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .base import load_moe_experts
        from .misc_llama import BracketRoleEncoder, _bpe2_tokenizer

        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, tie_flag, n_active, n_experts, attn_mult, logits_scaling,
         residual_mult, rope_theta) = extra
        tie = bool(tie_flag)
        n_layers = base.num_hidden_layers
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, tie_lm_head=tie,
                                 norm_eps=1e-6, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        cfg = _replace(
            cfg, attention_scale=attn_mult, residual_scale=residual_mult,
            logit_scale=1.0 / logits_scaling,
            layer_specs=tuple(LayerSpec(is_moe=True) for _ in range(n_layers)),
            moe_num_experts=n_experts, moe_top_k=n_active,
            moe_norm_topk_prob=True)
        tok = _bpe2_tokenizer(gf, base, BracketRoleEncoder())
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
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "attn": {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                },
                "mlp": {
                    "gate": pb.linear(f"{pfx}.block_sparse_moe.router.layer"),
                    "experts": load_moe_experts(
                        pb, f"{pfx}.block_sparse_moe", n_experts),
                },
            })
        params["layers"] = tuple(params["layers"])
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# Seed-OSS (models/seed.cpp — qwen2 arch + head_dim, bos/eos role turns)
# ---------------------------------------------------------------------------

class SeedEncoder(HistoryEncoder):
    def _msg(self, role, content, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        ids.extend(tok.encode(role))
        ids.extend(tok.encode("\n"))
        ids.extend(tok.encode(content))
        ids.append(tok.eos_token_id)

    def append_sys_prompt(self, ids):
        if self.tokenizer.sys_prompt:
            self._msg("system", self.tokenizer.sys_prompt, ids)

    def append_user(self, round_idx, user, ids):
        self._msg("user", user, ids)

    def append_ai_opening(self, round_idx, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        ids.extend(tok.encode("assistant"))
        ids.extend(tok.encode("\n"))


@register_model(ModelType.SEED)
class SeedOSS(BaseLLM):
    EXTRA_FMT = "2if"   # n_kv, head_dim, rope_theta (seed.cpp:8-13)

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, head_dim, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 head_dim=head_dim, rope_theta=rope_theta,
                                 rope_layout=ROPE_NEOX, qkv_bias=True,
                                 norm_eps=1e-6, max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tp = BPEProcessor2()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        tok = ChatTokenizer(tp, SeedEncoder(), sys_prompt="")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        tok.terminate_ids.add(base.eos_token_id)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)


# ---------------------------------------------------------------------------
# XVERSE-MoE (models/xverse.cpp:108 — deepseek-v1-MoE arch, role: template)
# ---------------------------------------------------------------------------

class XverseMoEEncoder(HistoryEncoder):
    def append_sys_prompt(self, ids):
        if self.tokenizer.sys_prompt:
            ids.extend(self.tokenizer.encode(
                f"system: {self.tokenizer.sys_prompt}\n"))

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode(f"user: {user}\n"))

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        ids.extend(self.tokenizer.encode(ai))
        ids.append(self.tokenizer.eos_token_id)

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("assistant: "))


@register_model(ModelType.XVERSEMOE)
class XverseMoE(BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .deepseek import DeepSeekV1MoE

        self = DeepSeekV1MoE.load.__func__(DeepSeekV1MoE, gf, rt,
                                           skip_tokenizer=True)
        # swap processor (BPEProcessor3, xverse.cpp:33) + template
        # (xverse.cpp:112-148)
        tp = BPEProcessor3(["[0-9]"])
        tp.load(gf.tokenizer_reader(), self.native_config.vocab_size)
        enc = XverseMoEEncoder()
        tok = ChatTokenizer(tp, enc, sys_prompt="")
        tok.bos_token_id = self.native_config.bos_token_id
        tok.eos_token_id = self.native_config.eos_token_id
        self.tokenizer = tok
        return cls(gf.model_type, self.cfg, self.params, tok,
                   native_config=self.native_config, meta=gf.meta)


# ---------------------------------------------------------------------------
# GigaChat (models/gigachat.cpp — deepseek-v1-MoE arch, role/message seps)
# ---------------------------------------------------------------------------

class GigaChatEncoder(HistoryEncoder):
    def __init__(self, role_sep, message_sep):
        super().__init__()
        self.role_sep, self.message_sep = role_sep, message_sep

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if tok.bos_token_id >= 0:
            ids.append(tok.bos_token_id)
        ids.extend(tok.encode(tok.sys_prompt or ""))
        ids.append(self.message_sep)

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        ids.extend(tok.encode("user"))
        ids.append(self.role_sep)
        ids.extend(tok.encode(user))
        ids.append(self.message_sep)
        ids.extend(tok.encode("available functions"))
        ids.append(self.role_sep)
        ids.extend(tok.encode("[]"))
        ids.append(self.message_sep)

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("assistant"))
        ids.append(self.role_sep)


@register_model(ModelType.GIGACHAT)
class GigaChat(BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .deepseek import DeepSeekV1MoE

        lm = DeepSeekV1MoE.load.__func__(DeepSeekV1MoE, gf, rt,
                                         skip_tokenizer=True)
        tp = BPEProcessor2()
        tp.load(gf.tokenizer_reader(), lm.native_config.vocab_size)
        tp.enable_return_special_token(True)
        role_sep = tp.piece_to_id("<|role_sep|>")
        message_sep = tp.piece_to_id("<|message_sep|>")
        tok = ChatTokenizer(tp, GigaChatEncoder(role_sep, message_sep),
                            sys_prompt="")
        tok.bos_token_id = lm.native_config.bos_token_id
        tok.eos_token_id = lm.native_config.eos_token_id
        if message_sep >= 0:
            tok.terminate_ids.add(message_sep)
        return cls(gf.model_type, lm.cfg, lm.params, tok,
                   native_config=lm.native_config, meta=gf.meta)
