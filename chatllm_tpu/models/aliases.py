"""Fine-tune families that reuse an existing architecture with a different
chat template / special tokens (reference: models/{wizard,openchat,
neuralbeagle,tigerbot,numinamath,hermes,codellama}.cpp — each subclasses an
existing ConditionalGeneration and swaps the history encoder)."""
from __future__ import annotations

import struct

from ..runtime.chat import ChatMLEncoder, HistoryEncoder
from .base import BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig, \
    load_llama_family_params, register_model
from .llama import Llama2, build_dense_config, make_llama2_tokenizer
from .mistral import Mistral, Mixtral
from .model_types import ModelType


def _retemplate(lm_cls, gf, rt, encoder, sys_prompt=None):
    """Load via the base family then swap the chat template."""
    self = lm_cls.load.__func__(lm_cls, gf, rt)
    encoder.tokenizer = self.tokenizer
    self.tokenizer.chat_encoder = encoder
    if sys_prompt is not None:
        self.tokenizer.sys_prompt = sys_prompt
    return self


# -- Vicuna-style (wizard::lm, wizard.cpp:35-85) ---------------------------

class VicunaEncoder(HistoryEncoder):
    def append_sys_prompt(self, ids):
        if self.tokenizer.sys_prompt:
            ids.extend(self.tokenizer.encode(self.tokenizer.sys_prompt + " "))

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode(f"USER: {user}"))

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode(" ASSISTANT:"))


WIZARDLM_SYS = ("A chat between a curious user and an artificial intelligence "
                "assistant. The assistant gives helpful, detailed, and polite "
                "answers to the user's questions. USER: Hi ASSISTANT: Hello.")


@register_model(ModelType.WIZARDLM)
class WizardLM(BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        return _retemplate(Llama2, gf, rt, VicunaEncoder(), WIZARDLM_SYS)


# -- Alpaca-style (wizard::coder/math, wizard.cpp:86-175) ------------------

class AlpacaEncoder(HistoryEncoder):
    def append_sys_prompt(self, ids):
        if self.tokenizer.sys_prompt:
            ids.extend(self.tokenizer.encode(self.tokenizer.sys_prompt + "\n\n"))

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode(f"### Instruction:\n{user}\n\n"))

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("### Response:\n"))


WIZARD_CODER_SYS = ("Below is an instruction that describes a task. Write a "
                    "response that appropriately completes the request.")


@register_model(ModelType.CODELLAMA)
class CodeLlama(BaseLLM):
    EXTRA_FMT = "f"   # rope_theta (codellama.h:5-8; fixes the 1e6 base)

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (rope_theta,) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, rope_theta=rope_theta,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tok = make_llama2_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        return cls(gf.model_type, cfg, params, tok, native_config=base,
                   meta=gf.meta)


@register_model(ModelType.WIZARDCODER)
class WizardCoder(BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        return _retemplate(CodeLlama, gf, rt, AlpacaEncoder(), WIZARD_CODER_SYS)


@register_model(ModelType.WIZARDMATH)
class WizardMath(BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        return _retemplate(Mistral, gf, rt, AlpacaEncoder(), WIZARD_CODER_SYS)


# -- OpenChat / Starling (openchat.cpp: "GPT4 Correct User:" turns) --------

class OpenChatEncoder(HistoryEncoder):
    def append_sys_prompt(self, ids):
        if self.tokenizer.bos_token_id >= 0:
            ids.append(self.tokenizer.bos_token_id)

    def _turn(self, role, text, ids):
        sys = self.tokenizer.sys_prompt or "GPT4"
        ids.extend(self.tokenizer.encode(f"{sys} Correct {role}: {text}"))
        eot = self.tokenizer.tp.piece_to_id("<|end_of_turn|>")
        ids.append(eot if eot >= 0 else self.tokenizer.eos_token_id)

    def append_user(self, round_idx, user, ids):
        self._turn("User", user, ids)

    def append_ai(self, round_idx, ai, ids):
        self._turn("Assistant", ai, ids)

    def append_ai_opening(self, round_idx, ids):
        sys = self.tokenizer.sys_prompt or "GPT4"
        ids.extend(self.tokenizer.encode(f"{sys} Correct Assistant:"))


@register_model(ModelType.OPENCHAT, ModelType.STARLING)
class OpenChat(BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        self = _retemplate(Mistral, gf, rt, OpenChatEncoder(), "GPT4")
        eot = self.tokenizer.tp.piece_to_id("<|end_of_turn|>")
        if eot >= 0:
            self.tokenizer.terminate_ids.add(eot)
        return self


# -- NeuralBeagle (neuralbeagle.cpp: ChatML-ish over mistral) --------------

@register_model(ModelType.NEURALBEAGLE)
class NeuralBeagle(BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        return _retemplate(Mistral, gf, rt, ChatMLEncoder(), "")


# -- DeepHermes-3 Mistral (hermes.cpp: ChatML + deep-thinking sys) ---------

HERMES_SYS = ("You are a deep thinking AI, you may use extremely long chains "
              "of thought to deeply consider the problem and deliberate with "
              "yourself via systematic reasoning processes to help come to a "
              "correct solution prior to answering.")


@register_model(ModelType.DEEPHERMES3_MISTRAL)
class DeepHermes3Mistral(BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        return _retemplate(Mistral, gf, rt, ChatMLEncoder(), HERMES_SYS)


# -- TigerBot (tigerbot.cpp: instruct/response marker ids = pad-2/pad-1) ---

class TigerBotEncoder(HistoryEncoder):
    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        if tok.bos_token_id >= 0:
            ids.append(tok.bos_token_id)
        ids.append(tok.pad_token_id - 2)      # instruct marker
        ids.extend(tok.encode(user))

    def append_ai_opening(self, round_idx, ids):
        ids.append(self.tokenizer.pad_token_id - 1)   # response marker


@register_model(ModelType.TIGERBOT)
class TigerBot(BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        return _retemplate(Llama2, gf, rt, TigerBotEncoder(), "")


# -- NuminaMath (numinamath.cpp: deepseek-v1 arch, problem/solution) -------

class NuminaEncoder(HistoryEncoder):
    def append_sys_prompt(self, ids):
        if self.tokenizer.bos_token_id >= 0:
            ids.append(self.tokenizer.bos_token_id)

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode(f"### Problem: {user}\n"))

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("### Solution: "))


@register_model(ModelType.NUMINAMATH)
class NuminaMath(BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        from .deepseek import DeepSeekV1

        return _retemplate(DeepSeekV1, gf, rt, NuminaEncoder(), "")
