"""MiniCPM-O (openbmb/MiniCPM-o-2_6): Qwen2 LLM + SigLIP vision + Whisper
audio encoder + ChatTTS-style TTS tower.

The reference defines MiniCPM_O ONLY in its converter
(/root/reference/convert.py:294, MiniCPMOConverter :5133) — its C++ runtime
has no loader for the id, so a reference user can convert the checkpoint but
not run it.  Here the converted file additionally RUNS for text chat: the
llm.* (Qwen2) tower loads and generates with the MiniCPM-V ChatML template;
the vision/audio/TTS towers are stored in the file (full converter parity)
but not yet wired into the runtime.
"""
from __future__ import annotations

from ..ops.rope import ROPE_NEOX
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .llama import build_dense_config
from .model_types import ModelType
from .qwen import make_qwen_tokenizer


class _PrefixedGGMM:
    """Name-prefixing view of a GGMMFile (tensor lookups get 'llm.')."""

    def __init__(self, gf, prefix: str):
        self._gf = gf
        self._prefix = prefix
        # prefix-stripped view of the tensor table (ParamBuilder indexes
        # gf.tensors directly)
        self.tensors = {n[len(prefix):]: e for n, e in gf.tensors.items()
                        if n.startswith(prefix)}

    def has_tensor(self, name: str) -> bool:
        return self._gf.has_tensor(self._prefix + name)

    def tensor_f32(self, name: str):
        return self._gf.tensor_f32(self._prefix + name)

    def raw_tensor(self, name: str):
        return self._gf.raw_tensor(self._prefix + name)

    def __getattr__(self, item):
        return getattr(self._gf, item)


@register_model(ModelType.MINICPM_O)
class MiniCPMO(BaseLLM):
    # Config: QWen2 {n_kv, sliding_window} + rope_theta, then vision 11i,
    # audio f+14i, tts f+16i (tools/convert_extra5.py convert_minicpmo,
    # mirroring reference convert.py:5145-5236)
    EXTRA_FMT = "2if11if14if16i"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        n_kv, _sliding_window, rope_theta = extra[0], extra[1], extra[2]
        tie = not gf.has_tensor("llm.lm_head.weight")
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=rope_theta,
            rope_layout=ROPE_NEOX, tie_lm_head=tie, norm_eps=1e-6,
            qkv_bias=True, max_length=rt.max_length,
            cache_dtype=rt.cache_dtype)
        tok = make_qwen_tokenizer(gf, base)
        pb = ParamBuilder(_PrefixedGGMM(gf, "llm."), rt)
        params = load_llama_family_params(pb, base.num_hidden_layers,
                                          tie_lm_head=tie)
        return cls(gf.model_type, cfg, params, tok, native_config=base,
                   meta=gf.meta)
