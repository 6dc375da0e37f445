"""Orpheus TTS (reference: /root/reference/models/orpheus.{h,cpp}).

Llama-3.2 LLM generating SNAC codec tokens (7 per frame in pyramid order),
decoded to 24 kHz PCM by the JAX SNAC decoder (nn/snac.py).  The streaming
scheme matches the reference: a sliding window of 28 codec tokens (4
frames) is re-decoded per frame and the second quarter of the 8192-sample
output is emitted (orpheus.cpp decoder_push_llm_tok_id / speech_synthesis).
"""
from __future__ import annotations

import numpy as np

from ..nn.snac import SnacConfig, load_snac_params, pyramid_order, snac_decode
from .base import BaseLLM, ParamBuilder, RuntimeConfig, register_model
from .llama import Llama32
from .model_types import ModelType

CUSTOM_TOKEN_START = 128266     # orpheus.cpp:462
CUSTOM_TOKEN_END = 156937


@register_model(ModelType.ORPHEUS_TTS)
class OrpheusTTS(BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        lm = Llama32.load.__func__(Llama32, gf, rt)
        self = cls(gf.model_type, lm.cfg, lm.params, lm.tokenizer,
                   native_config=lm.native_config, meta=gf.meta)
        self.tokenizer.terminate_ids.add(128258)
        self.voice = "tara"

        snac_json = (gf.meta or {}).get("snac_config.json", {})
        self.snac_cfg = SnacConfig(
            sampling_rate=int(snac_json.get("sampling_rate", 24000)),
            decoder_dim=int(snac_json.get("decoder_dim", 1024)),
            decoder_rates=tuple(snac_json.get("decoder_rates", (8, 8, 4, 2))),
            codebook_size=int(snac_json.get("codebook_size", 4096)),
            codebook_dim=int(snac_json.get("codebook_dim", 8)),
            vq_strides=tuple(snac_json.get("vq_strides", (4, 2, 1))),
            noise=bool(snac_json.get("noise", True)),
            depthwise=bool(snac_json.get("depthwise", True)))
        self.snac_params = None
        if gf.has_tensor("snac.decoder.model.layers.0.weight"):
            pb = ParamBuilder(gf, rt)
            self.snac_params = load_snac_params(pb, self.snac_cfg)
        self._pyramid = pyramid_order(len(self.snac_cfg.vq_strides))
        return self

    def set_additional_args(self, args: dict):
        self.voice = args.get("voice", self.voice)

    def encode_tts_prompt(self, text: str) -> list[int]:
        """Orpheus prompt framing (orpheus.cpp Tokenizer::encode)."""
        tok = self.tokenizer
        ids = [128259, tok.bos_token_id]
        prompt = (f"{self.voice}: " if self.voice else "") + text
        ids.extend(tok.encode(prompt))
        ids.extend([128009, 128260, 128261, 128257])
        return ids

    def decode_codec_tokens(self, llm_tokens: list[int]) -> np.ndarray:
        """Codec-token stream → PCM float waveform (batch version of the
        reference's sliding-window loop)."""
        cfg = self.snac_cfg
        fs = cfg.frame_tokens
        ids = []
        for t in llm_tokens:
            if t < CUSTOM_TOKEN_START or t > CUSTOM_TOKEN_END:
                continue
            v = (t - CUSTOM_TOKEN_START) - (len(ids) % fs) * cfg.codebook_size
            if v < 0:
                continue
            ids.append(v)
        pcm = []
        for count in range(fs, len(ids) + 1, fs):
            if count < 28:
                continue
            window = ids[count - 28: count]
            codes = [[] for _ in cfg.vq_strides]
            for f in range(len(window) // fs):
                i = f * fs
                for level in self._pyramid:
                    codes[level].append(window[i])
                    i += 1
            wave = np.asarray(snac_decode(cfg, self.snac_params, codes))
            if len(wave) == 8192:
                pcm.append(wave[2048:4096])
        return np.concatenate(pcm) if pcm else np.zeros((0,), np.float32)

    def speech_synthesis(self, text: str, gen_config=None):
        """→ (int16 samples, sample_rate, channels)
        (AbstractModel::speech_synthesis analog, src/chat.h:978)."""
        from ..runtime.generate import GenerationConfig

        assert self.snac_params is not None, "SNAC decoder weights missing"
        gen_config = gen_config or GenerationConfig(do_sample=True,
                                                    temperature=0.6,
                                                    top_p=0.9,
                                                    max_new_tokens=2048)
        ids = self.encode_tts_prompt(text)
        out, _, _ = self.generate(ids, gen_config)
        wave = self.decode_codec_tokens(out)
        pcm16 = np.clip(wave * 32767.0, -32768, 32767).astype(np.int16)
        return pcm16, self.snac_cfg.sampling_rate, 1


@register_model(ModelType.MAYA1)
class Maya1(OrpheusTTS):
    """Maya1 voice-design TTS (reference /root/reference/models/maya.cpp):
    Orpheus arch + SNAC with a `<description="...">` prompt; codec ids are
    reduced mod codebook_size instead of the per-slot offset subtraction."""

    DEFAULT_VOICE = ("Realistic male voice in the 30s age with american "
                     "accent. Normal pitch, warm timbre, conversational "
                     "pacing.")

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        self = super().load(gf, rt)
        self.voice = ""
        return self

    def encode_tts_prompt(self, text: str) -> list[int]:
        tok = self.tokenizer
        desc = self.voice or self.DEFAULT_VOICE
        ids = [128259, tok.bos_token_id]
        ids.extend(tok.encode(f'<description="{desc}"> {text}'))
        ids.extend([128009, 128260, 128261, 128257])
        return ids

    def decode_codec_tokens(self, llm_tokens: list[int]) -> np.ndarray:
        cfg = self.snac_cfg
        fs = cfg.frame_tokens
        ids = [(t - CUSTOM_TOKEN_START) % cfg.codebook_size
               for t in llm_tokens
               if CUSTOM_TOKEN_START <= t <= CUSTOM_TOKEN_END]
        pcm = []
        for count in range(fs, len(ids) + 1, fs):
            if count < 28:
                continue
            window = ids[count - 28: count]
            codes = [[] for _ in cfg.vq_strides]
            for f in range(len(window) // fs):
                i = f * fs
                for level in self._pyramid:
                    codes[level].append(window[i])
                    i += 1
            wave = np.asarray(snac_decode(cfg, self.snac_params, codes))
            if len(wave) == 8192:
                pcm.append(wave[2048:4096])
        return np.concatenate(pcm) if pcm else np.zeros((0,), np.float32)
