"""OuteTTS (reference /root/reference/models/oute.cpp — namespaces
chatllm::oute::tts_llama :222 and tts_qwen3 :664; converter
OuteTTSConverter convert.py:8946).

Llama-3.2 or Qwen3 LLM generating interleaved <|c1_N|><|c2_N|> DAC codec
token pairs, decoded to 24 kHz PCM by the shared SNAC/DAC decoder
(nn/snac.py with noise/depthwise off, VQ strides 1, output_padding 0).

The prompt follows OuteTTS v3 prompt_processor semantics (text
normalization, optional speaker-profile word codes via `--set speaker
file.json`)."""
from __future__ import annotations

import json
import re

import numpy as np

from ..nn.snac import SnacConfig, load_snac_params, snac_decode
from .base import BaseLLM, ParamBuilder, RuntimeConfig, register_model
from .llama import Llama32
from .model_types import ModelType
from .qwen import Qwen3

_UNICODE_MAP = {"“": '"', "”": '"', "‘": "'", "’": "'", "–": "-", "—": "-",
                "…": "..."}


def text_normalization(text: str) -> str:
    result = re.sub(r"\s+", " ", text).strip()
    for a, b in _UNICODE_MAP.items():
        result = result.replace(a, b)
    return result


def _separator_for(text: str) -> str:
    for ch in text:
        cp = ord(ch)
        if 0x3040 <= cp <= 0x30FF or 0x4E00 <= cp <= 0x9FFF:
            return "。"
    return ". "


def merge_speaker_text(input_text: str, speaker_text: str):
    """(merged text, separator-to-append-to-last-word)
    (oute.cpp merge_speaker_text:451)."""
    speaker_text = speaker_text.strip()
    sep = _separator_for(speaker_text)
    allowed = ("。", "？", "！", "?", "!") if sep == "。" else (".", "?", "!")
    rs = ""
    if speaker_text:
        if not speaker_text.endswith(allowed):
            rs = sep
        elif sep != "。":
            rs = " "
    return speaker_text + rs + input_text.strip(), rs.strip()


def _features(f: dict) -> str:
    return (f"<|energy_{int(f.get('energy', 0))}|>"
            f"<|spectral_centroid_{int(f.get('spectral_centroid', 0))}|>"
            f"<|pitch_{int(f.get('pitch', 0))}|>")


def create_codes(words: list[dict]) -> str:
    """Speaker-profile word blocks (oute.cpp create_codes:339)."""
    out = []
    for w in words:
        s = w["word"] + "<|features|>"
        s += f"<|t_{float(w['duration']):.2f}|>"
        s += _features(w.get("features", {}))
        s += "<|code|>"
        for c1, c2 in zip(w["c1"], w["c2"]):
            s += f"<|c1_{int(c1)}|><|c2_{int(c2)}|>"
        out.append("<|word_start|>" + s + "<|word_end|>")
    return "\n".join(out)


def get_completion_prompt(text: str, speaker: dict | None) -> str:
    text = text_normalization(text)
    if speaker:
        speaker = json.loads(json.dumps(speaker))  # deep copy; we mutate
        merged, sep = merge_speaker_text(text, speaker.get("text", ""))
        text = merged
        if sep and speaker.get("words"):
            speaker["words"][-1]["word"] += sep
        prompt = (f"<|im_start|><|text_start|>{text}<|text_end|>\n"
                  "<|audio_start|>\n")
        prompt += create_codes(speaker["words"]) + "\n<|word_start|>"
        return prompt
    return f"<|im_start|><|text_start|>{text}<|text_end|>\n<|audio_start|>\n"


class _OuteTTSMixin:
    """Shared codec wiring + speech_synthesis for both LLM bases."""

    def _init_tts(self, gf, rt):
        tok = self.tokenizer
        tok.c1_0_token_id = tok.tp.piece_to_id("<|c1_0|>")
        tok.c2_0_token_id = tok.tp.piece_to_id("<|c2_0|>")
        tok.audio_end_token_id = tok.tp.piece_to_id("<|audio_end|>")
        tok.terminate_ids.add(tok.audio_end_token_id)
        self.speaker = None

        dac = (gf.meta or {}).get("dac_config.json", {})
        self.dac_cfg = SnacConfig(
            sampling_rate=int(dac.get("sampling_rate", 24000)),
            decoder_dim=int(dac.get("decoder_hidden_size", 1536)),
            decoder_rates=tuple(dac.get("upsampling_ratios", (8, 8, 4, 2))),
            codebook_size=int(dac.get("codebook_size", 1024)),
            codebook_dim=int(dac.get("codebook_dim", 8)),
            vq_strides=(1,) * int(dac.get("n_codebooks", 2)),
            noise=False, depthwise=False, auto_output_padding=False)
        self.dac_params = None
        if gf.has_tensor("dac.decoder.model.layers.0.weight"):
            pb = ParamBuilder(gf, rt)
            self.dac_params = load_snac_params(pb, self.dac_cfg, prefix="dac.")

    def set_additional_args(self, args: dict):
        path = args.get("speaker")
        if path:
            with open(path) as f:
                self.speaker = json.load(f)

    def encode_tts_prompt(self, text: str) -> list[int]:
        return self.tokenizer.tp.encode(get_completion_prompt(text, self.speaker))

    def decode_codec_tokens(self, llm_tokens) -> np.ndarray:
        """c1/c2 token-id ranges → interleaved frames → DAC decode
        (oute.cpp generate_audio:613)."""
        tok = self.tokenizer
        cs = self.dac_cfg.codebook_size
        c1 = [t - tok.c1_0_token_id for t in llm_tokens
              if tok.c1_0_token_id <= t < tok.c1_0_token_id + cs]
        c2 = [t - tok.c2_0_token_id for t in llm_tokens
              if tok.c2_0_token_id <= t < tok.c2_0_token_id + cs]
        n = min(len(c1), len(c2))
        if n == 0:
            return np.zeros((0,), np.float32)
        return np.asarray(snac_decode(self.dac_cfg, self.dac_params,
                                      [c1[:n], c2[:n]]))

    def speech_synthesis(self, text: str, gen_config=None):
        """→ (int16 samples, sample_rate, channels)."""
        from ..runtime.generate import GenerationConfig

        assert self.dac_params is not None, "DAC decoder weights missing"
        gen_config = gen_config or GenerationConfig(
            do_sample=True, temperature=0.4, top_k=40, max_new_tokens=4096)
        ids = self.encode_tts_prompt(text)
        out, _, _ = self.generate(ids, gen_config)
        wave = self.decode_codec_tokens(out)
        pcm16 = np.clip(wave * 32767.0, -32768, 32767).astype(np.int16)
        return pcm16, self.dac_cfg.sampling_rate, 1


@register_model(ModelType.OUTE_TTS_LLAMA)
class OuteTTSLlama(_OuteTTSMixin, BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        lm = Llama32.load.__func__(Llama32, gf, rt)
        self = cls(gf.model_type, lm.cfg, lm.params, lm.tokenizer,
                   native_config=lm.native_config, meta=gf.meta)
        self._init_tts(gf, rt)
        return self


@register_model(ModelType.OUTE_TTS_QWEN3)
class OuteTTSQwen3(_OuteTTSMixin, BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        lm = Qwen3.load.__func__(Qwen3, gf, rt)
        self = cls(gf.model_type, lm.cfg, lm.params, lm.tokenizer,
                   native_config=lm.native_config, meta=gf.meta)
        self._init_tts(gf, rt)
        return self
