"""Qwen3-ASR + Qwen3-ForcedAligner (reference /root/reference/models/qwen.cpp
namespaces chatllm::qwen::v3_asr :2956 and v3_forcedaligner :3193; AuT audio
tower models/qwen_asr.{h,cpp}; converter Qwen3ASRConverter convert.py:6119).

Qwen3 LLM + AuT conv2d-window audio encoder (nn/audio.py aut_forward).
ASR prompt: ChatML user turn holding the spliced audio embeddings, with the
assistant opening optionally pinned to "language <L>".  The ForcedAligner
swaps the lm_head for a timestamp classifier and aligns a transcript to the
audio: words are interleaved with <timestamp> token pairs, each classified
to a time bin, then smoothed with the reference's LIS anomaly repair
(fix_timestamp, qwen.cpp:3281-3402).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn.audio import AuTConfig, aut_feat_out_len, aut_forward, load_aut_params
from .base import BaseConfig, ParamBuilder, RuntimeConfig, register_model
from .model_types import ModelType
from .qwen import Qwen3


def fix_timestamp(data: list[float]) -> list[float]:
    """Longest-increasing-subsequence anomaly repair over raw per-token
    times (qwen.cpp fix_timestamp:3281): ≤2 consecutive anomalies snap to
    the nearer normal neighbour, longer runs are linearly interpolated."""
    n = len(data)
    if n == 0:
        return []
    dp, parent = [1] * n, [-1] * n
    for i in range(1, n):
        for j in range(i):
            if data[j] <= data[i] and dp[j] + 1 > dp[i]:
                dp[i] = dp[j] + 1
                parent[i] = j
    idx = int(np.argmax(dp))
    is_normal = [False] * n
    while idx != -1:
        is_normal[idx] = True
        idx = parent[idx]
    result = list(data)
    i = 0
    while i < n:
        if is_normal[i]:
            i += 1
            continue
        j = i
        while j < n and not is_normal[j]:
            j += 1
        left = next((result[k] for k in range(i - 1, -1, -1) if is_normal[k]),
                    None)
        right = next((result[k] for k in range(j, n) if is_normal[k]), None)
        if j - i <= 2:
            for k in range(i, j):
                if left is None:
                    result[k] = right if right is not None else 0.0
                elif right is None:
                    result[k] = left
                else:
                    result[k] = left if (k - (i - 1)) <= (j - k) else right
        else:
            if left is not None and right is not None:
                step = (right - left) / (j - i + 1)
                for k in range(i, j):
                    result[k] = left + step * (k - i + 1)
            elif left is not None:
                for k in range(i, j):
                    result[k] = left
            elif right is not None:
                for k in range(i, j):
                    result[k] = right
        i = j
    return result


def _is_cjk(cp: int) -> bool:
    return (0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF or
            0xF900 <= cp <= 0xFAFF)


def split_words(text: str, language: str) -> list[list[str]]:
    """[(sentence → [word, ...])]: whitespace split; Chinese additionally
    splits each CJK codepoint into its own word (qwen.cpp split_cjk)."""
    out = []
    for sent in text.split():
        if language == "Chinese":
            words, run = [], ""
            for ch in sent.lower():
                if _is_cjk(ord(ch)):
                    if run:
                        words.append(run)
                        run = ""
                    words.append(ch)
                else:
                    run += ch
            if run:
                words.append(run)
            out.append([w for w in words if w])
        else:
            out.append([sent.lower()])
    return [w for w in out if w]


@register_model(ModelType.QWEN3_ASR)
class Qwen3ASR(Qwen3):
    # v3_asr::Config = v3::Config + mrope_section[4] (qwen.cpp:2958)
    EXTRA_FMT = Qwen3.EXTRA_FMT + "4i"

    @classmethod
    def load(cls, gf, rt):
        self = super().load(gf, rt)
        tok = self.tokenizer

        meta = gf.meta or {}
        added = {}
        for k, v in (meta.get("tokenizer_config.json", {})
                     .get("added_tokens_decoder", {})).items():
            added[v.get("content", "")] = int(k)
        for name, attr in (("<|audio_start|>", "audio_bos_token_id"),
                           ("<|audio_end|>", "audio_eos_token_id"),
                           ("<|im_start|>", "im_start_token_id"),
                           ("<|im_end|>", "im_end_token_id"),
                           ("<asr_text>", "asr_text_token_id"),
                           ("<timestamp>", "timestamp_token_id")):
            tid = added.get(name, tok.tp.piece_to_id(name))
            setattr(tok, attr, tid)
        self.support_languages = {
            str(s).lower(): str(s)
            for s in meta.get("config.json", {}).get("support_languages", [])}

        aud = (meta.get("config.json", {}).get("thinker_config", {})
               .get("audio_config", {}))
        pp = meta.get("preprocessor_config.json", {})
        self.sampling_rate = int(pp.get("sampling_rate", 16000))
        self.aud_cfg = None
        self.aud_params = None
        if aud and gf.has_tensor("audio.conv2d1.bias"):
            self.aud_cfg = AuTConfig(
                n_mels=int(aud["num_mel_bins"]),
                hidden_size=int(aud["d_model"]),
                num_hidden_layers=int(aud["encoder_layers"]),
                num_attention_heads=int(aud["encoder_attention_heads"]),
                intermediate_size=int(aud["encoder_ffn_dim"]),
                output_dim=self.cfg.hidden_size,
                downsample_hidden_size=int(aud["downsample_hidden_size"]),
                n_window=int(aud.get("n_window", 50)),
                n_window_infer=int(aud.get("n_window_infer", 800)),
                conv_chunksize=int(aud.get("conv_chunksize", 500)),
                max_source_positions=int(aud.get("max_source_positions", 1500)))
            pb = ParamBuilder(gf, rt)
            self.aud_params = load_aut_params(pb, self.aud_cfg)
        return self

    # ------------------------------------------------------------------
    def _audio_mel(self, audio) -> np.ndarray:
        from ..runtime.audio import load_audio, log_mel_spectrogram

        if isinstance(audio, (str, bytes)):
            pcm = load_audio(audio, self.sampling_rate)
        else:
            pcm = np.asarray(audio, np.float32)
        mel = log_mel_spectrogram(pcm, n_mels=self.aud_cfg.n_mels)
        # pad_mel_len (qwen_asr.cpp:292): tail rounded up to a multiple of 8
        n = mel.shape[1]
        padded = (n // 100) * 100 + -(-(n % 100) // 8) * 8
        if padded > n:
            mel = np.pad(mel, ((0, 0), (0, padded - n)))
        return mel[:, :padded].T                         # [T, n_mels]

    def encode_audio(self, mel: np.ndarray) -> jnp.ndarray:
        """mel [T, n_mels] → projected embeddings [aut_len, lm_hidden]."""
        assert self.aud_cfg is not None, "audio tower not loaded"
        return aut_forward(self.aud_cfg, self.aud_params, jnp.asarray(mel))

    def normalize_lang(self, language: str | None) -> str:
        if not language:
            return ""
        return self.support_languages.get(language.lower(), "")

    def _audio_prompt(self, media, opening_extra: str = ""):
        """ChatML ids around the spliced audio embeddings
        (v3_asr::append_user / append_ai_opening, qwen.cpp:3174-3192)."""
        from ..nn.transformer import embed_tokens

        tok = self.tokenizer
        pre = [tok.im_start_token_id]
        pre.extend(tok.encode("user\n"))
        pre.append(tok.audio_bos_token_id)
        mid = [tok.audio_eos_token_id, tok.im_end_token_id]
        mid.extend(tok.encode("\n"))
        mid.append(tok.im_start_token_id)
        mid.extend(tok.encode("assistant\n"))
        if opening_extra:
            mid.extend(tok.encode(opening_extra))
        emb_pre = embed_tokens(self.cfg, self.params,
                               jnp.asarray(np.asarray([pre], np.int32)))[0]
        emb_mid = embed_tokens(self.cfg, self.params,
                               jnp.asarray(np.asarray([mid], np.int32)))[0]
        embeds = jnp.concatenate(
            [emb_pre, media.astype(emb_pre.dtype), emb_mid], axis=0)[None]
        return embeds, len(pre), len(mid)

    def chat_audio(self, audio, language: str | None = None,
                   gen_config=None, streamer=None) -> str:
        """Transcribe: the model answers "language <L><asr_text><text>"."""
        from ..runtime.generate import GenerationConfig

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=448)
        media = self.encode_audio(self._audio_mel(audio))
        lang = self.normalize_lang(language)
        embeds, _, _ = self._audio_prompt(
            media, f"language {lang}" if lang else "")

        tok = self.tokenizer
        eng = self.engine
        cache = eng.new_cache(1, eng.max_length)
        logits, cache, n_past = eng.prefill_embeds(embeds, cache, 0)
        out, cache, n_past = eng.generate_from_logits(
            logits, cache, n_past, gen_config,
            is_terminator=tok.is_terminate_token,
            on_token=(lambda t: streamer.put([t])) if streamer else None)
        if streamer:
            streamer.end()
        return tok.decode(out)

    transcribe = chat_audio


@register_model(ModelType.QWEN3_ForcedAligner)
class Qwen3ForcedAligner(Qwen3ASR):
    """lm_head → timestamp-bin classifier [classify_num, hidden]; one
    prefill classifies every <timestamp> token (qwen.cpp:3403-3470)."""

    EXTRA_FMT = Qwen3ASR.EXTRA_FMT + "i"           # + classify_num

    @classmethod
    def load(cls, gf, rt):
        self = super().load(gf, rt)
        _, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        self.classify_num = int(extra[-1])
        self.timestamp_segment_time = float(
            (gf.meta or {}).get("config.json", {})
            .get("timestamp_segment_time", 0.08))
        return self

    def align(self, audio, text: str, language: str = "Chinese",
              delimiter: str | None = None):
        """→ [(sentence, start_s, end_s)] per sentence of `text`
        (words interleaved with <timestamp> pairs; per-word classifier
        times smoothed by fix_timestamp)."""
        from ..nn.transformer import init_cache, transformer_forward

        tok = self.tokenizer
        media = self.encode_audio(self._audio_mel(audio))
        if delimiter:
            sentences = [s for s in text.split(delimiter) if s.strip()]
            groups = [[w for ws in split_words(s, language) for w in ws]
                      for s in sentences]
        elif language == "Chinese":
            # each CJK-split word is its own "sentence" (qwen.cpp:3619-3637)
            flat = [w for ws in split_words(text, language) for w in ws]
            sentences = flat
            groups = [[w] for w in flat]
        else:
            groups = split_words(text, language)
            sentences = [" ".join(g) for g in groups]

        words, parents = [], []
        for si, g in enumerate(groups):
            for w in g:
                words.append(w)
                parents.append(si)

        # inject_words (qwen.cpp:3474): w1 ts ts w2 ts ts ... wN ts ts
        tail: list[int] = []
        ts_pos = []
        for i, w in enumerate(words):
            if i > 0:
                ts_pos += [len(tail), len(tail) + 1]
                tail += [tok.timestamp_token_id, tok.timestamp_token_id]
            tail.extend(tok.encode(w))
        ts_pos += [len(tail), len(tail) + 1]
        tail += [tok.timestamp_token_id, tok.timestamp_token_id]

        from ..nn.transformer import embed_tokens

        embeds, n_pre, _ = self._audio_prompt(media)
        emb_tail = embed_tokens(self.cfg, self.params,
                                jnp.asarray(np.asarray([tail], np.int32)))[0]
        embeds = jnp.concatenate([embeds[0], emb_tail], axis=0)[None]
        tail_start = embeds.shape[1] - len(tail)

        cache = init_cache(self.cfg, 1, embeds.shape[1])
        logits, _ = transformer_forward(self.cfg, self.params, None, cache, 0,
                                        input_embeds=embeds)
        cls_ids = np.asarray(jnp.argmax(logits[0], axis=-1))
        data = [self.timestamp_segment_time * float(cls_ids[tail_start + p])
                for p in ts_pos]
        times = fix_timestamp(data)

        spans: list[list[float]] = []
        for i, pid in enumerate(parents):
            start, end = times[2 * i], times[2 * i + 1]
            if pid >= len(spans):
                while pid > len(spans):
                    spans.append([0.0, 0.0])
                spans.append([start, end])
            else:
                spans[-1][1] = end
        while len(spans) < len(sentences):
            spans.append([0.0, 0.0])
        return [(s, sp[0], sp[1]) for s, sp in zip(sentences, spans)]
