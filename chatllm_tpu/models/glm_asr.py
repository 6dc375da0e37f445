"""GLM-ASR (reference: /root/reference/models/chatglm.cpp glm::asr:1032,
registered :1323): llama-v3 LLM + rope audio tower, speech → transcript.

Template: <|user|>\\n<|begin_of_audio|>…<|end_of_audio|><|user|>\\n{prompt}
<|assistant|>\\n (inject_audio_ids + HistoryEncoderBracketRole)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn.audio import (GlmAudioConfig, glm_audio_encoder_forward,
                        load_glm_audio_params)
from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor2
from .base import BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig, \
    load_llama_family_params, register_model
from .llama import build_dense_config
from .model_types import ModelType


class GlmAsrEncoder(HistoryEncoder):
    def __init__(self, user_id, assistant_id):
        super().__init__()
        self.user_id, self.assistant_id = user_id, assistant_id

    def append_user(self, round_idx, user, ids):
        ids.append(self.user_id)
        ids.extend(self.tokenizer.encode("\n" + user + "\n"))

    def append_ai_opening(self, round_idx, ids):
        ids.append(self.assistant_id)
        ids.extend(self.tokenizer.encode("\n"))


@register_model(ModelType.GLM_ASR)
class GlmAsr(BaseLLM):
    EXTRA_FMT = "if"   # llama v3 config (chatglm.cpp:1034 typedef)

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tp = BPEProcessor2()
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        user_id = tp.piece_to_id("<|user|>")
        assistant_id = tp.piece_to_id("<|assistant|>")
        tok = ChatTokenizer(tp, GlmAsrEncoder(user_id, assistant_id),
                            sys_prompt="")
        tok.eos_token_id = tp.piece_to_id("<|endoftext|>")
        tok.audio_bos_token_id = tp.piece_to_id("<|begin_of_audio|>")
        tok.audio_eos_token_id = tp.piece_to_id("<|end_of_audio|>")
        for t in (tok.eos_token_id, user_id, assistant_id):
            if t >= 0:
                tok.terminate_ids.add(t)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        self = cls(gf.model_type, cfg, params, tok, native_config=base,
                   meta=gf.meta)
        self._user_id, self._assistant_id = user_id, assistant_id

        cfg_json = (gf.meta or {}).get("config.json", {})
        aud = cfg_json.get("audio_config", {})
        pp = (gf.meta or {}).get("preprocessor_config.json", {})
        self.sampling_rate = int(pp.get("sampling_rate", 16000))
        self.n_mels = int(pp.get("feature_size", aud.get("num_mel_bins", 128)))
        self.aud_cfg = None
        self.aud_params = None
        if aud and gf.has_tensor("audio.conv1.bias"):
            head_dim = int(aud.get("head_dim",
                                   aud["hidden_size"] // aud["num_attention_heads"]))
            rp = aud.get("rope_parameters", {})
            self.aud_cfg = GlmAudioConfig(
                n_mels=int(aud["num_mel_bins"]),
                hidden_size=int(aud["hidden_size"]),
                num_hidden_layers=int(aud["num_hidden_layers"]),
                num_attention_heads=int(aud["num_attention_heads"]),
                num_key_value_heads=int(aud.get("num_key_value_heads",
                                                aud["num_attention_heads"])),
                intermediate_size=int(aud["intermediate_size"]),
                max_positions=int(aud.get("max_position_embeddings", 1500)),
                rope_dim=int(head_dim * float(aud.get("partial_rotary_factor", 1.0))),
                rope_theta=float(rp.get("rope_theta", 10000.0)))
            self.aud_params = load_glm_audio_params(pb, self.aud_cfg)
        return self

    # ------------------------------------------------------------------
    def encode_audio(self, mel: np.ndarray) -> jnp.ndarray:
        assert self.aud_cfg is not None, "audio tower not loaded"
        return glm_audio_encoder_forward(self.aud_cfg, self.aud_params,
                                         jnp.asarray(mel))

    def chat_audio(self, audio, question: str = "请转写这段音频。",
                   gen_config=None, streamer=None) -> str:
        from ..nn.transformer import embed_tokens
        from ..runtime.audio import load_audio, log_mel_spectrogram
        from ..runtime.generate import GenerationConfig

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=256)
        if isinstance(audio, (str, bytes)):
            pcm = load_audio(audio, self.sampling_rate)
        else:
            pcm = np.asarray(audio, np.float32)
        mel = log_mel_spectrogram(pcm, n_mels=self.n_mels)
        media = self.encode_audio(mel)

        tok = self.tokenizer
        pre = [self._user_id]
        pre.extend(tok.encode("\n"))
        pre.append(tok.audio_bos_token_id)
        mid = [tok.audio_eos_token_id, self._user_id]
        mid.extend(tok.encode("\n" + question))
        mid.append(self._assistant_id)
        mid.extend(tok.encode("\n"))

        emb_pre = embed_tokens(self.cfg, self.params,
                               jnp.asarray(np.asarray([pre], np.int32)))[0]
        emb_mid = embed_tokens(self.cfg, self.params,
                               jnp.asarray(np.asarray([mid], np.int32)))[0]
        embeds = jnp.concatenate(
            [emb_pre, media.astype(emb_pre.dtype), emb_mid], axis=0)[None]

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
