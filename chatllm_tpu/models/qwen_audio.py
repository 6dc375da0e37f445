"""Qwen2-Audio (reference: /root/reference/models/qwen.cpp namespace
chatllm::qwen::v2_audio, registered at :3683).

Qwen2 LLM + Whisper-descendant audio tower (nn/audio.py) with avg-pool ×2 and
a linear projector; audio embeddings are spliced between <|audio_bos|> /
<|audio_eos|> markers in a ChatML prompt (inject_audio_ids, qwen.cpp:663).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn.audio import (AudioEncoderConfig, audio_encoder_forward,
                        load_audio_tower_params)
from .base import BaseLLM, ParamBuilder, RuntimeConfig, register_model
from .model_types import ModelType
from .qwen import Qwen2


@register_model(ModelType.QWEN2_AUDIO)
class Qwen2Audio(BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        lm = Qwen2.load.__func__(Qwen2, gf, rt)
        self = cls(gf.model_type, lm.cfg, lm.params, lm.tokenizer,
                   native_config=lm.native_config, meta=gf.meta)
        tok = self.tokenizer
        tok.audio_bos_token_id = tok.tp.piece_to_id("<|audio_bos|>")
        tok.audio_eos_token_id = tok.tp.piece_to_id("<|audio_eos|>")

        cfg_json = (gf.meta or {}).get("config.json", {})
        aud = cfg_json.get("audio_config", {})
        pp = (gf.meta or {}).get("preprocessor_config.json", {})
        self.sampling_rate = int(pp.get("sampling_rate", 16000))
        self.n_mels = int(pp.get("feature_size", aud.get("num_mel_bins", 128)))
        self.aud_cfg = None
        self.aud_params = None
        if aud and gf.has_tensor("audio.embed_positions.weight"):
            self.aud_cfg = AudioEncoderConfig(
                n_mels=int(aud["num_mel_bins"]),
                hidden_size=int(aud["d_model"]),
                num_hidden_layers=int(aud["encoder_layers"]),
                num_attention_heads=int(aud["encoder_attention_heads"]),
                intermediate_size=int(aud["encoder_ffn_dim"]),
                max_source_positions=int(aud.get("max_source_positions", 1500)))
            pb = ParamBuilder(gf, rt)
            self.aud_params = load_audio_tower_params(pb, self.aud_cfg)
            self.aud_params["projector"] = pb.linear(
                "multi_modal_projector.linear", bias=True)
        return self

    # ------------------------------------------------------------------
    def encode_audio(self, mel: np.ndarray) -> jnp.ndarray:
        """mel [n_mels, frames] → projected embeddings [T, lm_hidden]
        (AudioTransformer::forward: encoder → avg-pool ×2 → LN → linear)."""
        from ..ops.qmm import matmul

        assert self.aud_cfg is not None, "audio tower not loaded"
        h = audio_encoder_forward(self.aud_cfg, self.aud_params,
                                  jnp.asarray(mel)[None], pool_stride=2)
        return matmul(h, self.aud_params["projector"])[0]

    def chat_audio(self, audio, question: str = "", gen_config=None,
                   streamer=None) -> str:
        """One-shot audio chat: load → log-mel → encode → splice → generate
        (v2_audio::ChatHistoryEncoder::append_user, qwen.cpp:740)."""
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
        pre: list[int] = []
        tok.chat_encoder.append_sys_prompt(pre)
        pre.append(tok.im_start_token_id)
        pre.extend(tok.encode("user\nAudio 1: "))
        pre.append(tok.audio_bos_token_id)
        mid: list[int] = [tok.audio_eos_token_id]
        mid.extend(tok.encode("\n" + question))
        mid.append(tok.im_end_token_id)
        mid.extend(tok.encode("\n"))
        mid.append(tok.im_start_token_id)
        mid.extend(tok.encode("assistant\n"))

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
