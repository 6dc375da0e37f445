"""Qwen3-TTS (reference /root/reference/models/qwen_tts.cpp namespace
chatllm::qwen::v3_tts, 2224 LoC — the second-largest reference model file).

Three coupled networks drive speech synthesis (speech_synthesis :2150):

 1. the **talker** — a Qwen3 LLM over the codec vocabulary whose embedding
    table is extended with rows projected from TEXT token embeddings
    (text_embedding → SiLU resize MLP, TalkerGeneration::project_text
    :1655) and optionally one speaker x-vector row; every input position is
    the SUM of a main embedding and a scaled "added" embedding
    (run_main_model custom_embedding :2048), and during decode each step
    additionally sums the 15 residual-codebook embeddings of the previous
    frame (run_main_model(added_id, code_block) :1928).
 2. the **code predictor** — a small Qwen3 stack that, given the talker's
    last hidden state and the frame's first codec id embedding, emits the
    remaining 15 residual codebook ids one by one, each step with its own
    input embedding table and output head (Qwen3TTSTalkerCodePredictor…
    :873, TalkerGeneration::code_predict :1570).
 3. the **speech tokenizer decoder** — RVQ dequantize → sliding-window
    pre-transformer → ConvNeXt upsample → snake HiFi decoder
    (nn/qwen_tts_codec.py), run chunked (chunked_decode :704).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..nn.qwen_tts_codec import (QwenTTSDecoderConfig, SpeakerEncoderConfig,
                                 load_qwen_tts_decoder, load_speaker_encoder,
                                 qwen_tts_chunked_decode,
                                 speaker_encoder_forward)
from ..nn.transformer import (TransformerConfig, init_cache, lm_logits,
                              transformer_forward)
from ..ops.qmm import matmul
from ..ops.rope import ROPE_NEOX, RopeConfig
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   register_model)
from .model_types import ModelType
from .qwen import Qwen3, make_qwen_tokenizer

MROPE_SECTION_MAX = 4
CODE_BLOCK = 16           # num_code_groups (TalkerGeneration code_block_size)
TTS_SAMPLE_RATE = 24000   # qwen_tts.h:10


def _sample(logits: np.ndarray, gen_config, rng: np.random.RandomState) -> int:
    """Host-side sampler for the bespoke talker loop (temperature / top-k /
    top-p, matching the reference SamplerFactory defaults)."""
    t = getattr(gen_config, "temperature", 1.0)
    if not getattr(gen_config, "do_sample", False) or t <= 0:
        return int(np.argmax(logits))
    x = logits.astype(np.float64) / max(t, 1e-6)
    k = getattr(gen_config, "top_k", 0)
    if k and 0 < k < len(x):
        kth = np.partition(x, -k)[-k]
        x = np.where(x < kth, -np.inf, x)
    p = np.exp(x - np.max(x))
    p /= p.sum()
    tp = getattr(gen_config, "top_p", 1.0)
    if 0 < tp < 1.0:
        order = np.argsort(-p)
        cum = np.cumsum(p[order])
        cut = np.searchsorted(cum, tp) + 1
        mask = np.zeros_like(p)
        mask[order[:cut]] = p[order[:cut]]
        p = mask / mask.sum()
    return int(rng.choice(len(p), p=p))


@register_model(ModelType.QWEN3_TTS)
class Qwen3TTS(BaseLLM):
    """v3_tts::ConditionalGeneration (qwen_tts.cpp:1419-2221)."""

    # QWen3Converter.dump_config + mrope_section[4] + {text_hidden_size,
    # talker_vocab_size} (Qwen3TTSConverter.dump_config, convert.py:6092)
    EXTRA_FMT = Qwen3.EXTRA_FMT + "6i"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, head_dim, rope_theta) = extra[0], extra[1], extra[2]
        tail = extra[-6:]
        text_hidden = tail[4]
        talker_vocab = tail[5]

        # the talker LLM: qwen3 arch over the codec vocabulary; BaseConfig's
        # vocab_size is the TEXT vocab (for the tokenizer) — the transformer
        # embeds talker_vocab + projected rows, lm_head = codec_head
        cfg = TransformerConfig(
            vocab_size=talker_vocab, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv,
            intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            head_dim=head_dim, norm_eps=1e-6, qk_norm="rmsnorm",
            rope=RopeConfig(head_dim=head_dim, freq_base=rope_theta,
                            layout=ROPE_NEOX),
            cache_dtype=rt.cache_dtype)

        tok = make_qwen_tokenizer(gf, base)
        tok_cfg = (gf.meta or {}).get("tokenizer_config.json", {})
        for tid, entry in tok_cfg.get("added_tokens_decoder", {}).items():
            try:
                tok.tp.add_added_token(entry["content"], int(tid))
            except (KeyError, ValueError):
                pass

        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("talker.model.codec_embedding.weight"),
            "final_norm": pb.norm("talker.model.norm"),
            "lm_head": pb.linear("talker.codec_head"),
            "layers": [],
        }
        for i in range(base.num_hidden_layers):
            pfx = f"talker.model.layers.{i}"
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
                "mlp": {"gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                        "up": pb.linear(f"{pfx}.mlp.up_proj"),
                        "down": pb.linear(f"{pfx}.mlp.down_proj")},
            })
        params["layers"] = tuple(params["layers"])

        self = cls(gf.model_type, cfg, params, tok, native_config=base,
                   meta=gf.meta)
        self.talker_vocab = talker_vocab
        self._load_talker_parts(gf, pb, rt, text_hidden)
        self._load_codec_ids(gf.meta or {})
        self.language = "auto"
        self.speaker = "vivian"
        self.instruct = ""
        self.ref_audio_file = ""
        self._step_cache = {}
        return self

    # ------------------------------------------------------------------
    def _load_talker_parts(self, gf, pb, rt, text_hidden):
        cfg_json = (gf.meta or {}).get("config.json", {})
        talker_cfg = cfg_json.get("talker_config", {})

        self.text_embedding = pb.array("talker.model.text_embedding.weight")
        self.text_proj = {
            "fc0": pb.linear("talker.text_projection.linear_fc1"),
            "fc1": pb.linear("talker.text_projection.linear_fc2"),
        }

        # code predictor (Qwen3TTSTalkerCodePredictorModel, qwen_tts.cpp:786)
        cp = talker_cfg.get("code_predictor_config", {})
        self.cp_cfg = None
        if cp and gf.has_tensor("talker.code_predictor.model.norm.weight"):
            H = int(cp["hidden_size"])
            self.cp_cfg = TransformerConfig(
                vocab_size=int(cp["vocab_size"]), hidden_size=H,
                num_hidden_layers=int(cp["num_hidden_layers"]),
                num_attention_heads=int(cp["num_attention_heads"]),
                num_key_value_heads=int(cp["num_key_value_heads"]),
                intermediate_size=int(cp["intermediate_size"]),
                max_length=int(cp.get("max_position_embeddings", 64)),
                head_dim=int(cp.get("head_dim", -1)), norm_eps=1e-6,
                qk_norm="rmsnorm",
                rope=RopeConfig(head_dim=int(cp.get("head_dim",
                                H // int(cp["num_attention_heads"]))),
                                freq_base=float(cp.get("rope_theta", 1e4)),
                                layout=ROPE_NEOX),
                cache_dtype="float32")
            ng = int(cp.get("num_code_groups", CODE_BLOCK))
            base = "talker.code_predictor"
            layers = []
            for i in range(self.cp_cfg.num_hidden_layers):
                pfx = f"{base}.model.layers.{i}"
                layers.append({
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
                    "mlp": {"gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                            "up": pb.linear(f"{pfx}.mlp.up_proj"),
                            "down": pb.linear(f"{pfx}.mlp.down_proj")},
                })
            self.cp_params = {
                "layers": tuple(layers),
                "final_norm": pb.norm(f"{base}.model.norm"),
                # per-step input embeddings + output heads (Embeddings used
                # as linear maps: logits = h @ W^T)
                "codec_embedding": [pb.array(
                    f"{base}.model.codec_embedding.{i}.weight")
                    for i in range(ng - 1)],
                "lm_head": [pb.array(f"{base}.lm_head.{i}.weight")
                            for i in range(ng - 1)],
            }
            if gf.has_tensor(f"{base}.small_to_mtp_projection.weight"):
                self.cp_params["proj"] = pb.linear(
                    f"{base}.small_to_mtp_projection")

        # speech tokenizer decoder
        st = (gf.meta or {}).get("speech_tokenizer-config.json", {})
        dec = st.get("decoder_config", {})
        self.codec_cfg = None
        self.codec_params = None
        if dec and gf.has_tensor("decoder.pre_transformer.norm.weight"):
            self.codec_cfg = QwenTTSDecoderConfig(
                codebook_size=int(dec.get("codebook_size", 2048)),
                hidden_size=int(dec.get("hidden_size", 1024)),
                latent_dim=int(dec.get("latent_dim", 1024)),
                codebook_dim=int(dec.get("codebook_dim", 512)),
                rope_theta=float(dec.get("rope_theta", 1e4)),
                num_attention_heads=int(dec.get("num_attention_heads", 16)),
                num_key_value_heads=int(dec.get("num_key_value_heads", 16)),
                sliding_window=int(dec.get("sliding_window", 72)),
                intermediate_size=int(dec.get("intermediate_size", 3072)),
                rms_norm_eps=float(dec.get("rms_norm_eps", 1e-5)),
                num_hidden_layers=int(dec.get("num_hidden_layers", 8)),
                num_quantizers=int(dec.get("num_quantizers", 16)),
                upsample_rates=tuple(dec.get("upsample_rates", (8, 5, 4, 3))),
                upsampling_ratios=tuple(dec.get("upsampling_ratios", (2, 2))),
                decoder_dim=int(dec.get("decoder_dim", 1536)),
                head_dim=int(dec.get("head_dim",
                             int(dec.get("hidden_size", 1024))
                             // int(dec.get("num_attention_heads", 16)))))
            self.codec_params = load_qwen_tts_decoder(pb, self.codec_cfg)

        # speaker encoder (optional — voice cloning)
        self.spk_cfg = None
        self.spk_params = None
        if gf.has_tensor("speaker_encoder.asp.conv.bias"):
            se = cfg_json.get("speaker_encoder_config", {})
            self.spk_cfg = SpeakerEncoderConfig(
                mel_dim=int(se.get("mel_dim", 128)),
                enc_dim=int(se.get("enc_dim", 1024)),
                enc_channels=tuple(se.get("enc_channels",
                                          (512, 512, 512, 512, 1536))),
                enc_kernel_sizes=tuple(se.get("enc_kernel_sizes",
                                              (5, 3, 3, 3, 1))),
                enc_dilations=tuple(se.get("enc_dilations", (1, 2, 3, 4, 1))),
                enc_attention_channels=int(se.get("enc_attention_channels", 128)),
                enc_res2net_scale=int(se.get("enc_res2net_scale", 8)),
                enc_se_channels=int(se.get("enc_se_channels", 128)))
            self.spk_params = load_speaker_encoder(pb, self.spk_cfg)

    def _load_codec_ids(self, meta):
        cfg = meta.get("config.json", {})
        t = cfg.get("talker_config", {})
        self.codec_ids = {
            k: int(t.get(k, 0)) for k in (
                "codec_bos_id", "codec_eos_token_id", "codec_think_id",
                "codec_nothink_id", "codec_pad_id", "codec_think_bos_id",
                "codec_think_eos_id")}
        self.tts_ids = {k: int(cfg.get(k, 0)) for k in (
            "tts_bos_token_id", "tts_eos_token_id", "tts_pad_token_id")}
        self.codec_language_id = {k: int(v) for k, v in
                                  t.get("codec_language_id", {}).items()}
        self.spk_id = {k: int(v) for k, v in t.get("spk_id", {}).items()}
        self.spk_dialect_id = {
            k: self.codec_language_id[v]
            for k, v in t.get("spk_is_dialect", {}).items()
            if isinstance(v, str) and v in self.codec_language_id}

    def set_additional_args(self, args: dict):
        self.language = args.get("language", self.language).lower()
        self.speaker = args.get("speaker", self.speaker).lower()
        self.instruct = args.get("instruct", self.instruct)
        self.ref_audio_file = args.get("ref_audio_file", self.ref_audio_file)

    # ------------------------------------------------------------------
    def project_text(self, ids) -> np.ndarray:
        """text ids → talker-hidden rows (TalkerGeneration::project_text,
        qwen_tts.cpp:1655-1672): text_embedding → SiLU resize MLP."""
        emb = self.text_embedding[np.asarray(ids, np.int32)]
        h = matmul(jnp.asarray(emb), self.text_proj["fc0"]).astype(jnp.float32)
        h = jax.nn.silu(h)
        return np.asarray(matmul(h, self.text_proj["fc1"]))

    def project_speaker(self, path: str) -> np.ndarray:
        """reference audio → one x-vector embedding row
        (project_speaker_embedding, qwen_tts.cpp:1625)."""
        from ..runtime.audio import load_audio, log_mel_dual_reflect

        pcm = load_audio(path, TTS_SAMPLE_RATE)
        mel = log_mel_dual_reflect(pcm, n_mels=self.spk_cfg.mel_dim,
                                   n_fft=1024, hop_length=256,
                                   sample_rate=TTS_SAMPLE_RATE)
        return np.asarray(speaker_encoder_forward(
            self.spk_cfg, self.spk_params, jnp.asarray(mel)))

    # ------------------------------------------------------------------
    @property
    def _embed_host(self) -> np.ndarray:
        """Host copy of the talker embedding table (cached — the decode loop
        reads individual rows every frame)."""
        if getattr(self, "_embed_host_cache", None) is None:
            self._embed_host_cache = np.asarray(self.params["embed"],
                                                np.float32)
        return self._embed_host_cache

    @property
    def _codec_emb_host(self) -> list:
        if getattr(self, "_codec_emb_host_cache", None) is None:
            self._codec_emb_host_cache = [
                np.asarray(t, np.float32)
                for t in self.cp_params["codec_embedding"]]
        return self._codec_emb_host_cache

    def _emb_row(self, idx: int, proj_rows: np.ndarray) -> np.ndarray:
        if idx < self.talker_vocab:
            return self._embed_host[idx]
        return proj_rows[idx - self.talker_vocab]

    def _talker_step_fn(self, T: int):
        cfg = self.cfg
        if ("t", T) not in self._step_cache:
            from functools import partial

            @partial(jax.jit, donate_argnums=(1,))
            def fn(params, cache, embeds, n_past, n_tok):
                hidden, cache = transformer_forward(
                    cfg, params, None, cache, n_past, input_embeds=embeds,
                    return_hidden=True)
                last = jax.lax.dynamic_slice_in_dim(hidden, n_tok - 1, 1,
                                                    axis=1)
                logits = lm_logits(cfg, params, last)
                return logits[0, 0], last[0, 0], cache
            self._step_cache[("t", T)] = fn
        return self._step_cache[("t", T)]

    def _cp_step_fn(self, T: int):
        cfg = self.cp_cfg
        if ("c", T) not in self._step_cache:
            from functools import partial

            @partial(jax.jit, donate_argnums=(1,))
            def fn(params, cache, embeds, n_past):
                hidden, cache = transformer_forward(
                    cfg, params, None, cache, n_past, input_embeds=embeds,
                    return_hidden=True)
                return hidden[0, -1], cache
            self._step_cache[("c", T)] = fn
        return self._step_cache[("c", T)]

    def _code_predict(self, gen_config, rng, past_hidden, last_id_hidden):
        """One frame's residual ids (TalkerGeneration::code_predict,
        qwen_tts.cpp:1558-1569)."""
        cp = self.cp_params
        cfg = self.cp_cfg
        cache = init_cache(cfg, 1, CODE_BLOCK + 2)
        x = np.stack([past_hidden, last_id_hidden])[None]     # [1, 2, H]
        if "proj" in cp:
            x = np.asarray(matmul(jnp.asarray(x), cp["proj"]))
        h, cache = self._cp_step_fn(2)(cp, cache, jnp.asarray(x), 0)
        seq = []
        n_past = 2
        if getattr(self, "_lm_head_host", None) is None:
            self._lm_head_host = [np.asarray(t, np.float32)
                                  for t in cp["lm_head"]]
        for step in range(CODE_BLOCK - 1):
            logits = np.asarray(h, np.float32) @ self._lm_head_host[step].T
            tid = _sample(logits, gen_config, rng)
            seq.append(tid)
            if step == CODE_BLOCK - 2:
                break
            e = self._codec_emb_host[step][tid][None, None]
            if "proj" in cp:
                e = np.asarray(matmul(jnp.asarray(e), cp["proj"]))
            h, cache = self._cp_step_fn(1)(cp, cache, jnp.asarray(e), n_past)
            n_past += 1
        return seq

    # ------------------------------------------------------------------
    def speech_synthesis(self, text: str, gen_config=None):
        """→ (int16 samples, sample_rate, channels)
        (speech_synthesis, qwen_tts.cpp:2150-2220)."""
        from ..runtime.generate import GenerationConfig

        assert self.cp_cfg is not None, \
            "code predictor weights missing from this checkpoint"
        assert self.codec_params is not None, \
            "speech tokenizer decoder weights missing from this checkpoint"
        gen_config = gen_config or GenerationConfig(
            do_sample=True, temperature=0.9, top_k=50,
            max_new_tokens=2048)
        rng = np.random.RandomState(getattr(gen_config, "seed", 0) or 0)
        tok = self.tokenizer

        lang_id = self.codec_language_id.get(self.language, -1)
        s_id = self.spk_id.get(self.speaker, -1)
        if self.language in ("auto", "chinese") and \
                self.speaker in self.spk_dialect_id:
            lang_id = self.spk_dialect_id[self.speaker]

        input_ids = tok.tp.encode(
            f"<|im_start|>assistant\n{text}<|im_end|>\n<|im_start|>assistant\n")
        instruct_ids = tok.tp.encode(
            f"<|im_start|>user\n{self.instruct}<|im_end|>\n") \
            if self.instruct else []

        # ---- project text rows + build the dual id streams
        # (prepare_ids, qwen_tts.cpp:1838-1914)
        proj_rows = np.zeros((0, self.cfg.hidden_size), np.float32)
        mapped_count = [0]

        def inject(ids):
            nonlocal proj_rows
            ids = list(ids)
            if not ids:
                return []
            rows = self.project_text(ids)
            proj_rows = np.concatenate([proj_rows, rows], 0)
            out = [self.talker_vocab + mapped_count[0] + i
                   for i in range(len(ids))]
            mapped_count[0] += len(ids)
            return out

        tts_bos, tts_eos, tts_pad = inject(
            [self.tts_ids["tts_bos_token_id"],
             self.tts_ids["tts_eos_token_id"],
             self.tts_ids["tts_pad_token_id"]])

        main_ids: list[int] = []
        added_ids: list[int] = []
        added_scale: list[float] = []
        main_ids += inject(instruct_ids)
        main_ids += inject(input_ids[:3])          # <|im_start|>assistant\n
        while len(added_ids) < len(main_ids):
            added_ids.append(0)
            added_scale.append(0.0)

        ci = self.codec_ids
        if lang_id < 0:
            codec_seq = [ci["codec_nothink_id"], ci["codec_think_bos_id"],
                         ci["codec_think_eos_id"]]
        else:
            codec_seq = [ci["codec_think_id"], ci["codec_think_bos_id"],
                         lang_id, ci["codec_think_eos_id"]]
        if self.ref_audio_file and self.spk_params is not None:
            xvec = self.project_speaker(self.ref_audio_file)
            proj_rows = np.concatenate([proj_rows, xvec[None]], 0)
            s_id = self.talker_vocab + mapped_count[0]
            mapped_count[0] += 1
        if s_id >= 0:
            codec_seq.append(s_id)
        codec_seq += [ci["codec_pad_id"], ci["codec_bos_id"]]

        for cid in codec_seq[:-1]:
            main_ids.append(cid)
            added_ids.append(tts_pad)
        added_ids[-1] = tts_bos
        main_ids += inject(input_ids[3:4])
        added_ids.append(codec_seq[-1])
        trailing = inject(input_ids[4:len(input_ids) - 4])
        trailing.append(tts_eos)
        while len(added_scale) < len(main_ids):
            added_scale.append(1.0)

        # ---- prefill: embeds = emb(main) + scale*emb(added)
        emb_of = lambda i: self._emb_row(i, proj_rows)
        embeds = np.stack([
            emb_of(m) + s * emb_of(a)
            for m, a, s in zip(main_ids, added_ids, added_scale)])[None]

        cache = init_cache(self.cfg, 1, self.cfg.max_length)
        T = embeds.shape[1]
        logits, last_h, cache = self._talker_step_fn(T)(
            self.params, cache, jnp.asarray(embeds), 0, T)
        n_past = T

        terminators = {ci["codec_eos_token_id"], ci["codec_think_eos_id"]}
        codec_frames: list[list[int]] = []
        trailing_next = 0
        max_new = gen_config.max_new_tokens if gen_config.max_new_tokens > 0 else 2048
        while len(codec_frames) * CODE_BLOCK < max_new:
            last_id = _sample(np.asarray(logits), gen_config, rng)
            if last_id in terminators or last_id > self.cp_cfg.vocab_size:
                break
            block = [last_id]
            block += self._code_predict(gen_config, rng,
                                        np.asarray(last_h, np.float32),
                                        emb_of(last_id))
            codec_frames.append(block)

            # next main step: emb(block[0]) + Σ codec_emb[i-1](block[i])
            # + emb(added)  (run_main_model custom_embedding :2048)
            added = trailing[trailing_next] if trailing_next < len(trailing) \
                else tts_pad
            if trailing_next < len(trailing):
                trailing_next += 1
            e = emb_of(block[0]).copy()
            for i in range(1, CODE_BLOCK):
                e += self._codec_emb_host[i - 1][block[i]]
            e += emb_of(added)
            logits, last_h, cache = self._talker_step_fn(1)(
                self.params, cache, jnp.asarray(e[None, None]), n_past, 1)
            n_past += 1

        if not codec_frames or self.codec_params is None:
            return np.zeros(0, np.int16), TTS_SAMPLE_RATE, 1
        codes = jnp.asarray(np.asarray(codec_frames, np.int32))
        pcm = qwen_tts_chunked_decode(self.codec_cfg, self.codec_params, codes)
        pcm16 = np.clip(pcm * 32767.0, -32768, 32767).astype(np.int16)
        return pcm16, TTS_SAMPLE_RATE, 1
