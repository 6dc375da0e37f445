"""dots.ocr (reference /root/reference/models/dots.cpp, namespaces
chatllm::dots::vit and chatllm::dots::ocr; converter DotsOCRConverter
convert.py:9627).

LLM = plain Qwen2 (config layout QWen2Converter.dump_config — the image
tokens take ordinary sequential rope positions, no mrope).  Vision tower:
nn/vit.py `dots_vit_forward` (NaViT conv patch embed + RMSNorm, 2-D-rope
RMSNorm blocks with SiLU-gated MLP, 2×2 merge projector); patches are fed
in merge-block raster order (TensorPosHelper::prepare, dots.cpp:85).

Template (dots.cpp ocr::ChatHistoryEncoder :360-447):
  [<|system|>{sys}<|endofsystem|>\n] <|user|>{u}<|endofuser|> <|assistant|>
  {ai}<|endofassistant|>, images as <|img|>…<|endofimg|> inside the user
  turn.  Terminators: <|endofassistant|> and <|endofuser|>.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn.vit import DotsViTConfig, dots_vit_forward, load_dots_vit_params
from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor2
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .llama import build_dense_config
from .model_types import ModelType
from .qwen import QWEN_REGEX


class DotsOCREncoder(HistoryEncoder):
    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        if tok.sys_prompt:
            ids.extend(tok.encode(
                "<|system|>" + tok.sys_prompt + "<|endofsystem|>\n"))

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        ids.append(tok.user_token_id)
        ids.extend(tok.encode(user))
        ids.append(tok.end_user_token_id)

    def append_ai(self, round_idx, ai, ids):
        tok = self.tokenizer
        ids.append(tok.assistant_token_id)
        ids.extend(tok.encode(ai))
        ids.append(tok.end_assistant_token_id)

    def append_ai_opening(self, round_idx, ids):
        ids.append(self.tokenizer.assistant_token_id)

    def append_user_opening(self, round_idx, ids):
        ids.append(self.tokenizer.user_token_id)


def make_dots_tokenizer(gf, base):
    """dots.cpp Tokenizer::load:317-341 (qwen v1 BPE base)."""
    tp = BPEProcessor2(QWEN_REGEX)
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tp.enable_return_special_token(True)
    tok = ChatTokenizer(tp, DotsOCREncoder(), sys_prompt="")
    tok.pad_token_id = tp.piece_to_id("[PAD]")
    tok.eos_token_id = tp.piece_to_id("<|endoftext|>")
    tok.user_token_id = tp.piece_to_id("<|user|>")
    tok.assistant_token_id = tp.piece_to_id("<|assistant|>")
    tok.end_user_token_id = tp.piece_to_id("<|endofuser|>")
    tok.end_assistant_token_id = tp.piece_to_id("<|endofassistant|>")
    tok.img_token_id = tp.piece_to_id("<|img|>")
    tok.end_img_token_id = tp.piece_to_id("<|endofimg|>")
    tok.terminate_ids.add(tok.end_assistant_token_id)
    tok.terminate_ids.add(tok.end_user_token_id)
    return tok


@register_model(ModelType.DOTS_OCR)
class DotsOCR(BaseLLM):
    # Config layout = Qwen2 ("2if": n_kv, sliding_window, rope_theta —
    # DotsOCRConverter.dump_config delegates to QWen2Converter)
    EXTRA_FMT = "2if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, _sw, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        tie = not gf.has_tensor("lm_head.weight")
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=rope_theta,
            rope_layout="neox", tie_lm_head=tie, norm_eps=1e-6,
            qkv_bias=True, max_length=rt.max_length,
            cache_dtype=rt.cache_dtype)
        tok = make_dots_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers,
                                          tie_lm_head=tie)
        self = cls(gf.model_type, cfg, params, tok, native_config=base,
                   meta=gf.meta)

        cfg_json = (gf.meta or {}).get("config.json", {})
        vis = cfg_json.get("vision_config", {})
        self.vis_cfg = None
        self.vis_params = None
        if vis and gf.has_tensor("vision_model.patch_embed.proj.weight"):
            self.vis_cfg = DotsViTConfig(
                hidden_size=int(vis["hidden_size"]),
                num_hidden_layers=int(vis["num_hidden_layers"]),
                num_attention_heads=int(vis["num_attention_heads"]),
                intermediate_size=int(vis["intermediate_size"]),
                lm_hidden_size=base.hidden_size,
                patch_size=int(vis.get("patch_size", 14)),
                spatial_merge_size=int(vis.get("spatial_merge_size", 2)),
                norm_eps=float(vis.get("rms_norm_eps", 1e-5)))
        pp = (gf.meta or {}).get("preprocessor_config.json", {})
        self.image_mean = pp.get("image_mean", [0.5, 0.5, 0.5])
        self.image_std = pp.get("image_std", [0.5, 0.5, 0.5])
        self.min_pixels = int(pp.get("min_pixels", 3136))
        self.max_pixels = int(pp.get("max_pixels", 11289600))
        if self.vis_cfg is not None:
            self.vis_params = load_dots_vit_params(pb, self.vis_cfg)
        return self

    # ------------------------------------------------------------------
    def encode_image(self, img):
        """PIL image → (merged embeddings [n, lm_hidden], merged grid).

        The reference clamps the pixel count to [min_pixels, max_pixels]
        (vision::MinMaxPixels, dots.cpp:407) and pads to patch multiples
        with black; we additionally pad to patch·merge so the 2×2 merger
        divides evenly."""
        assert self.vis_cfg is not None, "vision tower not loaded"
        vc = self.vis_cfg
        unit = vc.patch_size * vc.spatial_merge_size
        w, h = img.size
        if w * h > self.max_pixels:
            s = (self.max_pixels / (w * h)) ** 0.5
            w, h = max(unit, int(w * s)), max(unit, int(h * s))
            img = img.resize((w, h))
        pw = max(unit, (w + unit - 1) // unit * unit)
        ph = max(unit, (h + unit - 1) // unit * unit)
        canvas = np.zeros((ph, pw, 3), np.float32)
        arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
        canvas[:h, :w] = arr
        canvas = (canvas - np.asarray(self.image_mean, np.float32)) \
            / np.asarray(self.image_std, np.float32)
        gh, gw = ph // vc.patch_size, pw // vc.patch_size
        emb = dots_vit_forward(vc, self.vis_params, jnp.asarray(canvas),
                               gh, gw)
        m = vc.spatial_merge_size
        return emb, (gh // m, gw // m)

    def chat_image(self, image, question: str = "", gen_config=None,
                   streamer=None) -> str:
        """One-shot OCR/VQA: <|user|><|img|>[embeds]<|endofimg|>{q}
        <|endofuser|><|assistant|> with sequential positions
        (ocr::ChatHistoryEncoder::append_user, dots.cpp:392-447)."""
        from ..nn.transformer import embed_tokens
        from ..runtime.generate import GenerationConfig
        from ..runtime.vision import load_image

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=512)
        media, _ = self.encode_image(load_image(image))

        tok = self.tokenizer
        pre: list[int] = []
        tok.chat_encoder.append_sys_prompt(pre)
        pre.append(tok.user_token_id)
        pre.append(tok.img_token_id)
        mid: list[int] = [tok.end_img_token_id]
        if question:
            mid.extend(tok.encode(question))
        mid.append(tok.end_user_token_id)
        mid.append(tok.assistant_token_id)

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
