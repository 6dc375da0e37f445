"""PaddleOCR-VL (reference /root/reference/models/ernie.cpp, namespaces
chatllm::paddle::ocr::vit :306 and chatllm::paddle::ocr :667; converter
PaddleOCRVLConverter convert.py:10315).

LLM = ERNIE-4.5-0.3B shape (llama arch + explicit head_dim, no biases,
optionally tied head) with the 3-axis qwen M-RoPE: text tokens advance
t==h==w together; an image block pins t and spreads h/w over the merged
grid (before_generate_next_token, ernie.cpp:959-1014 — same fill as
qwen.cpp:1578, so `build_3d_pos` from qwen_vl is reused verbatim).

Vision tower: nn/vit.py `paddle_vit_forward` (NaViT-style conv patch embed,
bilinear pos-embed interpolation, 2-D-rope LayerNorm blocks, 2×2 merge
projector).  Sequence order is plain raster (TensorPosHelper constructed
with spatial_merge_size=1, ernie.cpp:478).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn.vit import PaddleViTConfig, load_paddle_vit_params, \
    paddle_vit_forward
from ..runtime.chat import ChatTokenizer, HistoryEncoder
from ..tokenizer.processor import BPEProcessor1
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .llama import build_dense_config
from .model_types import ModelType
from .qwen_vl import build_3d_pos


class PaddleOCREncoder(HistoryEncoder):
    """bos + [sys\\n] / "User: {u}\\n" / "Assistant:\\n{ai}</s>"
    (ernie.cpp:730-758)."""

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        if tok.sys_prompt:
            ids.extend(tok.encode(tok.sys_prompt + "\n"))

    def append_user(self, round_idx, user, ids):
        ids.extend(self.tokenizer.encode("User: " + user + "\n"))

    def append_ai(self, round_idx, ai, ids):
        self.append_ai_opening(round_idx, ids)
        ids.extend(self.tokenizer.encode(ai))
        ids.append(self.tokenizer.eos_token_id)

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("Assistant:\n"))


def make_paddle_tokenizer(gf, base):
    tp = BPEProcessor1()
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tok = ChatTokenizer(tp, PaddleOCREncoder(), sys_prompt="")
    tok.bos_token_id = tp.piece_to_id("<|begin_of_sentence|>")
    tok.image_start_id = tp.piece_to_id("<|IMAGE_START|>")
    tok.image_end_id = tp.piece_to_id("<|IMAGE_END|>")
    eos = tp.piece_to_id("</s>")
    tok.eos_token_id = eos if eos >= 0 else 2
    end = tp.piece_to_id("<|end_of_sentence|>")
    if end >= 0:
        tok.terminate_ids.add(end)
    return tok


@register_model(ModelType.PADDLE_OCR_VL)
class PaddleOCRVL(BaseLLM):
    # Config: llama-like + {n_kv, head_dim, rope_theta:f, mrope_section[3],
    # tie_word_embeddings} (PaddleOCRVLConverter.dump_config "<iifiiii")
    EXTRA_FMT = "2if4i"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        n_kv, head_dim, rope_theta = extra[0], extra[1], extra[2]
        sections = tuple(int(s) for s in extra[3:6] if s > 0)
        tie = bool(extra[6])
        from dataclasses import replace as _replace

        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, head_dim=head_dim,
            rope_theta=rope_theta, rope_layout="neox", tie_lm_head=tie,
            norm_eps=1e-5, max_length=rt.max_length,
            cache_dtype=rt.cache_dtype)
        cfg = _replace(cfg, rope=_replace(cfg.rope, mrope_sections=sections))
        tok = make_paddle_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers,
                                          tie_lm_head=tie)
        self = cls(gf.model_type, cfg, params, tok, native_config=base,
                   meta=gf.meta)

        cfg_json = (gf.meta or {}).get("config.json", {})
        vis = cfg_json.get("vision_config", {})
        self.vis_cfg = None
        self.vis_params = None
        if vis and gf.has_tensor("visual.embeddings.patch_embedding.weight"):
            patch = int(vis.get("patch_size", 14))
            self.vis_cfg = PaddleViTConfig(
                hidden_size=int(vis["hidden_size"]),
                num_hidden_layers=int(vis["num_hidden_layers"]),
                num_attention_heads=int(vis["num_attention_heads"]),
                intermediate_size=int(vis["intermediate_size"]),
                lm_hidden_size=base.hidden_size,
                patch_size=patch,
                spatial_merge_size=int(vis.get("spatial_merge_size", 2)),
                posemb_grid_size=int(vis.get("image_size", 378)) // patch)
            self.vis_params = load_paddle_vit_params(pb, self.vis_cfg)
        pp = (gf.meta or {}).get("preprocessor_config.json", {})
        self.image_mean = pp.get("image_mean", [0.5, 0.5, 0.5])
        self.image_std = pp.get("image_std", [0.5, 0.5, 0.5])
        return self

    # ------------------------------------------------------------------
    def encode_image(self, img):
        """PIL image → (merged embeddings [n, lm_hidden], merged grid).

        The reference pads the native-size image to patch multiples
        (vision::image_load PaddingMode::Black, ernie.cpp:781); we pad to
        patch*merge so the 2×2 projector always divides evenly."""
        assert self.vis_cfg is not None, "vision tower not loaded"
        vc = self.vis_cfg
        unit = vc.patch_size * vc.spatial_merge_size
        w, h = img.size
        pw = max(unit, (w + unit - 1) // unit * unit)
        ph = max(unit, (h + unit - 1) // unit * unit)
        canvas = np.zeros((ph, pw, 3), np.float32)
        arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
        canvas[:h, :w] = arr
        canvas = (canvas - np.asarray(self.image_mean, np.float32)) \
            / np.asarray(self.image_std, np.float32)
        gh, gw = ph // vc.patch_size, pw // vc.patch_size
        emb = paddle_vit_forward(vc, self.vis_params, jnp.asarray(canvas),
                                 gh, gw)
        m = vc.spatial_merge_size
        return emb, (gh // m, gw // m)

    def chat_image(self, image, question: str = "", gen_config=None,
                   streamer=None) -> str:
        """One-shot OCR/VQA: bos + "User: " + <|IMAGE_START|>…<|IMAGE_END|>
        + question ("OCR:" default) + "\\nAssistant:\\n" with 3-D positions
        (ocr::ChatHistoryEncoder ernie.cpp:760-806)."""
        from ..nn.transformer import embed_tokens
        from ..runtime.generate import GenerationConfig
        from ..runtime.vision import load_image

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=512)
        media, (gh, gw) = self.encode_image(load_image(image))

        tok = self.tokenizer
        pre: list[int] = [tok.bos_token_id]
        pre.extend(tok.encode("User: "))
        pre.append(tok.image_start_id)
        mid: list[int] = [tok.image_end_id]
        mid.extend(tok.encode((question if question else "OCR:") + "\n"))
        mid.extend(tok.encode("Assistant:\n"))

        emb_pre = embed_tokens(self.cfg, self.params,
                               jnp.asarray(np.asarray([pre], np.int32)))[0]
        emb_mid = embed_tokens(self.cfg, self.params,
                               jnp.asarray(np.asarray([mid], np.int32)))[0]
        embeds = jnp.concatenate(
            [emb_pre, media.astype(emb_pre.dtype), emb_mid], axis=0)[None]
        positions, t_next = build_3d_pos([
            ("text", len(pre)), ("image", (gh, gw)), ("text", len(mid))])

        eng = self.engine
        cache = eng.new_cache(1, eng.max_length)
        logits, cache, n_past = eng.prefill_embeds(embeds, cache, 0,
                                                   positions=positions)
        eng.pos_delta = t_next - n_past
        try:
            out, cache, n_past = eng.generate_from_logits(
                logits, cache, n_past, gen_config,
                is_terminator=tok.is_terminate_token,
                on_token=(lambda t: streamer.put([t])) if streamer else None)
        finally:
            eng.pos_delta = 0
        if streamer:
            streamer.end()
        return tok.decode(out)
