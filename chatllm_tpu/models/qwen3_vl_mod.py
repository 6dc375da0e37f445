"""Qwen3-VL family (reference /root/reference/models/qwen.cpp namespace
chatllm::qwen::v3_vl, registered at :3685-3688; converter
Qwen3VLConverter convert.py:5707).

Qwen3(-MoE) LLM with interleaved M-RoPE (IMROPE) and the Qwen3-VL tower
(nn/qwen_vit.py qwen3_vit_forward): learned-pos-embed full-attention ViT
with DeepStack taps — intermediate ViT features are merged and ADDED to the
LLM's hidden states after its first few layers
(HF Qwen3VLTextModel._deepstack_process).

Also: QWEN3_VL_Embedding (last-token L2 embedding over the multimodal
prompt, qwen.cpp:2778 v3_vl_emb) and QWEN3_VL_ReRanker (yes/no logit
score, :2854 v3_vl_ranker).
"""
from __future__ import annotations

from dataclasses import replace as _replace

import jax
import numpy as np
import jax.numpy as jnp

from ..nn.qwen_vit import (QwenViTConfig, grid_layout, load_qwen3_vit_params,
                           qwen3_vit_forward)
from .base import BaseConfig, register_model
from .model_types import ModelType
from .qwen import Qwen3, _Qwen3EncoderMixin
from .qwen_vl import build_3d_pos


@register_model(ModelType.QWEN3_VL)
class Qwen3VL(Qwen3):
    # v3_vl::Config = v3::Config + mrope_section[4] (qwen.cpp:2491)
    EXTRA_FMT = Qwen3.EXTRA_FMT + "4i"

    @classmethod
    def load(cls, gf, rt):
        self = super().load(gf, rt)
        _, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        sections = tuple(int(s) for s in extra[-4:] if s > 0)
        self.cfg = _replace(self.cfg, rope=_replace(
            self.cfg.rope, mrope_sections=sections, mrope_interleaved=True))
        tok = self.tokenizer
        for piece in ("<|vision_start|>", "<|vision_end|>", "<|image_pad|>",
                      "<|video_pad|>"):
            pid = tok.tp.piece_to_id(piece)
            setattr(tok, piece.strip("<|>").replace("|", "") + "_id", pid)

        cfg_json = (gf.meta or {}).get("config.json", {})
        vis = cfg_json.get("vision_config", {})
        self.vis_cfg = None
        self.vis_params = None
        if vis and gf.has_tensor("visual.patch_embed.proj.0.weight"):
            from .base import ParamBuilder

            self.vis_cfg = QwenViTConfig(
                hidden_size=int(vis["hidden_size"]),
                num_hidden_layers=int(vis["depth"]),
                num_attention_heads=int(vis["num_heads"]),
                intermediate_size=int(vis["intermediate_size"]),
                patch_size=int(vis.get("patch_size", 16)),
                spatial_merge_size=int(vis.get("spatial_merge_size", 2)),
                temporal_patch_size=int(vis.get("temporal_patch_size", 2)),
                window_size=0, is_v3=True,
                num_position_embeddings=int(vis.get("num_position_embeddings", 2304)),
                deepstack_visual_indexes=tuple(
                    vis.get("deepstack_visual_indexes", ())))
            pb = ParamBuilder(gf, rt)
            self.vis_params = load_qwen3_vit_params(pb, self.vis_cfg)
        pp = (gf.meta or {}).get("preprocessor_config.json", {})
        self.image_mean = pp.get("image_mean", [0.5, 0.5, 0.5])
        self.image_std = pp.get("image_std", [0.5, 0.5, 0.5])
        self.min_pixels = int(pp.get("min_pixels", 56 * 56))
        self.max_pixels = int(pp.get("max_pixels", 14 * 14 * 4 * 1280))
        return self

    # ------------------------------------------------------------------
    def encode_image(self, img):
        """PIL image → (embeddings [n_merged, lm_hidden], deepstack list,
        merged grid)."""
        from ..runtime.vision import qwen_image_frames

        assert self.vis_cfg is not None, "vision tower not loaded"
        vc = self.vis_cfg
        frames, gh, gw = qwen_image_frames(
            img, patch_size=vc.patch_size, merge_size=vc.spatial_merge_size,
            min_pixels=self.min_pixels, max_pixels=self.max_pixels,
            mean=self.image_mean, std=self.image_std)
        layout = grid_layout(vc, gh, gw)
        emb, deepstack = qwen3_vit_forward(vc, self.vis_params,
                                           jnp.asarray(frames), layout, gh, gw)
        m = vc.spatial_merge_size
        return emb, deepstack, (gh // m, gw // m)

    def chat_image(self, image, question: str, gen_config=None,
                   streamer=None) -> str:
        """One-shot VQA with interleaved M-RoPE + DeepStack injection
        (ChatML + vision markers, v2_5_vl::ChatHistoryEncoder)."""
        from ..nn.transformer import embed_tokens
        from ..runtime.generate import GenerationConfig
        from ..runtime.vision import load_image

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=256)
        media, deepstack, (gh, gw) = self.encode_image(load_image(image))
        n_img = gh * gw

        tok = self.tokenizer
        pre: list[int] = []
        tok.chat_encoder.append_sys_prompt(pre)
        pre.append(tok.im_start_token_id)
        pre.extend(tok.encode("user\n"))
        pre.append(tok.vision_start_id)
        mid: list[int] = [tok.vision_end_id]
        mid.extend(tok.encode(question))
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
        er = self._deepstack_residuals(deepstack, len(pre), embeds.shape[1])

        positions, t_next = build_3d_pos([
            ("text", len(pre)), ("image", (gh, gw)), ("text", len(mid))])

        eng = self.engine
        cache = eng.new_cache(1, eng.max_length)
        logits, cache, n_past = eng.prefill_embeds(embeds, cache, 0,
                                                   positions=positions,
                                                   extra_residuals=er)
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

    def _deepstack_residuals(self, deepstack, img_start: int, T: int):
        """Scatter the per-layer deepstack features [n_img, H] into
        zero-padded [n_ds, 1, T, H] prompt-aligned residuals."""
        if not deepstack:
            return None
        n_img, H = deepstack[0].shape
        er = jnp.zeros((len(deepstack), 1, T, H), deepstack[0].dtype)
        for j, d in enumerate(deepstack):
            er = er.at[j, 0, img_start:img_start + n_img].set(d)
        return er


@register_model(ModelType.QWEN3_VL_Embedding)
class Qwen3VLEmbedding(_Qwen3EncoderMixin, Qwen3VL):
    """Last-token L2-normed embedding over a (possibly multimodal) prompt
    (qwen.cpp:2778 v3_vl_emb; EmbeddingLastTokenFinalSteps)."""

    task = "Represent the user's input."

    @property
    def engine(self):
        raise TypeError("encoder model: use embed()/qa_rank()")

    @property
    def embedding_dim(self) -> int:
        return self.cfg.hidden_size

    def embed(self, text: str, purpose: str = "doc") -> np.ndarray:
        from ..ops.norm import rms_norm

        tok = self.tokenizer
        ids = [tok.im_start_token_id]
        ids.extend(tok.encode(f"system\n{self.task}"))
        ids.append(tok.im_end_token_id)
        ids.extend(tok.encode("\n"))
        ids.append(tok.im_start_token_id)
        ids.extend(tok.encode(f"user\n{text}"))
        ids.append(tok.im_end_token_id)
        ids.extend(tok.encode("\n"))
        ids = ids[: self.cfg.max_length - 1]
        ids.append(tok.eos_token_id)
        h = self._last_hidden(ids)
        h = rms_norm(h, self.params["final_norm"]["w"], eps=self.cfg.norm_eps)
        v = h[0].astype(jnp.float32)
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        return np.asarray(v)


@register_model(ModelType.QWEN3_VL_ReRanker)
class Qwen3VLReRanker(_Qwen3EncoderMixin, Qwen3VL):
    """score = P('yes') over yes/no logits of the last token
    (qwen.cpp:2854 v3_vl_ranker)."""

    task = "Retrieve images or text relevant to the user's query."

    @property
    def engine(self):
        raise TypeError("encoder model: use embed()/qa_rank()")

    def qa_rank(self, question: str, answer: str) -> float:
        from ..nn.transformer import lm_logits
        from ..ops.norm import rms_norm

        tok = self.tokenizer
        yes_id = tok.tp.piece_to_id("yes")
        no_id = tok.tp.piece_to_id("no")
        text = (
            '<|im_start|>system\nJudge whether the Document meets the '
            'requirements based on the Query and the Instruct provided. '
            'Note that the answer can only be "yes" or "no".<|im_end|>\n'
            "<|im_start|>user\n"
            f"<Instruct>: {self.task}\n<Query>: {question}\n"
            f"\n<Document>: {answer}"
            "<|im_end|>\n<|im_start|>assistant\n")
        ids = tok.encode(text)[-self.cfg.max_length:]
        h = self._last_hidden(ids)
        h = rms_norm(h, self.params["final_norm"]["w"], eps=self.cfg.norm_eps)
        logits = lm_logits(self.cfg, self.params, h[None])
        two = jnp.stack([logits[0, 0, yes_id], logits[0, 0, no_id]])
        p = jax.nn.softmax(two.astype(jnp.float32))
        return float(p[0])
