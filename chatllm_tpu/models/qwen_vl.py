"""Qwen2-VL / Qwen2.5-VL (reference: /root/reference/models/qwen.cpp
namespace chatllm::qwen::v2_5_vl, registered for both ids at :3681-3682).

Qwen2 LLM with M-RoPE (3-D t/h/w positions, mrope_section config field) plus
the windowed ViT tower of nn/qwen_vit.py.  Image embeddings are spliced into
the prompt embeddings (TPU-native replacement for the extended-embedding-table
trick) and 3-D positions are built host-side per prompt
(TensorPosHelper3D::build_3d_pos, qwen.cpp:1578).
"""
from __future__ import annotations

from dataclasses import replace as _replace

import numpy as np
import jax.numpy as jnp

from ..nn.qwen_vit import (QwenViTConfig, grid_layout, load_qwen_vit_params,
                           qwen_vit_forward)
from .base import BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig, \
    load_llama_family_params, register_model
from .llama import build_dense_config
from .model_types import ModelType
from .qwen import make_qwen_tokenizer


def build_3d_pos(segments, token_time: int = 0, token_n_inc: int = 1):
    """3-D rope positions for an interleaved text/image token stream.

    segments: list of ("text", n_tokens) | ("image", (grid_h, grid_w)) in
    merged-token grid units.  Returns (positions [3, T] int32, next_t) —
    the port of TensorPosHelper3D::build_3d_pos (qwen.cpp:1578): text tokens
    advance t with t==h==w; an image block keeps t fixed and spreads h/w over
    the grid; t then resumes after the block's max coordinate.
    """
    p_t, p_h, p_w = [], [], []
    t = token_time
    for kind, val in segments:
        if kind == "text":
            for _ in range(val):
                p_t.append(t); p_h.append(t); p_w.append(t)
                t += 1
        else:
            gh, gw = val
            t0 = t
            for h in range(gh):
                for w in range(gw):
                    p_t.append(t0); p_h.append(t0 + h); p_w.append(t0 + w)
            t = max(p_h[-1], p_w[-1]) + 1 if gh * gw > 0 else t0
            t = max(t, t0 + token_n_inc)
    return np.asarray([p_t, p_h, p_w], np.int32), t


@register_model(ModelType.QWEN2_5_VL, ModelType.QWEN2_VL)
class Qwen25VL(BaseLLM):
    # Config: Qwen2 ("2if") + tie_word_embeddings + mrope_section[4]
    # (QWen2_5VLConverter.dump_config, convert.py:5091)
    EXTRA_FMT = "2if5i"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, _sliding_window, rope_theta, tie, *mrope_section) = extra
        sections = tuple(int(s) for s in mrope_section if s > 0)
        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, rope_theta=rope_theta,
            rope_layout="neox", tie_lm_head=bool(tie), norm_eps=1e-6,
            qkv_bias=True, max_length=rt.max_length, cache_dtype=rt.cache_dtype)
        cfg = _replace(cfg, rope=_replace(cfg.rope, mrope_sections=sections))
        tok = make_qwen_tokenizer(gf, base)
        for piece in ("<|vision_start|>", "<|vision_end|>", "<|image_pad|>",
                      "<|video_pad|>"):
            setattr(tok, piece.strip("<|>").replace("|", "") + "_id",
                    tok.tp.piece_to_id(piece))
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers,
                                          tie_lm_head=bool(tie))
        self = cls(gf.model_type, cfg, params, tok, native_config=base,
                   meta=gf.meta)

        cfg_json = (gf.meta or {}).get("config.json", {})
        vis = cfg_json.get("vision_config", {})
        self.is_v2 = cfg_json.get("model_type") == "qwen2_vl"
        self.vis_cfg = None
        self.vis_params = None
        if vis and gf.has_tensor("visual.patch_embed.proj.0.weight"):
            if self.is_v2:
                hidden = int(vis["embed_dim"])
                inter = hidden * int(vis["mlp_ratio"])
            else:
                hidden = int(vis["hidden_size"])
                inter = int(vis["intermediate_size"])
            self.vis_cfg = QwenViTConfig(
                hidden_size=hidden,
                num_hidden_layers=int(vis["depth"]),
                num_attention_heads=int(vis["num_heads"]),
                intermediate_size=inter,
                patch_size=int(vis["patch_size"]),
                spatial_merge_size=int(vis.get("spatial_merge_size", 2)),
                temporal_patch_size=int(vis.get("temporal_patch_size", 2)),
                window_size=int(vis.get("window_size", 0)),
                fullatt_block_indices=tuple(vis.get("fullatt_block_indexes", ())),
                is_v2=self.is_v2)
            self.vis_params = load_qwen_vit_params(pb, self.vis_cfg)
        pp = (gf.meta or {}).get("preprocessor_config.json", {})
        self.image_mean = pp.get("image_mean", [0.48145466, 0.4578275, 0.40821073])
        self.image_std = pp.get("image_std", [0.26862954, 0.26130258, 0.27577711])
        self.min_pixels = int(pp.get("min_pixels", 56 * 56))
        self.max_pixels = int(pp.get("max_pixels", 14 * 14 * 4 * 1280))
        return self

    # ------------------------------------------------------------------
    def encode_image(self, img):
        """PIL image → (embeddings [n_merged, lm_hidden], merged grid)."""
        from ..runtime.vision import qwen_image_frames

        assert self.vis_cfg is not None, "vision tower not loaded"
        vc = self.vis_cfg
        frames, gh, gw = qwen_image_frames(
            img, patch_size=vc.patch_size, merge_size=vc.spatial_merge_size,
            min_pixels=self.min_pixels, max_pixels=self.max_pixels,
            mean=self.image_mean, std=self.image_std)
        layout = grid_layout(vc, gh, gw)
        emb = qwen_vit_forward(vc, self.vis_params, jnp.asarray(frames),
                               layout, gh, gw)
        m = vc.spatial_merge_size
        return emb, (gh // m, gw // m)

    def chat_image(self, image, question: str, gen_config=None,
                   streamer=None) -> str:
        """One-shot VQA with M-RoPE positions (ChatML + vision markers,
        v2_5_vl::ChatHistoryEncoder / Tokenizer::inject_media)."""
        from ..nn.transformer import embed_tokens
        from ..runtime.generate import GenerationConfig
        from ..runtime.vision import load_image

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=256)
        media, (gh, gw) = self.encode_image(load_image(image))
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

        positions, t_next = build_3d_pos([
            ("text", len(pre)), ("image", (gh, gw)), ("text", len(mid))])

        eng = self.engine
        cache = eng.new_cache(1, eng.max_length)
        logits, cache, n_past = eng.prefill_embeds(embeds, cache, 0,
                                                   positions=positions)
        eng.pos_delta = t_next - n_past       # decode continues on the t axis
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
