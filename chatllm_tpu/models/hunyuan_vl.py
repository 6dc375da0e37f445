"""Youtu-VL and Penguin-VL (reference /root/reference/models/hunyuan.cpp,
namespaces chatllm::hunyuan::youtu::vl :1263 and penguin::vl :1875;
converters YoutuVLConverter convert.py:10046, PenguinVLConverter :10115).

Youtu-VL: Youtu dense-MLA LLM + SigLIP2-style windowed ViT
(nn/qwen_vit.py youtu_vit_forward), images between <|vision_start|>/
<|vision_end|>.  Penguin-VL: Qwen3 LLM + the Penguin conv ViT
(penguin_vit_forward, per-patch tokens, no merging) spliced flat followed
by a newline.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn.qwen_vit import (PenguinViTConfig, QwenViTConfig, grid_layout,
                           load_penguin_vit_params, load_youtu_vit_params,
                           penguin_vit_forward, youtu_vit_forward)
from .base import ParamBuilder, RuntimeConfig, register_model
from .misc_wave3 import Youtu
from .model_types import ModelType
from .qwen import Qwen3


def _patchify_hwc(frame: np.ndarray, patch: int) -> np.ndarray:
    """[gh*p, gw*p, 3] → [gh*gw, p²·3] (patch raster, HWC inside —
    PatchesFormat::PatchesLeftRightDown_MergeN_PixelsLeftRightDown_
    ChannelsRGB)."""
    gh, gw = frame.shape[0] // patch, frame.shape[1] // patch
    x = frame.reshape(gh, patch, gw, patch, 3)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(gh * gw, patch * patch * 3)


@register_model(ModelType.YOUTU_VL)
class YoutuVL(Youtu):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        self = super().load(gf, rt)
        tok = self.tokenizer
        tok.vision_start_id = tok.tp.piece_to_id("<|vision_start|>")
        tok.vision_end_id = tok.tp.piece_to_id("<|vision_end|>")

        cfg_json = (gf.meta or {}).get("config.json", {})
        vis = cfg_json.get("vision_config", {})
        pp = (gf.meta or {}).get("preprocessor_config.json", {})
        self.image_mean = pp.get("image_mean", [0.5, 0.5, 0.5])
        self.image_std = pp.get("image_std", [0.5, 0.5, 0.5])
        self.vis_cfg = None
        self.vis_params = None
        if vis and gf.has_tensor("visual.embeddings.patch_embedding.bias"):
            self.vis_cfg = QwenViTConfig(
                hidden_size=int(vis["hidden_size"]),
                num_hidden_layers=int(vis["num_hidden_layers"]),
                num_attention_heads=int(vis["num_attention_heads"]),
                intermediate_size=int(vis["intermediate_size"]),
                patch_size=int(vis.get("patch_size", 16)),
                spatial_merge_size=2,
                window_size=int(vis.get("window_size", 0)),
                fullatt_block_indices=tuple(
                    vis.get("fullatt_block_indexes", ())),
                is_youtu=True, norm_eps=1e-6)
            pb = ParamBuilder(gf, rt)
            self.vis_params = load_youtu_vit_params(pb, self.vis_cfg)
        return self

    def encode_image(self, img):
        from ..runtime.vision import qwen_image_frames

        assert self.vis_cfg is not None, "vision tower not loaded"
        vc = self.vis_cfg
        frames, gh, gw = qwen_image_frames(
            img, patch_size=vc.patch_size, merge_size=vc.spatial_merge_size,
            min_pixels=vc.patch_size ** 2 * 16,
            max_pixels=vc.patch_size ** 2 * 4096,
            mean=self.image_mean, std=self.image_std)
        layout = grid_layout(vc, gh, gw)
        patches = jnp.asarray(_patchify_hwc(frames[0], vc.patch_size))
        return youtu_vit_forward(vc, self.vis_params, patches, layout, gh, gw)

    def chat_image(self, image, question: str, gen_config=None,
                   streamer=None) -> str:
        """bos user\\n <|vision_start|>…<|vision_end|>{q} eos bos
        assistant\\n (youtu::vl::ChatHistoryEncoder)."""
        from ..nn.transformer import embed_tokens
        from ..runtime.generate import GenerationConfig
        from ..runtime.vision import load_image

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=256)
        media = self.encode_image(load_image(image))
        tok = self.tokenizer
        pre = [tok.bos_token_id]
        pre.extend(tok.encode("user\n"))
        pre.append(tok.vision_start_id)
        mid = [tok.vision_end_id]
        mid.extend(tok.encode(question))
        mid.append(tok.eos_token_id)
        mid.append(tok.bos_token_id)
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


@register_model(ModelType.PENGUIN_VL)
class PenguinVL(Qwen3):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        self = super().load(gf, rt)
        cfg_json = (gf.meta or {}).get("config.json", {})
        vis = cfg_json.get("vision_encoder_config", {})
        pp = (gf.meta or {}).get("preprocessor_config.json", {})
        self.image_mean = pp.get("image_mean", [0.5, 0.5, 0.5])
        self.image_std = pp.get("image_std", [0.5, 0.5, 0.5])
        self.vis_cfg = None
        self.vis_params = None
        if vis and gf.has_tensor("visual.embeddings.patch_embedding.bias"):
            self.vis_cfg = PenguinViTConfig(
                hidden_size=int(vis["hidden_size"]),
                num_hidden_layers=int(vis["num_hidden_layers"]),
                num_attention_heads=int(vis["num_attention_heads"]),
                num_key_value_heads=int(vis["num_key_value_heads"]),
                intermediate_size=int(vis["intermediate_size"]),
                head_dim=int(vis["head_dim"]),
                out_hidden_size=self.cfg.hidden_size,
                patch_size=int(vis.get("patch_size", 16)),
                rope_theta=float(vis.get("rope_theta", 10000.0)))
            pb = ParamBuilder(gf, rt)
            self.vis_params = load_penguin_vit_params(pb, self.vis_cfg)
        return self

    def encode_image(self, img):
        from ..runtime.vision import qwen_image_frames

        assert self.vis_cfg is not None, "vision tower not loaded"
        vc = self.vis_cfg
        frames, gh, gw = qwen_image_frames(
            img, patch_size=vc.patch_size, merge_size=1,
            min_pixels=vc.patch_size ** 2 * 16,
            max_pixels=vc.patch_size ** 2 * 1024,
            mean=self.image_mean, std=self.image_std)
        return penguin_vit_forward(vc, self.vis_params,
                                   jnp.asarray(frames[0]), gh, gw)

    def chat_image(self, image, question: str, gen_config=None,
                   streamer=None) -> str:
        """ChatML turn; per-patch image embeds spliced flat + '\\n'
        (penguin::vl::Tokenizer::inject_media)."""
        from ..nn.transformer import embed_tokens
        from ..runtime.generate import GenerationConfig
        from ..runtime.vision import load_image

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=256)
        media = self.encode_image(load_image(image))
        tok = self.tokenizer
        pre: list[int] = []
        tok.chat_encoder.append_sys_prompt(pre)
        pre.append(tok.im_start_token_id)
        pre.extend(tok.encode("user\n"))
        mid = list(tok.encode("\n"))
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
