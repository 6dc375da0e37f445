"""Kimi-VL and LocateAnything (reference /root/reference/models/moonshot.cpp
namespace chatllm::kimi::vl :524 and models/locateanything.cpp; converters
KimiVLConverter convert.py:8284, LocateAnythingConverter :8374).

Kimi-VL: DeepSeek-V3-Light MLA/MoE LLM + MoonViT tower (nn/kimi_vit.py)
with `<|im_user|>user<|im_middle|>…<|media_start|>image<|media_content|>…
<|media_end|>` turns.  LocateAnything: Qwen2 LLM + the same tower with the
mlp1 projector and <img>…</img> markers.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn.kimi_vit import KimiViTConfig, kimi_vit_forward, load_kimi_vit_params
from ..tokenizer.processor import BPEProcessor2
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   register_model)
from .deepseek import DeepSeekV3
from .model_types import ModelType
from .qwen import Qwen2

KIMI_REGEX = [
    r"(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])",
    r"[^\r\n\p{L}\p{N}]?\p{L}+",
    r"\p{N}{1,3}",
    r" ?[^\s\p{L}\p{N}]+[\r\n]*",
    r"\s*[\r\n]+",
    r"\s+(?!\S)",
]


class _MoonViTMixin:
    """Shared tower loading + chat_image for MoonViT hosts."""

    def _init_vision(self, gf, rt, projector: str):
        cfg_json = (gf.meta or {}).get("config.json", {})
        vis = cfg_json.get("vision_config", {})
        pp = (gf.meta or {}).get("preprocessor_config.json", {})
        self.image_mean = pp.get("image_mean", [0.5, 0.5, 0.5])
        self.image_std = pp.get("image_std", [0.5, 0.5, 0.5])
        self.in_token_limit = int(pp.get("in_token_limit", 4096))
        self.vis_cfg = None
        self.vis_params = None
        if vis and gf.has_tensor("vision_model.patch_embed.proj.bias"):
            self.vis_cfg = KimiViTConfig(
                hidden_size=int(vis["hidden_size"]),
                num_hidden_layers=int(vis["num_hidden_layers"]),
                num_attention_heads=int(vis["num_attention_heads"]),
                intermediate_size=int(vis["intermediate_size"]),
                lm_hidden_size=self.cfg.hidden_size,
                patch_size=int(vis.get("patch_size", 14)),
                init_pos_emb_height=int(vis.get("init_pos_emb_height", 64)),
                init_pos_emb_width=int(vis.get("init_pos_emb_width", 64)),
                merge_kernel_size=tuple(vis.get("merge_kernel_size", (2, 2))),
                projector=projector)
            pb = ParamBuilder(gf, rt)
            self.vis_params = load_kimi_vit_params(pb, self.vis_cfg)

    def encode_image(self, img):
        """PIL image → (merged embeddings [n, H], token count)."""
        from ..runtime.vision import qwen_image_frames

        assert self.vis_cfg is not None, "vision tower not loaded"
        vc = self.vis_cfg
        m = vc.merge_kernel_size[0]
        frames, gh, gw = qwen_image_frames(
            img, patch_size=vc.patch_size, merge_size=m,
            min_pixels=vc.patch_size ** 2 * m * m,
            max_pixels=vc.patch_size ** 2 * self.in_token_limit,
            mean=self.image_mean, std=self.image_std)
        emb = kimi_vit_forward(vc, self.vis_params,
                               jnp.asarray(frames[0]), gh, gw)
        return emb

    def _chat_with_image(self, pre, mid, media, gen_config, streamer):
        from ..nn.transformer import embed_tokens

        tok = self.tokenizer
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


@register_model(ModelType.KIMI_VL)
class KimiVL(_MoonViTMixin, DeepSeekV3):
    @classmethod
    def make_tokenizer(cls, gf, base):
        from ..runtime.chat import ChatTokenizer, HistoryEncoder

        class KimiEncoder(HistoryEncoder):
            def append_sys_prompt(self, ids):
                tok = self.tokenizer
                ids.append(tok.im_system_token_id)
                ids.extend(tok.encode("system"))
                ids.append(tok.im_middle_token_id)
                ids.extend(tok.encode(tok.sys_prompt))
                ids.append(tok.im_end_token_id)

            def append_user(self, round_idx, user, ids):
                tok = self.tokenizer
                ids.append(tok.im_user_token_id)
                ids.extend(tok.encode("user"))
                ids.append(tok.im_middle_token_id)
                ids.extend(tok.encode(user))
                ids.append(tok.im_end_token_id)

            def append_ai(self, round_idx, ai, ids):
                self.append_ai_opening(round_idx, ids)
                ids.extend(self.tokenizer.encode(ai))
                ids.append(self.tokenizer.im_end_token_id)

            def append_ai_opening(self, round_idx, ids):
                tok = self.tokenizer
                ids.append(tok.im_assistant_token_id)
                ids.extend(tok.encode("assistant"))
                ids.append(tok.im_middle_token_id)

        tp = BPEProcessor2(KIMI_REGEX)
        tp.load(gf.tokenizer_reader(), base.vocab_size)
        tp.enable_return_special_token(True)
        tok = ChatTokenizer(tp, KimiEncoder(),
                            sys_prompt="You are a helpful assistant")
        tok.bos_token_id = base.bos_token_id
        tok.eos_token_id = base.eos_token_id
        added = {}
        for k, v in ((gf.meta or {}).get("tokenizer_config.json", {})
                     .get("added_tokens_decoder", {})).items():
            added[v.get("content", "")] = int(k)
        for name in ("im_end", "im_user", "im_assistant", "im_system",
                     "im_middle", "media_start", "media_content",
                     "media_end", "media_pad"):
            tid = added.get(f"<|{name}|>", tp.piece_to_id(f"<|{name}|>"))
            setattr(tok, name + "_token_id", tid)
        if tok.im_end_token_id >= 0:
            tok.terminate_ids.add(tok.im_end_token_id)
        return tok

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        self = super().load(gf, rt)
        self._init_vision(gf, rt, "kimi")
        return self

    def chat_image(self, image, question: str, gen_config=None,
                   streamer=None) -> str:
        """<|media_start|>image<|media_content|>…<|media_end|> user turn
        (kimi::vl ChatHistoryEncoder::append_user + inject_media)."""
        from ..runtime.generate import GenerationConfig
        from ..runtime.vision import load_image

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=256)
        media = self.encode_image(load_image(image))
        tok = self.tokenizer
        pre = [tok.im_user_token_id]
        pre.extend(tok.encode("user"))
        pre.append(tok.im_middle_token_id)
        pre.append(tok.media_start_token_id)
        pre.extend(tok.encode("image"))
        pre.append(tok.media_content_token_id)
        mid = [tok.media_end_token_id]
        mid.extend(tok.encode(question))
        mid.append(tok.im_end_token_id)
        mid.append(tok.im_assistant_token_id)
        mid.extend(tok.encode("assistant"))
        mid.append(tok.im_middle_token_id)
        return self._chat_with_image(pre, mid, media, gen_config, streamer)


@register_model(ModelType.LocateAnything)
class LocateAnything(_MoonViTMixin, BaseLLM):
    """Qwen2 arch (+tie flag) + MoonViT with the mlp1 projector; images
    wrapped in <img>…</img> and labeled "<image N>"
    (models/locateanything.cpp)."""

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        lm = Qwen2.load.__func__(Qwen2, gf, rt)
        self = cls(gf.model_type, lm.cfg, lm.params, lm.tokenizer,
                   native_config=lm.native_config, meta=gf.meta)
        tok = self.tokenizer
        tok.image_start_token_id = tok.tp.piece_to_id("<img>")
        tok.image_end_token_id = tok.tp.piece_to_id("</img>")
        self._init_vision(gf, rt, "locate")
        return self

    def chat_image(self, image, question: str, gen_config=None,
                   streamer=None) -> str:
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
        pre.extend(tok.encode("<image 1>"))
        pre.append(tok.image_start_token_id)
        mid = [tok.image_end_token_id]
        mid.extend(tok.encode(question))
        mid.append(tok.im_end_token_id)
        mid.extend(tok.encode("\n"))
        mid.append(tok.im_start_token_id)
        mid.extend(tok.encode("assistant\n"))
        return self._chat_with_image(pre, mid, media, gen_config, streamer)
