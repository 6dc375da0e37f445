"""Step-VL (StepFun Step-3 VL; reference /root/reference/models/step.cpp,
namespaces chatllm::step::vit and chatllm::step::vl; converter
StepVLConverter convert.py:9911).

LLM = Qwen3 config layout (qk-normed GQA, ChatML template) with a forced
"<think>\\n" assistant opening (append_ai_opening, step.cpp:606-611).
Vision tower: nn/vit.py `step_vit_forward` (CLIP-style ln_pre tower with
layer scale, quick-GELU MLP, w-first 2-D rope, two stride-2 conv
downsamplers + linear projector).  Images go through pan-and-scan
(vision_process.cpp:451): 504² sliding-window crops injected as
<patch_start>…<patch_end> rows, then the whole image_size² view as
<im_start>…<im_end> (ChatHistoryEncoder::append_content, step.cpp:713-800).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn.vit import StepViTConfig, load_step_vit_params, step_vit_forward
from ..runtime.chat import ChatMLEncoder
from .base import ParamBuilder, RuntimeConfig, register_model
from .model_types import ModelType
from .qwen import Qwen3

CLIP_MEAN = [0.48145466, 0.4578275, 0.40821073]
CLIP_STD = [0.26862954, 0.26130258, 0.27577711]


class StepVLEncoder(ChatMLEncoder):
    """ChatML + "<think>\\n" forced after the assistant opening."""

    def append_ai_opening(self, round_idx, ids):
        super().append_ai_opening(round_idx, ids)
        ids.extend(self.tokenizer.encode("<think>\n"))


@register_model(ModelType.STEP_VL)
class StepVL(Qwen3):
    # Config layout = Qwen3 (StepVLConverter.dump_config delegates to
    # QWen3Converter on config.text_config)

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        self = super().load(gf, rt)
        tok = self.tokenizer
        tok.chat_encoder = StepVLEncoder()
        tok.chat_encoder.tokenizer = tok
        tok.sys_prompt = ""
        tp = tok.tp
        tok.patch_newline_token_id = tp.piece_to_id("<patch_newline>")
        tok.image_start_token_id = tp.piece_to_id("<im_start>")
        tok.image_end_token_id = tp.piece_to_id("<im_end>")
        tok.patch_start_token_id = tp.piece_to_id("<patch_start>")
        tok.patch_end_token_id = tp.piece_to_id("<patch_end>")

        cfg_json = (gf.meta or {}).get("config.json", {})
        vis = cfg_json.get("vision_config", {})
        self.vis_cfg = None
        self.vis_params = None
        self.do_pan_and_scan = True
        if vis and gf.has_tensor("visual.positional_embedding"):
            width = int(vis["width"])
            self.vis_cfg = StepViTConfig(
                hidden_size=width,
                num_hidden_layers=int(vis["layers"]),
                num_attention_heads=int(vis["heads"]),
                # hardcoded ratio, step.cpp load_more:458
                intermediate_size=int(width * (8960.0 / 1536)),
                lm_hidden_size=self.cfg.hidden_size,
                patch_size=int(vis["patch_size"]),
                image_size=int(vis["image_size"]))
            pb = ParamBuilder(gf, rt)
            self.vis_params = load_step_vit_params(pb, self.vis_cfg)
        self.big_patch_size = 504
        self.image_mean = CLIP_MEAN
        self.image_std = CLIP_STD
        return self

    def set_additional_args(self, args: dict):
        if "do-pan-and-scan" in args:
            self.do_pan_and_scan = str(args["do-pan-and-scan"]).lower() \
                not in ("0", "false", "no")
        if str(args.get("native-resolution", "")).lower() in ("1", "true", "yes"):
            self.do_pan_and_scan = False
        if hasattr(super(), "set_additional_args"):
            try:
                super().set_additional_args(args)
            except AttributeError:
                pass

    # ------------------------------------------------------------------
    def _encode_view(self, img) -> jnp.ndarray:
        """Square PIL view → projected embeddings [n, lm_hidden]."""
        vc = self.vis_cfg
        arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
        arr = (arr - np.asarray(self.image_mean, np.float32)) \
            / np.asarray(self.image_std, np.float32)
        g = arr.shape[0] // vc.patch_size
        return step_vit_forward(vc, self.vis_params, jnp.asarray(arr), g, g)

    def chat_image(self, image, question: str = "", gen_config=None,
                   streamer=None) -> str:
        """One-shot VQA: ChatML user turn with pan-and-scan patch rows +
        whole view, assistant opening "<think>\\n"
        (append_content, step.cpp:713-800)."""
        from ..nn.transformer import embed_tokens
        from ..runtime.generate import GenerationConfig
        from ..runtime.vision import load_image, step_pan_and_scan

        assert self.vis_cfg is not None, "vision tower not loaded"
        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=512)
        img = load_image(image)
        if self.do_pan_and_scan:
            crops, crops_per_row = step_pan_and_scan(
                img, image_size=self.vis_cfg.image_size,
                crop_size=self.big_patch_size)
        else:
            crops = [img.resize((self.vis_cfg.image_size,) * 2)]
            crops_per_row = 0

        tok = self.tokenizer
        # segments: alternate token-id lists and media arrays; patch crops
        # first (ids 1..n-1), whole view (id 0) last — step.cpp:767
        segs: list = []
        head: list[int] = []
        tok.chat_encoder.append_user_opening(0, head)
        segs.append(head)
        n = len(crops)
        for i in range(n):
            idx = (i + 1) % n
            media = self._encode_view(crops[idx])
            if idx == 0:
                segs.append([tok.image_start_token_id])
                segs.append(media)
                segs.append([tok.image_end_token_id])
            else:
                segs.append([tok.patch_start_token_id])
                segs.append(media)
                tail = [tok.patch_end_token_id]
                if crops_per_row and idx % crops_per_row == 0 and idx < n - 1:
                    tail.append(tok.patch_newline_token_id)
                segs.append(tail)
        tail: list[int] = []
        if question:
            tail.extend(tok.encode(question))
        tail.append(tok.im_end_token_id)
        tail.extend(tok.encode("\n"))
        tok.chat_encoder.append_ai_opening(0, tail)
        segs.append(tail)

        parts = []
        for seg in segs:
            if isinstance(seg, list):
                if not seg:
                    continue
                parts.append(embed_tokens(
                    self.cfg, self.params,
                    jnp.asarray(np.asarray([seg], np.int32)))[0])
            else:
                parts.append(seg)
        dt = parts[0].dtype
        embeds = jnp.concatenate([p.astype(dt) for p in parts], axis=0)[None]

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
