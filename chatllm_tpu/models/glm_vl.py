"""GLM-4V and GLM-OCR (reference /root/reference/models/glm_vl.cpp,
namespaces chatllm::glm::v4v :445 and chatllm::glm::ocr :808; converters
GLM4VConverter convert.py:4152 and GLMOCRConverter :4264).

LLM = GLM-4-0414 arch (sandwich norms, partial rotary) with chunked M-RoPE:
text tokens advance all three axes together; image tokens hold t and offset
h/w from it (glm_vl.cpp:658-712 generate_next_token position fill).  The
converter stores q/k rope dims pair→NeoX permuted (permute_pair_rope_nope,
convert.py:6247), so the runtime rope layout is NeoX over `rot_dim`.

Vision tower: nn/glm_vit.py (bicubic-interpolated learned pos-embed for
GLM-4V; qk-normed biased blocks for GLM-OCR).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn.glm_vit import GlmViTConfig, glm_vit_forward, load_glm_vit_params
from ..nn.transformer import TransformerConfig
from ..ops.rope import ROPE_NEOX, RopeConfig
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   register_model)
from .glm import make_glm4_tokenizer
from .model_types import ModelType


def build_glm_3d_pos(segments):
    """[3, T] (t, h, w) rope position streams for a GLM-4V prompt.

    segments: list of ("text", n) | ("image", (gh, gw)) in merged-grid
    units.  Text: all axes share the running counter.  Image: t pinned,
    h/w = t + row/col (glm_vl.cpp:683-702); afterwards the counter resumes
    at max(h, w) + 1.  Returns (positions, t_next)."""
    t, streams = 0, [[], [], []]
    for kind, arg in segments:
        if kind == "text":
            for _ in range(arg):
                for s in streams:
                    s.append(t)
                t += 1
        else:
            gh, gw = arg
            for h in range(gh):
                for w in range(gw):
                    streams[0].append(t)
                    streams[1].append(t + h)
                    streams[2].append(t + w)
            t = t + max(gh, gw) - 1 + 1
    return np.asarray(streams, np.int32), t


@register_model(ModelType.GLM4V)
class GLM4V(BaseLLM):
    # glm4_0414 Config {n_kv, attn_bias, rope_dim, rope_theta:f} +
    # mrope_section[4] (glm_vl.cpp:447-450)
    EXTRA_FMT = "3if" + "4i"
    OCR_HEAD_DIM = False

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        n_kv, attn_bias, rope_dim, rope_theta = extra[:4]
        sections = tuple(int(s) for s in extra[4:8] if s > 0)
        head_dim = int(extra[8]) if cls.OCR_HEAD_DIM else \
            base.hidden_size // base.num_attention_heads
        cfg = TransformerConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=n_kv, head_dim=head_dim,
            intermediate_size=base.intermediate_size,
            max_length=rt.max_length if rt.max_length > 0 else base.max_length,
            norm_eps=1e-5, post_norms=True, qkv_bias=bool(attn_bias),
            rope=RopeConfig(head_dim=head_dim, rot_dim=rope_dim,
                            freq_base=rope_theta, layout=ROPE_NEOX,
                            mrope_sections=sections),
            cache_dtype=rt.cache_dtype)
        tok = make_glm4_tokenizer(gf, base)
        tok.begin_of_image_id = tok.tp.piece_to_id("<|begin_of_image|>")
        tok.end_of_image_id = tok.tp.piece_to_id("<|end_of_image|>")
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "lm_head": pb.linear("lm_head"),
            "layers": [],
        }
        for i in range(base.num_hidden_layers):
            pfx = f"model.layers.{i}"
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "attn": {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                },
                "post_attn_norm": pb.norm(f"{pfx}.post_self_attn_layernorm"),
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "post_ffn_norm": pb.norm(f"{pfx}.post_mlp_layernorm"),
                "mlp": {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                },
            })
        params["layers"] = tuple(params["layers"])
        self = cls(gf.model_type, cfg, params, tok, native_config=base,
                   meta=gf.meta)

        cfg_json = (gf.meta or {}).get("config.json", {})
        vis = cfg_json.get("vision_config", {})
        self.vis_cfg = None
        self.vis_params = None
        if vis and gf.has_tensor("visual.patch_embed.proj.0.weight"):
            self.vis_cfg = GlmViTConfig(
                hidden_size=int(vis["hidden_size"]),
                num_hidden_layers=int(vis["depth"]),
                num_attention_heads=int(vis["num_heads"]),
                intermediate_size=int(vis["intermediate_size"]),
                out_hidden_size=int(vis["out_hidden_size"]),
                lm_hidden_size=base.hidden_size,
                patch_size=int(vis.get("patch_size", 14)),
                spatial_merge_size=int(vis.get("spatial_merge_size", 2)),
                temporal_patch_size=int(vis.get("temporal_patch_size", 2)),
                image_ref_size=int(vis.get("image_size", 336)),
                is_ocr=vis.get("model_type") == "glm_ocr_vision",
                norm_eps=float(vis.get("rms_norm_eps", 1e-5)))
            self.vis_params = load_glm_vit_params(pb, self.vis_cfg)
        pp = (gf.meta or {}).get("preprocessor_config.json", {})
        self.image_mean = pp.get("image_mean", [0.48145466, 0.4578275,
                                                0.40821073])
        self.image_std = pp.get("image_std", [0.26862954, 0.26130258,
                                              0.27577711])
        return self

    # ------------------------------------------------------------------
    def encode_image(self, img):
        """PIL image → (merged embeddings [n, H], merged grid (gh, gw))."""
        from ..runtime.vision import qwen_image_frames

        assert self.vis_cfg is not None, "vision tower not loaded"
        vc = self.vis_cfg
        frames, gh, gw = qwen_image_frames(
            img, patch_size=vc.patch_size, merge_size=vc.spatial_merge_size,
            min_pixels=vc.patch_size ** 2 * 4 * 4,
            max_pixels=vc.patch_size ** 2 * 4 * 1024,
            mean=self.image_mean, std=self.image_std)
        emb = glm_vit_forward(vc, self.vis_params, jnp.asarray(frames), gh, gw)
        m = vc.spatial_merge_size
        return emb, (gh // m, gw // m)

    def chat_image(self, image, question: str, gen_config=None,
                   streamer=None) -> str:
        """One-shot VQA: [gMASK]<sop><|user|>\\n<|begin_of_image|>…
        <|end_of_image|>{q}<|assistant|> with GLM 3-D positions
        (v4v::ChatHistoryEncoder + inject_media, glm_vl.cpp:497,716)."""
        from ..nn.transformer import embed_tokens
        from ..runtime.generate import GenerationConfig
        from ..runtime.vision import load_image

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=256)
        media, (gh, gw) = self.encode_image(load_image(image))

        tok = self.tokenizer
        pre = [tok.gmask_token_id, tok.sop_token_id,
               tok.user_token_id, tok.nl_token_id, tok.begin_of_image_id]
        mid = [tok.end_of_image_id]
        mid.extend(tok.encode(self._ocr_prompt(question)))
        mid.append(tok.assistant_token_id)

        emb_pre = embed_tokens(self.cfg, self.params,
                               jnp.asarray(np.asarray([pre], np.int32)))[0]
        emb_mid = embed_tokens(self.cfg, self.params,
                               jnp.asarray(np.asarray([mid], np.int32)))[0]
        embeds = jnp.concatenate(
            [emb_pre, media.astype(emb_pre.dtype), emb_mid], axis=0)[None]
        positions, t_next = build_glm_3d_pos([
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

    def _ocr_prompt(self, question: str) -> str:
        return question


@register_model(ModelType.GLM_OCR)
class GLMOCR(GLM4V):
    """GLM-OCR: GLM-4V + explicit head_dim, qk-normed biased OCR tower,
    ':'-suffixed prompts defaulting to "Text Recognition:"
    (glm_vl.cpp:808-886)."""

    EXTRA_FMT = GLM4V.EXTRA_FMT + "i"
    OCR_HEAD_DIM = True

    def _ocr_prompt(self, question: str) -> str:
        q = question.strip()
        if not q:
            return "Text Recognition:"
        return q if q.endswith(":") else q + ":"
