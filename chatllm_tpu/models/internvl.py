"""InternVL 3.x (reference: /root/reference/models/internvl.cpp).

InternViT tower (cls token + layer-scale pre-LN ViT) → pixel-shuffle
downsample → LN+MLP projector (`mlp1`/`vision_projector`) → Qwen3 LLM.
Image embeddings are spliced into the prompt's input embeddings
(TPU-native replacement for the reference's extended-embedding-table trick,
internvl.cpp ExtendEmbedding/before_generate).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn.vit import ViTConfig, pixel_shuffle, vit_forward
from ..runtime.chat import MsgRole
from .base import BaseLLM, ParamBuilder, RuntimeConfig, register_model
from .model_types import ModelType
from .qwen import Qwen3


@register_model(ModelType.INTERN_VL)
class InternVL(BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        lm = Qwen3.load.__func__(Qwen3, gf, rt)
        self = cls(gf.model_type, lm.cfg, lm.params, lm.tokenizer,
                   native_config=lm.native_config, meta=gf.meta)

        tok = self.tokenizer
        tok.img_start_token_id = tok.tp.piece_to_id("<img>")
        tok.img_end_token_id = tok.tp.piece_to_id("</img>")

        cfg_json = (gf.meta or {}).get("config.json", {})
        vis = cfg_json.get("vision_config", {})
        self.downsample_ratio = float(cfg_json.get("downsample_ratio", 0.5))
        self.use_thumbnail = bool(cfg_json.get("use_thumbnail", True))
        pp = (gf.meta or {}).get("preprocessor_config.json", {})
        self.image_mean = pp.get("image_mean", [0.485, 0.456, 0.406])
        self.image_std = pp.get("image_std", [0.229, 0.224, 0.225])

        self.vis_cfg = None
        self.vis_params = None
        if vis and gf.has_tensor("visual.embeddings.class_embedding"):
            def _dim(v):
                # HF-native InternVL stores image_size/patch_size as [h, w]
                return int(v[0] if isinstance(v, (list, tuple)) else v)

            self.vis_cfg = ViTConfig(
                hidden_size=int(vis["hidden_size"]),
                num_hidden_layers=int(vis["num_hidden_layers"]),
                num_attention_heads=int(vis["num_attention_heads"]),
                intermediate_size=int(vis["intermediate_size"]),
                patch_size=_dim(vis["patch_size"]),
                image_size=_dim(vis["image_size"]),
                act="gelu", cls_token=True, layer_scale=True,
                norm_eps=float(vis.get("layer_norm_eps", 1e-6)))
            pb = ParamBuilder(gf, rt)
            self.vis_params = load_internvit_params(pb, self.vis_cfg)
        return self

    # ------------------------------------------------------------------
    def encode_images(self, tiles: np.ndarray) -> jnp.ndarray:
        """tiles [N, S, S, 3] → projected embeddings [N * tokens, lm_hidden]
        (internvl.cpp MultiModalProjector::forward: drop cls, pixel-shuffle,
        LN → fc → gelu → fc)."""
        assert self.vis_cfg is not None, "vision tower not loaded"
        cfg = self.vis_cfg
        x = vit_forward(cfg, self.vis_params, jnp.asarray(tiles))
        x = x[:, 1:, :]                       # drop cls token
        g = cfg.grid
        x = pixel_shuffle(x, g, g, self.downsample_ratio)
        p = self.vis_params["projector"]
        from ..ops.norm import layer_norm
        from ..ops.qmm import matmul
        import jax

        x = layer_norm(x, p["ln"]["w"], p["ln"]["b"], eps=1e-5)
        x = matmul(x, p["fc0"]).astype(jnp.float32)
        x = jax.nn.gelu(x, approximate=False)
        x = matmul(x.astype(jnp.bfloat16) if self.params["embed"].dtype == jnp.bfloat16 else x,
                   p["fc1"])
        N, T, H = x.shape
        return x.reshape(N * T, H)

    def image_token_count(self) -> int:
        g = self.vis_cfg.grid
        fac = int(round(1 / self.downsample_ratio))
        return (g // fac) * (g // fac)

    def chat_image(self, image, question: str, gen_config=None, streamer=None,
                   max_tiles: int = 12) -> str:
        """One-shot VQA: preprocess → encode tiles → splice embeddings →
        generate (the `user: <image>\\nquestion` template of internvl.cpp)."""
        from ..runtime.generate import GenerationConfig
        from ..runtime.vision import internvl_tiles, load_image

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=256)
        img = load_image(image)
        tiles, _ = internvl_tiles(
            img, image_size=self.vis_cfg.image_size, max_num=max_tiles,
            use_thumbnail=self.use_thumbnail,
            mean=self.image_mean, std=self.image_std)
        media = self.encode_images(tiles)     # [n_img_tokens, H]

        tok = self.tokenizer
        pre: list[int] = []
        enc = tok.chat_encoder
        enc.append_sys_prompt(pre)
        pre.append(tok.im_start_token_id)
        pre.extend(tok.encode("user\n"))
        pre.append(tok.img_start_token_id)
        mid: list[int] = [tok.img_end_token_id]
        mid.extend(tok.encode("\n" + question))
        mid.append(tok.im_end_token_id)
        mid.extend(tok.encode("\n"))
        mid.append(tok.im_start_token_id)
        mid.extend(tok.encode("assistant\n"))

        from ..nn.transformer import embed_tokens

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


def load_internvit_params(pb: ParamBuilder, cfg: ViTConfig) -> dict:
    """Weight names per InternVLConverter (convert.py:10172)."""
    import jax.numpy as jnp

    params = {
        "embed": {
            "proj_w": jnp.asarray(np.transpose(
                pb.raw_f32("visual.embeddings.patch_embedding.weight"),
                (2, 3, 1, 0))),
            "proj_b": pb.array("visual.embeddings.patch_embedding.bias"),
            "cls": pb.array("visual.embeddings.class_embedding").reshape(1, -1),
            "pos": pb.array("visual.embeddings.position_embedding").reshape(
                -1, cfg.hidden_size),
        },
        "projector": {
            "ln": {"w": pb.array("vision_projector.0.weight"),
                   "b": pb.array("vision_projector.0.bias")},
            "fc0": pb.linear("vision_projector.1", bias=True),
            "fc1": pb.linear("vision_projector.3", bias=True),
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pfx = f"visual.layers.{i}"
        params["layers"].append({
            "norm1": pb.norm(f"{pfx}.norm1", bias=True),
            "attn": {
                "q": pb.linear(f"{pfx}.self_attn.q_proj", bias=True),
                "k": pb.linear(f"{pfx}.self_attn.k_proj", bias=True),
                "v": pb.linear(f"{pfx}.self_attn.v_proj", bias=True),
                "o": pb.linear(f"{pfx}.self_attn.o_proj", bias=True),
            },
            "norm2": pb.norm(f"{pfx}.norm2", bias=True),
            "mlp": {"fc0": pb.linear(f"{pfx}.mlp.fc1", bias=True),
                    "fc1": pb.linear(f"{pfx}.mlp.fc2", bias=True)},
            "ls1": pb.array(f"{pfx}.ls1"),
            "ls2": pb.array(f"{pfx}.ls2"),
        })
    return params
