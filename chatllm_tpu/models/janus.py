"""Janus-Pro: multimodal understanding + IMAGE GENERATION
(reference /root/reference/models/janus.cpp, namespace janus::pro).

Understanding: SigLIP-Large-p16-384 tower (timm-style blocks; on-disk names
`vision_model.layers.{i}.attn.*` / `norm1/2`, pos_embed without `.weight` —
converter pp, convert.py:9374) → biased-GELU `aligner` MLP → llama LM with
the DeepSeek-v1 template.

Generation (`/gen prompt`): classifier-free guidance with two parallel rows
per image (conditional + pad-masked unconditional, janus.cpp:793-806);
per-step the final hidden state goes through `gen_head`
(output_mlp_projector → gelu → vision_head) to 16384 image-token logits,
CFG-mixed (uncond + w·(cond − uncond), GenHead::forward:98), multinomial-
sampled, and fed back through `gen_embed` + `gen_aligner`.  After 576
tokens the ids are decoded to a 384×384 image by the VQ-16 decoder
(nn/vqgan.py).  The whole token loop runs on-device in one `lax.scan`.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..nn.vit import ViTConfig, vit_forward
from ..nn.vqgan import load_vq_decoder, vq_decode
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .deepseek import make_deepseek_v1_tokenizer
from .llama import build_dense_config
from .model_types import ModelType


@register_model(ModelType.JANUS_PRO)
class JanusPro(BaseLLM):
    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, _ = BaseConfig.parse(gf)
        cfg = build_dense_config(base, max_length=rt.max_length,
                                 norm_eps=1e-6, cache_dtype=rt.cache_dtype)
        tok = make_deepseek_v1_tokenizer(gf, base)
        for name, attr in [("<begin_of_image>", "boi_token_id"),
                           ("<end_of_image>", "eoi_token_id"),
                           ("<｜▁pad▁｜>", "img_pad_token_id")]:
            setattr(tok, attr, tok.tp.piece_to_id(name))
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers)
        self = cls(gf.model_type, cfg, params, tok, native_config=base,
                   meta=gf.meta)

        cfg_json = (gf.meta or {}).get("config.json", {})
        self.vis_cfg = None
        self.vis_params = None
        self.gen_params = None
        if gf.has_tensor("vision_model.patch_embed.proj.weight"):
            # original checkpoints nest geometry under vision_config.params
            # (janus.cpp load_more:683); HF-transformers JanusConfig stores
            # the flat HF keys — accept both
            vcfg = cfg_json.get("vision_config", {})
            vp = vcfg.get("params") or vcfg
            width = int(vp.get("width", vp.get("hidden_size", 1024)))
            self.vis_cfg = ViTConfig(
                hidden_size=width,
                num_hidden_layers=int(vp.get("layers",
                                             vp.get("num_hidden_layers", 24))),
                num_attention_heads=int(vp.get("heads",
                                               vp.get("num_attention_heads", 16))),
                intermediate_size=int(round(float(vp.get("mlp_ratio", 4.0))
                                            * width)),
                patch_size=int(vp.get("patch_size", 16)),
                image_size=int(vp.get("image_size", 384)),
                act="gelu", cls_token=False, layer_scale=False,
                norm_eps=1e-6)
            self.vis_params = _load_janus_vit_params(pb, self.vis_cfg)
        if gf.has_tensor("gen_head.vision_head.weight"):
            gh = cfg_json.get("gen_head_config", {}).get("params", {})
            gv = cfg_json.get("gen_vision_config", {}).get("params", {})
            vq = cfg_json.get("vq_config", {})        # HF-transformers form
            self.image_token_size = int(gh.get(
                "image_token_size", vq.get("num_embeddings", 16384)))
            self.gen_embed_dim = int(gv.get("n_embed",
                                            vq.get("embed_dim", 8)))
            self.gen_params = {
                "gen_embed": pb.array("gen_embed.weight"),
                "gen_aligner": {"fc0": pb.linear("gen_aligner.fc0", bias=True),
                                "fc1": pb.linear("gen_aligner.fc1", bias=True)},
                "gen_head": {"fc0": pb.linear("gen_head.output_mlp_projector",
                                              bias=True),
                             "fc1": pb.linear("gen_head.vision_head",
                                              bias=True)},
                "vq": load_vq_decoder(pb),
            }
        self.image_mean = [0.5, 0.5, 0.5]
        self.image_std = [0.5, 0.5, 0.5]
        return self

    # -------------------------------------------------- understanding
    def encode_images(self, images: np.ndarray) -> jnp.ndarray:
        """[N, 384, 384, 3] normalized → [N * 576, lm_hidden]
        (tower → aligner MLP; janus.cpp siglip tower + aligner)."""
        from ..ops.qmm import matmul

        cfg = self.vis_cfg
        x = vit_forward(cfg, self.vis_params, jnp.asarray(images))
        p = self.vis_params["aligner"]
        x = jax.nn.gelu(matmul(x, p["fc0"]).astype(jnp.float32),
                        approximate=False)
        x = matmul(x.astype(jnp.float32), p["fc1"])
        N, T, H = x.shape
        return x.reshape(N * T, H)

    def image_token_count(self) -> int:
        g = self.vis_cfg.grid
        return g * g

    def chat_image(self, image, question: str, gen_config=None,
                   streamer=None) -> str:
        """VQA: <begin_of_image>[576 embeds]<end_of_image>\\nquestion."""
        from ..nn.transformer import embed_tokens
        from ..runtime.generate import GenerationConfig
        from ..runtime.vision import load_image, to_array

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=256)
        px = to_array(load_image(image), self.vis_cfg.image_size,
                      self.image_mean, self.image_std)
        media = self.encode_images(px[None])

        tok = self.tokenizer
        pre: list[int] = []
        tok.chat_encoder.append_sys_prompt(pre)
        pre.extend(tok.encode("User:"))
        pre.append(tok.boi_token_id)
        mid: list[int] = [tok.eoi_token_id]
        mid.extend(tok.encode("\n" + question + "\n\n"))
        mid.extend(tok.encode("Assistant:"))

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

    # -------------------------------------------------- image generation
    def gen_head_logits(self, hidden) -> jax.Array:
        """gen_head MLP: [.., H] → [.., image_token_size] raw logits."""
        from ..ops.qmm import matmul

        p = self.gen_params["gen_head"]
        h = jax.nn.gelu(matmul(hidden, p["fc0"]).astype(jnp.float32),
                        approximate=False)
        return matmul(h, p["fc1"]).astype(jnp.float32)

    def gen_image_embed(self, tokens) -> jax.Array:
        """image-token ids → LM input embeddings (GenImageEmbed:124)."""
        from ..ops.qmm import matmul

        g = self.gen_params
        e = jnp.take(g["gen_embed"], tokens, axis=0)
        h = jax.nn.gelu(matmul(e, g["gen_aligner"]["fc0"]).astype(jnp.float32),
                        approximate=False)
        return matmul(h, g["gen_aligner"]["fc1"])

    def generate_image(self, prompt: str, *, parallel_size: int = 1,
                       cfg_weight: float = 5.0, temperature: float = 1.0,
                       seed: int = 0, grid: int = 24):
        """Text → [parallel_size] images ([P, S, S, 3] f32 in [0, 1]).

        Mirrors janus.cpp generate_next_token:784-880: CFG pair per image,
        gen_head + multinomial for 576 tokens, then VQ decode."""
        from ..nn.transformer import init_cache, transformer_forward

        assert self.gen_params is not None, "generation weights not loaded"
        tok = self.tokenizer
        cond: list[int] = []
        tok.chat_encoder.append_sys_prompt(cond)
        tok.chat_encoder.append_user(0, prompt, cond)
        cond.extend(tok.encode("Assistant:"))
        cond.append(tok.boi_token_id)
        # unconditional row: same length, everything between bos and
        # <begin_of_image> replaced by pads (janus.cpp:797-805)
        pad = tok.img_pad_token_id if tok.img_pad_token_id >= 0 else 0
        uncond = [cond[0]] + [pad] * (len(cond) - 2) + [cond[-1]]

        P = max(1, parallel_size)
        n_tokens = grid * grid   # 24x24 = 576 per image (janus.cpp:556)
        T = len(cond)
        B = 2 * P
        rows = []
        for _ in range(P):
            rows.append(cond)
            rows.append(uncond)
        ids = jnp.asarray(np.asarray(rows, np.int32))       # [2P, T]

        cfg = self.cfg
        cache = init_cache(cfg, B, T + n_tokens + 8)
        key = jax.random.PRNGKey(seed)

        @jax.jit
        def run(ids, cache, key):
            hidden, cache = transformer_forward(
                cfg, self.params, ids, cache, 0, last_only=True,
                return_hidden=True)

            def step(carry, _):
                hidden, cache, n_past, key = carry
                logits = self.gen_head_logits(hidden[:, 0])   # [2P, Vimg]
                cnd, unc = logits[0::2], logits[1::2]
                mixed = unc + cfg_weight * (cnd - unc)
                key, sub = jax.random.split(key)
                nxt = jax.random.categorical(
                    sub, mixed / max(temperature, 1e-6), axis=-1)  # [P]
                both = jnp.repeat(nxt, 2)                     # [2P]
                emb = self.gen_image_embed(both)[:, None, :]  # [2P, 1, H]
                hidden, cache = transformer_forward(
                    cfg, self.params, None, cache, n_past, last_only=True,
                    input_embeds=emb.astype(hidden.dtype), return_hidden=True)
                return (hidden, cache, n_past + 1, key), nxt

            (_, cache, _, _), toks = jax.lax.scan(
                step, (hidden, cache, jnp.int32(ids.shape[1]), key), None,
                length=n_tokens)
            return toks.T                                     # [P, n_tokens]

        tokens = run(ids, cache, key)
        images = vq_decode(self.gen_params["vq"], tokens, (grid, grid))
        return np.asarray(images)


def _load_janus_vit_params(pb: ParamBuilder, cfg: ViTConfig) -> dict:
    """timm-SigLIP on-disk names (JanusConverter pp, convert.py:9374-9396)."""
    params = {
        "embed": {
            "proj_w": jnp.asarray(np.transpose(
                pb.raw_f32("vision_model.patch_embed.proj.weight"),
                (2, 3, 1, 0))),
            "proj_b": pb.array("vision_model.patch_embed.proj.bias"),
            "pos": pb.array("vision_model.pos_embed"),
        },
        "post_norm": {"w": pb.array("vision_model.norm.weight"),
                      "b": pb.array("vision_model.norm.bias")},
        "aligner": {"fc0": pb.linear("aligner.fc0", bias=True),
                    "fc1": pb.linear("aligner.fc1", bias=True)},
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pfx = f"vision_model.layers.{i}"
        params["layers"].append({
            "norm1": pb.norm(f"{pfx}.norm1", bias=True),
            "attn": {
                "q": pb.linear(f"{pfx}.attn.q_proj", bias=True),
                "k": pb.linear(f"{pfx}.attn.k_proj", bias=True),
                "v": pb.linear(f"{pfx}.attn.v_proj", bias=True),
                "o": pb.linear(f"{pfx}.attn.o_proj", bias=True),
            },
            "norm2": pb.norm(f"{pfx}.norm2", bias=True),
            "mlp": {"fc0": pb.linear(f"{pfx}.mlp.fc0", bias=True),
                    "fc1": pb.linear(f"{pfx}.mlp.fc1", bias=True)},
        })
    return params
