"""SmolVLM / SmolVLM2 (reference /root/reference/models/smol.cpp,
namespaces smol::vit + smol::vlm).

SigLIP tower ("vision_model.encoder.layers.*", biased attention + LayerNorm,
learned position embedding, no cls token) → pixel-shuffle by `scale_factor`
→ single no-bias `multi_modal_projector.proj` linear → SmolLM2 (llama-arch)
LM.  Template (smol.cpp:467-497): "User: ..<end_of_utterance>\n" /
"Assistant:"; images injected as
<fake_token_around_image><global-img>[img embeds]<fake_token_around_image>
(smol.cpp Tokenizer::inject_global_image:449).  Image embeddings are spliced
into the prompt's input embeddings (TPU-native replacement for the
reference's extended-embedding-table trick, ExtendEmbedding).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn.vit import ViTConfig, pixel_shuffle, vit_forward
from ..runtime.chat import HistoryEncoder
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_llama_family_params, register_model)
from .llama import build_dense_config
from .misc_llama import _bpe2_tokenizer
from .model_types import ModelType


class SmolVLMEncoder(HistoryEncoder):
    """smol.cpp vlm::ChatHistoryEncoder: bos + optional "System: ..", rounds
    of "User: ..<end_of_utterance>\n" / "Assistant:"."""

    def append_sys_prompt(self, ids):
        tok = self.tokenizer
        ids.append(tok.bos_token_id)
        if tok.sys_prompt:
            ids.extend(tok.encode("System:"))
            ids.extend(tok.encode(" " + tok.sys_prompt))
            ids.append(tok.eou_token_id)
            ids.extend(tok.encode("\n"))

    def append_user(self, round_idx, user, ids):
        tok = self.tokenizer
        self.append_user_opening(round_idx, ids)
        ids.extend(tok.encode(" " + user))
        ids.append(tok.eou_token_id)
        ids.extend(tok.encode("\n"))

    def append_ai(self, round_idx, ai, ids):
        tok = self.tokenizer
        self.append_ai_opening(round_idx, ids)
        ids.extend(tok.encode(ai))
        ids.append(tok.eou_token_id)
        ids.extend(tok.encode("\n"))

    def append_ai_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("Assistant:"))

    def append_user_opening(self, round_idx, ids):
        ids.extend(self.tokenizer.encode("User:"))


@register_model(ModelType.SMOL_VLM)
class SmolVLM(BaseLLM):
    """LM config layout = SmolLM ("if" extra: n_kv, rope_theta —
    SmolVLMConverter.dump_config delegates to SmolLMConverter,
    /root/reference/convert.py:2277)."""

    EXTRA_FMT = "if"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, (n_kv, rope_theta) = BaseConfig.parse(gf, cls.EXTRA_FMT)
        tie = not gf.has_tensor("lm_head.weight")
        cfg = build_dense_config(base, num_key_value_heads=n_kv,
                                 rope_theta=rope_theta, tie_lm_head=tie,
                                 norm_eps=1e-6,
                                 max_length=rt.max_length,
                                 cache_dtype=rt.cache_dtype)
        tok = _bpe2_tokenizer(gf, base, SmolVLMEncoder())
        tok.bos_token_id = tok.tp.piece_to_id("<|im_start|>")
        tok.eou_token_id = tok.tp.piece_to_id("<end_of_utterance>")
        tok.fake_img_token_id = tok.tp.piece_to_id("<fake_token_around_image>")
        tok.global_img_token_id = tok.tp.piece_to_id("<global-img>")
        tok.eos_token_id = tok.eou_token_id
        for piece in ("<|im_end|>", "<|endoftext|>", "<tool_call>",
                      "<|im_start|>", "<end_of_utterance>"):
            tid = tok.tp.piece_to_id(piece)
            if tid >= 0:
                tok.terminate_ids.add(tid)
        pb = ParamBuilder(gf, rt)
        params = load_llama_family_params(pb, base.num_hidden_layers,
                                          tie_lm_head=tie)
        self = cls(gf.model_type, cfg, params, tok, native_config=base,
                   meta=gf.meta)

        cfg_json = (gf.meta or {}).get("config.json", {})
        vis = cfg_json.get("vision_config", {})
        self.vis_cfg = None
        self.vis_params = None
        if vis and gf.has_tensor("vision_model.embeddings.patch_embedding.weight"):
            # field defaults per smol.cpp load_more:258-271
            self.scale_factor = int(cfg_json.get("scale_factor", 3))
            split = int(vis.get("max_image_size", {}).get("longest_edge",
                                                          vis.get("image_size", 384)))
            self.vis_cfg = ViTConfig(
                hidden_size=int(vis.get("hidden_size", 1152)),
                num_hidden_layers=int(vis["num_hidden_layers"]),
                num_attention_heads=int(vis.get("num_attention_heads", 16)),
                intermediate_size=int(vis["intermediate_size"]),
                patch_size=int(vis["patch_size"]),
                image_size=split,
                act="gelu_tanh", cls_token=False, layer_scale=False,
                norm_eps=float(vis.get("layer_norm_eps", 1e-6)))
            pp = (gf.meta or {}).get("preprocessor_config.json", {})
            self.image_mean = pp.get("image_mean", [0.5, 0.5, 0.5])
            self.image_std = pp.get("image_std", [0.5, 0.5, 0.5])
            pb2 = ParamBuilder(gf, rt)
            self.vis_params = load_smol_vit_params(pb2, self.vis_cfg)
        return self

    # ------------------------------------------------------------------
    def encode_images(self, images: np.ndarray) -> jnp.ndarray:
        """images [N, S, S, 3] (normalized) → [N * image_seq_len, lm_hidden]
        (smol.cpp VisionTransformer::forward:220-229: tower → final LN →
        pixel shuffle → proj)."""
        assert self.vis_cfg is not None, "vision tower not loaded"
        cfg = self.vis_cfg
        x = vit_forward(cfg, self.vis_params, jnp.asarray(images))
        g = cfg.grid
        x = pixel_shuffle(x, g, g, 1.0 / self.scale_factor)
        from ..ops.qmm import matmul

        x = matmul(x, self.vis_params["projector"])
        N, T, H = x.shape
        return x.reshape(N * T, H)

    def image_token_count(self) -> int:
        g = self.vis_cfg.grid
        return (g // self.scale_factor) ** 2

    def chat_image(self, image, question: str, gen_config=None,
                   streamer=None) -> str:
        """One-shot VQA with the global-image injection (no grid split —
        the reference's default `do-split=false`, smol.cpp:531)."""
        from ..nn.transformer import embed_tokens
        from ..runtime.generate import GenerationConfig
        from ..runtime.vision import load_image, to_array

        gen_config = gen_config or GenerationConfig(do_sample=False,
                                                    max_new_tokens=256)
        img = load_image(image)
        px = to_array(img, self.vis_cfg.image_size,
                      self.image_mean, self.image_std)
        media = self.encode_images(px[None])          # [seq_len, H]

        tok = self.tokenizer
        pre: list[int] = []
        tok.chat_encoder.append_sys_prompt(pre)
        tok.chat_encoder.append_user_opening(0, pre)
        pre.append(tok.fake_img_token_id)
        pre.append(tok.global_img_token_id)
        mid: list[int] = [tok.fake_img_token_id]
        mid.extend(tok.encode(" " + question))
        mid.append(tok.eou_token_id)
        mid.extend(tok.encode("\n"))
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


def _smolvlm_pos_ids(nps: int) -> np.ndarray:
    """HF SmolVLMVisionEmbeddings bucketized position ids for a full square
    image: fractional coords are scaled by (1 - 1e-6), so coordinate i/nps
    lands strictly below boundary i/nps and buckets to i-1 — the ids are NOT
    arange (row ids [0, 0, 1, .., nps-2]).  HF is ground truth; reproduce
    bit-exactly and bake the permutation into the pos table."""
    boundaries = np.arange(1, nps, dtype=np.float32) / np.float32(nps)
    frac = np.arange(nps, dtype=np.float32) / np.float32(nps) * np.float32(1 - 1e-6)
    side = np.searchsorted(boundaries, frac, side="right")
    return (side[:, None] * nps + side[None, :]).reshape(-1)


def load_smol_vit_params(pb: ParamBuilder, cfg: ViTConfig) -> dict:
    """On-disk names per SmolVLMConverter (/root/reference/convert.py:2280-2310)."""
    pos = pb.array("vision_model.embeddings.position_embedding.weight")
    pos = pos[jnp.asarray(_smolvlm_pos_ids(cfg.grid))]
    params = {
        "embed": {
            "proj_w": jnp.asarray(np.transpose(
                pb.raw_f32("vision_model.embeddings.patch_embedding.weight"),
                (2, 3, 1, 0))),
            "proj_b": pb.array("vision_model.embeddings.patch_embedding.bias"),
            "pos": pos,
        },
        "post_norm": {"w": pb.array("vision_model.final_layernorm.weight"),
                      "b": pb.array("vision_model.final_layernorm.bias")},
        "projector": pb.linear("multi_modal_projector.proj", bias=False),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pfx = f"vision_model.encoder.layers.{i}"
        params["layers"].append({
            "norm1": pb.norm(f"{pfx}.layer_norm1", bias=True),
            "attn": {
                "q": pb.linear(f"{pfx}.self_attn.q_proj", bias=True),
                "k": pb.linear(f"{pfx}.self_attn.k_proj", bias=True),
                "v": pb.linear(f"{pfx}.self_attn.v_proj", bias=True),
                "o": pb.linear(f"{pfx}.self_attn.o_proj", bias=True),
            },
            "norm2": pb.norm(f"{pfx}.layer_norm2", bias=True),
            "mlp": {"fc0": pb.linear(f"{pfx}.mlp.fc0", bias=True),
                    "fc1": pb.linear(f"{pfx}.mlp.fc1", bias=True)},
        })
    return params
