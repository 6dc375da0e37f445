"""Qwen3.5 (reference /root/reference/models/qwen3_5.cpp, namespace
chatllm::qwen::v3_5; converter QWen3_5Converter convert.py:5839).

Qwen3-Next-style hybrid stack: most layers are Gated-DeltaNet linear
attention (nn/transformer.py gated_deltanet_block), the rest gated full
attention (sigmoid output gate, zero-centered (1+w) RMSNorm everywhere,
per-head qk-norm, interleaved M-RoPE with partial rotary dim), with an
optional 256-expert top-8 MoE + sigmoid-gated shared expert per layer and
an optional Qwen3-VL vision tower (DeepStack taps).  The numeric oracle
for the DeltaNet recurrence is HF Qwen3-Next
(torch_recurrent_gated_delta_rule), which Qwen3.5 shares.
"""
from __future__ import annotations

from dataclasses import replace as _replace

import numpy as np
import jax.numpy as jnp

from ..nn.transformer import GDNConfig, LayerSpec
from ..ops.rope import ROPE_NEOX
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_moe_experts, register_model)
from .llama import build_dense_config
from .model_types import ModelType
from .qwen import make_qwen_tokenizer


@register_model(ModelType.QWEN3_5)
class Qwen35(BaseLLM):
    # Config: BaseConfig + {n_kv, attn_output_gate, linear_conv_kernel_dim,
    # linear_key_head_dim, linear_num_key_heads, linear_num_value_heads,
    # linear_value_head_dim, head_dim, rope_theta:f, rope_dim,
    # mrope_section[3], 0, moe_intermediate, shared_expert_intermediate,
    # num_experts_per_tok, num_experts, tie, mtp_num_hidden_layers,
    # router_aux_loss_coef:f} + layer_is_la[128]
    # (QWen3_5Converter.dump_config, convert.py:5925-5949)
    EXTRA_FMT = "8if11if128i"

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, extra = BaseConfig.parse(gf, cls.EXTRA_FMT)
        (n_kv, attn_gate, conv_k, k_dim, nk, nv, v_dim, head_dim) = extra[:8]
        rope_theta = extra[8]
        rope_dim = extra[9]
        sections = tuple(int(s) for s in extra[10:13] if s > 0)
        moe_inter, shared_inter, topk, n_experts, tie_flag, mtp = extra[14:20]
        la = extra[21:21 + base.num_hidden_layers]
        tie = bool(tie_flag)

        cfg = build_dense_config(
            base, num_key_value_heads=n_kv, head_dim=head_dim,
            rope_theta=rope_theta, rope_layout=ROPE_NEOX, tie_lm_head=tie,
            norm_eps=1e-6, qk_norm="rmsnorm", max_length=rt.max_length,
            cache_dtype=rt.cache_dtype)
        cfg = _replace(
            cfg,
            rms_norm_offset=1.0,                 # RMSNormWeightPlus1
            attn_out_gate=bool(attn_gate),
            gdn=GDNConfig(conv_kernel=conv_k, num_k_heads=nk,
                          num_v_heads=nv, k_head_dim=k_dim,
                          v_head_dim=v_dim),
            rope=_replace(cfg.rope, rot_dim=rope_dim,
                          mrope_sections=sections, mrope_interleaved=True),
            layer_specs=tuple(
                LayerSpec(linear_attn=bool(la[i]), is_moe=n_experts > 0)
                for i in range(base.num_hidden_layers)),
            moe_num_experts=max(n_experts, 0), moe_top_k=max(topk, 0),
            moe_norm_topk_prob=True)

        tok = make_qwen_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = {
            "embed": pb.embedding("model.embed_tokens.weight"),
            "final_norm": pb.norm("model.norm"),
            "layers": [],
        }
        if not tie:
            params["lm_head"] = pb.linear("lm_head")
        for i in range(base.num_hidden_layers):
            pfx = f"model.layers.{i}"
            if la[i]:
                attn = {
                    "qkv": pb.linear(f"{pfx}.linear_attn.in_proj_qkv"),
                    "z": pb.linear(f"{pfx}.linear_attn.in_proj_z"),
                    "b": pb.linear(f"{pfx}.linear_attn.in_proj_b"),
                    "a": pb.linear(f"{pfx}.linear_attn.in_proj_a"),
                    "conv_w": pb.raw_f32(f"{pfx}.linear_attn.conv1d.weight"),
                    "dt_bias": pb.array(f"{pfx}.linear_attn.dt_bias"),
                    "A_log": pb.array(f"{pfx}.linear_attn.A_log"),
                    "norm_w": pb.array(f"{pfx}.linear_attn.norm.weight"),
                    "o": pb.linear(f"{pfx}.linear_attn.out_proj"),
                }
            else:
                attn = {
                    "q": pb.linear(f"{pfx}.self_attn.q_proj"),
                    "k": pb.linear(f"{pfx}.self_attn.k_proj"),
                    "v": pb.linear(f"{pfx}.self_attn.v_proj"),
                    "o": pb.linear(f"{pfx}.self_attn.o_proj"),
                    "q_norm": pb.norm(f"{pfx}.self_attn.q_norm"),
                    "k_norm": pb.norm(f"{pfx}.self_attn.k_norm"),
                }
                if attn_gate:
                    attn["gate"] = pb.linear(f"{pfx}.self_attn.gate_proj")
            if n_experts > 0:
                mlp = {
                    "gate": pb.linear(f"{pfx}.mlp.gate"),
                    "experts": load_moe_experts(pb, f"{pfx}.mlp", n_experts),
                    "shared": {
                        "gate": pb.linear(f"{pfx}.mlp.shared_expert.gate_proj"),
                        "up": pb.linear(f"{pfx}.mlp.shared_expert.up_proj"),
                        "down": pb.linear(f"{pfx}.mlp.shared_expert.down_proj"),
                    },
                    "shared_gate": pb.linear(f"{pfx}.mlp.shared_expert_gate"),
                }
            else:
                mlp = {
                    "gate": pb.linear(f"{pfx}.mlp.gate_proj"),
                    "up": pb.linear(f"{pfx}.mlp.up_proj"),
                    "down": pb.linear(f"{pfx}.mlp.down_proj"),
                }
            params["layers"].append({
                "attn_norm": pb.norm(f"{pfx}.input_layernorm"),
                "attn": attn,
                "ffn_norm": pb.norm(f"{pfx}.post_attention_layernorm"),
                "mlp": mlp,
            })
        params["layers"] = tuple(params["layers"])
        self = cls(gf.model_type, cfg, params, tok, native_config=base,
                   meta=gf.meta)

        # optional Qwen3-VL tower (qwen3_5.cpp uses v3_vl's
        # VisualEmbeddingGeneration; converter reuses Qwen3VL names)
        cfg_json = (gf.meta or {}).get("config.json", {})
        vis = cfg_json.get("vision_config", {})
        self.vis_cfg = None
        self.vis_params = None
        if vis and gf.has_tensor("visual.patch_embed.proj.0.weight"):
            from ..nn.qwen_vit import QwenViTConfig, load_qwen3_vit_params

            self.vis_cfg = QwenViTConfig(
                hidden_size=int(vis["hidden_size"]),
                num_hidden_layers=int(vis["depth"]),
                num_attention_heads=int(vis["num_heads"]),
                intermediate_size=int(vis["intermediate_size"]),
                patch_size=int(vis.get("patch_size", 16)),
                spatial_merge_size=int(vis.get("spatial_merge_size", 2)),
                temporal_patch_size=int(vis.get("temporal_patch_size", 2)),
                window_size=0, is_v3=True,
                num_position_embeddings=int(
                    vis.get("num_position_embeddings", 2304)),
                deepstack_visual_indexes=tuple(
                    vis.get("deepstack_visual_indexes", ())))
            self.vis_params = load_qwen3_vit_params(ParamBuilder(gf, rt),
                                                    self.vis_cfg)
            tok.vision_start_id = tok.tp.piece_to_id("<|vision_start|>")
            tok.vision_end_id = tok.tp.piece_to_id("<|vision_end|>")
        pp = (gf.meta or {}).get("preprocessor_config.json", {})
        self.image_mean = pp.get("image_mean", [0.5, 0.5, 0.5])
        self.image_std = pp.get("image_std", [0.5, 0.5, 0.5])
        self.min_pixels = int(pp.get("min_pixels", 56 * 56))
        self.max_pixels = int(pp.get("max_pixels", 14 * 14 * 4 * 1280))
        return self

    # ------------------------------------------------------------------
    def encode_image(self, img):
        from ..nn.qwen_vit import grid_layout, qwen3_vit_forward
        from ..runtime.vision import qwen_image_frames

        assert self.vis_cfg is not None, "vision tower not loaded"
        vc = self.vis_cfg
        frames, gh, gw = qwen_image_frames(
            img, patch_size=vc.patch_size, merge_size=vc.spatial_merge_size,
            min_pixels=self.min_pixels, max_pixels=self.max_pixels,
            mean=self.image_mean, std=self.image_std)
        layout = grid_layout(vc, gh, gw)
        emb, deepstack = qwen3_vit_forward(vc, self.vis_params,
                                           jnp.asarray(frames), layout,
                                           gh, gw)
        m = vc.spatial_merge_size
        return emb, deepstack, (gh // m, gw // m)

    def chat_image(self, image, question: str = "", gen_config=None,
                   streamer=None) -> str:
        """Same flow as Qwen3-VL: interleaved M-RoPE positions + DeepStack
        residuals over the image token span."""
        from .qwen3_vl_mod import Qwen3VL

        return Qwen3VL.chat_image(self, image, question, gen_config,
                                  streamer)

    def _deepstack_residuals(self, deepstack, img_start: int, T: int):
        from .qwen3_vl_mod import Qwen3VL

        return Qwen3VL._deepstack_residuals(self, deepstack, img_start, T)
