"""MoonViT vision tower — Kimi-VL / LocateAnything (reference
/root/reference/models/moonshot.{h,cpp} namespace chatllm::kimi::vit:
PatchEmbedding :173, Learnable2DInterpPosEmb :134, ViTSelfAttention 2-D
interleaved rope :203, MultiModalProjector :291, VisionTransformer :343).

Structure: conv patch embed (+bias) + bicubic-interpolated learnable 2-D
pos-embed → pre-LN blocks (biased qkv/o, biased GELU MLP) with an
interleaved 2-D rope (pairs alternate w/h angles sharing frequency
base^(-4g/d), ggml rope_ext Interleaved over each half) → final LN →
merge-kernel patch merge + projector.

Two projector variants:
  - Kimi-VL:      pre_norm (LN on C) → merge reshape → linear_1 (m²C→m²C)
                  → GELU → linear_2 (m²C→lm)   [multi_modal_projector.*]
  - LocateAnything: merge reshape → LN(m²C) → Linear(m²C→lm) → GELU →
                  Linear(lm→lm)                [mlp1.{0,1,3}]
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norm import layer_norm
from ..ops.qmm import matmul
from ..ops.rope import ROPE_NORMAL, apply_rope
from .glm_vit import bicubic_resize_2d


@dataclass(frozen=True)
class KimiViTConfig:
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    lm_hidden_size: int
    patch_size: int = 14
    init_pos_emb_height: int = 64
    init_pos_emb_width: int = 64
    merge_kernel_size: tuple = (2, 2)
    projector: str = "kimi"          # "kimi" | "locate"
    norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def kimi_2d_rope_cos_sin(grid_h: int, grid_w: int, head_dim: int,
                         freq_base: float = 10000.0):
    """Interleaved 2-D rope tables [S, d/2] in ROPE_NORMAL pair layout:
    pair 2g rotates by pos_w·f_g, pair 2g+1 by pos_h·f_g with
    f_g = base^(-4g/d) (moonshot.cpp apply_2d_rope: strided views rotated
    with ggml RoPEMode::Interleaved over d/2 dims)."""
    q = head_dim // 4
    inv = np.power(freq_base, -4.0 * np.arange(q) / head_dim)
    hh, ww = np.meshgrid(np.arange(grid_h), np.arange(grid_w), indexing="ij")
    pw = ww.reshape(-1, 1) * inv[None, :]            # [S, q]
    ph = hh.reshape(-1, 1) * inv[None, :]
    theta = np.stack([pw, ph], axis=-1).reshape(-1, 2 * q)   # [S, d/2]
    return jnp.cos(jnp.asarray(theta, jnp.float32)), \
        jnp.sin(jnp.asarray(theta, jnp.float32))


def _attention(cfg: KimiViTConfig, p, x, cos, sin):
    S = x.shape[0]
    H, D = cfg.num_attention_heads, cfg.head_dim
    q = matmul(x, p["q"]).reshape(S, H, D)
    k = matmul(x, p["k"]).reshape(S, H, D)
    v = matmul(x, p["v"]).reshape(S, H, D)
    q = apply_rope(q[None], cos[None], sin[None], layout=ROPE_NORMAL)[0]
    k = apply_rope(k[None], cos[None], sin[None], layout=ROPE_NORMAL)[0]
    scores = jnp.einsum("shd,thd->hst", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (D ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hst,thd->shd", probs.astype(v.dtype), v)
    return matmul(out.reshape(S, H * D), p["o"])


def merge_patches(x, grid_h: int, grid_w: int, kernel: tuple):
    """[gh*gw, C] raster → [gh*gw/(kh*kw), kh*kw*C]: kh×kw blocks raster,
    patches raster inside each block (custom_ops.cpp merge_patch:1150)."""
    kh, kw = kernel
    C = x.shape[-1]
    x = x.reshape(grid_h // kh, kh, grid_w // kw, kw, C)
    x = jnp.transpose(x, (0, 2, 1, 3, 4))
    return x.reshape(-1, kh * kw * C)


def kimi_vit_forward(cfg: KimiViTConfig, params, frames, grid_h: int,
                     grid_w: int):
    """frames: [grid_h*patch, grid_w*patch, 3] normalized pixels →
    merged features [gh*gw/m², lm_hidden] in merge-block raster order."""
    p = cfg.patch_size
    emb = params["embed"]
    k = jnp.transpose(jnp.asarray(emb["proj_w"]), (2, 3, 1, 0))
    x = jax.lax.conv_general_dilated(
        frames[None].astype(jnp.float32), k.astype(jnp.float32),
        window_strides=(p, p), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    x = x.reshape(grid_h * grid_w, -1) + emb["proj_b"][None, :]
    pos = bicubic_resize_2d(emb["pos"], grid_h, grid_w)
    x = x + pos.reshape(grid_h * grid_w, -1).astype(x.dtype)

    cos, sin = kimi_2d_rope_cos_sin(grid_h, grid_w, cfg.head_dim)
    for lp in params["layers"]:
        x = x + _attention(cfg, lp["attn"],
                           layer_norm(x, lp["norm0"]["w"], lp["norm0"].get("b"),
                                      eps=cfg.norm_eps), cos, sin)
        h = layer_norm(x, lp["norm1"]["w"], lp["norm1"].get("b"),
                       eps=cfg.norm_eps)
        h = jax.nn.gelu(matmul(h, lp["mlp"]["fc0"]).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        x = x + matmul(h, lp["mlp"]["fc1"])
    x = layer_norm(x, params["post_norm"]["w"], params["post_norm"].get("b"),
                   eps=cfg.norm_eps)

    pj = params["projector"]
    if cfg.projector == "kimi":
        x = layer_norm(x, pj["pre_norm"]["w"], pj["pre_norm"].get("b"),
                       eps=cfg.norm_eps)
        x = merge_patches(x, grid_h, grid_w, cfg.merge_kernel_size)
        x = jax.nn.gelu(matmul(x, pj["fc0"]).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        return matmul(x, pj["fc1"])
    x = merge_patches(x, grid_h, grid_w, cfg.merge_kernel_size)
    x = layer_norm(x, pj["pre_norm"]["w"], pj["pre_norm"].get("b"), eps=1e-5)
    x = jax.nn.gelu(matmul(x, pj["fc0"]).astype(jnp.float32),
                    approximate=False).astype(x.dtype)
    return matmul(x, pj["fc1"])


def load_kimi_vit_params(pb, cfg: KimiViTConfig,
                         prefix: str = "vision_model.") -> dict:
    """Converter names (KimiVLConverter convert.py:8284: wqkv split,
    wo→o_proj, norms norm0/norm1; LocateAnything projector = mlp1.{0,1,3},
    convert.py:8417)."""
    pos = pb.raw_f32(f"{prefix}patch_embed.pos_emb.weight")
    if pos.ndim == 2:
        pos = pos.reshape(cfg.init_pos_emb_height, cfg.init_pos_emb_width, -1)
    params = {
        "embed": {
            "proj_w": pb.raw_f32(f"{prefix}patch_embed.proj.weight"),
            "proj_b": pb.array(f"{prefix}patch_embed.proj.bias"),
            "pos": jnp.asarray(pos),
        },
        "post_norm": pb.norm(f"{prefix}final_layernorm"),
        "layers": [],
    }
    if cfg.projector == "kimi":
        params["projector"] = {
            "pre_norm": pb.norm("multi_modal_projector.pre_norm"),
            "fc0": pb.linear("multi_modal_projector.linear_1", bias=True),
            "fc1": pb.linear("multi_modal_projector.linear_2", bias=True),
        }
    else:
        params["projector"] = {
            "pre_norm": pb.norm("mlp1.0"),
            "fc0": pb.linear("mlp1.1", bias=True),
            "fc1": pb.linear("mlp1.3", bias=True),
        }
    for i in range(cfg.num_hidden_layers):
        pfx = f"{prefix}encoder.blocks.{i}"
        params["layers"].append({
            "norm0": pb.norm(f"{pfx}.norm0", bias=True),
            "norm1": pb.norm(f"{pfx}.norm1", bias=True),
            "attn": {n: pb.linear(f"{pfx}.attn.{n}_proj", bias=True)
                     for n in ("q", "k", "v", "o")},
            "mlp": {"fc0": pb.linear(f"{pfx}.mlp.fc0", bias=True),
                    "fc1": pb.linear(f"{pfx}.mlp.fc1", bias=True)},
        })
    params["layers"] = tuple(params["layers"])
    return params
