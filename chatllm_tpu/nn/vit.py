"""Vision transformer towers (SigLIP / InternViT family).

Reference blocks: models/siglip.h (PatchEmbedding :26, ViTSelfAttention :48,
VisionTransformer :87 = pre-LN LayerNorm blocks with biased attention and
GELU MLP) and models/internvl.cpp vit namespace (cls token + layer-scale
ls1/ls2 + pixel-shuffle downsample + LN+MLP projector).

Pure functions over param dicts, like nn/transformer.py.  The patch conv is
one `lax.conv_general_dilated` with stride=patch (maps straight onto the
MXU as an implicit GEMM).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.norm import layer_norm
from ..ops.qmm import matmul


@dataclass(frozen=True)
class ViTConfig:
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    patch_size: int
    image_size: int
    act: str = "gelu_tanh"          # siglip: gelu_pytorch_tanh; internvit: gelu
    cls_token: bool = False         # InternViT prepends a class token
    layer_scale: bool = False       # InternViT ls1/ls2
    qk_norm: bool = False
    norm_eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


def _act(cfg):
    if cfg.act == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    return lambda x: jax.nn.gelu(x, approximate=False)


def patch_embed(cfg: ViTConfig, p, pixels):
    """pixels: [B, H, W, 3] (normalized f32) → [B, N(+1 cls), hidden]."""
    w = p["proj_w"]                       # [ph, pw, 3, hidden]
    x = jax.lax.conv_general_dilated(
        pixels.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    B, gh, gw, H = x.shape
    x = x.reshape(B, gh * gw, H)
    if "proj_b" in p:
        x = x + p["proj_b"]
    if cfg.cls_token:
        cls = jnp.broadcast_to(p["cls"], (B, 1, H))
        x = jnp.concatenate([cls, x], axis=1)
    pos = p["pos"]                        # [N(+1), hidden]
    x = x + pos[None, : x.shape[1]]
    return x


def vit_attention(cfg: ViTConfig, p, x):
    B, N, H = x.shape
    nh = cfg.num_attention_heads
    d = H // nh
    q = matmul(x, p["q"]).reshape(B, N, nh, d)
    k = matmul(x, p["k"]).reshape(B, N, nh, d)
    v = matmul(x, p["v"]).reshape(B, N, nh, d)
    if cfg.qk_norm:
        from ..ops.norm import rms_norm

        q = rms_norm(q, p["q_norm"]["w"], eps=cfg.norm_eps)
        k = rms_norm(k, p["k_norm"]["w"], eps=cfg.norm_eps)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    scores = jnp.einsum("bnhd,bmhd->bhnm", qf, kf) * (d ** -0.5)
    pr = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", pr, v.astype(jnp.float32))
    out = out.reshape(B, N, H).astype(x.dtype)
    return matmul(out, p["o"]).astype(x.dtype)


def vit_layer(cfg: ViTConfig, p, x):
    h = layer_norm(x, p["norm1"]["w"], p["norm1"].get("b"), eps=cfg.norm_eps)
    attn = vit_attention(cfg, p["attn"], h)
    if cfg.layer_scale:
        attn = attn * p["ls1"]
    x = x + attn
    h = layer_norm(x, p["norm2"]["w"], p["norm2"].get("b"), eps=cfg.norm_eps)
    h = _act(cfg)(matmul(h, p["mlp"]["fc0"]).astype(jnp.float32)).astype(x.dtype)
    h = matmul(h, p["mlp"]["fc1"]).astype(x.dtype)
    if cfg.layer_scale:
        h = h * p["ls2"]
    return x + h


def vit_forward(cfg: ViTConfig, params, pixels):
    """pixels [B, H, W, 3] → hidden states [B, N(+cls), hidden]."""
    x = patch_embed(cfg, params["embed"], pixels)
    for lp in params["layers"]:
        x = vit_layer(cfg, lp, x)
    if "post_norm" in params:
        x = layer_norm(x, params["post_norm"]["w"], params["post_norm"].get("b"),
                       eps=cfg.norm_eps)
    return x


def pixel_shuffle(x, grid_h: int, grid_w: int, scale: float):
    """InternVL pixel-shuffle downsample: [B, gh*gw, H] →
    [B, (gh*s)*(gw*s), H/s²] with s = downsample_ratio (0.5)."""
    B, N, H = x.shape
    x = x.reshape(B, grid_h, grid_w, H)
    fac = int(round(1 / scale))
    x = x.reshape(B, grid_h, grid_w // fac, H * fac)
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = x.reshape(B, grid_w // fac, grid_h // fac, H * fac * fac)
    x = jnp.transpose(x, (0, 2, 1, 3))
    return x.reshape(B, (grid_h // fac) * (grid_w // fac), H * fac * fac)
