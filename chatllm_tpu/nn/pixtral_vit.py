"""Pixtral vision tower (Mistral-3 / Mistral-Small-3.1).

Reference: models/mistral.cpp chatllm::mistral::pixtral:306-640 — conv patch
embed + RMS ln_pre, transformer blocks with per-pixel 2D rotary (ggml
GGML_ROPE_TYPE_VISION, sections [d/4, d/4, 0, 0]) and silu-gated MLP, then
MultiModalProjector: RMSNorm → 2x2 patch merge → merging_layer → linear_1 →
GELU → linear_2.  HF modeling_pixtral / modeling_mistral3 are the numeric
ground truth (PixtralRotaryEmbedding builds freqs_h from the even frequency
slots and freqs_w from the odd ones; the patch merger unfolds channel-major).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.norm import rms_norm
from ..ops.qmm import matmul


@dataclass(frozen=True)
class PixtralViTConfig:
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    patch_size: int = 16
    head_dim: int = 64
    rope_theta: float = 10000.0
    spatial_merge_size: int = 2
    norm_eps: float = 1e-5


def _pixtral_rope(cfg: PixtralViTConfig, gh: int, gw: int):
    """cos/sin [gh*gw, head_dim] per HF PixtralRotaryEmbedding: even
    frequency slots take the row position, odd slots the column."""
    d = cfg.head_dim
    freqs = 1.0 / (cfg.rope_theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
    h = np.arange(gh, dtype=np.float64)
    w = np.arange(gw, dtype=np.float64)
    fh = np.outer(h, freqs[0::2])                     # [gh, d/4]
    fw = np.outer(w, freqs[1::2])                     # [gw, d/4]
    ang = np.concatenate(
        [np.repeat(fh[:, None, :], gw, axis=1),
         np.repeat(fw[None, :, :], gh, axis=0)], axis=-1).reshape(-1, d // 2)
    ang = np.concatenate([ang, ang], axis=-1)         # [T, d]
    return jnp.asarray(np.cos(ang), jnp.float32), \
        jnp.asarray(np.sin(ang), jnp.float32)


def _rot_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _attn(cfg: PixtralViTConfig, p, x, cos, sin):
    T, H = x.shape
    nh, d = cfg.num_attention_heads, cfg.head_dim
    q = matmul(x, p["q"]).reshape(T, nh, d)
    k = matmul(x, p["k"]).reshape(T, nh, d)
    v = matmul(x, p["v"]).reshape(T, nh, d)
    q = q * cos[:, None, :] + _rot_half(q) * sin[:, None, :]
    k = k * cos[:, None, :] + _rot_half(k) * sin[:, None, :]
    scores = jnp.einsum("qhd,khd->hqk", q, k) * (d ** -0.5)
    pr = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("hqk,khd->qhd", pr, v).reshape(T, nh * d)
    return matmul(o, p["o"])


def pixtral_vit_forward(cfg: PixtralViTConfig, params, image):
    """image [Hpx, Wpx, 3] normalized → merged+projected embeddings
    [gh/m * gw/m, lm_hidden] (single tile; reference pixtral
    VisionTransformer + MultiModalProjector)."""
    P = cfg.patch_size
    gh, gw = image.shape[0] // P, image.shape[1] // P
    x = jax.lax.conv_general_dilated(
        image[None].astype(jnp.float32),
        params["embed"]["proj_w"].astype(jnp.float32),
        window_strides=(P, P), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    x = x.reshape(gh * gw, cfg.hidden_size)
    x = rms_norm(x, params["embed"]["ln_pre"], eps=cfg.norm_eps)
    cos, sin = _pixtral_rope(cfg, gh, gw)
    for lp in params["layers"]:
        h = rms_norm(x, lp["attn_norm"], eps=cfg.norm_eps)
        x = x + _attn(cfg, lp["attn"], h, cos, sin)
        h = rms_norm(x, lp["ffn_norm"], eps=cfg.norm_eps)
        g = matmul(h, lp["mlp"]["gate"])
        u = matmul(h, lp["mlp"]["up"])
        x = x + matmul(jax.nn.silu(g) * u, lp["mlp"]["down"])

    proj = params["projector"]
    x = rms_norm(x, proj["norm"], eps=proj.get("norm_eps", 1e-5))
    # patch merge: unfold channel-major ([d, ky, kx] per merged token)
    m = cfg.spatial_merge_size
    d = cfg.hidden_size
    x = x.reshape(gh, gw, d)
    x = x.reshape(gh // m, m, gw // m, m, d)
    x = jnp.transpose(x, (0, 2, 4, 1, 3))             # [gh/m, gw/m, d, ky, kx]
    x = x.reshape(gh // m * (gw // m), d * m * m)
    x = matmul(x, proj["merger"])
    x = matmul(x, proj["fc0"])
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False)
    return matmul(x, proj["fc1"])


def load_pixtral_vit_params(pb, cfg: PixtralViTConfig,
                            prefix: str = "vision_model.") -> dict:
    """On-disk names per the reference pixtral loader (mistral.cpp:500-540:
    patch_conv/ln_pre, layers.N.{attention_norm, ffn_norm, attention.*,
    feed_forward.*}, multi_modal_projector.{norm, patch_merger.merging_layer,
    linear_1, linear_2})."""
    params = {
        "embed": {
            "proj_w": jnp.asarray(np.transpose(
                pb.raw_f32(f"{prefix}patch_conv.weight"), (2, 3, 1, 0))),
            "ln_pre": pb.array(f"{prefix}ln_pre.weight"),
        },
        "projector": {
            "norm": pb.array("multi_modal_projector.norm.weight"),
            "merger": pb.linear(
                "multi_modal_projector.patch_merger.merging_layer",
                bias=False),
            "fc0": pb.linear("multi_modal_projector.linear_1", bias=False),
            "fc1": pb.linear("multi_modal_projector.linear_2", bias=False),
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pfx = f"{prefix}layers.{i}"
        params["layers"].append({
            "attn_norm": pb.array(f"{pfx}.attention_norm.weight"),
            "ffn_norm": pb.array(f"{pfx}.ffn_norm.weight"),
            "attn": {
                "q": pb.linear(f"{pfx}.attention.q_proj", bias=False),
                "k": pb.linear(f"{pfx}.attention.k_proj", bias=False),
                "v": pb.linear(f"{pfx}.attention.v_proj", bias=False),
                "o": pb.linear(f"{pfx}.attention.o_proj", bias=False),
            },
            "mlp": {
                "gate": pb.linear(f"{pfx}.feed_forward.gate_proj", bias=False),
                "up": pb.linear(f"{pfx}.feed_forward.up_proj", bias=False),
                "down": pb.linear(f"{pfx}.feed_forward.down_proj", bias=False),
            },
        })
    return params
