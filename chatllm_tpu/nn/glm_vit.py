"""GLM-4V / GLM-OCR vision tower (reference /root/reference/models/glm_vl.cpp
namespace chatllm::glm::vit — PatchEmbedding :203, MultiModalProjector :296,
VisionTransformer :83; HF `Glm4vVisionModel` is the numeric oracle).

Structure (GLM-4V):
  dual temporal conv patch embed (+bias) → post-conv RMSNorm → bicubic-
  interpolated learned pos-embed → RMSNorm/SwiGLU blocks with full 2-D-rope
  attention → post RMSNorm → stride-m conv downsample per merge block →
  merger (proj → LayerNorm → GELU → gated SiLU MLP).

GLM-OCR variant (`is_ocr`): no pos-embed/post-conv norm, per-head RMS
qk-norm, biased attention + MLP projections, block MLP sized by
`intermediate_size` (GLM-4V blocks use `out_hidden_size` —
HF Glm4VisionMlp), merger MLP sized 3×lm_hidden.

TPU-native design: patch sequence is laid out in merge-block raster order
with a static host-side permutation (same scheme as nn/qwen_vit.py); the
bicubic pos-embed interpolation is a separable 4-tap gather (numpy weight
precompute + two jnp contractions) matching torch grid_sample(bicubic,
align_corners=False, padding_mode="border").
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norm import layer_norm, rms_norm
from ..ops.qmm import matmul
from ..ops.rope import apply_rope, vision_rope_cos_sin


@dataclass(frozen=True)
class GlmViTConfig:
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    out_hidden_size: int
    lm_hidden_size: int
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    image_ref_size: int = 336              # learned pos grid = (ref/patch)²
    is_ocr: bool = False
    norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def block_mlp_size(self) -> int:
        # HF Glm4VisionMlp intermediate == out_hidden_size; OCR vision uses
        # intermediate_size (glm_vl.cpp:100 `is_ocr_vision ? ...`)
        return self.intermediate_size if self.is_ocr else self.out_hidden_size

    @property
    def merger_mlp_size(self) -> int:
        # glm_vl.cpp:418 mlp_intermediate_size = lm_hidden*3 for OCR
        return 3 * self.lm_hidden_size if self.is_ocr else self.intermediate_size


def glm_grid_layout(cfg: GlmViTConfig, grid_h: int, grid_w: int):
    """Merge-block raster permutation + per-slot (h, w) rope coords
    (HF Glm4vVisionModel.rot_pos_emb ordering)."""
    m = cfg.spatial_merge_size
    assert grid_h % m == 0 and grid_w % m == 0
    perm, pos_h, pos_w = [], [], []
    for by in range(grid_h // m):
        for bx in range(grid_w // m):
            for iy in range(m):
                for ix in range(m):
                    y, x = by * m + iy, bx * m + ix
                    perm.append(y * grid_w + x)
                    pos_h.append(y)
                    pos_w.append(x)
    return (np.asarray(perm, np.int32), np.asarray(pos_h, np.int32),
            np.asarray(pos_w, np.int32))


def _cubic_weights(x: np.ndarray, a: float = -0.75):
    """4-tap Keys cubic convolution weights at fractional offsets x∈[0,1):
    taps (floor-1, floor, floor+1, floor+2) — torch grid_sample bicubic."""
    def k(t):
        t = np.abs(t)
        return np.where(
            t <= 1.0, ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0,
            np.where(t < 2.0, ((a * t - 5.0 * a) * t + 8.0 * a) * t - 4.0 * a,
                     0.0))
    return np.stack([k(x + 1.0), k(x), k(1.0 - x), k(2.0 - x)], axis=-1)


def _bicubic_axis(n_src: int, n_dst: int):
    """Sampling indices [n_dst, 4] (border-clamped) + weights [n_dst, 4] for
    grid coords ((i+0.5)/n_dst)*n_src - 0.5 (align_corners=False)."""
    x = (np.arange(n_dst, dtype=np.float64) + 0.5) / n_dst * n_src - 0.5
    f = np.floor(x)
    w = _cubic_weights(x - f)
    idx = f[:, None] + np.array([-1.0, 0.0, 1.0, 2.0])
    idx = np.clip(idx, 0, n_src - 1).astype(np.int64)
    return idx, w.astype(np.float32)


def bicubic_resize_2d(t2, grid_h: int, grid_w: int):
    """Separable bicubic resize of a [H, W, C] table to [grid_h, grid_w, C]
    (torch grid_sample(bicubic, border, align_corners=False) semantics)."""
    t2 = t2.astype(jnp.float32)
    ih, wh = _bicubic_axis(t2.shape[0], grid_h)
    iw, ww = _bicubic_axis(t2.shape[1], grid_w)
    # along w: [H, grid_w, C]
    tw = jnp.einsum("wk,nwkc->nwc", jnp.asarray(ww), t2[:, jnp.asarray(iw)])
    # along h: [grid_h, grid_w, C]
    return jnp.einsum("hk,hkwc->hwc", jnp.asarray(wh), tw[jnp.asarray(ih)])


def bicubic_pos_embed(table, n_side: int, grid_h: int, grid_w: int):
    """Interpolate the [n², hidden] learned pos table onto (grid_h, grid_w)
    raster order — HF Glm4vVisionEmbeddings.forward grid_sample(bicubic,
    border, align_corners=False); the reference uses ggml::interpolate
    Bicubic (glm_vl.cpp:247)."""
    t2 = table.reshape(n_side, n_side, table.shape[-1])
    return bicubic_resize_2d(t2, grid_h, grid_w).reshape(grid_h * grid_w, -1)


def _attention(cfg: GlmViTConfig, p, x, cos, sin):
    S = x.shape[0]
    H, D = cfg.num_attention_heads, cfg.head_dim
    q = matmul(x, p["q"]).reshape(S, H, D)
    k = matmul(x, p["k"]).reshape(S, H, D)
    v = matmul(x, p["v"]).reshape(S, H, D)
    if cfg.is_ocr:
        # per-head RMS qk-norm (glm_vl.cpp:795 QKNormedAttention<RMSNorm,...>)
        q = rms_norm(q, p["q_norm"], eps=cfg.norm_eps)
        k = rms_norm(k, p["k_norm"], eps=cfg.norm_eps)
    q = apply_rope(q[None], cos[None], sin[None])[0]
    k = apply_rope(k[None], cos[None], sin[None])[0]
    scores = jnp.einsum("shd,thd->hst", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (D ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hst,thd->shd", probs.astype(v.dtype), v)
    return matmul(out.reshape(S, H * D), p["o"])


def _gated_mlp(p, x):
    g = matmul(x, p["gate"]).astype(jnp.float32)
    u = matmul(x, p["up"]).astype(jnp.float32)
    h = (jax.nn.silu(g) * u).astype(x.dtype)
    return matmul(h, p["down"])


def glm_vit_forward(cfg: GlmViTConfig, params, frames, grid_h: int,
                    grid_w: int):
    """frames: [2, grid_h*patch, grid_w*patch, 3] normalized pixels
    → merged features [gh*gw/m², lm_hidden] in merge-block raster order
    (the order GLM-4V splices image tokens into the prompt)."""
    p = cfg.patch_size
    emb = params["embed"]

    def pconv(img, w):
        k = jnp.transpose(jnp.asarray(w), (2, 3, 1, 0))
        y = jax.lax.conv_general_dilated(
            img[None].astype(jnp.float32), k.astype(jnp.float32),
            window_strides=(p, p), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        return y.reshape(grid_h * grid_w, -1)

    x = pconv(frames[0], emb["proj0"]) + pconv(frames[1], emb["proj1"])
    x = x + emb["bias"][None, :]
    if not cfg.is_ocr:
        x = rms_norm(x, emb["post_conv_norm"]["w"], eps=cfg.norm_eps)
        n_side = cfg.image_ref_size // cfg.patch_size
        x = x + bicubic_pos_embed(emb["pos"], n_side, grid_h, grid_w
                                  ).astype(x.dtype)

    perm, pos_h, pos_w = glm_grid_layout(cfg, grid_h, grid_w)
    x = x[jnp.asarray(perm)]
    cos, sin = vision_rope_cos_sin(jnp.asarray(pos_h), jnp.asarray(pos_w),
                                   cfg.head_dim)

    for lp in params["layers"]:
        x = x + _attention(cfg, lp["attn"],
                           rms_norm(x, lp["norm1"]["w"], eps=cfg.norm_eps),
                           cos, sin)
        x = x + _gated_mlp(lp["mlp"],
                           rms_norm(x, lp["norm2"]["w"], eps=cfg.norm_eps))

    x = rms_norm(x, params["post_norm"]["w"], eps=cfg.norm_eps)

    # stride-m conv downsample: each m×m merge block (already contiguous in
    # the sequence) collapses to one token (HF .view(-1,m,m,C) + Conv2d)
    m = cfg.spatial_merge_size
    nb = x.shape[0] // (m * m)
    blocks = x.reshape(nb, m, m, cfg.hidden_size)
    dw = params["downsample"]["w"]              # [out, in, m, m]
    wmat = jnp.transpose(jnp.asarray(dw, jnp.float32), (2, 3, 1, 0)).reshape(
        m * m * cfg.hidden_size, -1)
    x = jnp.dot(blocks.reshape(nb, m * m * cfg.hidden_size).astype(jnp.float32),
                wmat, preferred_element_type=jnp.float32)
    x = (x + params["downsample"]["b"][None, :]).astype(blocks.dtype)

    mg = params["merger"]
    x = matmul(x, mg["proj"])
    x = layer_norm(x, mg["post_proj_norm"]["w"], mg["post_proj_norm"].get("b"),
                   eps=1e-5)
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    return _gated_mlp(mg["mlp"], x)


def load_glm_vit_params(pb, cfg: GlmViTConfig, prefix: str = "visual.") -> dict:
    """Weight names per GLM4VConverter/GLMOCRConverter
    (convert.py:4231-4320): blocks renamed to layers.*, qkv split, .proj →
    .o_proj."""
    params = {
        "embed": {
            "proj0": pb.raw_f32(f"{prefix}patch_embed.proj.0.weight"),
            "proj1": pb.raw_f32(f"{prefix}patch_embed.proj.1.weight"),
            "bias": pb.array(f"{prefix}patch_embed.proj.bias"),
        },
        "post_norm": pb.norm(f"{prefix}post_layernorm"),
        "downsample": {"w": pb.raw_f32(f"{prefix}downsample.weight"),
                       "b": pb.array(f"{prefix}downsample.bias")},
        "merger": {
            "proj": pb.linear(f"{prefix}merger.proj", bias=False),
            "post_proj_norm": pb.norm(f"{prefix}merger.post_projection_norm"),
            "mlp": {
                "gate": pb.linear(f"{prefix}merger.gate_proj", bias=False),
                "up": pb.linear(f"{prefix}merger.up_proj", bias=False),
                "down": pb.linear(f"{prefix}merger.down_proj", bias=False),
            },
        },
        "layers": [],
    }
    if not cfg.is_ocr:
        params["embed"]["post_conv_norm"] = pb.norm(
            f"{prefix}post_conv_layernorm")
        params["embed"]["pos"] = pb.array(
            f"{prefix}embeddings.position_embedding.weight")
    for i in range(cfg.num_hidden_layers):
        pfx = f"{prefix}layers.{i}"
        attn = {ours: pb.linear(f"{pfx}.attn.{theirs}", bias=cfg.is_ocr)
                for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                                     ("v", "v_proj"), ("o", "o_proj"))}
        if cfg.is_ocr:
            attn["q_norm"] = pb.array(f"{pfx}.attn.q_norm.weight")
            attn["k_norm"] = pb.array(f"{pfx}.attn.k_norm.weight")
        mlp = {n: pb.linear(f"{pfx}.mlp.{n}_proj", bias=cfg.is_ocr)
               for n in ("gate", "up", "down")}
        params["layers"].append({
            "norm1": pb.norm(f"{pfx}.norm1"),
            "norm2": pb.norm(f"{pfx}.norm2"),
            "attn": attn, "mlp": mlp,
        })
    params["layers"] = tuple(params["layers"])
    return params
