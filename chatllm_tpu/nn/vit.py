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


# ---------------------------------------------------------------------------
# PaddleOCR-VL tower (reference models/ernie.cpp chatllm::paddle::ocr::vit
# :306 — NaViT-style: conv patch embed + bias, bilinear-interpolated learned
# pos-embed, pre-LN LayerNorm blocks with biased attention carrying the qwen
# 2-D vision rope (qwen.h:484 apply_2d_rope), GELU MLP, post-LN, then a 2×2
# merge projector `mlp_AR` (pre_norm LN → raster concat → fc GELU fc).
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PaddleViTConfig:
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    lm_hidden_size: int
    patch_size: int = 14
    spatial_merge_size: int = 2
    posemb_grid_size: int = 27          # image_size / patch_size
    norm_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def _paddle_pos_embed(table, n_side: int, grid_h: int, grid_w: int):
    """Bilinear interpolation of the [n_side², hidden] learned pos table onto
    (grid_h, grid_w) raster — ggml::interpolate Bilinear at ernie.cpp:417."""
    from .qwen_vit import _bilinear_pos_embed

    return _bilinear_pos_embed(table, n_side, grid_h, grid_w)


def paddle_vit_forward(cfg: PaddleViTConfig, params, pixels,
                       grid_h: int, grid_w: int):
    """pixels [grid_h*patch, grid_w*patch, 3] normalized → merged embeddings
    [grid_h*grid_w/m², lm_hidden] in merge-block raster order
    (VisionTransformer::forward ernie.cpp:510-531)."""
    from ..ops.rope import apply_rope, vision_rope_cos_sin
    from .qwen_vit import _vit_attention

    p = cfg.patch_size
    emb = params["embed"]
    k = jnp.transpose(jnp.asarray(emb["proj_w"]), (2, 3, 1, 0))   # HWIO
    x = jax.lax.conv_general_dilated(
        pixels[None].astype(jnp.float32), k.astype(jnp.float32),
        window_strides=(p, p), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    x = x.reshape(grid_h * grid_w, -1) + emb["proj_b"][None, :]
    x = x + _paddle_pos_embed(emb["pos"], cfg.posemb_grid_size, grid_h, grid_w)

    # raster 2-D rope coordinates (TensorPosHelper::prepare_v2 with
    # spatial_merge_size=1, qwen.cpp:975; merging is done by the projector)
    ph = jnp.repeat(jnp.arange(grid_h, dtype=jnp.int32), grid_w)
    pw = jnp.tile(jnp.arange(grid_w, dtype=jnp.int32), grid_h)
    cos, sin = vision_rope_cos_sin(ph, pw, cfg.head_dim)

    class _A:  # adapter so qwen_vit's attention helper sees our head count
        num_attention_heads = cfg.num_attention_heads
        head_dim = cfg.head_dim

    for lp in params["layers"]:
        h = layer_norm(x, lp["norm1"]["w"], lp["norm1"].get("b"),
                       eps=cfg.norm_eps)
        x = x + _vit_attention(_A, lp["attn"], h, cos, sin, None)
        h = layer_norm(x, lp["norm2"]["w"], lp["norm2"].get("b"),
                       eps=cfg.norm_eps)
        h = jax.nn.gelu(matmul(h, lp["mlp"]["fc0"]).astype(jnp.float32),
                        approximate=True).astype(x.dtype)   # ggml ActFunc::GELU
        x = x + matmul(h, lp["mlp"]["fc1"])
    x = layer_norm(x, params["post_norm"]["w"], params["post_norm"].get("b"),
                   eps=cfg.norm_eps)

    # mlp_AR projector (ernie.cpp:352-363): LN, 2×2 raster concat, GELU MLP
    pj = params["projector"]
    x = layer_norm(x, pj["pre_norm"]["w"], pj["pre_norm"].get("b"),
                   eps=cfg.norm_eps)
    m = cfg.spatial_merge_size
    H = cfg.hidden_size
    x = x.reshape(grid_h // m, m, grid_w // m, m, H)
    x = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(-1, m * m * H)
    x = jax.nn.gelu(matmul(x, pj["fc0"]).astype(jnp.float32),
                    approximate=True).astype(x.dtype)
    return matmul(x, pj["fc1"])


def load_paddle_vit_params(pb, cfg: PaddleViTConfig,
                           prefix: str = "visual.") -> dict:
    """Weight names per PaddleOCRVLConverter (convert.py:10315-10407; the
    unused `visual.head.*` attention-pool tensors are skipped — the runtime
    never forwards them, ernie.cpp:504)."""
    params = {
        "embed": {
            "proj_w": pb.raw_f32(f"{prefix}embeddings.patch_embedding.weight"),
            "proj_b": pb.array(f"{prefix}embeddings.patch_embedding.bias"),
            "pos": pb.array(f"{prefix}embeddings.position_embedding.weight"),
        },
        "post_norm": pb.norm(f"{prefix}post_layernorm", bias=True),
        "projector": {
            "pre_norm": pb.norm("mlp_AR.pre_norm", bias=True),
            "fc0": pb.linear("mlp_AR.linear_1", bias=True),
            "fc1": pb.linear("mlp_AR.linear_2", bias=True),
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pfx = f"{prefix}layers.{i}"
        params["layers"].append({
            "norm1": pb.norm(f"{pfx}.layer_norm1", bias=True),
            "norm2": pb.norm(f"{pfx}.layer_norm2", bias=True),
            "attn": {
                "q": pb.linear(f"{pfx}.self_attn.q_proj", bias=True),
                "k": pb.linear(f"{pfx}.self_attn.k_proj", bias=True),
                "v": pb.linear(f"{pfx}.self_attn.v_proj", bias=True),
                "o": pb.linear(f"{pfx}.self_attn.out_proj", bias=True),
            },
            "mlp": {"fc0": pb.linear(f"{pfx}.mlp.fc1", bias=True),
                    "fc1": pb.linear(f"{pfx}.mlp.fc2", bias=True)},
        })
    params["layers"] = tuple(params["layers"])
    return params


# ---------------------------------------------------------------------------
# dots.ocr tower (reference models/dots.cpp chatllm::dots::vit — NaViT-style:
# conv patch embed + RMSNorm (PatchEmbedding :24), pre-RMSNorm blocks with
# unbiased attention carrying the qwen 2-D vision rope (apply_2d_rope :157,
# sections [d/4, d/4]) and a SiLU-gated MLP (LMBlock1<RMSNorm, ViTSelfAttention,
# RMSNorm, SiLUMLP> :191), post_trunk_norm, then the qwen merge projector
# GenMultiModalProjector<LayerNorm, MLP> (ln_q → m²-concat → fc0 GELU fc1).
# Patch sequence order is merge-block raster (TensorPosHelper::prepare :85),
# so consecutive m² rows of the trunk output form one merged output token.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DotsViTConfig:
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    lm_hidden_size: int
    patch_size: int = 14
    spatial_merge_size: int = 2
    norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def _merge_block_order(grid_h: int, grid_w: int, m: int):
    """Raster patch index + (h, w) rope coords per sequence slot, blocks of
    m×m in raster order (dots.cpp TensorPosHelper::prepare:85-113)."""
    import numpy as np

    perm, pos_h, pos_w = [], [], []
    for bi in range(grid_h // m):
        for bj in range(grid_w // m):
            for i0 in range(m):
                for j0 in range(m):
                    y, x = bi * m + i0, bj * m + j0
                    perm.append(y * grid_w + x)
                    pos_h.append(y)
                    pos_w.append(x)
    return (np.asarray(perm, np.int32), np.asarray(pos_h, np.int32),
            np.asarray(pos_w, np.int32))


def dots_vit_forward(cfg: DotsViTConfig, params, pixels,
                     grid_h: int, grid_w: int):
    """pixels [grid_h*patch, grid_w*patch, 3] normalized → merged embeddings
    [grid_h*grid_w/m², lm_hidden] in merged-grid raster order."""
    import numpy as np

    from ..ops.norm import rms_norm
    from ..ops.rope import apply_rope, vision_rope_cos_sin
    from .qwen_vit import _vit_attention

    p = cfg.patch_size
    emb = params["embed"]
    k = jnp.transpose(jnp.asarray(emb["proj_w"]), (2, 3, 1, 0))   # HWIO
    x = jax.lax.conv_general_dilated(
        pixels[None].astype(jnp.float32), k.astype(jnp.float32),
        window_strides=(p, p), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    x = x.reshape(grid_h * grid_w, -1) + emb["proj_b"][None, :]
    x = rms_norm(x, emb["norm"]["w"], eps=cfg.norm_eps)

    perm, ph, pw = _merge_block_order(grid_h, grid_w, cfg.spatial_merge_size)
    x = x[jnp.asarray(perm)]
    cos, sin = vision_rope_cos_sin(jnp.asarray(ph), jnp.asarray(pw),
                                   cfg.head_dim)

    class _A:  # adapter for qwen_vit's attention helper
        num_attention_heads = cfg.num_attention_heads
        head_dim = cfg.head_dim

    for lp in params["layers"]:
        h = rms_norm(x, lp["norm1"]["w"], eps=cfg.norm_eps)
        x = x + _vit_attention(_A, lp["attn"], h, cos, sin, None)
        h = rms_norm(x, lp["norm2"]["w"], eps=cfg.norm_eps)
        g = matmul(h, lp["mlp"]["gate"]).astype(jnp.float32)
        u = matmul(h, lp["mlp"]["up"]).astype(jnp.float32)
        x = x + matmul((jax.nn.silu(g) * u).astype(x.dtype),
                       lp["mlp"]["down"])
    x = rms_norm(x, params["post_norm"]["w"], eps=cfg.norm_eps)

    # merger (qwen.h GenMultiModalProjector:538): ln_q → concat m² consecutive
    # patches (sequence is already merge-ordered) → fc0 GELU fc1 (exact GELU —
    # HF dots.ocr nn.GELU default is the numeric oracle)
    pj = params["projector"]
    x = layer_norm(x, pj["pre_norm"]["w"], pj["pre_norm"].get("b"),
                   eps=cfg.norm_eps)
    m2 = cfg.spatial_merge_size ** 2
    x = x.reshape(-1, m2 * cfg.hidden_size)
    x = jax.nn.gelu(matmul(x, pj["fc0"]).astype(jnp.float32),
                    approximate=False).astype(x.dtype)
    return matmul(x, pj["fc1"])


def load_dots_vit_params(pb, cfg: DotsViTConfig,
                         prefix: str = "vision_model.") -> dict:
    """On-disk names per DotsOCRConverter (/root/reference/convert.py:9627-9715
    — attention/MLP weights are unbiased, merger mlp is biased)."""
    params = {
        "embed": {
            "proj_w": pb.raw_f32(f"{prefix}patch_embed.proj.weight"),
            "proj_b": pb.array(f"{prefix}patch_embed.proj.bias"),
            "norm": pb.norm(f"{prefix}patch_embed.norm"),
        },
        "post_norm": pb.norm(f"{prefix}post_trunk_norm"),
        "projector": {
            "pre_norm": pb.norm(f"{prefix}merger.ln_q", bias=True),
            "fc0": pb.linear(f"{prefix}merger.mlp.fc0", bias=True),
            "fc1": pb.linear(f"{prefix}merger.mlp.fc1", bias=True),
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pfx = f"{prefix}layers.{i}"
        params["layers"].append({
            "norm1": pb.norm(f"{pfx}.norm1"),
            "norm2": pb.norm(f"{pfx}.norm2"),
            "attn": {
                "q": pb.linear(f"{pfx}.attn.q_proj", bias=False),
                "k": pb.linear(f"{pfx}.attn.k_proj", bias=False),
                "v": pb.linear(f"{pfx}.attn.v_proj", bias=False),
                "o": pb.linear(f"{pfx}.attn.o_proj", bias=False),
            },
            "mlp": {"gate": pb.linear(f"{pfx}.mlp.gate_proj", bias=False),
                    "up": pb.linear(f"{pfx}.mlp.up_proj", bias=False),
                    "down": pb.linear(f"{pfx}.mlp.down_proj", bias=False)},
        })
    params["layers"] = tuple(params["layers"])
    return params


# ---------------------------------------------------------------------------
# Step-VL tower (reference models/step.cpp chatllm::step::vit — CLIP-style:
# unbiased conv patch embed + bilinear-interpolated learned pos-embed + ln_pre
# (PatchEmbedding :23), pre-LN blocks with biased attention carrying a 2-D
# vision rope whose FIRST frequency section is the column (w) coordinate
# (TensorPosHelper::prepare :208 fills p_w before p_h), layer-scale ls_1/ls_2
# (EncoderLayerScale :157), quick-GELU MLP c_fc/c_proj (VitSiLUMLP :143 —
# despite the name, ActFunc::GELU_QUICK).  No post-trunk norm.  Projector:
# two 3×3 stride-2 convs (hidden→2h→4h) then an unbiased linear
# (MultiModalProjector :94).  The converter NeoX-permutes vision q/k
# (permute_pair, convert.py:9927), so apply_rope's half-split layout is the
# on-disk layout.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class StepViTConfig:
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    lm_hidden_size: int
    patch_size: int = 14
    image_size: int = 728
    norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def posemb_grid(self) -> int:
        return self.image_size // self.patch_size


def step_vit_forward(cfg: StepViTConfig, params, pixels,
                     grid_h: int, grid_w: int):
    """pixels [grid_h*patch, grid_w*patch, 3] normalized → projected
    embeddings [(grid_h//2//2)*(grid_w//2//2), lm_hidden] raster order."""
    from ..ops.rope import apply_rope, vision_rope_cos_sin
    from .qwen_vit import _bilinear_pos_embed, _vit_attention

    p = cfg.patch_size
    emb = params["embed"]
    k = jnp.transpose(jnp.asarray(emb["proj_w"]), (2, 3, 1, 0))   # HWIO
    x = jax.lax.conv_general_dilated(
        pixels[None].astype(jnp.float32), k.astype(jnp.float32),
        window_strides=(p, p), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    x = x.reshape(grid_h * grid_w, -1)
    if grid_h == cfg.posemb_grid and grid_w == cfg.posemb_grid:
        x = x + emb["pos"]
    else:
        x = x + _bilinear_pos_embed(emb["pos"], cfg.posemb_grid,
                                    grid_h, grid_w)
    x = layer_norm(x, emb["ln_pre"]["w"], emb["ln_pre"].get("b"),
                   eps=cfg.norm_eps)

    # raster coords; w drives the FIRST rope section (step.cpp:208-218)
    ph = jnp.repeat(jnp.arange(grid_h, dtype=jnp.int32), grid_w)
    pw = jnp.tile(jnp.arange(grid_w, dtype=jnp.int32), grid_h)
    cos, sin = vision_rope_cos_sin(pw, ph, cfg.head_dim)

    class _A:
        num_attention_heads = cfg.num_attention_heads
        head_dim = cfg.head_dim

    for lp in params["layers"]:
        h = layer_norm(x, lp["norm1"]["w"], lp["norm1"].get("b"),
                       eps=cfg.norm_eps)
        x = x + _vit_attention(_A, lp["attn"], h, cos, sin, None) * lp["ls1"]
        h = layer_norm(x, lp["norm2"]["w"], lp["norm2"].get("b"),
                       eps=cfg.norm_eps)
        h = matmul(h, lp["mlp"]["fc0"]).astype(jnp.float32)
        h = h * jax.nn.sigmoid(1.702 * h)                 # GELU_QUICK
        x = x + matmul(h.astype(x.dtype), lp["mlp"]["fc1"]) * lp["ls2"]

    # downsample projector (step.cpp MultiModalProjector::forward:105-118)
    pj = params["projector"]
    H = cfg.hidden_size
    y = x.reshape(1, grid_h, grid_w, H).astype(jnp.float32)
    for conv in ("down1", "down2"):
        kk = jnp.transpose(jnp.asarray(pj[conv]["w"]), (2, 3, 1, 0))
        y = jax.lax.conv_general_dilated(
            y, kk.astype(jnp.float32), window_strides=(2, 2),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + pj[conv]["b"]
    _, oh, ow, oc = y.shape
    y = y.reshape(oh * ow, oc)
    return matmul(y, pj["proj"])


def load_step_vit_params(pb, cfg: StepViTConfig,
                         prefix: str = "visual.") -> dict:
    """On-disk names per StepVLConverter (convert.py:9911-9990)."""
    params = {
        "embed": {
            "proj_w": pb.raw_f32(f"{prefix}conv1.weight"),
            "pos": pb.array(f"{prefix}positional_embedding"),
            "ln_pre": pb.norm(f"{prefix}ln_pre", bias=True),
        },
        "projector": {
            "down1": {"w": pb.raw_f32(f"{prefix}vit_downsampler1.weight"),
                      "b": pb.array(f"{prefix}vit_downsampler1.bias")},
            "down2": {"w": pb.raw_f32(f"{prefix}vit_downsampler2.weight"),
                      "b": pb.array(f"{prefix}vit_downsampler2.bias")},
            "proj": pb.linear(f"{prefix}vit_large_projector", bias=False),
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pfx = f"{prefix}blocks.{i}"
        params["layers"].append({
            "norm1": pb.norm(f"{pfx}.ln_1", bias=True),
            "norm2": pb.norm(f"{pfx}.ln_2", bias=True),
            "ls1": pb.array(f"{pfx}.ls_1.gamma"),
            "ls2": pb.array(f"{pfx}.ls_2.gamma"),
            "attn": {
                "q": pb.linear(f"{pfx}.attn.q_proj", bias=True),
                "k": pb.linear(f"{pfx}.attn.k_proj", bias=True),
                "v": pb.linear(f"{pfx}.attn.v_proj", bias=True),
                "o": pb.linear(f"{pfx}.attn.o_proj", bias=True),
            },
            "mlp": {"fc0": pb.linear(f"{pfx}.mlp.c_fc", bias=True),
                    "fc1": pb.linear(f"{pfx}.mlp.c_proj", bias=True)},
        })
    params["layers"] = tuple(params["layers"])
    return params


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
