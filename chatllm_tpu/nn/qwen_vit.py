"""Qwen2-VL / Qwen2.5-VL vision tower.

Reference: /root/reference/models/qwen.cpp namespace chatllm::qwen::vit
(PatchEmbedding :909, TensorPosHelper window partition :1004, VisionTransformer
:1209) and models/qwen.h (GenericViTSelfAttention2D :459, GenMultiModalProjector
:538, LayerBlock/LayerBlockV2 :599).

TPU-native design: the reference builds per-window ragged attention via a
host-written block-diagonal mask tensor; here the window partition is a static
numpy permutation computed per grid on the host, and window locality becomes a
segment-id equality mask inside one dense attention — fully static shapes, one
fused softmax on the VPU, matmuls on the MXU.

  - Qwen2.5-VL: RMSNorm + SwiGLU blocks, window attention (except
    `fullatt_block_indices`), merger with RMSNorm.
  - Qwen2-VL ("v2"): LayerNorm + quick-GELU blocks, full attention everywhere,
    merger with LayerNorm.  (The HF tower uses quick_gelu; HF is the numeric
    oracle here.)

Both use 2-D rope over the full head dim (half h / half w frequencies) and a
temporal-pair patch embedding (two conv kernels summed — identical frames for
still images).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norm import layer_norm, rms_norm
from ..ops.qmm import matmul
from ..ops.rope import apply_rope, vision_rope_cos_sin


@dataclass(frozen=True)
class QwenViTConfig:
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    window_size: int = 112                  # 0 → full attention everywhere
    fullatt_block_indices: tuple = ()
    is_v2: bool = False                     # Qwen2-VL (LN + quick-GELU, full attn)
    is_v3: bool = False                     # Qwen3-VL (LN + GELU-tanh, learned
    #                                         pos-embed, deepstack taps)
    is_youtu: bool = False                  # Youtu-VL (SigLIP2 tower: linear
    #                                         patch embed, LN + exact-GELU
    #                                         blocks, windowed attention,
    #                                         post-LN; hunyuan.cpp:1068)
    num_position_embeddings: int = 0        # v3 learned pos table size (n²)
    deepstack_visual_indexes: tuple = ()    # v3 block indices tapped for deepstack
    norm_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclass
class GridLayout:
    """Host-side static layout for one (grid_h, grid_w)."""
    perm: np.ndarray          # [S] raster patch index for each sequence slot
    pos_h: np.ndarray         # [S] patch row per sequence slot
    pos_w: np.ndarray         # [S] patch col per sequence slot
    seg_ids: np.ndarray       # [S] window id per sequence slot (all 0 if full)
    reverse: np.ndarray       # [S/m²] output slot for each merge block (raster)


def grid_layout(cfg: QwenViTConfig, grid_h: int, grid_w: int) -> GridLayout:
    """Window partition + rope coordinates (TensorPosHelper::prepare,
    models/qwen.cpp:1004).  Sequence order:

      v2 / full: merge blocks in raster order, m×m raster inside each.
      windowed:  windows in raster order, merge blocks raster inside the
                 window, m×m raster inside each block.

    `reverse[b]` maps merge block b (raster order) to its slot in the merged
    output sequence, undoing the window shuffle after the merger.
    """
    m = cfg.spatial_merge_size
    assert grid_h % m == 0 and grid_w % m == 0
    bh, bw = grid_h // m, grid_w // m
    if cfg.is_v2 or cfg.is_v3 or cfg.window_size <= 0:
        win = max(bh, bw)  # one window == whole image
    else:
        win = cfg.window_size // cfg.patch_size // m

    perm, pos_h, pos_w, seg, block_order = [], [], [], [], []
    wid = 0
    for wy in range(0, bh, win):
        for wx in range(0, bw, win):
            for by in range(wy, min(wy + win, bh)):
                for bx in range(wx, min(wx + win, bw)):
                    block_order.append(by * bw + bx)
                    for iy in range(m):
                        for ix in range(m):
                            y, x = by * m + iy, bx * m + ix
                            perm.append(y * grid_w + x)
                            pos_h.append(y)
                            pos_w.append(x)
                            seg.append(wid)
            wid += 1
    inv = np.empty(len(block_order), np.int64)
    inv[np.asarray(block_order, np.int64)] = np.arange(len(block_order))
    return GridLayout(
        perm=np.asarray(perm, np.int32), pos_h=np.asarray(pos_h, np.int32),
        pos_w=np.asarray(pos_w, np.int32), seg_ids=np.asarray(seg, np.int32),
        reverse=inv.astype(np.int32))


def _vit_attention(cfg: QwenViTConfig, p, x, cos, sin, mask):
    S = x.shape[0]
    H, D = cfg.num_attention_heads, cfg.head_dim
    q = matmul(x, p["q"]).reshape(S, H, D)
    k = matmul(x, p["k"]).reshape(S, H, D)
    v = matmul(x, p["v"]).reshape(S, H, D)
    q = apply_rope(q[None], cos[None], sin[None])[0]
    k = apply_rope(k[None], cos[None], sin[None])[0]
    scores = jnp.einsum("shd,thd->hst", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (D ** -0.5)
    if mask is not None:
        scores = jnp.where(mask[None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hst,thd->shd", probs.astype(v.dtype), v)
    return matmul(out.reshape(S, H * D), p["o"])


def _vit_mlp(cfg: QwenViTConfig, p, x):
    if cfg.is_youtu:
        h = matmul(x, p["fc0"]).astype(jnp.float32)
        h = jax.nn.gelu(h, approximate=False)
        return matmul(h.astype(x.dtype), p["fc1"])
    if cfg.is_v3:
        h = matmul(x, p["fc0"]).astype(jnp.float32)
        h = jax.nn.gelu(h, approximate=True)        # gelu_pytorch_tanh
        return matmul(h.astype(x.dtype), p["fc1"])
    if cfg.is_v2:
        h = matmul(x, p["fc0"]).astype(jnp.float32)
        h = h * jax.nn.sigmoid(1.702 * h)           # quick_gelu
        return matmul(h.astype(x.dtype), p["fc1"])
    g = matmul(x, p["gate"]).astype(jnp.float32)
    u = matmul(x, p["up"]).astype(jnp.float32)
    return matmul((jax.nn.silu(g) * u).astype(x.dtype), p["down"])


def _vnorm(cfg: QwenViTConfig, x, p):
    if cfg.is_v2 or cfg.is_v3 or cfg.is_youtu:
        return layer_norm(x, p["w"], p.get("b"), eps=cfg.norm_eps)
    return rms_norm(x, p["w"], eps=cfg.norm_eps)


def _bilinear_pos_embed(table, n_side: int, grid_h: int, grid_w: int):
    """Interpolate the [n², hidden] learned pos table onto (grid_h, grid_w)
    in raster order — HF Qwen3VLVisionModel.fast_pos_embed_interpolate
    4-corner bilinear (the reference uses ggml bicubic at
    models/qwen.cpp:2166; HF is the numeric oracle)."""
    h_idx = np.linspace(0, n_side - 1, grid_h)
    w_idx = np.linspace(0, n_side - 1, grid_w)
    hf, wf = h_idx.astype(np.int64), w_idx.astype(np.int64)
    hc = np.clip(hf + 1, 0, n_side - 1)
    wc = np.clip(wf + 1, 0, n_side - 1)
    dh, dw = h_idx - hf, w_idx - wf
    out = 0.0
    for hi, wh in ((hf, 1 - dh), (hc, dh)):
        for wi, ww in ((wf, 1 - dw), (wc, dw)):
            idx = (hi[:, None] * n_side + wi[None, :]).reshape(-1)
            wgt = (wh[:, None] * ww[None, :]).reshape(-1)
            out = out + table[jnp.asarray(idx)] * jnp.asarray(
                wgt, table.dtype)[:, None]
    return out                                       # [grid_h*grid_w, hidden]


def _v3_merge(cfg: QwenViTConfig, p, x, postshuffle: bool):
    """Qwen3VLVisionPatchMerger: norm → m²-concat → fc0 → GELU → fc1
    (postshuffle_norm variant norms AFTER the concat)."""
    m2 = cfg.spatial_merge_size ** 2
    if postshuffle:
        x = x.reshape(x.shape[0] // m2, m2 * cfg.hidden_size)
        x = layer_norm(x, p["norm"]["w"], p["norm"].get("b"), eps=1e-6)
    else:
        x = layer_norm(x, p["norm"]["w"], p["norm"].get("b"), eps=1e-6)
        x = x.reshape(x.shape[0] // m2, m2 * cfg.hidden_size)
    x = matmul(x, p["fc0"]).astype(jnp.float32)
    x = jax.nn.gelu(x, approximate=False)
    return matmul(x, p["fc1"])


def qwen3_vit_forward(cfg: QwenViTConfig, params, frames, layout: GridLayout,
                      grid_h: int, grid_w: int):
    """Qwen3-VL tower (HF Qwen3VLVisionModel; reference
    models/qwen.cpp:2126-2488 v3_vl::vit): dual temporal conv + bias,
    bilinear-interpolated learned pos-embed, full attention with 2-D rope,
    GELU-tanh MLP blocks; returns (merged [n/m², lm_hidden],
    deepstack list of same-shape features tapped at
    cfg.deepstack_visual_indexes)."""
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
    n_side = int(round(cfg.num_position_embeddings ** 0.5))
    x = x + _bilinear_pos_embed(emb["pos"], n_side, grid_h, grid_w)
    x = x[jnp.asarray(layout.perm)]

    cos, sin = vision_rope_cos_sin(jnp.asarray(layout.pos_h),
                                   jnp.asarray(layout.pos_w), cfg.head_dim)
    deepstack = []
    for i, lp in enumerate(params["layers"]):
        x = x + _vit_attention(cfg, lp["attn"], _vnorm(cfg, x, lp["norm1"]),
                               cos, sin, None)
        x = x + _vit_mlp(cfg, lp["mlp"], _vnorm(cfg, x, lp["norm2"]))
        if i in cfg.deepstack_visual_indexes:
            j = cfg.deepstack_visual_indexes.index(i)
            deepstack.append(_v3_merge(cfg, params["ds_mergers"][j], x,
                                       postshuffle=True))
    out = _v3_merge(cfg, params["merger"], x, postshuffle=False)
    rev = jnp.asarray(layout.reverse)
    return out[rev], [d[rev] for d in deepstack]


def load_qwen3_vit_params(pb, cfg: QwenViTConfig, prefix: str = "visual.") -> dict:
    """Weight names per Qwen3VLConverter (convert.py:5707-5828): fused qkv
    split into q/k/v, conv3d split into proj.0/proj.1 + proj.bias."""
    def merger(path):
        return {"norm": pb.norm(path + "norm"),
                "fc0": pb.linear(path + "mlp.fc0", bias=True),
                "fc1": pb.linear(path + "mlp.fc1", bias=True)}

    params = {
        "embed": {
            "proj0": pb.raw_f32(f"{prefix}patch_embed.proj.0.weight"),
            "proj1": pb.raw_f32(f"{prefix}patch_embed.proj.1.weight"),
            "bias": pb.array(f"{prefix}patch_embed.proj.bias"),
            "pos": pb.array(f"{prefix}pos_embed.weight"),
        },
        "merger": merger(f"{prefix}merger."),
        "ds_mergers": tuple(
            merger(f"{prefix}deepstack_merger_list.{i}.")
            for i in range(len(cfg.deepstack_visual_indexes))),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pfx = f"{prefix}blocks.{i}"
        params["layers"].append({
            "norm1": pb.norm(f"{pfx}.norm1", bias=True),
            "norm2": pb.norm(f"{pfx}.norm2", bias=True),
            "attn": {
                "q": pb.linear(f"{pfx}.attn.q_proj", bias=True),
                "k": pb.linear(f"{pfx}.attn.k_proj", bias=True),
                "v": pb.linear(f"{pfx}.attn.v_proj", bias=True),
                "o": pb.linear(f"{pfx}.attn.proj", bias=True),
            },
            "mlp": {"fc0": pb.linear(f"{pfx}.mlp.fc0", bias=True),
                    "fc1": pb.linear(f"{pfx}.mlp.fc1", bias=True)},
        })
    params["layers"] = tuple(params["layers"])
    return params


def qwen_vit_forward(cfg: QwenViTConfig, params, frames, layout: GridLayout,
                     grid_h: int, grid_w: int):
    """frames: [2, grid_h*patch, grid_w*patch, 3] normalized pixels (both
    frames identical for still images) → merged embeddings
    [grid_h*grid_w/m², lm_hidden] in merge-block raster order."""
    p = cfg.patch_size
    emb = params["embed"]

    def pconv(img, w):  # w: [hidden, 3, p, p] (torch layout)
        k = jnp.transpose(jnp.asarray(w), (2, 3, 1, 0))        # HWIO
        y = jax.lax.conv_general_dilated(
            img[None].astype(jnp.float32), k.astype(jnp.float32),
            window_strides=(p, p), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        return y.reshape(grid_h * grid_w, -1)

    x = pconv(frames[0], emb["proj0"]) + pconv(frames[1], emb["proj1"])
    x = x[jnp.asarray(layout.perm)]

    cos, sin = vision_rope_cos_sin(jnp.asarray(layout.pos_h),
                                   jnp.asarray(layout.pos_w), cfg.head_dim)
    seg = jnp.asarray(layout.seg_ids)
    window_mask = seg[:, None] == seg[None, :]
    n_windows = int(layout.seg_ids.max()) + 1

    for i, lp in enumerate(params["layers"]):
        full = cfg.is_v2 or (i in cfg.fullatt_block_indices) or n_windows == 1
        mask = None if full else window_mask
        x = x + _vit_attention(cfg, lp["attn"], _vnorm(cfg, x, lp["norm1"]),
                               cos, sin, mask)
        x = x + _vit_mlp(cfg, lp["mlp"], _vnorm(cfg, x, lp["norm2"]))

    # merger: norm per patch → concat m² patches → GELU MLP → lm hidden
    mg = params["merger"]
    x = _vnorm(cfg, x, mg["ln_q"])
    m2 = cfg.spatial_merge_size ** 2
    x = x.reshape(x.shape[0] // m2, m2 * cfg.hidden_size)
    x = matmul(x, mg["fc0"]).astype(jnp.float32)
    x = jax.nn.gelu(x, approximate=False)
    x = matmul(x, mg["fc1"])
    return x[jnp.asarray(layout.reverse)]


def load_qwen_vit_params(pb, cfg: QwenViTConfig, prefix: str = "visual.") -> dict:
    """Weight names per QWen2_5VLConverter / QWen2_VLConverter
    (convert.py:5099-5131, :5019-5053)."""
    params = {
        "embed": {
            "proj0": pb.raw_f32(f"{prefix}patch_embed.proj.0.weight"),
            "proj1": pb.raw_f32(f"{prefix}patch_embed.proj.1.weight"),
        },
        "merger": {
            "ln_q": pb.norm(f"{prefix}merger.ln_q"),
            "fc0": pb.linear(f"{prefix}merger.mlp.0", bias=True),
            "fc1": pb.linear(f"{prefix}merger.mlp.2", bias=True),
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pfx = f"{prefix}blocks.{i}"
        lp = {
            "norm1": pb.norm(f"{pfx}.norm1"),
            "norm2": pb.norm(f"{pfx}.norm2"),
            "attn": {
                "q": pb.linear(f"{pfx}.attn.q_proj", bias=True),
                "k": pb.linear(f"{pfx}.attn.k_proj", bias=True),
                "v": pb.linear(f"{pfx}.attn.v_proj", bias=True),
                "o": pb.linear(f"{pfx}.attn.proj", bias=True),
            },
        }
        if cfg.is_v2:
            lp["mlp"] = {"fc0": pb.linear(f"{pfx}.mlp.fc1", bias=True),
                         "fc1": pb.linear(f"{pfx}.mlp.fc2", bias=True)}
        else:
            lp["mlp"] = {"gate": pb.linear(f"{pfx}.mlp.gate_proj", bias=True),
                         "up": pb.linear(f"{pfx}.mlp.up_proj", bias=True),
                         "down": pb.linear(f"{pfx}.mlp.down_proj", bias=True)}
        params["layers"].append(lp)
    params["layers"] = tuple(params["layers"])
    return params


# ---------------------------------------------------------------------------
# Youtu-VL tower (reference models/hunyuan.cpp chatllm::hunyuan::youtu::vit
# :1068 — SigLIP2-style: LINEAR patch embedding, LayerNorm + exact-GELU
# blocks, qwen windowed 2-D-rope attention, post-LN, RMS ln_q merger)
# ---------------------------------------------------------------------------

def youtu_vit_forward(cfg: QwenViTConfig, params, patches,
                      layout: GridLayout, grid_h: int, grid_w: int):
    """patches: [grid_h*grid_w, p²·3] flattened normalized patch pixels
    (HWC inside each patch) → merged embeddings [n/m², lm_hidden]."""
    x = matmul(patches, params["embed"]["proj"])
    x = x[jnp.asarray(layout.perm)]

    cos, sin = vision_rope_cos_sin(jnp.asarray(layout.pos_h),
                                   jnp.asarray(layout.pos_w), cfg.head_dim)
    seg = jnp.asarray(layout.seg_ids)
    window_mask = seg[:, None] == seg[None, :]
    n_windows = int(layout.seg_ids.max()) + 1

    for i, lp in enumerate(params["layers"]):
        full = (i in cfg.fullatt_block_indices) or n_windows == 1
        mask = None if full else window_mask
        x = x + _vit_attention(cfg, lp["attn"], _vnorm(cfg, x, lp["norm1"]),
                               cos, sin, mask)
        x = x + _vit_mlp(cfg, lp["mlp"], _vnorm(cfg, x, lp["norm2"]))

    x = layer_norm(x, params["post_norm"]["w"], params["post_norm"].get("b"),
                   eps=cfg.norm_eps)
    mg = params["merger"]
    x = rms_norm(x, mg["ln_q"]["w"], eps=cfg.norm_eps)
    m2 = cfg.spatial_merge_size ** 2
    x = x.reshape(x.shape[0] // m2, m2 * cfg.hidden_size)
    x = matmul(x, mg["fc0"]).astype(jnp.float32)
    x = jax.nn.gelu(x, approximate=False)
    x = matmul(x, mg["fc1"])
    return x[jnp.asarray(layout.reverse)]


def load_youtu_vit_params(pb, cfg: QwenViTConfig,
                          prefix: str = "visual.") -> dict:
    """Weight names per YoutuVLConverter (convert.py:10046: siglip2
    encoder → visual.layers.*, fc1/fc2 → fc0/fc1, out_proj → o_proj)."""
    params = {
        "embed": {"proj": pb.linear(f"{prefix}embeddings.patch_embedding",
                                    bias=True)},
        "post_norm": pb.norm(f"{prefix}post_layernorm"),
        "merger": {
            "ln_q": pb.norm("merger.ln_q"),
            "fc0": pb.linear("merger.mlp.0", bias=True),
            "fc1": pb.linear("merger.mlp.2", bias=True),
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pfx = f"{prefix}layers.{i}"
        params["layers"].append({
            "norm1": pb.norm(f"{pfx}.layer_norm1", bias=True),
            "norm2": pb.norm(f"{pfx}.layer_norm2", bias=True),
            "attn": {n: pb.linear(f"{pfx}.self_attn.{n}_proj", bias=True)
                     for n in ("q", "k", "v", "o")},
            "mlp": {"fc0": pb.linear(f"{pfx}.mlp.fc0", bias=True),
                    "fc1": pb.linear(f"{pfx}.mlp.fc1", bias=True)},
        })
    params["layers"] = tuple(params["layers"])
    return params


# ---------------------------------------------------------------------------
# Penguin-VL tower (reference models/hunyuan.cpp
# chatllm::hunyuan::penguin::vit :1591 — conv patch embed, RMSNorm blocks,
# GQA attention with per-head qk RMS-norm and the model's own "wrong" 2-D
# rope: pairs j<d/4 take the h angle, j≥d/4 the w angle, frequencies
# continuing across the boundary; per-patch GELU readout, NO merging)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PenguinViTConfig:
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    intermediate_size: int
    head_dim: int
    out_hidden_size: int
    patch_size: int = 16
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5


def penguin_2d_rope_cos_sin(grid_h: int, grid_w: int, head_dim: int,
                            freq_base: float):
    """[S, d/2] tables in ROPE_NORMAL pair layout: pair j < d/4 rotates by
    pos_h·f_j, pair j ≥ d/4 by pos_w·f_j with f_j = base^(-2j/d) NOT
    restarting at the boundary (hunyuan.cpp:1690 'wrong implementation'
    reproduced deliberately — concat of half of rope(pos_h) with half of
    rope(pos_w))."""
    half = head_dim // 2
    inv = np.power(freq_base, -2.0 * np.arange(half) / head_dim)
    hh, ww = np.meshgrid(np.arange(grid_h), np.arange(grid_w), indexing="ij")
    pos_h = hh.reshape(-1, 1).astype(np.float64)
    pos_w = ww.reshape(-1, 1).astype(np.float64)
    q = half // 2
    theta = np.concatenate([pos_h * inv[None, :q], pos_w * inv[None, q:]],
                           axis=-1)
    return jnp.cos(jnp.asarray(theta, jnp.float32)), \
        jnp.sin(jnp.asarray(theta, jnp.float32))


def penguin_vit_forward(cfg: PenguinViTConfig, params, image, grid_h: int,
                        grid_w: int):
    """image: [grid_h*patch, grid_w*patch, 3] normalized pixels →
    per-patch features [grid_h*grid_w, out_hidden] (no merge —
    hunyuan.cpp:1862 'merge by interpolation TODO')."""
    from ..ops.rope import ROPE_NORMAL

    p = cfg.patch_size
    k = jnp.transpose(jnp.asarray(params["embed"]["w"]), (2, 3, 1, 0))
    x = jax.lax.conv_general_dilated(
        image[None].astype(jnp.float32), k.astype(jnp.float32),
        window_strides=(p, p), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    x = x.reshape(grid_h * grid_w, -1) + params["embed"]["b"][None, :]

    cos, sin = penguin_2d_rope_cos_sin(grid_h, grid_w, cfg.head_dim,
                                       cfg.rope_theta)
    S = x.shape[0]
    H, KV, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                cfg.head_dim)
    for lp in params["layers"]:
        h = rms_norm(x, lp["norm1"]["w"], eps=cfg.norm_eps)
        q = matmul(h, lp["attn"]["q"]).reshape(S, H, D)
        kk = matmul(h, lp["attn"]["k"]).reshape(S, KV, D)
        v = matmul(h, lp["attn"]["v"]).reshape(S, KV, D)
        q = rms_norm(q, lp["attn"]["q_norm"], eps=cfg.norm_eps)
        kk = rms_norm(kk, lp["attn"]["k_norm"], eps=cfg.norm_eps)
        q = apply_rope(q[None], cos[None], sin[None], layout=ROPE_NORMAL)[0]
        kk = apply_rope(kk[None], cos[None], sin[None], layout=ROPE_NORMAL)[0]
        rep = H // KV
        kk = jnp.repeat(kk, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
        scores = jnp.einsum("shd,thd->hst", q.astype(jnp.float32),
                            kk.astype(jnp.float32)) * (D ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("hst,thd->shd", probs.astype(v.dtype), v)
        x = x + matmul(out.reshape(S, H * D), lp["attn"]["o"])
        h = rms_norm(x, lp["norm2"]["w"], eps=cfg.norm_eps)
        g = matmul(h, lp["mlp"]["gate"]).astype(jnp.float32)
        u = matmul(h, lp["mlp"]["up"]).astype(jnp.float32)
        x = x + matmul((jax.nn.silu(g) * u).astype(x.dtype),
                       lp["mlp"]["down"])

    x = rms_norm(x, params["post_norm"]["w"], eps=cfg.norm_eps)
    x = matmul(x, params["readout"]["fc0"]).astype(jnp.float32)
    x = jax.nn.gelu(x, approximate=False)
    return matmul(x.astype(jnp.float32), params["readout"]["fc1"])


def load_penguin_vit_params(pb, cfg: PenguinViTConfig,
                            prefix: str = "visual.") -> dict:
    """Weight names per PenguinVLConverter (convert.py:10115)."""
    params = {
        "embed": {"w": pb.raw_f32(f"{prefix}embeddings.patch_embedding.weight"),
                  "b": pb.array(f"{prefix}embeddings.patch_embedding.bias")},
        "post_norm": pb.norm(f"{prefix}norm"),
        "readout": {
            "fc0": pb.linear("vision_projector.readout.0", bias=True),
            "fc1": pb.linear("vision_projector.readout.2", bias=True),
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pfx = f"{prefix}layers.{i}"
        params["layers"].append({
            "norm1": pb.norm(f"{pfx}.input_layernorm"),
            "norm2": pb.norm(f"{pfx}.post_attention_layernorm"),
            "attn": {
                "q": pb.linear(f"{pfx}.self_attn.q_proj", bias=False),
                "k": pb.linear(f"{pfx}.self_attn.k_proj", bias=False),
                "v": pb.linear(f"{pfx}.self_attn.v_proj", bias=False),
                "o": pb.linear(f"{pfx}.self_attn.o_proj", bias=False),
                "q_norm": pb.array(f"{pfx}.self_attn.q_norm.weight"),
                "k_norm": pb.array(f"{pfx}.self_attn.k_norm.weight"),
            },
            "mlp": {"gate": pb.linear(f"{pfx}.mlp.gate_proj", bias=False),
                    "up": pb.linear(f"{pfx}.mlp.up_proj", bias=False),
                    "down": pb.linear(f"{pfx}.mlp.down_proj", bias=False)},
        })
    params["layers"] = tuple(params["layers"])
    return params
