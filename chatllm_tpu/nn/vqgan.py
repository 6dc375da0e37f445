"""VQ-GAN ("VQ-16") image decoder for Janus-Pro image generation
(reference /root/reference/models/janus.cpp: VectorQuantizer:158,
AttnBlock:194, ResnetBlock:264, Upsample:323, Decoder:402, VQModel:494).

Layout is NHWC throughout (TPU-native conv layout; each conv is one
`lax.conv_general_dilated` on the MXU).  Weights come from the GGMM file
under `gen_vision_model.` with the reference converter's renames
(.q./.k./.v./.proj_out. → *_proj, convert.py:9366).

Decoder structure (VQ-16, ch=128, ch_mult=[1,1,2,2,4], z=256):
codes → codebook lookup (l2-normalized) → [B,24,24,8] → post_quant_conv 1x1
→ conv_in 3x3 → mid(res, attn, res) → 5 conv_blocks (3 res each; attn at the
deepest; nearest-2x upsample + conv between levels) → GroupNorm → swish →
conv_out → [B,384,384,3].
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

NORM_EPS = 1e-6


def spatial_group_norm(x, w, b, groups: int = 32, eps: float = NORM_EPS):
    """torch GroupNorm semantics on NHWC: stats over (H, W, C/groups)."""
    B, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(B, H, W, groups, C // groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(B, H, W, C)
    return y * w.astype(jnp.float32) + b.astype(jnp.float32)


def conv2d(x, p, stride: int = 1):
    """p: {"w": [kh, kw, in, out], "b": [out]} (repacked at load)."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), p["w"].astype(jnp.float32),
        window_strides=(stride, stride),
        padding="SAME" if p["w"].shape[0] > 1 else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def _swish(x):
    return x * jax.nn.sigmoid(x)


def resnet_block(p, x):
    h = spatial_group_norm(x, p["norm1"]["w"], p["norm1"]["b"])
    h = conv2d(_swish(h), p["conv1"])
    h = spatial_group_norm(h, p["norm2"]["w"], p["norm2"]["b"])
    h = conv2d(_swish(h), p["conv2"])
    if "nin_shortcut" in p:
        x = conv2d(x, p["nin_shortcut"])
    return x + h


def attn_block(p, x):
    """Single-head attention over spatial positions (janus.cpp AttnBlock:194)."""
    B, H, W, C = x.shape
    h = spatial_group_norm(x, p["norm"]["w"], p["norm"]["b"])
    q = conv2d(h, p["q"]).reshape(B, H * W, C)
    k = conv2d(h, p["k"]).reshape(B, H * W, C)
    v = conv2d(h, p["v"]).reshape(B, H * W, C)
    scores = jnp.einsum("bnc,bmc->bnm", q, k) * (C ** -0.5)
    pr = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bnm,bmc->bnc", pr, v).reshape(B, H, W, C)
    return x + conv2d(o, p["o"])


def upsample(p, x):
    B, H, W, C = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)   # nearest 2x
    if "conv" in p:
        x = conv2d(x, p["conv"])
    return x


def decoder_forward(params, z):
    """z: [B, h, w, z_channels] → [B, h*2^(levels-1), ..., 3]."""
    h = conv2d(z, params["conv_in"])
    h = resnet_block(params["mid"][0], h)
    h = attn_block(params["mid"][1], h)
    h = resnet_block(params["mid"][2], h)
    for blk in params["conv_blocks"]:
        for j, rp in enumerate(blk["res"]):
            h = resnet_block(rp, h)
            if "attn" in blk:
                h = attn_block(blk["attn"][j], h)
        if "upsample" in blk:
            h = upsample(blk["upsample"], h)
    h = spatial_group_norm(h, params["norm_out"]["w"], params["norm_out"]["b"])
    h = _swish(h)
    return conv2d(h, params["conv_out"])


def vq_decode(params, codes, grid_hw):
    """codes [B, N] int32 image-token ids → images [B, H, W, 3] in [0, 1]
    (janus.cpp VQModel::decode_code:500 + the (x+1)/2 rescale at :893)."""
    gh, gw = grid_hw
    emb = params["codebook"][codes]                       # [B, N, e_dim]
    if params.get("l2_norm", True):
        from ..ops.norm import l2_norm

        emb = l2_norm(emb, eps=NORM_EPS)
    B = emb.shape[0]
    z = emb.reshape(B, gh, gw, emb.shape[-1])
    z = conv2d(z, params["post_quant_conv"])
    img = decoder_forward(params["decoder"], z)
    return jnp.clip((img + 1.0) * 0.5, 0.0, 1.0)


# ---------------------------------------------------------------------------
def load_vq_decoder(pb, *, prefix: str = "gen_vision_model.",
                    num_res_blocks: int = 2) -> dict:
    """Read the decoder half of the VQ model from a GGMM file (converter
    names, convert.py:9485-9520: conv_blocks.0 is the DEEPEST level).
    The level count is probed from the file so VQ-16 (5 levels) and tiny
    test models both load."""

    def cv(name):
        w = pb.raw_f32(f"{prefix}{name}.weight")
        if w.ndim == 2:      # 1x1 conv stored [out, in]
            w = w[None, None].transpose(0, 1, 3, 2)
        else:                # [out, in, kh, kw] -> [kh, kw, in, out]
            w = np.transpose(w, (2, 3, 1, 0))
        return {"w": jnp.asarray(w),
                "b": pb.array(f"{prefix}{name}.bias")}

    def nm(name):
        return {"w": pb.array(f"{prefix}{name}.weight"),
                "b": pb.array(f"{prefix}{name}.bias")}

    def res(name):
        p = {"norm1": nm(f"{name}.norm1"), "conv1": cv(f"{name}.conv1"),
             "norm2": nm(f"{name}.norm2"), "conv2": cv(f"{name}.conv2")}
        if pb.has(f"{prefix}{name}.nin_shortcut.weight"):
            p["nin_shortcut"] = cv(f"{name}.nin_shortcut")
        return p

    def attn(name):
        return {"norm": nm(f"{name}.norm"), "q": cv(f"{name}.q_proj"),
                "k": cv(f"{name}.k_proj"), "v": cv(f"{name}.v_proj"),
                "o": cv(f"{name}.o_proj")}

    dec = {
        "conv_in": cv("decoder.conv_in"),
        "mid": [res("decoder.mid.0"), attn("decoder.mid.1"),
                res("decoder.mid.2")],
        "norm_out": nm("decoder.norm_out"),
        "conv_out": cv("decoder.conv_out"),
        "conv_blocks": [],
    }
    n_levels = 0
    while pb.has(f"{prefix}decoder.conv_blocks.{n_levels}.res.0.conv1.weight"):
        n_levels += 1
    for i in range(n_levels):
        pfx = f"decoder.conv_blocks.{i}"
        blk = {"res": [res(f"{pfx}.res.{j}") for j in range(num_res_blocks + 1)]}
        if i == 0:   # deepest level carries attention
            blk["attn"] = [attn(f"{pfx}.attn.{j}")
                           for j in range(num_res_blocks + 1)]
        if pb.has(f"{prefix}{pfx}.upsample.conv.weight"):
            blk["upsample"] = {"conv": cv(f"{pfx}.upsample.conv")}
        dec["conv_blocks"].append(blk)

    return {
        "codebook": pb.array(f"{prefix}quantize.embedding.weight"),
        "l2_norm": True,
        "post_quant_conv": cv("post_quant_conv"),
        "decoder": dec,
    }
