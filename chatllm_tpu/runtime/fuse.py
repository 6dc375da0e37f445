"""Load-time weight-stream fusion for the decode path.

Batched decode is bandwidth-bound on the weight pass (BASELINE.md B=32
composite model).  Fusing the per-layer projections that share an input —
q|k|v after attn_norm, gate|up after ffn_norm — into single [in, q0+..]
tensors turns 5 weight streams per layer into 2 contiguous ones: fewer
kernel dispatches, longer DMA bursts, and one activation read instead of
N.  The forward path already understands the fused keys ("qkv",
nn/transformer.py attention_block — reference BaseConsolidatedQKVAttention
src/layers.h:1773; "gate_up", gated_mlp — reference GLM2MLP
src/layers.h:1079), so fusion is a pure parameter transform: each output
column's dot product is mathematically unchanged, only the column order of
the concatenated weight matrix is new.  (Not necessarily BIT-identical —
XLA may tile a wider dot differently, reordering the f32 accumulation;
tests assert tight allclose + token-exact generation.)

Applies to unsharded engines only — the fused halves straddle TP shard
boundaries (tp_param_sharding has no specs for the fused keys, so a meshed
engine would replicate them; callers gate on `mesh is None`).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..nn.transformer import TransformerConfig
from ..ops.qtensor import DenseLinear, QuantLinear


def _concat_out(lins):
    """Concatenate linear layers along the OUTPUT dim.  All layers must
    share the input dim and (for QuantLinear) the quant format.  Returns
    None when the layers are not fusable (mixed classes/formats)."""
    if all(isinstance(l, DenseLinear) for l in lins):
        if len({l.w.shape[0] for l in lins}) != 1:
            return None
        if len({str(l.w.dtype) for l in lins}) != 1:
            return None
        w = jnp.concatenate([l.w for l in lins], axis=1)
        bias = None
        if any(l.bias is not None for l in lins):
            bias = jnp.concatenate(
                [l.bias if l.bias is not None
                 else jnp.zeros((l.w.shape[1],), jnp.float32)
                 for l in lins], axis=0)
        return DenseLinear(w=w, bias=bias)
    if not all(isinstance(l, QuantLinear) for l in lins):
        return None
    ref = lins[0]
    for l in lins[1:]:
        if (l.q.shape[0] != ref.q.shape[0]
                or l.group_size != ref.group_size or l.packed != ref.packed
                or l.zero_point != ref.zero_point or l.sb != ref.sb
                or (l.b is None) != (ref.b is None)
                or (l.d is None) != (ref.d is None)
                or l.q.dtype != ref.q.dtype or l.s.dtype != ref.s.dtype):
            return None
    cat = lambda xs: jnp.concatenate(xs, axis=1)
    bias = None
    if any(l.bias is not None for l in lins):
        bias = jnp.concatenate(
            [l.bias if l.bias is not None
             else jnp.zeros((l.q.shape[1],), jnp.float32)
             for l in lins], axis=0)
    return QuantLinear(
        q=cat([l.q for l in lins]),
        s=cat([l.s for l in lins]),
        b=cat([l.b for l in lins]) if ref.b is not None else None,
        bias=bias,
        group_size=ref.group_size, packed=ref.packed,
        zero_point=ref.zero_point,
        d=cat([l.d for l in lins]) if ref.d is not None else None,
        dm=cat([l.dm for l in lins]) if ref.dm is not None else None,
        sb=ref.sb)


def fuse_decode_streams(cfg: TransformerConfig, params: dict) -> dict:
    """Fuse q|k|v -> "qkv" and gate|up -> "gate_up" wherever the layer
    shape allows; layers that don't qualify are left untouched.  Safe on
    any params tree — unknown structures pass through unchanged."""
    if not isinstance(params, dict) or "layers" not in params:
        return params
    out = dict(params)
    layers = []
    for i, lp in enumerate(params["layers"]):
        spec = cfg.layer_spec(i)
        lp = dict(lp)
        attn = lp.get("attn")
        if (isinstance(attn, dict)
                and all(k in attn for k in ("q", "k", "v"))
                and not spec.v_from_k and spec.shared_kv_from < 0
                and not spec.linear_attn and cfg.mla is None
                # per-head q/k norms split BEFORE the norm — fused path
                # handles them identically (split happens first), but
                # rope-free / exotic layouts keep the plain path for
                # debuggability; fuse only the standard shapes
                and cfg.qk_norm in ("none", "rmsnorm", "rmsnorm_post",
                                    "l2norm_post")):
            fused = _concat_out([attn["q"], attn["k"], attn["v"]])
            if fused is not None:
                attn = {k: v for k, v in attn.items()
                        if k not in ("q", "k", "v")}
                attn["qkv"] = fused
                lp["attn"] = attn
        mlp = lp.get("mlp")
        if (isinstance(mlp, dict) and "gate" in mlp and "up" in mlp
                and "experts" not in mlp and not spec.is_moe
                and "gate_up" not in mlp
                # gated_mlp splits the fused output at the midpoint
                and mlp["gate"].shape_in_out[1] == mlp["up"].shape_in_out[1]):
            fused = _concat_out([mlp["gate"], mlp["up"]])
            if fused is not None:
                mlp = {k: v for k, v in mlp.items()
                       if k not in ("gate", "up")}
                mlp["gate_up"] = fused
                lp["mlp"] = mlp
        layers.append(lp)
    out["layers"] = tuple(layers)
    return out
