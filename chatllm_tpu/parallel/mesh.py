"""Mesh construction + parameter/cache sharding rules.

Tensor-parallel layout (the standard Megatron-style sharding, expressed as
GSPMD annotations rather than explicit collectives — "pick a mesh, annotate
shardings, let XLA insert collectives"):

  - q/k/v projections: output (head) dim sharded over "tp"
  - o projection:      input dim sharded  (psum inserted by XLA after it)
  - mlp gate/up:       output dim sharded
  - mlp down:          input dim sharded
  - MoE experts:       expert dim sharded over "tp" (expert parallelism)
  - embed / norms:     replicated
  - lm_head:           vocab (output) dim sharded
  - KV cache:          kv-head dim sharded over "tp"
  - batch dims:        sharded over "dp" when present

QuantLinear shards q/s/b along the same logical dim (group axis follows the
`in` axis).  DenseLinear stores w as [in, out], so "output sharding" is dim 1.
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.qtensor import DenseLinear, QuantLinear


def make_mesh(tp: int = -1, dp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh.  tp=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp <= 0:
        tp = n // dp
    assert dp * tp <= n, f"mesh {dp}x{tp} > {n} devices"
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def describe_devices() -> str:
    """--show_devices analog (/root/reference/src/main.cpp:1326)."""
    lines = []
    for d in jax.devices():
        mem = getattr(d, "memory_stats", lambda: None)()
        total = mem.get("bytes_limit", 0) / 2**30 if mem else 0.0
        lines.append(f"{d.id}: {d.platform}:{d.device_kind} "
                     f"(process {d.process_index}) mem={total:.1f}GiB")
    return "\n".join(lines)


def _linear_spec(lin, shard_dim: str, tp: int = 0):
    """Build the matching sharding pytree for one linear layer.
    shard_dim: 'out' | 'in' | 'expert' | 'none'.  `tp` (when known) lets
    row-sharded superblock d/dm arrays fall back to replication when their
    row count (in/(G*sb)) doesn't divide — only reachable on toy shapes,
    where the XLA path handles the matmul anyway."""
    # both layouts are [in, out] (QuantLinear: q [in,out], s/b [in//G,out])
    if shard_dim == "out":
        ws = P(None, "tp")
        bias = P("tp")
    elif shard_dim == "in":
        ws = P("tp", None)
        bias = P()
    else:
        ws = P(None, None)
        bias = P()
    if isinstance(lin, QuantLinear):
        dspec = ws
        if (shard_dim == "in" and lin.d is not None and tp
                and lin.d.shape[0] % tp):
            dspec = P(None, None)
        return QuantLinear(
            q=ws, s=ws,
            b=None if lin.b is None else ws,
            bias=None if lin.bias is None else bias,
            group_size=lin.group_size, packed=lin.packed,
            zero_point=lin.zero_point,
            d=None if lin.d is None else dspec,
            dm=None if lin.dm is None else dspec, sb=lin.sb)
    if isinstance(lin, DenseLinear):
        return DenseLinear(w=ws, bias=None if lin.bias is None else bias)
    raise TypeError(type(lin))


def _norm_spec(p: dict) -> dict:
    return {k: P(None) for k in p}


def tp_param_sharding(params: dict, tp: int = 0) -> dict:
    """PartitionSpec pytree matching a llama-family param tree."""
    spec = {"embed": P(None, None)}
    if "lm_head" in params:
        spec["lm_head"] = _linear_spec(params["lm_head"], "out", tp)
    spec["final_norm"] = _norm_spec(params["final_norm"])
    layers = []
    for lp in params["layers"]:
        ls = {}
        for key, sub in lp.items():
            if key == "attn":
                a = {}
                for k2, v2 in sub.items():
                    if k2 in ("q", "k", "v"):
                        a[k2] = _linear_spec(v2, "out", tp)
                    elif k2 == "o":
                        a[k2] = _linear_spec(v2, "in", tp)
                    elif k2 in ("q_norm", "k_norm"):
                        a[k2] = _norm_spec(v2)
                    else:  # sinks etc: per-head vectors shard over tp
                        a[k2] = P("tp")
                ls[key] = a
            elif key == "mlp":
                m = {}
                for k2, v2 in sub.items():
                    if k2 == "experts":
                        # stacked dense experts [E, ...]: expert-parallel
                        m[k2] = {n: P("tp", None, None) for n in v2}
                    elif k2 == "shared":
                        m[k2] = {"gate": _linear_spec(v2["gate"], "out", tp),
                                 "up": _linear_spec(v2["up"], "out", tp),
                                 "down": _linear_spec(v2["down"], "in", tp)}
                    elif k2 in ("up", "gate"):
                        m[k2] = _linear_spec(v2, "out", tp)
                    elif k2 == "down":
                        m[k2] = _linear_spec(v2, "in", tp)
                    else:
                        m[k2] = _linear_spec(v2, "none", tp)
                # router gate of a MoE layer must be replicated
                if "experts" in sub:
                    m["gate"] = _linear_spec(sub["gate"], "none", tp)
                ls[key] = m
            else:  # norms
                ls[key] = _norm_spec(sub)
        layers.append(ls)
    spec["layers"] = tuple(layers)
    return spec


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place a param tree onto the mesh with TP sharding."""
    spec = tp_param_sharding(params, tp=mesh.shape.get("tp", 1))

    def place(x, s):
        return jax.device_put(x, NamedSharding(mesh, s))

    # tree.map flattens `spec` up to the leaf structure of `params`, so the
    # PartitionSpec tuples are kept whole at array positions.
    return jax.tree.map(place, params, spec)


def cache_spec() -> P:
    # [B, S, H_kv, D]: batch over dp, kv heads over tp
    return P("dp", None, "tp", None)


def shard_cache(cache, mesh: Mesh):
    from ..nn.transformer import KVCache

    sh = NamedSharding(mesh, cache_spec())
    return KVCache(
        k=tuple(jax.device_put(k, sh) for k in cache.k),
        v=tuple(jax.device_put(v, sh) for v in cache.v),
    )
