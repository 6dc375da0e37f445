"""VERDICT r4 #2: attack the q8-KV B=32 attention residual with a
[B, H, S, D]-logical cache.

Finding behind this experiment (q8_hlo_probe2.py): with the production
[B, S, H, D] cache, XLA's layout assignment keeps the scan-carried int8
cache in {3,1,2,0} — PHYSICALLY [B, H, S, D] — and the einsum consumes it
natively; the relayout copies live only at jit entry/exit (~2%/step).  The
q8 residual is the attention fusion itself (~150 GB/s effective on the
int8 stream vs ~250 GB/s for the bf16 path).  A cache that is [B, H, S, D]
LOGICALLY makes the row-major default equal XLA's preferred physical
layout, so a pallas kernel gets contiguous [block_k, D] tiles with NO
relayout — the thing that killed the kernel at B>=8 in round 4.

Variants (8B q4k llama shape, minimal local forward):
  einsum_bshd   — production attention semantics (baseline cross-check)
  einsum_bhsd   — XLA einsum over the bhsd cache
  pallas_bhsd   — per-(b,h) flash-decode kernel, in-kernel int8 reads
per cache dtype in {bfloat16, q8_0}.

Usage: python experiments/bhsd_decode.py [B] [ctx] [steps]
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chatllm_tpu.models.synthetic import build_synthetic_params, llama3_8b_config
from chatllm_tpu.ops.qmm import matmul
from chatllm_tpu.ops.attention import quantize_kv
from chatllm_tpu.ops.pallas.flash_decode import _decode_kernel
from chatllm_tpu.ops.rope import apply_rope, precompute_rope_cache

NEG_INF = -1e30


def rmsnorm(x, w, eps=1e-5):
    xf = x.astype(jnp.float32)
    v = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(v + eps) * w).astype(x.dtype)


def pallas_decode_bhsd(q, k_cache, v_cache, n_past, *, scale,
                       k_scale=None, v_scale=None, block_k=512):
    """q [B,T,Hq,D]; caches [B,Hkv,S,D(v)]; scales [B,Hkv,S]."""
    B, T, Hq, D = q.shape
    Hkv, S = k_cache.shape[1], k_cache.shape[2]
    Dv = v_cache.shape[-1]
    G = Hq // Hkv
    n_kv_blocks = S // block_k
    quantized = k_scale is not None
    R = G * T
    Rp = max(8, -(-R // 8) * 8)
    qt = jnp.transpose(q.reshape(B, T, Hkv, G, D).astype(jnp.float32),
                       (0, 2, 3, 1, 4)).reshape(B, Hkv, R, D)
    if Rp != R:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Rp - R), (0, 0)))
    if quantized:
        kst = k_scale.astype(jnp.float32).reshape(B * Hkv, 1, S)
        vst = v_scale.astype(jnp.float32).reshape(B * Hkv, 1, S)
    else:
        kst = jnp.zeros((B * Hkv, 1, block_k), jnp.float32)
        vst = kst
    sk = jnp.zeros((Hkv, Rp, 1), jnp.float32)
    np_vec = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1), (B,))
    nt = jnp.asarray(T, jnp.int32).reshape(1)

    kernel = functools.partial(
        _decode_kernel, scale=scale, sliding_window=0, logit_softcap=0.0,
        block_k=block_k, n_kv_blocks=n_kv_blocks, T=T, quantized=quantized,
        has_sinks=False)
    out = pl.pallas_call(
        kernel,
        grid=(B, Hkv, n_kv_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Rp, D), lambda b, h, ki: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, Dv), lambda b, h, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k),
                         (lambda b, h, ki, H=Hkv: (b * H + h, 0, ki))
                         if quantized else (lambda b, h, ki: (0, 0, 0))),
            pl.BlockSpec((1, 1, block_k),
                         (lambda b, h, ki, H=Hkv: (b * H + h, 0, ki))
                         if quantized else (lambda b, h, ki: (0, 0, 0))),
            pl.BlockSpec((1, Rp, 1), lambda b, h, ki: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, Rp, Dv), lambda b, h, ki: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Rp, Dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((Rp, Dv), jnp.float32),
            pltpu.VMEM((Rp, 128), jnp.float32),
            pltpu.VMEM((Rp, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(np_vec, nt, qt, k_cache, v_cache, kst, vst, sk)
    out = out[:, :, :R].reshape(B, Hkv, G, T, Dv)
    return jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(B, T, Hq, Dv)


def einsum_decode(q, k_cache, v_cache, n_past, *, scale, layout,
                  k_scale=None, v_scale=None):
    B, T, Hq, D = q.shape
    if layout == "bshd":
        sub_k, sub_v = "bthgd,bshd->bhgts", "bhgts,bshd->bthgd"
        S, Hkv = k_cache.shape[1], k_cache.shape[2]
        tr = lambda sc: sc.transpose(0, 2, 1)[:, :, None, None, :]
    else:
        sub_k, sub_v = "bthgd,bhsd->bhgts", "bhgts,bhsd->bthgd"
        Hkv, S = k_cache.shape[1], k_cache.shape[2]
        tr = lambda sc: sc[:, :, None, None, :]
    G = Hq // Hkv
    qg = q.reshape(B, T, Hkv, G, D).astype(jnp.float32)
    bf16 = lambda a: a.astype(jnp.bfloat16)
    scores = jnp.einsum(sub_k, bf16(qg), bf16(k_cache),
                        preferred_element_type=jnp.float32) * scale
    if k_scale is not None:
        scores = scores * tr(k_scale)
    q_pos = n_past + jnp.arange(T)[:, None]
    k_pos = jnp.arange(S)[None, :]
    valid = (k_pos < (n_past + T)) & (k_pos <= q_pos)
    scores = scores + jnp.where(valid, 0.0, NEG_INF)[None, None, None]
    p = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        p = p * tr(v_scale)
    out = jnp.einsum(sub_v, bf16(p), bf16(v_cache),
                     preferred_element_type=jnp.float32)
    return out.reshape(B, T, Hq, v_cache.shape[-1]).astype(q.dtype)


def forward(cfg, params, tok, caches, n_past, *, variant, cache_q8):
    """Minimal llama decode step.  caches: list of (k, v[, ks, vs])."""
    H = cfg.hidden_size
    d = cfg.rope.head_dim
    Hq, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    x = params["embed"][tok[:, 0]][:, None, :]        # [B,1,H]
    B, T = x.shape[:2]
    new_caches = []
    for li, lp in enumerate(params["layers"]):
        h = rmsnorm(x, lp["attn_norm"]["w"])
        a = lp["attn"]
        qp = matmul(h, a["q"]).reshape(B, T, Hq, d)
        kp = matmul(h, a["k"]).reshape(B, T, Hkv, d)
        vp = matmul(h, a["v"]).reshape(B, T, Hkv, d)
        cos, sin = precompute_rope_cache(n_past + jnp.arange(T), cfg.rope)
        qp = apply_rope(qp, cos, sin, layout=cfg.rope.layout)
        kp = apply_rope(kp, cos, sin, layout=cfg.rope.layout)
        c = caches[li]
        if variant == "no_attn":
            # weights-only floor: projections still stream, attention skipped
            new_caches.append(c)
            attn = qp + jnp.mean(kp, axis=2, keepdims=True) \
                + jnp.mean(vp, axis=2, keepdims=True)
        elif variant == "noscale":
            # int8 cache read + convert, but no scale multiplies: isolates
            # the convert cost from the scale-fold cost
            kq, ks1 = quantize_kv(kp)
            vq, vs1 = quantize_kv(vp)
            kc = jax.lax.dynamic_update_slice(c[0], kq, (0, n_past, 0, 0))
            vc = jax.lax.dynamic_update_slice(c[1], vq, (0, n_past, 0, 0))
            ks = jax.lax.dynamic_update_slice(c[2], ks1, (0, n_past, 0))
            vs = jax.lax.dynamic_update_slice(c[3], vs1, (0, n_past, 0))
            new_caches.append((kc, vc, ks, vs))
            attn = einsum_decode(qp, kc, vc, n_past, scale=d ** -0.5,
                                 layout="bshd")
        elif variant == "einsum_bshd":
            kc, vc = c[0], c[1]
            if cache_q8:
                kq, ks1 = quantize_kv(kp)
                vq, vs1 = quantize_kv(vp)
                kc = jax.lax.dynamic_update_slice(kc, kq, (0, n_past, 0, 0))
                vc = jax.lax.dynamic_update_slice(vc, vq, (0, n_past, 0, 0))
                ks = jax.lax.dynamic_update_slice(c[2], ks1, (0, n_past, 0))
                vs = jax.lax.dynamic_update_slice(c[3], vs1, (0, n_past, 0))
                new_caches.append((kc, vc, ks, vs))
                attn = einsum_decode(qp, kc, vc, n_past, scale=d ** -0.5,
                                     layout="bshd", k_scale=ks, v_scale=vs)
            else:
                kc = jax.lax.dynamic_update_slice(
                    kc, kp.astype(kc.dtype), (0, n_past, 0, 0))
                vc = jax.lax.dynamic_update_slice(
                    vc, vp.astype(vc.dtype), (0, n_past, 0, 0))
                new_caches.append((kc, vc))
                attn = einsum_decode(qp, kc, vc, n_past, scale=d ** -0.5,
                                     layout="bshd")
        else:
            # bhsd cache: [B,Hkv,S,D]; write at (:, :, n_past, :)
            kw = jnp.transpose(kp, (0, 2, 1, 3))      # [B,Hkv,T,D]
            vw = jnp.transpose(vp, (0, 2, 1, 3))
            kc, vc = c[0], c[1]
            if cache_q8:
                kq, ks1 = quantize_kv(kw)             # scale [B,Hkv,T]
                vq, vs1 = quantize_kv(vw)
                kc = jax.lax.dynamic_update_slice(kc, kq, (0, 0, n_past, 0))
                vc = jax.lax.dynamic_update_slice(vc, vq, (0, 0, n_past, 0))
                ks = jax.lax.dynamic_update_slice(c[2], ks1, (0, 0, n_past))
                vs = jax.lax.dynamic_update_slice(c[3], vs1, (0, 0, n_past))
                new_caches.append((kc, vc, ks, vs))
                if variant == "pallas_bhsd":
                    attn = pallas_decode_bhsd(qp, kc, vc, n_past,
                                              scale=d ** -0.5,
                                              k_scale=ks, v_scale=vs)
                else:
                    attn = einsum_decode(qp, kc, vc, n_past, scale=d ** -0.5,
                                         layout="bhsd", k_scale=ks, v_scale=vs)
            else:
                kc = jax.lax.dynamic_update_slice(
                    kc, kw.astype(kc.dtype), (0, 0, n_past, 0))
                vc = jax.lax.dynamic_update_slice(
                    vc, vw.astype(vc.dtype), (0, 0, n_past, 0))
                new_caches.append((kc, vc))
                if variant == "pallas_bhsd":
                    attn = pallas_decode_bhsd(qp, kc, vc, n_past,
                                              scale=d ** -0.5)
                else:
                    attn = einsum_decode(qp, kc, vc, n_past, scale=d ** -0.5,
                                         layout="bhsd")
        x = x + matmul(attn.reshape(B, T, Hq * d), a["o"]).astype(x.dtype)
        h = rmsnorm(x, lp["ffn_norm"]["w"])
        m = lp["mlp"]
        g = jax.nn.silu(matmul(h, m["gate"]).astype(jnp.float32))
        u = matmul(h, m["up"]).astype(jnp.float32)
        x = x + matmul((g * u).astype(x.dtype), m["down"]).astype(x.dtype)
    x = rmsnorm(x, params["final_norm"]["w"])
    logits = matmul(x, params["lm_head"]) if "lm_head" in params else (
        x @ params["embed"].T)
    return logits, new_caches


def init_caches(cfg, B, S, *, layout, q8):
    Hkv, d = cfg.num_key_value_heads, cfg.rope.head_dim
    L = cfg.num_hidden_layers
    shape = (B, S, Hkv, d) if layout == "bshd" else (B, Hkv, S, d)
    sshape = (B, S, Hkv) if layout == "bshd" else (B, Hkv, S)
    out = []
    for _ in range(L):
        if q8:
            out.append((jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                        jnp.zeros(sshape, jnp.float32),
                        jnp.zeros(sshape, jnp.float32)))
        else:
            out.append((jnp.zeros(shape, jnp.bfloat16),
                        jnp.zeros(shape, jnp.bfloat16)))
    return out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ctx = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    cfg = llama3_8b_config(max_length=ctx)
    params = build_synthetic_params(cfg, "q4k", zeros=True)

    import itertools
    combos = [(q8, v) for q8, v in itertools.product(
        (True, False), ("einsum_bshd", "einsum_bhsd", "pallas_bhsd"))]
    combos.insert(0, (False, "no_attn"))      # weights-only floor
    combos.insert(1, (True, "noscale"))       # int8 convert, no scale mults
    for cache_q8, variant in combos:
            layout = "bshd" if variant in ("einsum_bshd", "no_attn",
                                           "noscale") else "bhsd"

            @functools.partial(jax.jit, donate_argnums=(1,))
            def decode_n(p, caches, tok, n_past, variant=variant,
                         cache_q8=cache_q8):
                def body(carry, _):
                    tok, caches, n_past = carry
                    logits, caches = forward(cfg, p, tok, caches, n_past,
                                             variant=variant,
                                             cache_q8=cache_q8)
                    nxt = jnp.argmax(logits[:, -1, :], axis=-1)
                    return (nxt.astype(jnp.int32)[:, None], caches,
                            n_past + 1), None
                (tok, caches, n_past), _ = jax.lax.scan(
                    body, (tok, caches, n_past), None, length=steps)
                return tok, caches

            try:
                caches = init_caches(cfg, B, ctx, layout=layout, q8=cache_q8)
                tok = jnp.zeros((B, 1), jnp.int32)
                t, caches = decode_n(params, caches, tok, jnp.int32(0))
                _ = np.asarray(t)
                best = float("inf")
                for _i in range(3):
                    t0 = time.perf_counter()
                    t, caches = decode_n(params, caches, t, jnp.int32(0))
                    _ = np.asarray(t)
                    best = min(best, time.perf_counter() - t0)
                del caches
                print(json.dumps({
                    "variant": variant,
                    "cache": "q8_0" if cache_q8 else "bfloat16",
                    "B": B, "ctx": ctx,
                    "tok_s": round(B * steps / best, 1)}), flush=True)
            except Exception as e:
                print(json.dumps({"variant": variant,
                                  "cache": "q8_0" if cache_q8 else "bfloat16",
                                  "error": f"{type(e).__name__}: {str(e)[:300]}"}),
                      flush=True)


if __name__ == "__main__":
    main()
