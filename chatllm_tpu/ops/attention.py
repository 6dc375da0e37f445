"""Attention with a static-shape KV cache.

Reference semantics: `CoreAttention`/`KVCacheAttention`
(/root/reference/src/layers.h:1587-1811): causal mask against n_past, GQA
head grouping, optional logit softcap (Gemma), attention sinks, ALiBi, and
sliding-window masking (`BaseSlidingWindowAttentionPartialCache`,
src/layers.h:1973).

TPU design: the cache is a pair of [B, S_max, H_kv, D] arrays updated in
place with `lax.dynamic_update_slice` (donated across decode steps so XLA
reuses the buffer).  Scores are computed in f32 on the MXU via einsum with
the GQA grouping folded into the contraction — no materialized head
repetition.  A fused Pallas flash kernel replaces the einsum path for long
contexts (ops/pallas/flash.py); this XLA path is the reference semantics and
the fallback.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _dot(sub, a, b, bf16_dots):
    """Attention einsum with MXU-friendly input dtypes.

    When the model computes in bf16 (q arrives bf16 — the production TPU
    path), run the dot with bf16 inputs and f32 accumulation: full MXU rate,
    and int8 cache values convert to bf16 EXACTLY so a q8 cache never pays
    an f32 materialization.  When q is f32 (parity tests, --compute f32),
    keep the full-precision f32 dot."""
    if bf16_dots:
        return jnp.einsum(sub, a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.einsum(sub, a, b.astype(jnp.float32))


def quantize_kv(x):
    """Per-(token, head) symmetric int8 quantization of K/V vectors
    (the q8 cache mode; reference quantized KV cache src/layers.cpp:2933).
    x: [B,T,H,D] → (int8 [B,T,H,D], scale f32 [B,T,H])."""
    xf = x.astype(jnp.float32)
    m = jnp.max(jnp.abs(xf), axis=-1)
    scale = m / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale == 0, 1.0, scale), 0.0)
    q = jnp.clip(jnp.round(xf * inv[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def update_kv_cache(k_cache, v_cache, k, v, n_past, k_scale=None, v_scale=None):
    """Write new K/V ([B,T,H,D]) at position n_past. Returns updated caches
    (+ updated scale tensors when the cache is quantized).

    `n_past` may be a scalar (all rows share one write offset — the chat
    path) or an int vector [B] (per-slot offsets — the continuous-batching
    decode path, runtime/batching.py; writes become a batched scatter)."""
    if jnp.ndim(n_past) == 1:
        B, T = k.shape[:2]
        b_idx = jnp.arange(B)[:, None]                         # [B,1]
        pos = n_past[:, None] + jnp.arange(T)[None, :]         # [B,T]
        # rows past capacity are DROPPED (not clamped onto slot S-1, which
        # would silently overwrite the newest cache entry)
        if k_scale is not None:
            kq, ks = quantize_kv(k)
            vq, vs = quantize_kv(v)
            k_cache = k_cache.at[b_idx, pos].set(kq, mode="drop")
            v_cache = v_cache.at[b_idx, pos].set(vq, mode="drop")
            k_scale = k_scale.at[b_idx, pos].set(ks, mode="drop")
            v_scale = v_scale.at[b_idx, pos].set(vs, mode="drop")
            return k_cache, v_cache, k_scale, v_scale
        k_cache = k_cache.at[b_idx, pos].set(k.astype(k_cache.dtype), mode="drop")
        v_cache = v_cache.at[b_idx, pos].set(v.astype(v_cache.dtype), mode="drop")
        return k_cache, v_cache, None, None
    if k_scale is not None:
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        k_cache = jax.lax.dynamic_update_slice(k_cache, kq, (0, n_past, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, vq, (0, n_past, 0, 0))
        k_scale = jax.lax.dynamic_update_slice(k_scale, ks, (0, n_past, 0))
        v_scale = jax.lax.dynamic_update_slice(v_scale, vs, (0, n_past, 0))
        return k_cache, v_cache, k_scale, v_scale
    k_cache = jax.lax.dynamic_update_slice(k_cache, k.astype(k_cache.dtype), (0, n_past, 0, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v.astype(v_cache.dtype), (0, n_past, 0, 0))
    return k_cache, v_cache, None, None


CHUNKED_ATTN_THRESHOLD = 4096   # use online-softmax KV chunks beyond this
FLASH_MIN_Q = 128               # min query tokens for the Pallas flash path
FLASH_MIN_KV = 1024             # min cache length for the Pallas flash path


def _flash_enabled() -> bool:
    """Pallas flash prefill on TPU (env CHATLLM_TPU_FLASH=0/1 overrides)."""
    import os

    env = os.environ.get("CHATLLM_TPU_FLASH", "").strip()
    if env in ("0", "1"):
        return env == "1"
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pick_block(dim: int, want: int, lo: int = 16) -> int:
    b = min(want, dim)
    while b > lo and dim % b != 0:
        b //= 2
    return b if dim % b == 0 else 0


def _chunked_attention(qg, k_cache, v_cache, n_past, n_tokens, *, scale,
                       causal, sliding_window, logit_softcap,
                       k_scale=None, v_scale=None, chunk: int = 1024,
                       bf16_dots: bool = False):
    """Flash-style attention over KV chunks with a running softmax, so the
    [T, S] score matrix never materializes (long-context prefill).  Exact
    (not approximate); same masking semantics as the dense path."""
    B, T, Hkv, G, D = qg.shape
    S = k_cache.shape[1]
    if S % chunk != 0:
        chunk = S  # degenerate; caller gates on size anyway
    nc = S // chunk
    Dv = v_cache.shape[-1]

    q_pos = n_past + jnp.arange(T)[:, None]                    # [T,1]

    ks = jnp.moveaxis(k_cache.reshape(B, nc, chunk, Hkv, D), 1, 0)
    vs = jnp.moveaxis(v_cache.reshape(B, nc, chunk, Hkv, Dv), 1, 0)
    xs = [ks, vs, jnp.arange(nc)]
    if k_scale is not None:
        xs.append(jnp.moveaxis(k_scale.reshape(B, nc, chunk, Hkv), 1, 0))
        xs.append(jnp.moveaxis(v_scale.reshape(B, nc, chunk, Hkv), 1, 0))

    m0 = jnp.full((B, Hkv, G, T), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, Hkv, G, T), jnp.float32)
    a0 = jnp.zeros((B, Hkv, G, T, Dv), jnp.float32)

    def body(carry, inp):
        m, l, acc = carry
        if k_scale is not None:
            kc, vc, ci, ksc, vsc = inp
        else:
            kc, vc, ci = inp
            ksc = vsc = None
        scores = _dot("bthgd,bshd->bhgts", qg, kc, bf16_dots) * scale
        if ksc is not None:
            scores = scores * ksc.transpose(0, 2, 1)[:, :, None, None, :]
        if logit_softcap > 0.0:
            scores = jnp.tanh(scores / logit_softcap) * logit_softcap
        k_pos = ci * chunk + jnp.arange(chunk)[None, :]
        valid = k_pos < (n_past + n_tokens)
        if causal:
            valid &= k_pos <= q_pos
        if sliding_window > 0:
            valid &= k_pos > (q_pos - sliding_window)
        scores = scores + jnp.where(valid, 0.0, NEG_INF)[None, None, None]
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
        p = jnp.exp(scores - m_new[..., None])
        if vsc is not None:
            p_v = p * vsc.transpose(0, 2, 1)[:, :, None, None, :]
        else:
            p_v = p
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + _dot(
            "bhgts,bshd->bhgtd", p_v, vc, bf16_dots)
        return (m_new, l, acc), None

    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, a0), tuple(xs))
    out = acc / jnp.maximum(l[..., None], 1e-30)
    # [B,Hkv,G,T,Dv] -> [B,T,Hkv,G,Dv]
    return jnp.moveaxis(out, 3, 1)


def _flash_sharded(mesh, q, k_cache, v_cache, n_past, n_tokens, *, scale,
                   causal, sliding_window, logit_softcap, block_q, block_k):
    """shard_map the flash kernel over the mesh: heads over 'tp', batch over
    'dp'.  Both q and kv head counts split by tp, so the GQA group structure
    is preserved per shard and no collective is needed.  Returns None when
    the head/batch counts don't divide the mesh."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from .pallas.flash import flash_attention

    B, _, Hq, _ = q.shape
    Hkv = k_cache.shape[2]
    tp = mesh.shape.get("tp", 1)
    dp = mesh.shape.get("dp", 1)
    if Hq % tp or Hkv % tp or B % dp:
        return None
    dp_ax = "dp" if "dp" in mesh.shape else None
    spec = P(dp_ax, None, "tp", None)
    interp = jax.default_backend() == "cpu"

    def per_shard(ql, kl, vl, np_, nt_):
        return flash_attention(
            ql, kl, vl, np_, nt_, scale=scale, causal=causal,
            sliding_window=sliding_window, logit_softcap=logit_softcap,
            block_q=block_q, block_k=block_k, interpret=interp)

    return shard_map(per_shard, mesh=mesh,
                     in_specs=(spec, spec, spec, P(), P()),
                     out_specs=spec, check_vma=False)(
        q, k_cache, v_cache, jnp.asarray(n_past, jnp.int32),
        jnp.asarray(n_tokens, jnp.int32))


def _flash_decode_enabled() -> bool:
    """Pallas flash decode on TPU (env CHATLLM_TPU_FLASH_DECODE overrides)."""
    import os

    env = os.environ.get("CHATLLM_TPU_FLASH_DECODE", "").strip()
    if env in ("0", "1"):
        return env == "1"
    return _flash_enabled()


def _flash_decode_sharded(mesh, q, k_cache, v_cache, n_past, n_tokens, *,
                          scale, sliding_window, logit_softcap,
                          k_scale, v_scale, sinks, block_k):
    """shard_map flash_decode over the mesh: kv heads over 'tp', batch over
    'dp' (same layout as _flash_sharded).  Returns None when the head/batch
    counts don't divide the mesh."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from .pallas.flash_decode import flash_decode

    B, _, Hq, _ = q.shape
    Hkv = k_cache.shape[2]
    tp = mesh.shape.get("tp", 1)
    dp = mesh.shape.get("dp", 1)
    if Hq % tp or Hkv % tp or B % dp:
        return None
    dp_ax = "dp" if "dp" in mesh.shape else None
    spec = P(dp_ax, None, "tp", None)
    sc_spec = P(dp_ax, None, "tp")
    interp = jax.default_backend() == "cpu"
    np_vec = jnp.broadcast_to(
        jnp.asarray(n_past, jnp.int32).reshape(-1), (B,))

    quant = k_scale is not None
    has_sinks = sinks is not None

    def per_shard(ql, kl, vl, np_, nt_, ksl, vsl, skl):
        return flash_decode(
            ql, kl, vl, np_, nt_, scale=scale,
            sliding_window=sliding_window, logit_softcap=logit_softcap,
            k_scale=ksl if quant else None,
            v_scale=vsl if quant else None,
            sinks=skl if has_sinks else None,
            block_k=block_k, interpret=interp)

    dummy_sc = (k_scale if quant
                else jnp.zeros((B, 1, Hkv), jnp.float32))
    dummy_vs = v_scale if quant else dummy_sc
    sk = (jnp.asarray(sinks, jnp.float32) if has_sinks
          else jnp.zeros((Hq,), jnp.float32))
    return shard_map(per_shard, mesh=mesh,
                     in_specs=(spec, spec, spec, P(dp_ax), P(),
                               sc_spec, sc_spec, P("tp")),
                     out_specs=spec, check_vma=False)(
        q, k_cache, v_cache, np_vec, jnp.asarray(n_tokens, jnp.int32),
        dummy_sc, dummy_vs, sk)


def attention_with_cache(
    q: jax.Array,                 # [B, T, Hq, D]
    k_cache: jax.Array,           # [B, S, Hkv, D] (already holds new keys)
    v_cache: jax.Array,           # [B, S, Hkv, Dv]
    n_past,                       # scalar int (traced ok)
    n_tokens=None,                # valid new tokens this step (defaults to T)
    *,
    scale: float,
    causal: bool = True,
    logit_softcap: float = 0.0,
    sliding_window: int = 0,
    sinks: Optional[jax.Array] = None,        # [Hq] learned sink logits
    alibi_slopes: Optional[jax.Array] = None, # [Hq]
    mask_extra: Optional[jax.Array] = None,   # [B, T, S] additive mask
    k_scale: Optional[jax.Array] = None,      # [B, S, Hkv] (q8 cache)
    v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    B, T, Hq, D = q.shape
    S = k_cache.shape[1]
    Hkv = k_cache.shape[2]
    G = Hq // Hkv
    if n_tokens is None:
        n_tokens = T

    if (T >= FLASH_MIN_Q and S >= FLASH_MIN_KV and sinks is None
            and alibi_slopes is None and mask_extra is None
            and k_scale is None and v_cache.shape[-1] == D
            and _flash_enabled()):
        bq = _pick_block(T, 512)
        bk = _pick_block(S, 512)
        if bq >= 128 and bk >= 256:
            from .pallas.flash import flash_attention
            from .qmm import active_kernel_mesh

            mesh = active_kernel_mesh()
            if mesh is not None:
                out = _flash_sharded(
                    mesh, q, k_cache, v_cache, n_past, n_tokens, scale=scale,
                    causal=causal, sliding_window=sliding_window,
                    logit_softcap=logit_softcap, block_q=bq, block_k=bk)
                if out is not None:
                    return out
                # head counts not divisible by tp: fall through to XLA paths
            else:
                return flash_attention(
                    q, k_cache, v_cache, n_past, n_tokens, scale=scale,
                    causal=causal, sliding_window=sliding_window,
                    logit_softcap=logit_softcap, block_q=bq, block_k=bk)

    # Routing re-tuned on real v5e (2026-08-20, in-LOOP model-level A/B —
    # isolated per-op timings are dispatch-floor contaminated through the
    # axon tunnel): the batched all-heads kernel wins only for QUANTIZED
    # caches at tiny row counts x long contexts (B=1 q8: +2.5% at 4k,
    # +2% at 16k vs the XLA einsum); for bf16 caches and for B>=8 XLA's
    # einsum wins everywhere (its layout freedom inside the decode scan is
    # decisive — a pallas_call on the scan-carried cache pays a relayout
    # copy of K/V every step).  CHATLLM_TPU_FLASH_DECODE=1 forces the
    # kernel everywhere (tests / other TPU generations).
    import os as _os

    _forced = _os.environ.get("CHATLLM_TPU_FLASH_DECODE", "").strip() == "1"
    _min_s = 512 if _forced else 4096
    if (T <= 8 and S >= _min_s and causal and alibi_slopes is None
            and mask_extra is None
            and (_forced or (B * G * T <= 16 and k_scale is not None))
            and _flash_decode_enabled()):
        bk = _pick_block(S, 512, lo=128)
        if bk >= 128:
            from .qmm import _count, active_kernel_mesh

            mesh = active_kernel_mesh()
            if mesh is not None:
                out = _flash_decode_sharded(
                    mesh, q, k_cache, v_cache, n_past, n_tokens, scale=scale,
                    sliding_window=sliding_window,
                    logit_softcap=logit_softcap, k_scale=k_scale,
                    v_scale=v_scale, sinks=sinks, block_k=bk)
                if out is not None:
                    _count("flash_decode:pallas_sharded")
                    return out
            else:
                from .pallas.flash_decode import flash_decode

                _count("flash_decode:pallas"
                       + (":q8kv" if k_scale is not None else ""))
                return flash_decode(
                    q, k_cache, v_cache, n_past, n_tokens, scale=scale,
                    sliding_window=sliding_window,
                    logit_softcap=logit_softcap, k_scale=k_scale,
                    v_scale=v_scale, sinks=sinks, block_k=bk,
                    interpret=jax.default_backend() == "cpu")

    qg = q.reshape(B, T, Hkv, G, D).astype(jnp.float32)
    # bf16 MXU dots only when the CACHE carries no extra precision to lose:
    # int8 values convert to bf16 exactly, and a bf16 cache is already bf16.
    # An f32 cache under bf16 compute (--cache f32) keeps full-precision
    # dots — that combination exists precisely to buy cache precision.
    bf16_dots = (q.dtype == jnp.bfloat16
                 and k_cache.dtype in (jnp.int8, jnp.bfloat16))

    if jnp.ndim(n_past) == 1:
        # continuous-batching decode: per-slot positions (runtime/batching.py)
        return _batched_npast_attention(
            qg, k_cache, v_cache, n_past, n_tokens, scale=scale,
            causal=causal, logit_softcap=logit_softcap,
            sliding_window=sliding_window, sinks=sinks,
            alibi_slopes=alibi_slopes, k_scale=k_scale, v_scale=v_scale,
            bf16_dots=bf16_dots,
        ).reshape(B, T, Hq, v_cache.shape[-1]).astype(q.dtype)

    if (S >= CHUNKED_ATTN_THRESHOLD and sinks is None
            and alibi_slopes is None and mask_extra is None
            and S % 1024 == 0):
        out = _chunked_attention(
            qg, k_cache, v_cache, n_past, n_tokens, scale=scale,
            causal=causal, sliding_window=sliding_window,
            logit_softcap=logit_softcap, k_scale=k_scale, v_scale=v_scale,
            bf16_dots=bf16_dots)
        return out.reshape(B, T, Hq, v_cache.shape[-1]).astype(q.dtype)

    # scores: [B, Hkv, G, T, S]
    scores = _dot("bthgd,bshd->bhgts", qg, k_cache, bf16_dots) * scale
    if k_scale is not None:
        # int8 K: fold per-(token, head) scale into scores
        scores = scores * k_scale.transpose(0, 2, 1)[:, :, None, None, :]

    if logit_softcap > 0.0:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap

    q_pos = n_past + jnp.arange(T)[:, None]                    # [T,1]
    k_pos = jnp.arange(S)[None, :]                             # [1,S]
    valid = k_pos < (n_past + n_tokens)                        # key written
    if causal:
        valid &= k_pos <= q_pos
    if sliding_window > 0:
        valid &= k_pos > (q_pos - sliding_window)
    mask = jnp.where(valid, 0.0, NEG_INF)[None, None, None]    # [1,1,1,T,S]

    if alibi_slopes is not None:
        slopes = alibi_slopes.reshape(Hkv, G).astype(jnp.float32)
        bias = slopes[None, :, :, None, None] * k_pos.astype(jnp.float32)[None, None, None]
        scores = scores + bias
    scores = scores + mask
    if mask_extra is not None:
        scores = scores + mask_extra[:, None, None]

    if sinks is not None:
        # learned per-head sink logit joins the softmax denominator but emits
        # no value (reference: attn sinks in CoreAttention, src/layers.h:1587)
        sk = sinks.reshape(Hkv, G).astype(jnp.float32)
        sk = jnp.broadcast_to(sk[None, :, :, None, None], (B, Hkv, G, T, 1))
        all_scores = jnp.concatenate([scores, sk], axis=-1)
        m = jnp.max(all_scores, axis=-1, keepdims=True)
        e = jnp.exp(all_scores - m)
        p = e[..., :S] / jnp.sum(e, axis=-1, keepdims=True)
    else:
        p = jax.nn.softmax(scores, axis=-1)

    if v_scale is not None:
        # int8 V: fold per-(token, head) scale into the probabilities
        p = p * v_scale.transpose(0, 2, 1)[:, :, None, None, :]
    out = _dot("bhgts,bshd->bthgd", p, v_cache, bf16_dots)
    return out.reshape(B, T, Hq, v_cache.shape[-1]).astype(q.dtype)


def _batched_npast_attention(qg, k_cache, v_cache, n_past, n_tokens, *,
                             scale, causal, logit_softcap, sliding_window,
                             sinks, alibi_slopes, k_scale, v_scale,
                             bf16_dots=False):
    """Dense attention with a PER-ROW n_past vector [B] — each batch slot
    sees its own causal frontier.  Serving-path analog of the reference's
    per-slot KV state (one C++ model object per stream); here one shared
    [B, S] cache + per-row masks so decode stays a single batched einsum."""
    B, T, Hkv, G, D = qg.shape
    S = k_cache.shape[1]
    scores = _dot("bthgd,bshd->bhgts", qg, k_cache, bf16_dots) * scale
    if k_scale is not None:
        scores = scores * k_scale.transpose(0, 2, 1)[:, :, None, None, :]
    if logit_softcap > 0.0:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap

    q_pos = n_past[:, None, None] + jnp.arange(T)[None, :, None]   # [B,T,1]
    k_pos = jnp.arange(S)[None, None, :]                           # [1,1,S]
    valid = k_pos < (n_past[:, None, None] + n_tokens)
    if causal:
        valid &= k_pos <= q_pos
    if sliding_window > 0:
        valid &= k_pos > (q_pos - sliding_window)
    mask = jnp.where(valid, 0.0, NEG_INF)[:, None, None]           # [B,1,1,T,S]

    if alibi_slopes is not None:
        slopes = alibi_slopes.reshape(Hkv, G).astype(jnp.float32)
        bias = slopes[None, :, :, None, None] * jnp.arange(S, dtype=jnp.float32)[None, None, None, None]
        scores = scores + bias
    scores = scores + mask

    if sinks is not None:
        sk = sinks.reshape(Hkv, G).astype(jnp.float32)
        sk = jnp.broadcast_to(sk[None, :, :, None, None], (B, Hkv, G, T, 1))
        all_scores = jnp.concatenate([scores, sk], axis=-1)
        m = jnp.max(all_scores, axis=-1, keepdims=True)
        e = jnp.exp(all_scores - m)
        p = e[..., :S] / jnp.sum(e, axis=-1, keepdims=True)
    else:
        p = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        p = p * v_scale.transpose(0, 2, 1)[:, :, None, None, :]
    out = _dot("bhgts,bshd->bthgd", p, v_cache, bf16_dots)
    return out


def alibi_slopes_for(n_heads: int) -> jax.Array:
    """Standard ALiBi slope schedule (reference `ALiBiSelfAttention`,
    src/layers.h:2884; formula per the ALiBi paper)."""
    import math

    def pow2slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        s = pow2slopes(n_heads)
    else:
        closest = 2 ** int(math.floor(math.log2(n_heads)))
        s = pow2slopes(closest)
        extra = pow2slopes(2 * closest)
        s += extra[0::2][: n_heads - closest]
    return jnp.asarray(s, dtype=jnp.float32)
