"""Fused flash-decode attention with IN-KERNEL quantized-KV reads.

Decode attention is bandwidth-bound on the KV cache.  The reference streams
its (possibly q8_0-quantized) cache straight through flash attention
(/root/reference/src/layers.cpp:2916-3044); until round 4 our decode steps
went through the XLA einsum with the int8 cache converted outside any
kernel, reading 4x the bytes at 4k+ contexts.

This kernel keeps the cache int8 end-to-end: each [block_k, D] K/V tile is
DMA'd to VMEM as int8 (1 byte/elem off HBM), converted on-chip, and the
per-(token, head) scale is folded AFTER the q·k dot (a [R, block_k] multiply
instead of [block_k, D]).  The same kernel serves unquantized caches.

Shapes/design:
  - q [B, T, Hq, D] with small T (decode steps, T*G rows per KV head).  GQA
    is folded into the row dimension: rows = G*T per (b, h_kv) program, so
    the score dot is one [R, D] x [D, block_k] MXU op per tile.
  - grid (B, Hkv, S/block_k), KV innermost ("arbitrary"), running
    max/denominator/accumulator in VMEM scratch, exactly like the prefill
    kernel (ops/pallas/flash.py).
  - n_past is a PER-ROW [B] vector so the continuous-batching decode path
    (runtime/batching.py, per-slot positions) uses the same kernel; the
    single-stream path broadcasts its scalar.
  - optional attention sinks ([Hq] learned logits that join the softmax
    denominator but emit no value) are applied at finalization.

Masking semantics match ops/attention.py's XLA paths exactly; all math f32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(np_ref, nt_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                   sink_ref, o_ref, acc_ref, m_ref, l_ref, *,
                   scale, sliding_window, logit_softcap, block_k,
                   n_kv_blocks, T, quantized, has_sinks):
    b = pl.program_id(0)
    ki = pl.program_id(2)
    n_past = np_ref[b]
    n_tokens = nt_ref[0]

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    R = q_ref.shape[2]
    k_lo = ki * block_k
    # newest query row sees keys < n_past + n_tokens; oldest sees >= window lo
    live = k_lo < n_past + n_tokens
    if sliding_window > 0:
        live = jnp.logical_and(
            live, k_lo + block_k - 1 > n_past - sliding_window)

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0]                                       # [R, D] f32
        k = k_ref[0, 0].astype(jnp.float32)                   # [bk, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if quantized:
            s = s * ks_ref[0]                                 # [1, bk]
        if logit_softcap > 0.0:
            s = jnp.tanh(s / logit_softcap) * logit_softcap

        # row r = g*T + t  →  query position n_past + (r mod T)
        r_idx = jax.lax.broadcasted_iota(jnp.int32, (R, block_k), 0)
        q_pos = n_past + r_idx % T
        k_pos = k_lo + jax.lax.broadcasted_iota(jnp.int32, (R, block_k), 1)
        valid = jnp.logical_and(k_pos < n_past + n_tokens, k_pos <= q_pos)
        if sliding_window > 0:
            valid = jnp.logical_and(valid, k_pos > q_pos - sliding_window)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)                                # [R, bk]
        corr = jnp.exp(m_prev - m_new)
        l_ref[...] = jnp.broadcast_to(
            l_ref[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True),
            l_ref.shape)
        if quantized:
            p = p * vs_ref[0]                                 # [1, bk]
        v = v_ref[0, 0].astype(jnp.float32)                   # [bk, Dv]
        pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * corr + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(ki == n_kv_blocks - 1)
    def _finalize():
        m = m_ref[:, :1]
        l = l_ref[:, :1]
        acc = acc_ref[...]
        if has_sinks:
            # sink logit joins the denominator but emits no value
            # (reference CoreAttention sinks, src/layers.h:1587)
            sink = sink_ref[0]                                # [Rp, 1]
            m_f = jnp.maximum(m, sink)
            l = l * jnp.exp(m - m_f) + jnp.exp(sink - m_f)
            acc = acc * jnp.exp(m - m_f)
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_decode(q, k_cache, v_cache, n_past, n_tokens, *, scale,
                 sliding_window=0, logit_softcap=0.0,
                 k_scale=None, v_scale=None, sinks=None,
                 block_k=512, interpret=False, qk_dtype=None,
                 head_group=None):
    """Small-Q (decode) attention over the full cache.

    q: [B, T, Hq, D] (T small); k/v_cache: [B, S, Hkv, D(v)] — int8 when
    k_scale/v_scale ([B, S, Hkv]) are given, any float dtype otherwise.
    n_past: scalar or [B] vector of per-row frontiers.  Causal within the T
    new tokens.  Returns [B, T, Hq, Dv].

    Dispatches to the batched all-heads kernel (contiguous DMAs of the
    native [B, S, H, D] cache layout, no transpose copy) whenever the head
    dims are lane-aligned; the per-(b, h) kernel below is the fallback.

    qk_dtype: MXU input dtype for the batched kernel's dots (default bf16 —
    int8 cache values are exact in bf16, only q/p round; accumulation is
    always f32; env CHATLLM_TPU_FLASH_QK=f32 forces full precision).
    """
    D, Dv = q.shape[-1], v_cache.shape[-1]
    Hkv = k_cache.shape[2]
    if (D % 128 == 0 and Dv % 128 == 0) or Hkv == 1:
        if qk_dtype is None:
            import os
            env = os.environ.get("CHATLLM_TPU_FLASH_QK", "").strip()
            qk_dtype = {"f32": "float32", "bf16": "bfloat16",
                        "int8": "int8"}.get(env, "bfloat16")
        return _flash_decode_batched(
            q, k_cache, v_cache, n_past, n_tokens, scale=scale,
            sliding_window=sliding_window, logit_softcap=logit_softcap,
            k_scale=k_scale, v_scale=v_scale, sinks=sinks,
            block_k=block_k, interpret=interpret, qk_dtype=qk_dtype,
            head_group=head_group)
    return _flash_decode_perhead(
        q, k_cache, v_cache, n_past, n_tokens, scale=scale,
        sliding_window=sliding_window, logit_softcap=logit_softcap,
        k_scale=k_scale, v_scale=v_scale, sinks=sinks,
        block_k=block_k, interpret=interpret)


def _flash_decode_perhead(q, k_cache, v_cache, n_past, n_tokens, *, scale,
                          sliding_window=0, logit_softcap=0.0,
                          k_scale=None, v_scale=None, sinks=None,
                          block_k=512, interpret=False):
    """Original per-(batch, kv-head) grid.  Pays a transposed cache copy on
    the host side — kept only for head dims that aren't 128-lane aligned."""
    B, T, Hq, D = q.shape
    S, Hkv = k_cache.shape[1], k_cache.shape[2]
    Dv = v_cache.shape[-1]
    G = Hq // Hkv
    block_k = min(block_k, S)
    assert S % block_k == 0, (S, block_k)
    n_kv_blocks = S // block_k
    quantized = k_scale is not None

    # rows = [G, T] flattened per kv head; pad rows to the f32 sublane tile
    R = G * T
    Rp = max(8, -(-R // 8) * 8)
    qt = jnp.transpose(q.reshape(B, T, Hkv, G, D).astype(jnp.float32),
                       (0, 2, 3, 1, 4)).reshape(B, Hkv, R, D)
    if Rp != R:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Rp - R), (0, 0)))

    kt = jnp.transpose(k_cache, (0, 2, 1, 3))                # [B, Hkv, S, D]
    vt = jnp.transpose(v_cache, (0, 2, 1, 3))
    # scales laid out [B*Hkv, 1, S] so the (1, block_k) block equals the
    # array's last-two dims (Mosaic requires block dims divide (8, 128) or
    # equal the array dims); each program DMAs only its own head's scales
    if quantized:
        kst = jnp.transpose(k_scale, (0, 2, 1)).astype(
            jnp.float32).reshape(B * Hkv, 1, S)
        vst = jnp.transpose(v_scale, (0, 2, 1)).astype(
            jnp.float32).reshape(B * Hkv, 1, S)
    else:  # 1-block dummies (never read; kernel compiled without scaling)
        kst = jnp.zeros((B * Hkv, 1, block_k), jnp.float32)
        vst = kst

    has_sinks = sinks is not None
    if has_sinks:
        # per-(kv-head, row) sink logits, row r = g*T + t → head hkv*G + g,
        # laid out [Hkv, Rp, 1] so the block equals the last-two array dims
        sk = jnp.asarray(sinks, jnp.float32).reshape(Hkv, G)
        sk = jnp.repeat(sk, T, axis=1)                        # [Hkv, R]
        if Rp != R:
            sk = jnp.pad(sk, ((0, 0), (0, Rp - R)))
        sk = sk[:, :, None]                                   # [Hkv, Rp, 1]
    else:
        sk = jnp.zeros((Hkv, Rp, 1), jnp.float32)

    np_vec = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1), (B,))
    nt = jnp.asarray(n_tokens, jnp.int32).reshape(1)

    kernel = functools.partial(
        _decode_kernel, scale=scale, sliding_window=sliding_window,
        logit_softcap=logit_softcap, block_k=block_k,
        n_kv_blocks=n_kv_blocks, T=T, quantized=quantized,
        has_sinks=has_sinks)

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
                         if quantized
                         else (lambda b, h, ki: (0, 0, 0))),
            pl.BlockSpec((1, 1, block_k),
                         (lambda b, h, ki, H=Hkv: (b * H + h, 0, ki))
                         if quantized
                         else (lambda b, h, ki: (0, 0, 0))),
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
        interpret=interpret,
    )(np_vec, nt, qt, kt, vt, kst, vst, sk)

    out = out[:, :, :R].reshape(B, Hkv, G, T, Dv)
    return jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(B, T, Hq, Dv)


def _batched_kernel(np_ref, nt_ref, q_ref, qs_ref, k_ref, v_ref, ks_ref,
                    vs_ref, sink_ref, o_ref, acc_ref, m_ref, l_ref, *,
                    scale, sliding_window, logit_softcap, block_k,
                    n_kv_blocks, T, Hkv, Rp, D, Dv, quantized, has_sinks,
                    dot_dtype, head_group):
    """All kv heads of one (batch row, KV block) per program.

    The K/V blocks arrive as contiguous [block_k, Hkv*D] tiles of the cache's
    NATIVE layout (one straight-line DMA off HBM — the whole point); per-head
    [block_k, D] views are static lane slices.  Rows of every per-row scratch
    are grouped [h*Rp : (h+1)*Rp].  Dots run in `dot_dtype`; interior blocks
    (fully causally visible) skip the mask VPU work entirely.

    dot_dtype=int8 (quantized caches only — ggml's own q8 vec_dot strategy,
    /root/reference/ggml/src/ggml-quants.c): q arrives pre-quantized per row
    (qs_ref carries row scales x the attention scale), K/V tiles feed the
    MXU as s8 DIRECTLY — skipping the int8->float VPU retiling that
    otherwise costs as much as the halved DMA saves — and p re-quantizes
    per row before the s8 PV dot.  bf16: int8 cache values convert exactly,
    only q/p round; f32 accumulate everywhere."""
    b = pl.program_id(0)
    ki = pl.program_id(1)
    n_past = np_ref[b]
    n_tokens = nt_ref[0]

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    k_lo = ki * block_k
    k_hi = k_lo + block_k - 1
    live = k_lo < n_past + n_tokens
    if sliding_window > 0:
        live = jnp.logical_and(live, k_hi > n_past - sliding_window)
    # every (row, key) pair valid → no masking needed: keys all causally
    # visible to the OLDEST query row (pos n_past) and inside the NEWEST
    # row's window
    interior = k_hi <= n_past
    if sliding_window > 0:
        interior = jnp.logical_and(
            interior, k_lo > n_past + T - 1 - sliding_window)

    g = head_group
    n_groups = Hkv // g
    gR, gD, gDv = g * Rp, g * D, g * Dv
    int8_dots = dot_dtype == jnp.int8

    def _compute(masked):
        if masked:
            r_idx = jax.lax.broadcasted_iota(jnp.int32, (Rp, block_k), 0)
            q_pos = n_past + r_idx % T
            k_pos = k_lo + jax.lax.broadcasted_iota(
                jnp.int32, (Rp, block_k), 1)
            valid = jnp.logical_and(k_pos < n_past + n_tokens, k_pos <= q_pos)
            if sliding_window > 0:
                valid = jnp.logical_and(valid, k_pos > q_pos - sliding_window)

        kb = k_ref[0]                                         # [bk, Hkv*D]
        vb = v_ref[0]                                         # [bk, Hkv*Dv]
        for i in range(n_groups):
            rows = slice(i * gR, (i + 1) * gR)
            # block-diagonal q over the g heads of this group, built in
            # VMEM (static-index updates — never touches HBM): one
            # [gR, gD] x [gD, bk] MXU dot replaces g tiny dots, trading
            # g x MAC waste for ~g x fewer MXU dispatches (the dots are
            # latency-bound at Rp=8 rows)
            if g == 1:
                qbd = q_ref[0, rows].astype(dot_dtype)
            else:
                # qbd[:, j*D:(j+1)*D] = group rows masked to head j
                # (where + lane-concat — Mosaic has no value-DUS/scatter)
                qrows = q_ref[0, rows].astype(dot_dtype)      # [gR, D]
                row_gid = jax.lax.broadcasted_iota(
                    jnp.int32, (gR, D), 0) // Rp
                qbd = jnp.concatenate(
                    [jnp.where(row_gid == j, qrows, 0) for j in range(g)],
                    axis=1)                                   # [gR, gD]
            if int8_dots:
                kg = kb[:, i * gD:(i + 1) * gD]                # [bk, gD] s8
                s32 = jax.lax.dot_general(
                    qbd, kg, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                # per-row q scale (attention scale folded in by the host)
                s = s32.astype(jnp.float32) * qs_ref[0, rows]
            else:
                kg = kb[:, i * gD:(i + 1) * gD].astype(dot_dtype)
                s = jax.lax.dot_general(
                    qbd, kg, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
            s3 = s.reshape(g, Rp, block_k)
            if quantized:
                s3 = s3 * ks_ref[0, i * g:(i + 1) * g][:, None, :]
            if logit_softcap > 0.0:
                s3 = jnp.tanh(s3 / logit_softcap) * logit_softcap
            if masked:
                s3 = jnp.where(valid[None], s3, NEG_INF)

            m_prev = m_ref[rows, :1].reshape(g, Rp, 1)
            m_new = jnp.maximum(m_prev, jnp.max(s3, axis=-1, keepdims=True))
            p = jnp.exp(s3 - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_prev = l_ref[rows][:, :1].reshape(g, Rp, 1)
            l_ref[rows] = jnp.broadcast_to(
                (l_prev * corr + jnp.sum(p, axis=-1, keepdims=True))
                .reshape(gR, 1), (gR, l_ref.shape[1]))
            if quantized:
                p = p * vs_ref[0, i * g:(i + 1) * g][:, None, :]
            # p [gR, bk] x v [bk, gDv] accumulates ALL (h, h') pairs; the
            # diagonal blocks are the real per-head outputs, extracted at
            # finalization (the off-diagonal garbage shares the same corr
            # factor, so accumulating it is harmless)
            if int8_dots:
                p2 = p.reshape(gR, block_k)
                pmax = jnp.max(p2, axis=-1, keepdims=True)     # p2 >= 0
                psc = jnp.where(pmax > 0, pmax / 127.0, 1.0)   # [gR, 1]
                pq = jnp.round(p2 / psc).astype(jnp.int8)
                vg = vb[:, i * gDv:(i + 1) * gDv]              # [bk, gDv] s8
                pv = jax.lax.dot_general(
                    pq, vg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32) * psc
            else:
                vg = vb[:, i * gDv:(i + 1) * gDv].astype(dot_dtype)
                pv = jax.lax.dot_general(
                    p.reshape(gR, block_k).astype(dot_dtype), vg,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            corr_r = jnp.broadcast_to(corr, (g, Rp, 1)).reshape(gR, 1)
            acc_ref[rows] = acc_ref[rows] * corr_r + pv
            m_ref[rows] = jnp.broadcast_to(
                m_new.reshape(gR, 1), (gR, m_ref.shape[1]))

    @pl.when(jnp.logical_and(live, interior))
    def _fast():
        _compute(masked=False)

    @pl.when(jnp.logical_and(live, jnp.logical_not(interior)))
    def _masked():
        _compute(masked=True)

    @pl.when(ki == n_kv_blocks - 1)
    def _finalize():
        m = m_ref[:, :1]
        l = l_ref[:, :1]
        if has_sinks:
            sink = sink_ref[...]                              # [Hkv*Rp, 1]
            m_f = jnp.maximum(m, sink)
            l = l * jnp.exp(m - m_f) + jnp.exp(sink - m_f)
            sc = jnp.exp(m - m_f) / jnp.maximum(l, 1e-30)
        else:
            sc = 1.0 / jnp.maximum(l, 1e-30)
        for i in range(n_groups):
            for j in range(g):
                h = i * g + j
                rows = slice(h * Rp, (h + 1) * Rp)
                blk = acc_ref[i * gR + j * Rp:i * gR + (j + 1) * Rp,
                              j * Dv:(j + 1) * Dv]
                o_ref[0, rows] = (blk * sc[rows]).astype(o_ref.dtype)


def _flash_decode_batched(q, k_cache, v_cache, n_past, n_tokens, *, scale,
                          sliding_window=0, logit_softcap=0.0,
                          k_scale=None, v_scale=None, sinks=None,
                          block_k=512, interpret=False,
                          qk_dtype="bfloat16", head_group=None):
    B, T, Hq, D = q.shape
    S, Hkv = k_cache.shape[1], k_cache.shape[2]
    Dv = v_cache.shape[-1]
    G = Hq // Hkv
    quantized = k_scale is not None

    # cap the K/V tile at ~1 MB so double-buffered DMA fits VMEM comfortably
    itemsize = jnp.dtype(k_cache.dtype).itemsize
    while block_k > 128 and block_k * Hkv * max(D, Dv) * itemsize > (1 << 20):
        block_k //= 2
    block_k = min(block_k, S)
    assert S % block_k == 0, (S, block_k)
    n_kv_blocks = S // block_k

    if qk_dtype == "int8" and not quantized:
        qk_dtype = "bfloat16"    # s8 dots only pay off on quantized caches

    R = G * T
    Rp = max(8, -(-R // 8) * 8)
    qt = jnp.transpose(q.reshape(B, T, Hkv, G, D).astype(jnp.float32),
                       (0, 2, 3, 1, 4)).reshape(B, Hkv, R, D)
    if Rp != R:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Rp - R), (0, 0)))
    qt = qt.reshape(B, Hkv * Rp, D)
    if qk_dtype == "int8":
        # per-row symmetric q quantization; the attention scale rides the
        # row scale so the kernel applies both in one multiply
        qabs = jnp.max(jnp.abs(qt), axis=-1, keepdims=True)    # [B, HRp, 1]
        qrow = jnp.where(qabs > 0, qabs / 127.0, 1.0)
        qsc = (qrow * scale).astype(jnp.float32)
        qt = jnp.clip(jnp.round(qt / qrow), -127, 127).astype(jnp.int8)
    else:
        qsc = jnp.zeros((B, Hkv * Rp, 1), jnp.float32)         # never read

    kf = k_cache.reshape(B, S, Hkv * D)          # contiguous view — no copy
    vf = v_cache.reshape(B, S, Hkv * Dv)

    if quantized:
        kst = jnp.transpose(k_scale, (0, 2, 1)).astype(jnp.float32)  # [B,H,S]
        vst = jnp.transpose(v_scale, (0, 2, 1)).astype(jnp.float32)
    else:  # 1-block dummies (never read; kernel compiled without scaling)
        kst = jnp.zeros((B, Hkv, block_k), jnp.float32)
        vst = kst

    has_sinks = sinks is not None
    if has_sinks:
        sk = jnp.asarray(sinks, jnp.float32).reshape(Hkv, G)
        sk = jnp.repeat(sk, T, axis=1)                        # [Hkv, R]
        if Rp != R:
            sk = jnp.pad(sk, ((0, 0), (0, Rp - R)))
        sk = sk.reshape(Hkv * Rp, 1)
    else:
        sk = jnp.zeros((Hkv * Rp, 1), jnp.float32)

    np_vec = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1), (B,))
    nt = jnp.asarray(n_tokens, jnp.int32).reshape(1)

    if head_group is None:
        import os
        env_g = os.environ.get("CHATLLM_TPU_FLASH_GROUP", "").strip()
        head_group = int(env_g) if env_g.isdigit() else 4
    g = head_group
    while Hkv % g:          # g must divide the head count
        g //= 2
    g = max(1, g)

    kernel = functools.partial(
        _batched_kernel, scale=scale, sliding_window=sliding_window,
        logit_softcap=logit_softcap, block_k=block_k,
        n_kv_blocks=n_kv_blocks, T=T, Hkv=Hkv, Rp=Rp, D=D, Dv=Dv,
        quantized=quantized, has_sinks=has_sinks,
        dot_dtype=jnp.dtype(qk_dtype), head_group=g)

    out = pl.pallas_call(
        kernel,
        grid=(B, n_kv_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hkv * Rp, D), lambda b, ki: (b, 0, 0)),
            pl.BlockSpec((1, Hkv * Rp, 1), lambda b, ki: (b, 0, 0)),
            pl.BlockSpec((1, block_k, Hkv * D), lambda b, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, Hkv * Dv), lambda b, ki: (b, ki, 0)),
            pl.BlockSpec((1, Hkv, block_k),
                         (lambda b, ki: (b, 0, ki)) if quantized
                         else (lambda b, ki: (0, 0, 0))),
            pl.BlockSpec((1, Hkv, block_k),
                         (lambda b, ki: (b, 0, ki)) if quantized
                         else (lambda b, ki: (0, 0, 0))),
            pl.BlockSpec((Hkv * Rp, 1), lambda b, ki: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hkv * Rp, Dv), lambda b, ki: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hkv * Rp, Dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((Hkv * Rp, g * Dv), jnp.float32),
            pltpu.VMEM((Hkv * Rp, 128), jnp.float32),
            pltpu.VMEM((Hkv * Rp, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(np_vec, nt, qt, qsc, kf, vf, kst, vst, sk)

    out = out.reshape(B, Hkv, Rp, Dv)[:, :, :R].reshape(B, Hkv, G, T, Dv)
    return jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(B, T, Hq, Dv)
