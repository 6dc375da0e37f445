"""Fused dequantize × matmul Pallas kernel.

y[B, N] = x[B, K] @ dequant(q[K, N], s[K/G, N], b[K/G, N]) (+ bias[N])

The quantized weight tile is DMA'd to VMEM as int8, dequantized on the VPU
(group-scale broadcast along lanes), and fed to the MXU as bf16 — the bf16
weight never exists in HBM, so decode-GEMV traffic is the quantized bytes
only.  This is the TPU replacement for ggml's fused dequant-dot kernels
(/root/reference/ggml/src/ggml-quants.c, ggml-cuda/mmq.cu) on the path that
dominates tokens/s (SURVEY.md §7 "hard parts" #1).

Everything is stored output-dim-along-lanes ([K, N] / [K/G, N]), so the
dequant broadcast and the dot contraction need no transposes, and every
BlockSpec tile is (sublane, lane)-aligned.

Grid: (N/TILE_N, K/TILE_K, M/TILE_M) with the **M sweep innermost** so each
weight tile is dequantized ONCE (at m==0, into a VMEM scratch) and reused
for every activation tile.  With M outermost (the v1 layout) long-prefill
matmuls re-ran the VPU dequant per M-tile, capping the MXU at ~40%
utilization at M=2048; here the dequant cost is amortized to 1/n_mt.  The
output block is the whole [B, TILE_N] column, resident in VMEM across the
(k, m) sweep and accumulated in f32 in place.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, q_ref, s_ref, bias_ref, o_ref, w_ref, *, n_kt: int,
            tile_m: int, group: int, packed: bool, zero_point: int,
            compute_dtype, b_ref=None, d_ref=None, dm_ref=None, sb: int = 0,
            xs_ref=None):
    kt = pl.program_id(1)
    mt = pl.program_id(2)

    @pl.when(mt == 0)
    def _dequant():
        # Dequant cost: 2 VPU ops per weight (int→bf16 convert + bf16
        # multiply), +2 for the nibble unpack on the packed path — paid once
        # per weight tile, amortized over the whole M sweep.  The affine
        # group bias is handled OUTSIDE the kernel:
        # Σ_k x_k (q s + b) = x·(q s) + (Σ_{k∈g} x_k)·b, so the wrapper adds
        # a tiny [B, K/G] @ [K/G, N] matmul on the XLA side in full f32 —
        # EXCEPT on the superblock path (sb>0), where s/b exist only in
        # factored int8×f16 form and are composed in-kernel; the bias term
        # then rides a per-tile [TM, gs]×[gs, TN] MXU dot against the group
        # sums of x (xs_ref) instead of a per-weight VPU add — measured
        # 148→178 GB/s at M=32 on v5e (experiments/qmm_unpack_variants.py;
        # the per-weight sublane-broadcast add was ~25% of kernel time).
        q = q_ref[:]                               # [TK(/2), TN] int8/uint8
        tn = q.shape[1]
        if packed:
            # group-local pairing: byte row j of group g = rows
            # (32g+j, 32g+j+16); Mosaic has no uint8 shifts — widen to i32
            half = group // 2
            qg = q.reshape(q.shape[0] // half, half, tn)
            qi = qg.astype(jnp.int32)
            lo = (qi & 0xF).astype(compute_dtype)
            # u8 widening zero-extends, so >>4 needs no mask
            hi = (qi >> 4).astype(compute_dtype)
            wq = jnp.concatenate([lo, hi], axis=1)  # [gs, group, TN]
            if zero_point:
                wq = wq - jnp.asarray(zero_point, compute_dtype)
            gs = wq.shape[0]
            tk = gs * group
        else:
            tk = q.shape[0]
            gs = tk // group
            wq = q.astype(compute_dtype).reshape(gs, group, tn)
        from .gemv_kernel import f16_bits_to_f32, load_scale_f32

        if sb:
            sc = s_ref[:].astype(jnp.float32)      # [gs, TN] int8
            dd = f16_bits_to_f32(d_ref[:].astype(jnp.int32))  # [gs/sb, TN]
            s = (sc.reshape(gs // sb, sb, tn)
                 * dd[:, None, :]).reshape(gs, tn).astype(compute_dtype)
            w = wq * s[:, None, :]
            if b_ref is not None and xs_ref is None:
                # affine k-quants, M-swept path: per-weight bias add
                m = b_ref[:].astype(jnp.float32)
                dmn = f16_bits_to_f32(dm_ref[:].astype(jnp.int32))
                bb = -(m.reshape(gs // sb, sb, tn)
                       * dmn[:, None, :]).reshape(gs, tn).astype(compute_dtype)
                w = w + bb[:, None, :]
            w_ref[:] = w.reshape(tk, tn)
        else:
            s = load_scale_f32(s_ref).astype(compute_dtype)     # [gs, TN]
            w_ref[:] = (wq * s[:, None, :]).reshape(tk, tn)

    xc = x_ref[:].astype(compute_dtype)            # [TM, TK]
    part = jnp.dot(xc, w_ref[:], preferred_element_type=jnp.float32)
    if xs_ref is not None:
        from .gemv_kernel import f16_bits_to_f32 as _f16d
        gs = s_ref.shape[0]
        tn = q_ref.shape[1]
        m = b_ref[:].astype(jnp.float32)
        dmn = _f16d(dm_ref[:].astype(jnp.int32))
        bb = -(m.reshape(gs // sb, sb, tn)
               * dmn[:, None, :]).reshape(gs, tn)
        # xs arrives TRANSPOSED [K/G, TM] so the per-k-tile slice is a
        # sublane slice; contraction dim0×dim0 (MXU lhs transpose), f32
        xs = xs_ref[pl.ds(kt * gs, gs), :].astype(jnp.float32)
        part = part + jax.lax.dot_general(
            xs, bb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    sl = pl.ds(mt * tile_m, tile_m)

    @pl.when(kt == 0)
    def _first():
        o_ref[sl, :] = part

    @pl.when(kt != 0)
    def _acc():
        o_ref[sl, :] += part

    if bias_ref is not None:
        @pl.when(kt == n_kt - 1)
        def _bias():
            o_ref[sl, :] += bias_ref[:]


def _pick_tile(dim: int, want: int, unit: int) -> int:
    """Largest multiple of `unit` that divides `dim`, at most `want`."""
    t = min(want, dim)
    t -= t % unit
    while t >= unit:
        if dim % t == 0:
            return t
        t -= unit
    return dim  # no aligned divisor: single tile covering the whole dim


@functools.partial(jax.jit, static_argnames=("group", "packed", "zero_point",
                                             "tile_n", "tile_k", "sb",
                                             "compute_dtype", "interpret"))
def qmm_pallas(x, q, s, b=None, bias=None, *, group: int = 32,
               packed: bool = False, zero_point: int = 0,
               d=None, dm=None, sb: int = 0,
               tile_n: int = 512, tile_k: int = 1024,
               compute_dtype=jnp.bfloat16, interpret: bool = False):
    """x: [B, K] float; q: [K, N] int8 (or packed uint8 [K/2, N]);
    s/b: [K/group, N] f32 — or int8 sub-scale/min with f16
    d/dm [K/(group*sb), N] when sb>0 (superblock layout); bias: [N].
    Returns [B, N] f32."""
    B, K = x.shape
    N = q.shape[1]
    # pad batch/sequence to the sublane minimum
    B_pad = max(8, B)
    if B_pad % 8:
        B_pad += 8 - B_pad % 8
    # the [B, TILE_N] f32 output column lives in VMEM for the whole (k, m)
    # sweep — shrink TILE_N so it stays within budget at long prefill
    while tile_n > 128 and B_pad * tile_n * 4 > 6 * 2 ** 20:
        tile_n //= 2
    # largest tile sizes that divide the problem (lane/sublane-aligned)
    tile_n = _pick_tile(N, tile_n, 128)
    # the superblock d/dm blocks are [tile_k/(group*sb), tile_n] — Mosaic
    # needs their sublane count divisible by 8 (or the block to cover the
    # whole array), so the k tile must align to group*sb*8
    k_unit = group * max(1, sb) * (8 if sb else 1)
    tile_k = _pick_tile(K, max(tile_k, k_unit), k_unit)
    if sb and (tile_k // (group * sb)) % 8 and tile_k != K:
        tile_k = K  # full-K block is always legal
    # keep the weight scratch tile within VMEM budget
    while tile_n > 128 and tile_k * tile_n * 2 > 8 * 2 ** 20:
        tile_n = _pick_tile(N, tile_n // 2, 128)
    assert tile_k % group == 0
    n_kt = K // tile_k
    qdiv = 2 if packed else 1

    if B_pad != B:
        x = jnp.pad(x, ((0, B_pad - B), (0, 0)))
    tile_m = _pick_tile(B_pad, 256, 8)
    n_mt, n_nt = B_pad // tile_m, N // tile_n
    # activations go to the MXU in compute_dtype anyway; casting outside the
    # kernel halves x DMA traffic (x is re-streamed once per (n, k) pair)
    x_f32 = x
    x = x.astype(compute_dtype)

    # Mosaic has no f16 dtype: ship f16 scales as uint16 bit patterns,
    # decoded on the VPU (gemv_kernel.f16_bits_to_f32)
    if s.dtype == jnp.float16:
        s = jax.lax.bitcast_convert_type(s, jnp.uint16)

    gs = tile_k // group
    in_specs = [
        pl.BlockSpec((tile_m, tile_k), lambda n, k, m: (m, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_k // qdiv, tile_n), lambda n, k, m: (k, n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gs, tile_n), lambda n, k, m: (k, n),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, q, s]
    has_bias = bias is not None
    if has_bias:
        in_specs.append(pl.BlockSpec((1, tile_n), lambda n, k, m: (0, n),
                                     memory_space=pltpu.VMEM))
        args.append(bias.reshape(1, N))
    has_b = b is not None
    # bias-via-dot path: only when the M sweep is a single tile (decode
    # shapes) — a multi-tile M sweep would need a lane slice of xs per m
    use_xs = sb and has_b and n_mt == 1
    if sb:
        sbspec = pl.BlockSpec((gs // sb, tile_n), lambda n, k, m: (k, n),
                              memory_space=pltpu.VMEM)
        gspec = pl.BlockSpec((gs, tile_n), lambda n, k, m: (k, n),
                             memory_space=pltpu.VMEM)
        in_specs += ([gspec] if has_b else []) + [sbspec] \
            + ([sbspec] if has_b else [])
        args += ([b] if has_b else []) \
            + [jax.lax.bitcast_convert_type(d, jnp.uint16)] \
            + ([jax.lax.bitcast_convert_type(dm, jnp.uint16)] if has_b else [])
    if use_xs:
        xs_t = jnp.sum(
            x_f32.astype(jnp.float32).reshape(B_pad, K // group, group),
            axis=2).T                               # [K/G, B_pad]
        in_specs.append(pl.BlockSpec((K // group, B_pad),
                                     lambda n, k, m: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(xs_t)

    def kernel(*refs):
        x_ref, q_ref, s_ref = refs[0], refs[1], refs[2]
        idx = 3
        bias_ref = refs[idx] if has_bias else None
        idx += has_bias
        b_ref = d_ref = dm_ref = xs_ref = None
        if sb:
            if has_b:
                b_ref = refs[idx]
                idx += 1
            d_ref = refs[idx]
            idx += 1
            if has_b:
                dm_ref = refs[idx]
                idx += 1
        if use_xs:
            xs_ref = refs[idx]
            idx += 1
        o_ref, w_ref = refs[idx], refs[idx + 1]
        _kernel(x_ref, q_ref, s_ref, bias_ref, o_ref, w_ref,
                n_kt=n_kt, tile_m=tile_m, group=group, packed=packed,
                zero_point=zero_point, compute_dtype=compute_dtype,
                b_ref=b_ref, d_ref=d_ref, dm_ref=dm_ref, sb=sb,
                xs_ref=xs_ref)

    out = pl.pallas_call(
        kernel,
        grid=(n_nt, n_kt, n_mt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B_pad, tile_n), lambda n, k, m: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_k, tile_n), compute_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_pad * N * K,
            bytes_accessed=N * K // qdiv
            + (N * K // group * (2 if has_b else 1)
               + N * K // (group * sb) * (4 if has_b else 2) if sb
               else N * K // group * 4)
            + n_nt * B_pad * K * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    out = out[:B]
    if b is not None and not sb:
        # affine group-bias term: Σ_g b[g, n] · (Σ_{k∈g} x[b, k]) in f32
        xg = jnp.sum(x_f32[:B].astype(jnp.float32)
                     .reshape(B, K // group, group), axis=2)
        out = out + jnp.dot(xg, b, preferred_element_type=jnp.float32)
    return out
