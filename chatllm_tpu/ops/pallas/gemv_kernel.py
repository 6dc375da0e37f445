"""VPU-path fused dequant GEMV Pallas kernel (B=1 decode).

y[N] = sum_k x[k] * dequant(q[k, n])

The MXU path (qmm_kernel.py) is weight-LOAD bound for single-row GEMV:
the systolic array consumes ~4x128 weights/cycle regardless of batch, an
~60 tok/s ceiling for an 8B model on v5e.  This kernel never touches the
MXU: the quantized tile is unpacked and multiply-accumulated on the 8x128
VPU, so throughput is bounded by HBM bandwidth and VPU rate instead
(the reference's analog is the fused vec_dot q4_K kernels in
/root/reference/ggml/src/ggml-quants.c).

Compute layout per (n, k) grid step, all sublane-axis reductions done as
halving adds (~1 VPU op/weight) down to an 8-row accumulator:

    wq   [TK, TN]    unpack int4->f32 (or int8->f32)
    p    = wq * x[TK, 1]                  (lane-broadcast multiply)
    t    = group-halve(p)  [gs, 8, TN]    (reduce G -> 8 rows per group)
    t   *= s[gs, 1, TN]
    acc += halve(t)        [8, TN]

The affine group bias b and the packed-format zero point are folded into
tiny XLA-side matmuls by the wrapper:
    y += (group-sums of x) @ b - zp * ((group-sums of x) @ s)
so the kernel itself never subtracts the zero point (saves 1 op/weight).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def f16_bits_to_f32(bits_i32):
    """Decode IEEE f16 bit patterns (held in int32 lanes) to f32 on the VPU.

    Mosaic rejects the f16 dtype outright ("Unsupported type in mosaic
    dialect: 'f16'"), so f16 scale arrays are bitcast to uint16 OUTSIDE the
    kernel and decoded here: ~6 VPU ops per SCALE element = /group per
    weight.  Handles normals, subnormals, +-0, and inf/NaN (exp==31 maps to
    f32 inf/NaN so a corrupted checkpoint scale propagates instead of
    decoding as a finite ~2^16 value)."""
    bits = bits_i32 & 0xFFFF
    sign = (bits >> 15) & 1
    exp = (bits >> 10) & 0x1F
    man = bits & 0x3FF
    normal = ((exp + 112) << 23) | (man << 13)
    fn = jax.lax.bitcast_convert_type(normal, jnp.float32)
    special = jax.lax.bitcast_convert_type((0xFF << 23) | (man << 13),
                                           jnp.float32)
    fn = jnp.where(exp == 31, special, fn)
    fsub = man.astype(jnp.float32) * jnp.float32(2.0 ** -24)
    mag = jnp.where(exp == 0, fsub, fn)
    return jnp.where(sign == 1, -mag, mag)


def load_scale_f32(s_ref):
    """Read a scale tile as f32 whatever its storage dtype (f32, or uint16
    f16-bits after the wrapper's bitcast)."""
    s = s_ref[:]
    if s.dtype in (jnp.uint16, jnp.int16):
        return f16_bits_to_f32(s.astype(jnp.int32))
    return s.astype(jnp.float32)


def _reduce_axis0(t):
    """Pairwise-halve axis 0 while even, then unrolled adds -> t[0]-shaped."""
    g = t.shape[0]
    while g > 1 and g % 2 == 0:
        t = t[: g // 2] + t[g // 2:]
        g //= 2
    r = t[0]
    for i in range(1, g):
        r = r + t[i]
    return r


def _kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_kt: int, group: int,
            packed: bool, b_ref=None, d_ref=None, dm_ref=None, sb: int = 0):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:]                                   # [TK(/2), TN]
    tn = q.shape[1]
    xx = x_ref[:].astype(jnp.float32)              # [TK, 1]
    if packed:
        # group-local pairing (qtensor.pack_nibbles): byte row j of group g
        # holds original rows (G*g + j, G*g + j + G/2) in (lo, hi)
        half = group // 2
        gs = q.shape[0] // half
        qi = q.reshape(gs, half, tn).astype(jnp.int32)
        lo = (qi & 0xF).astype(jnp.float32)        # rows 0..G/2-1 of group
        # u8 widening zero-extends, so >>4 needs no mask (measured +4%:
        # 278 -> 290 GB/s at the 8B GEMV shape, experiments/gemv_unpack.py)
        hi = (qi >> 4).astype(jnp.float32)         # rows G/2..G-1
        xg = xx.reshape(gs, group, 1)
        p = lo * xg[:, :half] + hi * xg[:, half:]  # [gs, G/2, TN]
        h = half
    else:
        gs = q.shape[0] // group
        wq = q.astype(jnp.float32).reshape(gs, group, tn)
        xg = xx.reshape(gs, group, 1)
        p = wq * xg                                # [gs, G, TN]
        h = group
    # reduce the per-group row axis (axis=1) to 8 by halving adds
    t = p
    while h > 8:
        t = t[:, : h // 2] + t[:, h // 2:]
        h //= 2
    if sb:
        # superblock composition: s = d * sc, b = -(dmin * m); the affine
        # term rides the per-group sums of x, all accumulated in-kernel
        # (precomposing an f32 b in HBM would cost more bytes than the
        # whole factorization saves)
        sc = s_ref[:].astype(jnp.float32)          # [gs, TN] int8
        dsc = f16_bits_to_f32(d_ref[:].astype(jnp.int32))   # [gs/sb, TN]
        s = (sc.reshape(gs // sb, sb, tn) * dsc[:, None, :]).reshape(gs, tn)
        t = t * s[:, None, :]
        acc_ref[:] += _reduce_axis0(t)
        if b_ref is not None:                      # affine k-quants only
            m = b_ref[:].astype(jnp.float32)
            dmn = f16_bits_to_f32(dm_ref[:].astype(jnp.int32))
            bb = (m.reshape(gs // sb, sb, tn)
                  * dmn[:, None, :]).reshape(gs, tn)
            xs = xx.reshape(gs, group)
            w = group
            while w > 1:
                xs = xs[:, : w // 2] + xs[:, w // 2:]
                w //= 2
            rb = _reduce_axis0(bb * xs)            # [TN]
            acc_ref[0:1, :] -= rb[None, :]
    else:
        s = load_scale_f32(s_ref)                  # [gs, TN]
        t = t * s[:, None, :]
        acc_ref[:] += _reduce_axis0(t)

    @pl.when(kt == n_kt - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _pick_tile(dim: int, want: int, unit: int) -> int:
    t = min(want, dim)
    t -= t % unit
    while t >= unit:
        if dim % t == 0:
            return t
        t -= unit
    return dim


@functools.partial(jax.jit, static_argnames=("group", "packed", "zero_point",
                                             "tile_n", "tile_k", "interpret",
                                             "vmem_mb", "sb"))
def qgemv_pallas(x, q, s, b=None, bias=None, *, group: int = 32,
                 packed: bool = False, zero_point: int = 0,
                 d=None, dm=None, sb: int = 0,
                 tile_n: int = 1024, tile_k: int = 2048,
                 vmem_mb: int = 0, interpret: bool = False):
    """x: [1, K] float; q: [K, N] int8 (or packed uint8 [K/2, N]);
    s/b: [K/group, N] f32 — or int8 sub-scale/min with f16
    d/dm [K/(group*sb), N] when sb>0 (superblock layout, s_eff = d*sc,
    b_eff = -(dmin*m)); bias: [N].  Returns [1, N] f32."""
    B, K = x.shape
    assert B == 1, "VPU GEMV path is single-row; use qmm_pallas for B>1"
    N = q.shape[1]
    tile_n = _pick_tile(N, tile_n, 128)
    tile_k = _pick_tile(K, tile_k, group * max(1, sb))
    n_kt = K // tile_k
    qdiv = 2 if packed else 1
    gs = tile_k // group

    xc = x.reshape(K, 1).astype(jnp.float32)
    s_in = (jax.lax.bitcast_convert_type(s, jnp.uint16)
            if s.dtype == jnp.float16 else s)

    in_specs = [
        pl.BlockSpec((tile_k, 1), lambda n, k: (k, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_k // qdiv, tile_n), lambda n, k: (k, n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gs, tile_n), lambda n, k: (k, n),
                     memory_space=pltpu.VMEM),
    ]
    args = [xc, q, s_in]
    scale_bytes = N * K // group * 4
    if sb:
        gspec = pl.BlockSpec((gs, tile_n), lambda n, k: (k, n),
                             memory_space=pltpu.VMEM)
        sbspec = pl.BlockSpec((gs // sb, tile_n), lambda n, k: (k, n),
                              memory_space=pltpu.VMEM)
        has_b = b is not None
        in_specs += ([gspec] if has_b else []) + [sbspec] \
            + ([sbspec] if has_b else [])
        args += ([b] if has_b else []) \
            + [jax.lax.bitcast_convert_type(d, jnp.uint16)] \
            + ([jax.lax.bitcast_convert_type(dm, jnp.uint16)] if has_b else [])
        scale_bytes = (N * K // group * (2 if has_b else 1)
                       + N * K // (group * sb) * (4 if has_b else 2))

        def kernel(*refs):
            s_ref = refs[2]
            i = 3
            b_ref = refs[i] if has_b else None
            i += has_b
            d_ref = refs[i]
            i += 1
            dm_ref = refs[i] if has_b else None
            i += has_b
            _kernel(refs[0], refs[1], s_ref, refs[i], refs[i + 1], n_kt=n_kt,
                    group=group, packed=packed, b_ref=b_ref, d_ref=d_ref,
                    dm_ref=dm_ref, sb=sb)
    else:
        kernel = functools.partial(_kernel, n_kt=n_kt, group=group,
                                   packed=packed)

    out = pl.pallas_call(
        kernel,
        grid=(N // tile_n, n_kt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, tile_n), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, tile_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            **({"vmem_limit_bytes": vmem_mb * 2 ** 20} if vmem_mb else {})),
        cost_estimate=pl.CostEstimate(
            flops=3 * N * K,
            bytes_accessed=N * K // qdiv + scale_bytes + K * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    y = jnp.sum(out, axis=0, keepdims=True)        # [1, N]

    corr = None
    if not sb and (zero_point or b is not None):
        xg = jnp.sum(xc.reshape(K // group, group), axis=1,
                     dtype=jnp.float32)[None, :]   # [1, K/G]
        if zero_point:
            corr = -zero_point * jnp.dot(xg, s,
                                         preferred_element_type=jnp.float32)
        if b is not None:
            t = jnp.dot(xg, b, preferred_element_type=jnp.float32)
            corr = t if corr is None else corr + t
    if corr is not None:
        y = y + corr
    if bias is not None:
        y = y + bias[None, :]
    return y
