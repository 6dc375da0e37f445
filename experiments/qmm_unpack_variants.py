"""Cheaper q4k dequant arithmetic for the M<=64 qmm kernel.

qmm_m32.py: DMA roofline 395 GB/s, q4k qmm 148 GB/s — the gap is the VPU
dequant, dominated by the int32-width nibble unpack (i32 ops run at 1/4
byte throughput).  Variants:

  v0_current    — production _kernel (i32 widen, &0xF, >>4 & 0xF, 2 converts)
  v1_noredund   — drop the redundant & after >>4; single & for lo
  v2_i16        — widen to i16 instead of i32 (2x lane density)
  v3_f32math    — u8->f32 convert, hi=floor(q/16), lo=q-16*hi (no int ops)
  v4_biasdot    — v1 + fold the affine bias via a per-tile [M,gs]x[gs,tn]
                  MXU dot instead of a per-weight add
  v5_all        — best unpack + biasdot

Usage: python experiments/qmm_unpack_variants.py [M] [reps]
"""
import functools
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chatllm_tpu.models.synthetic import synth_linear
from chatllm_tpu.ops.pallas.gemv_kernel import f16_bits_to_f32
from chatllm_tpu.ops.pallas.qmm_kernel import qmm_pallas

M = int(sys.argv[1]) if len(sys.argv) > 1 else 32
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
K, N = 4096, 14336
GROUP, SB = 32, 8


def timeit(mkfn, *args, reps=REPS):
    @jax.jit
    def run(seed, *a):
        def body(c, _):
            return c + mkfn(c, *a) * 1e-20, None
        c, _ = jax.lax.scan(body, seed, None, length=reps)
        return c
    _ = np.asarray(run(jnp.float32(0), *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(run(jnp.float32(0), *args))
        best = min(best, time.perf_counter() - t0)
    return best / reps


def unpack_v0(q, compute_dtype):
    half = GROUP // 2
    tn = q.shape[1]
    qg = q.reshape(q.shape[0] // half, half, tn)
    qi = qg.astype(jnp.int32)
    lo = (qi & 0xF).astype(compute_dtype)
    hi = ((qi >> 4) & 0xF).astype(compute_dtype)
    return jnp.concatenate([lo, hi], axis=1)          # [gs, G, TN]


def unpack_v1(q, compute_dtype):
    half = GROUP // 2
    tn = q.shape[1]
    qg = q.reshape(q.shape[0] // half, half, tn)
    qi = qg.astype(jnp.int32)
    lo = (qi & 0xF).astype(compute_dtype)
    hi = (qi >> 4).astype(compute_dtype)              # u8 widen: high bits 0
    return jnp.concatenate([lo, hi], axis=1)


def unpack_v2(q, compute_dtype):
    half = GROUP // 2
    tn = q.shape[1]
    qg = q.reshape(q.shape[0] // half, half, tn)
    qi = qg.astype(jnp.int16)
    lo = (qi & jnp.int16(0xF)).astype(compute_dtype)
    hi = (qi >> jnp.int16(4)).astype(compute_dtype)
    return jnp.concatenate([lo, hi], axis=1)


def unpack_v3(q, compute_dtype):
    half = GROUP // 2
    tn = q.shape[1]
    qg = q.reshape(q.shape[0] // half, half, tn)
    qf = qg.astype(jnp.int32).astype(jnp.float32)
    hi = jnp.floor(qf * jnp.float32(0.0625))
    lo = qf - hi * jnp.float32(16.0)
    return jnp.concatenate([lo, hi], axis=1).astype(compute_dtype)


def unpack_v6_split(q, compute_dtype):
    """Tile-local GLOBAL pairing: byte row j holds original rows (j, j+TK/2).
    lo/hi become contiguous half-tiles — no sublane interleave/concat at all.
    (Bench-only: production layout pairs group-locally, so numerics differ.)"""
    qi = q.astype(jnp.int32)
    lo = (qi & 0xF).astype(compute_dtype)              # rows [0, TK/2)
    hi = (qi >> 4).astype(compute_dtype)               # rows [TK/2, TK)
    return lo, hi


def make_kernel2(mode, compute_dtype=jnp.bfloat16):
    """Diagnostic kernels (bench-only numerics)."""
    def kernel(x_ref, xs_ref, q_ref, s_ref, b_ref, d_ref, dm_ref, o_ref,
               w_ref, *, n_kt, tile_m):
        kt = pl.program_id(1)
        mt = pl.program_id(2)
        tn = q_ref.shape[1]

        @pl.when(mt == 0)
        def _dequant():
            gs = s_ref.shape[0]
            tk = gs * GROUP
            if mode == "noscale":
                qi = q_ref[:].astype(jnp.int32)
                lo = (qi & 0xF).astype(compute_dtype)
                hi = (qi >> 4).astype(compute_dtype)
                half = GROUP // 2
                wq = jnp.concatenate(
                    [lo.reshape(gs, half, tn), hi.reshape(gs, half, tn)],
                    axis=1)
                w_ref[:] = wq.reshape(tk, tn)
            elif mode == "nounpack":
                qb = q_ref[:].astype(jnp.int32).astype(compute_dtype)
                w_ref[:] = jnp.concatenate([qb, qb], axis=0)
            elif mode == "storeonly":
                qb = q_ref[:].astype(jnp.int32).astype(compute_dtype)
                w_ref[0:tk // 2, :] = qb
            elif mode == "splitstore":
                lo, hi = unpack_v6_split(q_ref[:], compute_dtype)
                sc = s_ref[:].astype(jnp.float32)
                dd = f16_bits_to_f32(d_ref[:].astype(jnp.int32))
                s = (sc.reshape(gs // SB, SB, tn)
                     * dd[:, None, :]).reshape(gs, tn).astype(compute_dtype)
                h = gs // 2
                s_lo = s[:h].reshape(h, 1, tn)
                s_hi = s[h:].reshape(h, 1, tn)
                w_ref[0:tk // 2, :] = (
                    lo.reshape(h, GROUP, tn) * s_lo).reshape(tk // 2, tn)
                w_ref[tk // 2:tk, :] = (
                    hi.reshape(h, GROUP, tn) * s_hi).reshape(tk // 2, tn)
            elif mode == "splitstore_bias":
                lo, hi = unpack_v6_split(q_ref[:], compute_dtype)
                sc = s_ref[:].astype(jnp.float32)
                dd = f16_bits_to_f32(d_ref[:].astype(jnp.int32))
                s = (sc.reshape(gs // SB, SB, tn)
                     * dd[:, None, :]).reshape(gs, tn).astype(compute_dtype)
                m_ = b_ref[:].astype(jnp.float32)
                dmn = f16_bits_to_f32(dm_ref[:].astype(jnp.int32))
                bb = -(m_.reshape(gs // SB, SB, tn)
                       * dmn[:, None, :]).reshape(gs, tn).astype(compute_dtype)
                h = gs // 2
                w_ref[0:tk // 2, :] = (
                    lo.reshape(h, GROUP, tn) * s[:h, None, :]
                    + bb[:h, None, :]).reshape(tk // 2, tn)
                w_ref[tk // 2:tk, :] = (
                    hi.reshape(h, GROUP, tn) * s[h:, None, :]
                    + bb[h:, None, :]).reshape(tk // 2, tn)

        xc = x_ref[:].astype(compute_dtype)
        part = jnp.dot(xc, w_ref[:], preferred_element_type=jnp.float32)
        sl = pl.ds(mt * tile_m, tile_m)

        @pl.when(kt == 0)
        def _first():
            o_ref[sl, :] = part

        @pl.when(kt != 0)
        def _acc():
            o_ref[sl, :] += part
    return kernel


def make_kernel(unpack, biasdot, compute_dtype=jnp.bfloat16):
    def kernel(x_ref, xs_ref, q_ref, s_ref, b_ref, d_ref, dm_ref, o_ref,
               w_ref, *, n_kt, tile_m):
        kt = pl.program_id(1)
        mt = pl.program_id(2)
        tn = q_ref.shape[1]

        @pl.when(mt == 0)
        def _dequant():
            wq = unpack(q_ref[:], compute_dtype)       # [gs, G, TN]
            gs = wq.shape[0]
            tk = gs * GROUP
            sc = s_ref[:].astype(jnp.float32)
            dd = f16_bits_to_f32(d_ref[:].astype(jnp.int32))
            s = (sc.reshape(gs // SB, SB, tn)
                 * dd[:, None, :]).reshape(gs, tn).astype(compute_dtype)
            w = wq * s[:, None, :]
            if not biasdot:
                m_ = b_ref[:].astype(jnp.float32)
                dmn = f16_bits_to_f32(dm_ref[:].astype(jnp.int32))
                bb = -(m_.reshape(gs // SB, SB, tn)
                       * dmn[:, None, :]).reshape(gs, tn).astype(compute_dtype)
                w = w + bb[:, None, :]
            w_ref[:] = w.reshape(tk, tn)

        xc = x_ref[:].astype(compute_dtype)            # [TM, TK]
        part = jnp.dot(xc, w_ref[:], preferred_element_type=jnp.float32)
        if biasdot:
            gs = s_ref.shape[0]
            kt_i = pl.program_id(1)
            m_ = b_ref[:].astype(jnp.float32)
            dmn = f16_bits_to_f32(dm_ref[:].astype(jnp.int32))
            bb = -(m_.reshape(gs // SB, SB, tn)
                   * dmn[:, None, :]).reshape(gs, tn)
            # xs arrives TRANSPOSED [gs_total, M] so the per-k-tile slice is
            # a sublane slice; contract dim0 x dim0 (MXU lhs transpose)
            xs = xs_ref[pl.ds(kt_i * gs, gs), :].astype(jnp.float32)
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
    return kernel


def bench_variant(name, unpack, biasdot, tile_k=2048, tile_n=512):
    lin = synth_linear(K, N, "q4k", zeros=True)
    x = jnp.zeros((M, K), jnp.float32)
    gs = tile_k // GROUP
    n_kt = K // tile_k
    kern = functools.partial(make_kernel(unpack, biasdot),
                             n_kt=n_kt, tile_m=M)
    s_in = lin.s
    d_in = jax.lax.bitcast_convert_type(lin.d, jnp.uint16)
    dm_in = jax.lax.bitcast_convert_type(lin.dm, jnp.uint16)

    def call(c, x):
        xx = x.at[0, 0].set(c)
        xs = jnp.sum(xx.reshape(M, K // GROUP, GROUP), axis=2).T
        out = pl.pallas_call(
            kern,
            grid=(N // tile_n, n_kt, 1),
            in_specs=[
                pl.BlockSpec((M, tile_k), lambda n, k, m: (m, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K // GROUP, M), lambda n, k, m: (0, m),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_k // 2, tile_n), lambda n, k, m: (k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gs, tile_n), lambda n, k, m: (k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gs, tile_n), lambda n, k, m: (k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gs // SB, tile_n), lambda n, k, m: (k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gs // SB, tile_n), lambda n, k, m: (k, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, tile_n), lambda n, k, m: (0, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tile_k, tile_n), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
                vmem_limit_bytes=64 * 2 ** 20),
        )(xx, xs, lin.q, s_in, lin.b, d_in, dm_in)
        return jnp.sum(out)

    qb = (lin.q.nbytes + lin.s.nbytes + lin.b.nbytes
          + lin.d.nbytes + lin.dm.nbytes)
    try:
        t = timeit(call, x)
        print(f"{name:14s}: {t*1e3:7.3f} ms  {qb/t/1e9:6.1f} GB/s",
              flush=True)
    except Exception as e:
        print(f"{name:14s}: {type(e).__name__}: {str(e)[:300]}", flush=True)


def check_correct(unpack, biasdot):
    """Numerical check vs production qmm on random weights (CPU interpret
    not needed — compare on device)."""
    rng = np.random.default_rng(0)
    lin = synth_linear(512, 256, "q4k", zeros=False, rng=rng)
    x = jnp.asarray(rng.standard_normal((M, 512)), jnp.float32)
    ref = qmm_pallas(x, lin.q, lin.s, lin.b, None, group=32, packed=True,
                     zero_point=0, d=lin.d, dm=lin.dm, sb=8)
    gs = 512 // GROUP
    kern = functools.partial(make_kernel(unpack, biasdot), n_kt=1, tile_m=M)
    xs = jnp.sum(x.reshape(M, 512 // GROUP, GROUP), axis=2).T
    out = pl.pallas_call(
        kern,
        grid=(2, 1, 1),
        in_specs=[
            pl.BlockSpec((M, 512), lambda n, k, m: (m, k)),
            pl.BlockSpec((512 // GROUP, M), lambda n, k, m: (0, m)),
            pl.BlockSpec((256, 128), lambda n, k, m: (k, n)),
            pl.BlockSpec((gs, 128), lambda n, k, m: (k, n)),
            pl.BlockSpec((gs, 128), lambda n, k, m: (k, n)),
            pl.BlockSpec((gs // SB, 128), lambda n, k, m: (k, n)),
            pl.BlockSpec((gs // SB, 128), lambda n, k, m: (k, n)),
        ],
        out_specs=pl.BlockSpec((M, 128), lambda n, k, m: (0, n)),
        out_shape=jax.ShapeDtypeStruct((M, 256), jnp.float32),
        scratch_shapes=[pltpu.VMEM((512, 128), jnp.bfloat16)],
    )(x, xs, lin.q, lin.s, lin.b,
      jax.lax.bitcast_convert_type(lin.d, jnp.uint16),
      jax.lax.bitcast_convert_type(lin.dm, jnp.uint16))
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    return err


def main():
    for mode in ("noscale", "nounpack", "storeonly", "splitstore",
                 "splitstore_bias"):
        import functools as _ft
        kern_factory = lambda u, b, m=mode: make_kernel2(m)
        _orig = globals()["make_kernel"]
        globals()["make_kernel"] = kern_factory
        try:
            bench_variant("diag_" + mode, None, False)
        finally:
            globals()["make_kernel"] = _orig
    for name, unpack, biasdot in (
            ("v0_current", unpack_v0, False),
            ("v4_biasdot", unpack_v1, True),
            ("v5_f32+biasdot", unpack_v3, True)):
        try:
            err = check_correct(unpack, biasdot)
        except Exception as e:
            print(f"{name:14s}: COMPILE FAIL {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)
            continue
        bench_variant(name + (f" (err {err:.1e})" if err > 1e-3 else ""),
                      unpack, biasdot)


if __name__ == "__main__":
    main()
