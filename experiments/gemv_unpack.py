"""B=1 GEMV nibble-unpack variants (q4k kernel is VPU-bound at ~271 GB/s
vs q8's ~476 effective; the i32-width unpack chain is the cost).

  v0  — production chain: widen, &0xF, (>>4)&0xF, 2 converts
  v1  — drop the redundant & after >>4
  v2  — single convert: qf = f32(q); hi = floor(qf/16); lo = qf - 16*hi
  v3  — v2 + algebraic MAC: hi*xh + lo*xl = qf*(xh/16) + lo*(xl - xh/16)
        (one fewer per-byte multiply)

Usage: python experiments/gemv_unpack.py [reps]
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
from chatllm_tpu.ops.pallas.gemv_kernel import f16_bits_to_f32, _reduce_axis0

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
K, N = 4096, 14336
GROUP, SB = 32, 8


def make_kernel(mode):
    def kernel(x_ref, q_ref, s_ref, b_ref, d_ref, dm_ref, o_ref, acc_ref, *,
               n_kt):
        kt = pl.program_id(1)

        @pl.when(kt == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        q = q_ref[:]
        tn = q.shape[1]
        xx = x_ref[:].astype(jnp.float32)
        half = GROUP // 2
        gs = q.shape[0] // half
        qg = q.reshape(gs, half, tn)
        xg = xx.reshape(gs, GROUP, 1)
        xl, xh = xg[:, :half], xg[:, half:]
        if mode == "v0":
            qi = qg.astype(jnp.int32)
            lo = (qi & 0xF).astype(jnp.float32)
            hi = ((qi >> 4) & 0xF).astype(jnp.float32)
            p = lo * xl + hi * xh
        elif mode == "v1":
            qi = qg.astype(jnp.int32)
            lo = (qi & 0xF).astype(jnp.float32)
            hi = (qi >> 4).astype(jnp.float32)
            p = lo * xl + hi * xh
        elif mode == "v2":
            qf = qg.astype(jnp.int32).astype(jnp.float32)
            hi = jnp.floor(qf * jnp.float32(0.0625))
            lo = qf - hi * jnp.float32(16.0)
            p = lo * xl + hi * xh
        else:  # v3
            qf = qg.astype(jnp.int32).astype(jnp.float32)
            hi = jnp.floor(qf * jnp.float32(0.0625))
            lo = qf - hi * jnp.float32(16.0)
            # hi*xh + lo*xl == qf*(xh/16) + lo*(xl - xh/16)
            p = qf * (xh * jnp.float32(0.0625)) \
                + lo * (xl - xh * jnp.float32(0.0625))
        t = p
        h = half
        while h > 8:
            t = t[:, : h // 2] + t[:, h // 2:]
            h //= 2
        sc = s_ref[:].astype(jnp.float32)
        dd = f16_bits_to_f32(d_ref[:].astype(jnp.int32))
        s = (sc.reshape(gs // SB, SB, tn) * dd[:, None, :]).reshape(gs, tn)
        t = t * s[:, None, :]
        acc_ref[:] += _reduce_axis0(t)
        m_ = b_ref[:].astype(jnp.float32)
        dmn = f16_bits_to_f32(dm_ref[:].astype(jnp.int32))
        bb = (m_.reshape(gs // SB, SB, tn) * dmn[:, None, :]).reshape(gs, tn)
        xs = xx.reshape(gs, GROUP)
        w = GROUP
        while w > 1:
            xs = xs[:, : w // 2] + xs[:, w // 2:]
            w //= 2
        rb = _reduce_axis0(bb * xs)
        acc_ref[0:1, :] -= rb[None, :]

        @pl.when(kt == n_kt - 1)
        def _():
            o_ref[:] = acc_ref[:]
    return kernel


def bench(mode, tile_n=1024, tile_k=2048):
    lin = synth_linear(K, N, "q4k", zeros=True)
    x = jnp.zeros((K, 1), jnp.float32)
    gs = tile_k // GROUP
    n_kt = K // tile_k
    kern = functools.partial(make_kernel(mode), n_kt=n_kt)
    d_in = jax.lax.bitcast_convert_type(lin.d, jnp.uint16)
    dm_in = jax.lax.bitcast_convert_type(lin.dm, jnp.uint16)

    def call(c, x):
        out = pl.pallas_call(
            kern,
            grid=(N // tile_n, n_kt),
            in_specs=[
                pl.BlockSpec((tile_k, 1), lambda n, k: (k, 0)),
                pl.BlockSpec((tile_k // 2, tile_n), lambda n, k: (k, n)),
                pl.BlockSpec((gs, tile_n), lambda n, k: (k, n)),
                pl.BlockSpec((gs, tile_n), lambda n, k: (k, n)),
                pl.BlockSpec((gs // SB, tile_n), lambda n, k: (k, n)),
                pl.BlockSpec((gs // SB, tile_n), lambda n, k: (k, n)),
            ],
            out_specs=pl.BlockSpec((8, tile_n), lambda n, k: (0, n)),
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, tile_n), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(x.at[0, 0].set(c), lin.q, lin.s, lin.b, d_in, dm_in)
        return jnp.sum(out)

    @jax.jit
    def run(seed, x):
        def body(c, _):
            return c + call(c, x) * 1e-20, None
        c, _ = jax.lax.scan(body, seed, None, length=REPS)
        return c

    _ = np.asarray(run(jnp.float32(0), x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(run(jnp.float32(0), x))
        best = min(best, time.perf_counter() - t0)
    t = best / REPS
    qb = sum(a.nbytes for a in (lin.q, lin.s, lin.b, lin.d, lin.dm))
    print(f"{mode}: {t*1e3:7.3f} ms  {qb/t/1e9:6.1f} GB/s", flush=True)


def check(mode):
    """Numerics vs production qgemv."""
    from chatllm_tpu.ops.pallas.gemv_kernel import qgemv_pallas

    rng = np.random.default_rng(0)
    lin = synth_linear(2048, 256, "q4k", zeros=False, rng=rng)
    x = jnp.asarray(rng.standard_normal((1, 2048)), jnp.float32)
    ref = qgemv_pallas(x, lin.q, lin.s, lin.b, None, group=32, packed=True,
                       zero_point=0, d=lin.d, dm=lin.dm, sb=8)
    gs = 2048 // GROUP
    kern = functools.partial(make_kernel(mode), n_kt=1)
    out = pl.pallas_call(
        kern, grid=(2, 1),
        in_specs=[pl.BlockSpec((2048, 1), lambda n, k: (k, 0)),
                  pl.BlockSpec((1024, 128), lambda n, k: (k, n)),
                  pl.BlockSpec((gs, 128), lambda n, k: (k, n)),
                  pl.BlockSpec((gs, 128), lambda n, k: (k, n)),
                  pl.BlockSpec((gs // SB, 128), lambda n, k: (k, n)),
                  pl.BlockSpec((gs // SB, 128), lambda n, k: (k, n))],
        out_specs=pl.BlockSpec((8, 128), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )(x.reshape(2048, 1), lin.q, lin.s, lin.b,
      jax.lax.bitcast_convert_type(lin.d, jnp.uint16),
      jax.lax.bitcast_convert_type(lin.dm, jnp.uint16))
    y = jnp.sum(out, axis=0, keepdims=True)
    err = float(jnp.max(jnp.abs(y - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    return err


for mode in ("v0", "v1", "v2", "v3"):
    try:
        err = check(mode)
        bench(mode if err < 1e-4 else f"{mode}(ERR {err:.1e})")
    except Exception as e:
        print(f"{mode}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
