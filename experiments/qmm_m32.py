"""Why does the fused dequant-matmul stream only ~173 GB/s at M=32 when
the GEMV kernel hits ~290 GB/s at M=1?  (bhsd_decode.py no_attn floor =
1273 tok/s = 25.1 ms for 4.34 GB.)

IMPORTANT harness note: a single np.asarray readback through the axon
relay costs ~25-35 ms regardless of work, so each measurement runs the
kernel `reps` times inside ONE jitted lax.scan (carry threaded through a
tiny operand so nothing hoists) with reps high enough that real work
dominates the floor.

Usage: python experiments/qmm_m32.py [M] [reps]
"""
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
from chatllm_tpu.ops.pallas.qmm_kernel import qmm_pallas

M = int(sys.argv[1]) if len(sys.argv) > 1 else 32
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2048


def timeit(mkfn, *args, reps=None):
    """mkfn(c, *args) -> scalar contribution; c is a f32 carry."""
    reps = reps or REPS

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


def qbytes(lin):
    n = lin.q.nbytes + lin.s.nbytes
    for a in (lin.b, lin.d, lin.dm):
        if a is not None:
            n += a.nbytes
    return n


def bench_fmt(fmt, K=4096, N=14336, **tiles):
    lin = synth_linear(K, N, fmt, zeros=True)
    x = jnp.zeros((M, K), jnp.float32)

    def call(c, x):
        y = qmm_pallas(
            x.at[0, 0].set(c), lin.q, lin.s, lin.b, None,
            group=lin.group_size, packed=lin.packed,
            zero_point=lin.zero_point, d=lin.d, dm=lin.dm, sb=lin.sb, **tiles)
        return jnp.sum(y)

    t = timeit(call, x)
    gbs = qbytes(lin) / t / 1e9
    tag = "+".join(f"{k}={v}" for k, v in tiles.items()) or "default"
    print(f"qmm {fmt:4s} M={M} K={K} N={N} {tag:22s}: "
          f"{t*1e3:7.3f} ms  {gbs:6.1f} GB/s", flush=True)


def _dma_kernel(c_ref, q_ref, o_ref):
    o_ref[0, 0] = (jnp.sum(q_ref[:].astype(jnp.int32)).astype(jnp.float32)
                   + c_ref[0, 0])


def bench_dma(K=4096, N=14336, tile_k=1024, tile_n=512):
    q = jnp.zeros((K // 2, N), jnp.uint8)

    def call(c, q):
        out = pl.pallas_call(
            _dma_kernel,
            grid=(N // tile_n, K // 2 // tile_k),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tile_k, tile_n), lambda n, k: (k, n),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda n, k: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )(c.reshape(1, 1), q)
        return out[0, 0]

    t = timeit(call, q)
    print(f"DMA-only        K={K} N={N} tk={tile_k} tn={tile_n}: "
          f"{t*1e3:7.3f} ms  {q.nbytes/t/1e9:6.1f} GB/s", flush=True)


def main():
    bench_dma()
    for fmt in ("q4k", "q8", "q4"):
        bench_fmt(fmt)
    for tk in (512, 2048, 4096):
        bench_fmt("q4k", tile_k=tk)
    for tn in (256, 1024, 2048):
        bench_fmt("q4k", tile_n=tn)


if __name__ == "__main__":
    main()
