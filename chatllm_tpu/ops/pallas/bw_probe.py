"""Sustained pure-READ HBM bandwidth probe.

Decode's weight pass is read-only, so its roofline is the pure-read rate —
NOT the read+write rate a `y = a*x+b` stream measures (and single-shot
timings through the axon relay carry a ~25-35 ms dispatch+readback floor,
so the kernel is repeated inside ONE jitted scan and amortized).

Measured on the v5e relay (2026-08-20): ~393-395 GB/s pure read vs
~150-290 GB/s for the old read+write probe — see BASELINE.md "Pure-read
roofline correction".
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _read_kernel(c_ref, q_ref, o_ref):
    # touch every loaded tile minimally so the DMA can't be elided
    o_ref[0, 0] = (jnp.sum(q_ref[:].astype(jnp.int32)).astype(jnp.float32)
                   + c_ref[0, 0])


def measure_read_bw(chunk_mb: int = 256, best_of: int = 5) -> float:
    """Bytes/s of sustained sequential HBM reads (one chip).

    SLOPE method: the axon relay adds a ~25-35 ms dispatch+readback floor
    per call, so a single timing is floor-dominated unless the kernel does
    seconds of work.  Timing the SAME jitted scan at two rep counts and
    taking (t_hi - t_lo) / (reps_hi - reps_lo) cancels the floor exactly.
    """
    rows = chunk_mb * (1 << 20) // 512
    rows -= rows % 1024
    q = jnp.zeros((rows, 512), jnp.uint8)
    tile_k = 1024
    grid = (rows // tile_k,)

    def make(reps):
        @jax.jit
        def run(seed, q):
            def body(c, _):
                out = pl.pallas_call(
                    _read_kernel,
                    grid=grid,
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((tile_k, 512), lambda k: (k, 0),
                                     memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((1, 1), lambda k: (0, 0),
                                           memory_space=pltpu.SMEM),
                    out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
                )(c.reshape(1, 1), q)
                return c + out[0, 0] * 1e-20, None
            c, _ = jax.lax.scan(body, seed, None, length=reps)
            return c
        return run

    # rep gap sized so the work DELTA (~12 GB ≈ 30 ms at HBM rates) dwarfs
    # the floor's run-to-run variance; median over pairs resists outliers
    # (min-of-differences would bias the estimate HIGH).
    lo, hi = 4, 4 + max(8, int(12 * (1 << 30) / q.nbytes))
    run_lo, run_hi = make(lo), make(hi)
    _ = np.asarray(run_lo(jnp.float32(0), q))
    _ = np.asarray(run_hi(jnp.float32(0), q))
    slopes = []
    for _i in range(max(best_of, 5)):
        # drain any pending async work so neither timing absorbs a tail
        _ = np.asarray(run_lo(jnp.float32(0), q))
        if _i % 2 == 0:
            t0 = time.perf_counter()
            _ = np.asarray(run_lo(jnp.float32(0), q))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = np.asarray(run_hi(jnp.float32(0), q))
            t_hi = time.perf_counter() - t0
        else:              # alternate order: cancels order-dependent drift
            t0 = time.perf_counter()
            _ = np.asarray(run_hi(jnp.float32(0), q))
            t_hi = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = np.asarray(run_lo(jnp.float32(0), q))
            t_lo = time.perf_counter() - t0
        if t_hi > t_lo:
            slopes.append((t_hi - t_lo) / (hi - lo))
    if not slopes:
        return -1.0
    med = float(np.median(slopes))
    return q.nbytes / med if med > 0 else -1.0
