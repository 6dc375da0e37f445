"""Decode-GEMV strategy probe (round 2).

Question: B=1 decode is stuck at ~54 tok/s (MXU weight-load bound per
round-1 analysis).  Which path can beat it on this chip?

Variants, all streaming L layers of [K, N] weights per "token step" with
the activation carried through (so nothing can be hoisted):

  mxu_bf16     dot(x_bf16, W_bf16)                     2 B/weight HBM
  mxu_dequant  dot(x_bf16, dequant(W_int8))  (XLA)     1 B/weight HBM
  mxu_int8     dot_general(x_int8, W_int8 -> int32)    1 B/weight HBM
  pallas_qmm   the production fused kernel             1 B/weight
  vpu_gemv     Pallas, VPU-only: acc(8,TN) += x*w      1 B/weight, no MXU
  stream_max   Pallas, 1 op/elem (read-BW upper bound) 1 B/weight

Run ON THE TPU (not under tests' CPU forcing):
  python experiments/gemv_probe.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, K, N = 16, 4096, 14336
STEPS = 8
GROUP = 32


def timed(fn, *args):
    import sys as _s
    print("  compiling...", flush=True)
    y = fn(*args)
    np.asarray(jax.tree.leaves(y)[0])          # readback = honest sync
    t0 = time.perf_counter()
    y = fn(*args)
    np.asarray(jax.tree.leaves(y)[0])
    dt = (time.perf_counter() - t0)
    return dt / STEPS


def report(name, dt_step, bytes_per_step):
    gbs = bytes_per_step / dt_step / 1e9
    toks = 1.0 / (dt_step * (8e9 / (L * K * N)))   # scaled to an 8B model
    print(f"{name:14s} {dt_step*1e3:8.2f} ms/step  {gbs:7.1f} GB/s  "
          f"-> {toks:6.1f} tok/s @8B", flush=True)


def chain(y, B):
    # y: [B, N] f32/int32 -> next x [B, K], data-dependent
    h = y[:, :K].astype(jnp.float32)
    return jnp.tanh(h * 1e-3)


def run_mxu(W, B, in_dtype, out_pref):
    x0 = jnp.ones((B, K), jnp.float32)

    @jax.jit
    def step_many(x):
        def step(x, _):
            def layer(x, w):
                xc = x.astype(in_dtype)
                y = jax.lax.dot_general(
                    xc, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=out_pref)
                return chain(y, B), None
            x, _ = jax.lax.scan(layer, x, W)
            return x, None
        x, _ = jax.lax.scan(step, x, None, length=STEPS)
        return x

    return timed(step_many, x0)


def run_mxu_dequant(Wq, Ws, B):
    x0 = jnp.ones((B, K), jnp.float32)

    @jax.jit
    def step_many(x):
        def step(x, _):
            def layer(x, wpair):
                w, s = wpair
                wf = (w.astype(jnp.bfloat16).reshape(K // GROUP, GROUP, N)
                      * s[:, None, :].astype(jnp.bfloat16)).reshape(K, N)
                y = jnp.dot(x.astype(jnp.bfloat16), wf,
                            preferred_element_type=jnp.float32)
                return chain(y, B), None
            x, _ = jax.lax.scan(layer, x, (Wq, Ws))
            return x, None
        x, _ = jax.lax.scan(step, x, None, length=STEPS)
        return x

    return timed(step_many, x0)


def run_pallas_qmm(Wq, Ws, B):
    from chatllm_tpu.ops.pallas.qmm_kernel import qmm_pallas
    x0 = jnp.ones((B, K), jnp.float32)

    @jax.jit
    def step_many(x):
        def step(x, _):
            def layer(x, wpair):
                w, s = wpair
                y = qmm_pallas(x, w, s)
                return chain(y, B), None
            x, _ = jax.lax.scan(layer, x, (Wq, Ws))
            return x, None
        x, _ = jax.lax.scan(step, x, None, length=STEPS)
        return x

    return timed(step_many, x0)


# ---------------- Pallas VPU-only GEMV ----------------

def _vpu_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_kt):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:]                                  # [TK, TN] int8
    x = x_ref[:]                                  # [TK, 1]  f32
    TK, TN = w.shape
    # per-group scale folded via x (x already includes nothing; do
    # group-scale after partial sums to stay honest about op count):
    p = w.astype(jnp.float32) * x                 # convert + mul
    pg = p.reshape(TK // GROUP, GROUP, TN)
    # group partial sums, sublane-preserving: (G/8 adds of (8,TN))
    t = pg.reshape(TK // GROUP, GROUP // 8, 8, TN).sum(axis=1)   # [gs,8,TN]
    s = s_ref[:]                                  # [gs, TN]
    acc_ref[:] += (t * s[:, None, :]).sum(axis=0)                # [8, TN]

    @pl.when(kt == n_kt - 1)
    def _():
        o_ref[:] = acc_ref[:]


def vpu_gemv(x, w, s, *, tile_n=2048, tile_k=256):
    n_kt = K // tile_k
    out = pl.pallas_call(
        lambda x_ref, w_ref, s_ref, o_ref, acc_ref: _vpu_kernel(
            x_ref, w_ref, s_ref, o_ref, acc_ref, n_kt=n_kt),
        grid=(N // tile_n, n_kt),
        in_specs=[
            pl.BlockSpec((tile_k, 1), lambda n, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k // GROUP, tile_n), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile_n), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, tile_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=3 * K * N, bytes_accessed=K * N, transcendentals=0),
    )(x, w, s)
    return out.sum(axis=0)[None, :]              # [1, N]


def run_vpu(Wq, Ws):
    x0 = jnp.ones((1, K), jnp.float32)

    @jax.jit
    def step_many(x):
        def step(x, _):
            def layer(x, wpair):
                w, s = wpair
                y = vpu_gemv(x.reshape(K, 1), w, s)
                return chain(y, 1), None
            x, _ = jax.lax.scan(layer, x, (Wq, Ws))
            return x, None
        x, _ = jax.lax.scan(step, x, None, length=STEPS)
        return x

    return timed(step_many, x0)


# ---------------- streaming upper bound ----------------

def _stream_kernel(w_ref, o_ref, acc_ref, *, n_kt):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:]                                  # [TK, TN] int8
    TK, TN = w.shape
    # Mosaic can't reduce int8; widen (still ~2 ops/elem, read-BW bound)
    acc_ref[:] = jnp.maximum(
        acc_ref[:], w.reshape(TK // 8, 8, TN).astype(jnp.int32).max(axis=0))

    @pl.when(kt == n_kt - 1)
    def _():
        o_ref[:] = acc_ref[:]


def stream_max(w, *, tile_n=2048, tile_k=256):
    n_kt = K // tile_k
    return pl.pallas_call(
        lambda w_ref, o_ref, acc_ref: _stream_kernel(
            w_ref, o_ref, acc_ref, n_kt=n_kt),
        grid=(N // tile_n, n_kt),
        in_specs=[pl.BlockSpec((tile_k, tile_n), lambda n, k: (k, n),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, tile_n), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, tile_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(w)


def run_stream(Wq):
    @jax.jit
    def step_many():
        def step(c, _):
            def layer(c, w):
                m = stream_max(w)
                return c + m.max(), None
            c, _ = jax.lax.scan(layer, c, Wq)
            return c, None
        c, _ = jax.lax.scan(step, jnp.int32(0), None, length=STEPS)
        return c

    y = step_many()
    np.asarray(y)
    t0 = time.perf_counter()
    np.asarray(step_many())
    return (time.perf_counter() - t0) / STEPS


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    # generate on device — host->device of ~1 GB through the axon tunnel
    # takes minutes
    key = jax.random.key(0)
    Wq = jax.jit(lambda k: jax.random.randint(
        k, (L, K, N), -127, 127, dtype=jnp.int8))(key)
    Ws = jax.jit(lambda k: jax.random.uniform(
        k, (L, K // GROUP, N), jnp.float32) * 0.01)(key)
    np.asarray(Ws[0, 0, :1])
    print("weights ready", flush=True)
    int8_bytes = L * K * N
    which = sys.argv[1:] or ["stream", "vpu", "mxu_int8", "mxu_dequant",
                             "pallas_qmm", "mxu_bf16", "mxu_bf16_b8"]

    if "stream" in which:
        report("stream_max", run_stream(Wq), int8_bytes)
    if "vpu" in which:
        report("vpu_gemv", run_vpu(Wq, Ws), int8_bytes)
    if "mxu_int8" in which:
        report("mxu_int8", run_mxu(Wq, 1, jnp.int8, jnp.int32), int8_bytes)
    if "mxu_dequant" in which:
        report("mxu_dequant", run_mxu_dequant(Wq, Ws, 1), int8_bytes)
    if "pallas_qmm" in which:
        report("pallas_qmm", run_pallas_qmm(Wq, Ws, 1), int8_bytes)
    if "mxu_bf16" in which or "mxu_bf16_b8" in which:
        Wb = (Wq.astype(jnp.bfloat16) * 0.01)
        del Wq
        if "mxu_bf16" in which:
            report("mxu_bf16", run_mxu(Wb, 1, jnp.bfloat16, jnp.float32),
                   2 * int8_bytes)
        if "mxu_bf16_b8" in which:
            report("mxu_bf16_b8", run_mxu(Wb, 8, jnp.bfloat16, jnp.float32),
                   2 * int8_bytes)


if __name__ == "__main__":
    main()
