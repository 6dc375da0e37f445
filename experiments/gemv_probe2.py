"""Minimal-compile GEMV probe: ONE kernel + fori_loop over ONE [K, N]
weight (64 MB int8 — far beyond VMEM, so every iteration re-streams HBM).
Avoids the scan-of-scan structure whose compile is pathologically slow
through the axon remote compiler.

  python experiments/gemv_probe2.py [stream|vpu|mxu_int8|mxu_bf16|dequant]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, N = 4096, 16384            # 64 MB int8
ITERS = 64
GROUP = 32


def bench(make_step, bytes_per_iter, name):
    print(f"[{name}] compiling...", flush=True)
    t0 = time.perf_counter()
    fn = make_step()
    y = fn()
    np.asarray(jax.tree.leaves(y)[0])
    print(f"[{name}] compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    np.asarray(jax.tree.leaves(fn())[0])
    dt = (time.perf_counter() - t0) / ITERS
    gbs = bytes_per_iter / dt / 1e9
    toks = 1.0 / (dt * (8e9 / (K * N)))
    print(f"[{name}] {dt*1e3:7.3f} ms/iter  {gbs:7.1f} GB/s  -> {toks:6.1f} tok/s @8B",
          flush=True)


def weights():
    key = jax.random.key(0)
    Wq = jax.jit(lambda k: jax.random.randint(k, (K, N), -127, 127,
                                              dtype=jnp.int8))(key)
    Ws = jax.jit(lambda k: jax.random.uniform(k, (K // GROUP, N)) * 0.01)(key)
    np.asarray(Ws[0, :1])
    return Wq, Ws


# ---- stream (read-BW bound) ----

def _stream_kernel(w_ref, o_ref, acc_ref, *, n_kt):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:]
    TK, TN = w.shape
    acc_ref[:] = jnp.maximum(
        acc_ref[:], w.reshape(TK // 8, 8, TN).astype(jnp.int32).max(axis=0))

    @pl.when(kt == n_kt - 1)
    def _():
        o_ref[:] = acc_ref[:]


def stream_once(w, tile_n=2048, tile_k=512):
    n_kt = K // tile_k
    return pl.pallas_call(
        lambda w_ref, o_ref, acc_ref: _stream_kernel(w_ref, o_ref, acc_ref, n_kt=n_kt),
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


def run_stream(Wq, Ws):
    @jax.jit
    def fn():
        def body(i, c):
            m = stream_once(Wq)
            return c + m[0, 0] + i
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
    return fn


# ---- vpu gemv ----

def _vpu_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_kt):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:]
    x = x_ref[:]
    TK, TN = w.shape
    p = w.astype(jnp.float32) * x
    t = p.reshape(TK // GROUP, GROUP // 8, 8, TN).sum(axis=1)
    s = s_ref[:]
    acc_ref[:] += (t * s[:, None, :]).sum(axis=0)

    @pl.when(kt == n_kt - 1)
    def _():
        o_ref[:] = acc_ref[:]


def vpu_once(x, w, s, tile_n=2048, tile_k=512):
    n_kt = K // tile_k
    out = pl.pallas_call(
        lambda x_ref, w_ref, s_ref, o_ref, acc_ref: _vpu_kernel(
            x_ref, w_ref, s_ref, o_ref, acc_ref, n_kt=n_kt),
        grid=(N // tile_n, n_kt),
        in_specs=[
            pl.BlockSpec((tile_k, 1), lambda n, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k // GROUP, tile_n), lambda n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile_n), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, tile_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, w, s)
    return out.sum(axis=0)


def run_vpu(Wq, Ws):
    @jax.jit
    def fn():
        def body(i, x):
            y = vpu_once(x.reshape(K, 1), Wq, Ws)      # [N]
            return jnp.tanh(y[:K] * 1e-3).reshape(K, 1)
        x = jax.lax.fori_loop(0, ITERS, body, jnp.ones((K, 1), jnp.float32))
        return x
    return fn


# ---- mxu variants ----

def run_mxu_int8(Wq, Ws):
    @jax.jit
    def fn():
        def body(i, x):
            y = jax.lax.dot_general(x, Wq, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return jnp.clip(y[:, :K] >> 8, -127, 127).astype(jnp.int8)
        x = jax.lax.fori_loop(0, ITERS, body,
                              jnp.ones((8, K), jnp.int8))
        return x
    return fn


def run_mxu_bf16(Wq, Ws):
    Wb = (Wq.astype(jnp.bfloat16) * jnp.bfloat16(0.01))

    @jax.jit
    def fn():
        def body(i, x):
            y = jnp.dot(x, Wb, preferred_element_type=jnp.float32)
            return jnp.tanh(y[:, :K] * 1e-3).astype(jnp.bfloat16)
        x = jax.lax.fori_loop(0, ITERS, body, jnp.ones((8, K), jnp.bfloat16))
        return x
    return fn


def run_dequant(Wq, Ws):
    @jax.jit
    def fn():
        def body(i, x):
            wf = (Wq.astype(jnp.bfloat16).reshape(K // GROUP, GROUP, N)
                  * Ws[:, None, :].astype(jnp.bfloat16)).reshape(K, N)
            y = jnp.dot(x, wf, preferred_element_type=jnp.float32)
            return jnp.tanh(y[:, :K] * 1e-3).astype(jnp.bfloat16)
        x = jax.lax.fori_loop(0, ITERS, body, jnp.ones((8, K), jnp.bfloat16))
        return x
    return fn


def run_pallas_qmm(Wq, Ws):
    from chatllm_tpu.ops.pallas.qmm_kernel import qmm_pallas

    @jax.jit
    def fn():
        def body(i, x):
            y = qmm_pallas(x, Wq, Ws)
            return jnp.tanh(y[:, :K] * 1e-3).astype(jnp.float32)
        x = jax.lax.fori_loop(0, ITERS, body, jnp.ones((1, K), jnp.float32))
        return x
    return fn


def main():
    print("device:", jax.devices()[0], flush=True)
    Wq, Ws = weights()
    print("weights ready", flush=True)
    B = K * N
    table = {
        "stream": (run_stream, B),
        "vpu": (run_vpu, B),
        "mxu_int8": (run_mxu_int8, B),
        "mxu_bf16": (run_mxu_bf16, 2 * B),
        "dequant": (run_dequant, B),
        "pallas_qmm": (run_pallas_qmm, B),
    }
    for name in (sys.argv[1:] or list(table)):
        runner, bytes_ = table[name]
        bench(lambda: runner(Wq, Ws), bytes_, name)


if __name__ == "__main__":
    main()
