"""Model-scale decode-GEMV bench: llama-3-8B shapes, q4 packed + f32 scales.

Chains all 7 projections x 32 layers per token (lax.scan over stacked
per-layer weights, fori_loop over tokens) so it measures exactly what the
engine's decode loop pays per token for the linear layers.

  python experiments/gemv_model_bench.py vpu [tile_n tile_k]
  python experiments/gemv_model_bench.py mxu
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chatllm_tpu.ops.pallas.gemv_kernel import qgemv_pallas
from chatllm_tpu.ops.pallas.qmm_kernel import qmm_pallas


def _stream_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_kt):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # minimal compute: touch every input tile with ~1 op per 8 rows
    q = q_ref[:]
    acc_ref[:] += (q[:8].astype(jnp.int32).astype(jnp.float32) * x_ref[0, 0]
                   + s_ref[:8].astype(jnp.float32) * 0.0)

    @pl.when(kt == n_kt - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_k", "vmem_mb"))
def stream_read(x, q, s, *, tile_n=1024, tile_k=2048, vmem_mb=0):
    """Same grid/BlockSpecs as qgemv but near-zero compute — measures the
    DMA ceiling for this access pattern."""
    K2, N = q.shape
    K = K2 * 2
    gs = tile_k // G
    n_kt = K // tile_k
    xc = x.reshape(K, 1).astype(jnp.float32)
    if s.dtype == jnp.float16:   # Mosaic has no f16 dtype
        s = jax.lax.bitcast_convert_type(s, jnp.uint16)
    out = pl.pallas_call(
        functools.partial(_stream_kernel, n_kt=n_kt),
        grid=(N // tile_n, n_kt),
        in_specs=[
            pl.BlockSpec((tile_k, 1), lambda n, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k // 2, tile_n), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((gs, tile_n), lambda n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile_n), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, tile_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            **({"vmem_limit_bytes": vmem_mb * 2 ** 20} if vmem_mb else {})),
    )(xc, q, s)
    return jnp.sum(out, axis=0, keepdims=True)

L = 32
H, KV, F = 4096, 1024, 14336
G = 32
TOKENS = 32
# (K, N) per projection, in forward order
SHAPES = [("q", H, H), ("k", H, KV), ("v", H, KV), ("o", H, H),
          ("gate", H, F), ("up", H, F), ("down", F, H)]


def make_weights():
    """Cheap deterministic pseudo-weights (iota math — jax.random at these
    sizes costs ~12 min through the axon tunnel)."""
    ws = {}
    total = 0
    for idx, (name, K, N) in enumerate(SHAPES):
        def mkq(idx=idx, K=K, N=N):
            r = jax.lax.broadcasted_iota(jnp.int32, (L, K // 2, N), 2)
            c = jax.lax.broadcasted_iota(jnp.int32, (L, K // 2, N), 1)
            return ((r * 1103515245 + c * 12345 + idx) >> 7).astype(jnp.uint8)

        def mks(idx=idx, K=K, N=N):
            r = jax.lax.broadcasted_iota(jnp.float32, (L, K // G, N), 2)
            return (0.005 + 0.00001 * jnp.cos(r + idx)).astype(jnp.float16)

        q = jax.jit(mkq)()
        s = jax.jit(mks)()
        ws[name] = (q, s)
        total += q.size + s.size * s.dtype.itemsize
    np.asarray(ws["down"][1][0, 0, :1])
    print(f"weights on device: {total/1e9:.2f} GB", flush=True)
    return ws, total


def run(kernel_name, tile_n=1024, tile_k=2048, vmem_mb=0, ws_total=None):
    ws, total = ws_total or make_weights()

    def proj(x, q, s, K, N):
        if kernel_name == "vpu":
            return qgemv_pallas(x, q, s, None, None, group=G, packed=True,
                                zero_point=8, tile_n=tile_n, tile_k=tile_k,
                                vmem_mb=vmem_mb)
        if kernel_name == "stream":
            return stream_read(x, q, s, tile_n=tile_n, tile_k=tile_k,
                               vmem_mb=vmem_mb)
        if kernel_name == "vpu_bf16":
            return qgemv_bf16(x, q, s, tile_n=tile_n, tile_k=tile_k,
                              vmem_mb=vmem_mb)
        return qmm_pallas(x, q, s, None, None, group=G, packed=True,
                          zero_point=8)

    def layer(x, lw):
        # lw: dict name -> (q[K/2,N], s[K/G,N])
        qo = proj(x, *lw["q"], H, H)
        ko = proj(x, *lw["k"], H, KV)
        vo = proj(x, *lw["v"], H, KV)
        oo = proj(jnp.tanh(qo * 1e-3), *lw["o"], H, H)
        h = jnp.tanh(oo * 1e-3)
        g = proj(h, *lw["gate"], H, F)
        u = proj(h, *lw["up"], H, F)
        d = proj(jnp.tanh(g * u * 1e-4), *lw["down"], F, H)
        return jnp.tanh(d * 1e-3) + (jnp.sum(ko) + jnp.sum(vo)) * 1e-9

    @jax.jit
    def decode(x0, ws):
        def tok(t, x):
            def body(x, lw):
                return layer(x, lw), 0.0
            x, _ = jax.lax.scan(body, x, ws)
            return x
        return jax.lax.fori_loop(0, TOKENS, tok, x0)

    x0 = jnp.ones((1, H), jnp.float32)
    print(f"[{kernel_name} tn={tile_n} tk={tile_k} vm={vmem_mb}] compiling...", flush=True)
    t0 = time.perf_counter()
    np.asarray(decode(x0, ws))
    print(f"compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    np.asarray(decode(x0, ws))
    dt = (time.perf_counter() - t0) / TOKENS
    nparams = sum(K * N for _, K, N in SHAPES) * L
    print(f"[{kernel_name}] {dt*1e3:.2f} ms/token -> {1/dt:.1f} tok/s "
          f"({total/dt/1e9:.0f} GB/s eff, {nparams/1e9:.1f}B params)",
          flush=True)


if __name__ == "__main__":
    # args: either "<kernel> [tn tk]" or "sweep <kernel:tn:tk> <kernel:tn:tk> ..."
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        wt = make_weights()
        for spec in sys.argv[2:]:
            parts = spec.split(":")
            name = parts[0]
            tn = int(parts[1]) if len(parts) > 1 else 1024
            tk = int(parts[2]) if len(parts) > 2 else 2048
            vm = int(parts[3]) if len(parts) > 3 else 0
            try:
                run(name, tn, tk, vm, ws_total=wt)
            except Exception as e:
                print(f"[{spec}] FAILED: {str(e)[:200]}", flush=True)
    else:
        name = sys.argv[1] if len(sys.argv) > 1 else "vpu"
        tn = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
        tk = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
        run(name, tn, tk)


# ---------------- bf16-compute VPU variant ----------------
# Tests whether the VPU dequant-MAC is op-throughput-bound: if bf16 lanes
# run 2x f32, this closes most of the gap to the stream ceiling.

def _kernel_bf16(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_kt, group):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:]
    tn = q.shape[1]
    xx = x_ref[:].astype(jnp.bfloat16)
    half = group // 2
    gs = q.shape[0] // half
    qi = q.reshape(gs, half, tn).astype(jnp.int32)
    lo = (qi & 0xF).astype(jnp.bfloat16)
    hi = ((qi >> 4) & 0xF).astype(jnp.bfloat16)
    xg = xx.reshape(gs, group, 1)
    p = lo * xg[:, :half] + hi * xg[:, half:]
    h = half
    t = p
    while h > 8:
        t = t[:, : h // 2] + t[:, h // 2:]
        h //= 2
    from chatllm_tpu.ops.pallas.gemv_kernel import f16_bits_to_f32
    sc = f16_bits_to_f32(s_ref[:].astype(jnp.int32)).astype(jnp.bfloat16)
    t = t * sc[:, None, :]
    g = gs
    while g > 1 and g % 2 == 0:
        t = t[: g // 2] + t[g // 2:]
        g //= 2
    r = t[0]
    for i in range(1, g):
        r = r + t[i]
    acc_ref[:] += r.astype(jnp.float32)

    @pl.when(kt == n_kt - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_k", "vmem_mb"))
def qgemv_bf16(x, q, s, *, tile_n=1024, tile_k=2048, vmem_mb=0):
    K2, N = q.shape
    K = K2 * 2
    gs = tile_k // G
    n_kt = K // tile_k
    xc = x.reshape(K, 1).astype(jnp.float32)
    s_in = jax.lax.bitcast_convert_type(s, jnp.uint16) if s.dtype == jnp.float16 else s
    out = pl.pallas_call(
        functools.partial(_kernel_bf16, n_kt=n_kt, group=G),
        grid=(N // tile_n, n_kt),
        in_specs=[
            pl.BlockSpec((tile_k, 1), lambda n, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k // 2, tile_n), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((gs, tile_n), lambda n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile_n), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, tile_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            **({"vmem_limit_bytes": vmem_mb * 2 ** 20} if vmem_mb else {})),
    )(xc, q, s_in)
    return jnp.sum(out, axis=0, keepdims=True)
