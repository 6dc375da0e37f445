"""Per-op breakdown of 8B prefill at T=2048: time each qmm shape and the
flash kernel in isolation, sum per layer, compare to end-to-end TTFT."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from chatllm_tpu.ops.pallas.qmm_kernel import qmm_pallas
from chatllm_tpu.ops.pallas.flash import flash_attention


def timeit(fn, *args, reps=3):
    # single jit whose OUTPUT is a tiny slice: full-array readback would
    # ship ~100 MB through the axon tunnel and dominate the timing
    @jax.jit
    def run(*a):
        # reduce to a scalar so XLA can't narrow the computation to a slice
        return jnp.sum(jax.tree_util.tree_leaves(fn(*a))[0])

    _ = np.asarray(run(*args))
    best = float("inf")
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best


REPS = 8


def qshape(M, K, N, group=32):
    x = jnp.ones((M, K), jnp.float32) * 0.01
    q = jnp.ones((K // 2, N), jnp.uint8) * 0x57
    s = jnp.ones((K // group, N), jnp.float16) * 0.01

    # amortize the ~28 ms tunnel dispatch+readback over REPS chained calls
    def loop(x, q, s):
        def body(c, _):
            y = qmm_pallas(x * c, q, s, group=group, packed=True, zero_point=8)
            return jnp.sum(y) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=REPS)
        return c

    t = timeit(loop, x, q, s) / REPS
    flops = 2 * M * K * N
    print(f"qmm M={M} K={K} N={N}: {t*1e3:7.2f} ms  "
          f"{flops/t/1e12:6.1f} TFLOP/s  w={(K*N//2+K*N//group*2)/t/1e9:6.1f} GB/s")
    return t


def main():
    print(jax.devices())
    T, D, H, KV, HD, F = 2048, 4096, 32, 8, 128, 14336
    t_q = qshape(T, D, H * HD)
    t_kv = qshape(T, D, KV * HD)
    t_o = qshape(T, H * HD, D)
    t_gu = qshape(T, D, F)
    t_dn = qshape(T, F, D)

    q = jnp.ones((1, T, H, HD), jnp.bfloat16) * 0.01
    k = jnp.ones((1, T, KV, HD), jnp.bfloat16) * 0.01
    v = jnp.ones((1, T, KV, HD), jnp.bfloat16) * 0.01

    def loopf(q, k, v):
        def body(c, _):
            o = flash_attention(q * c, k, v, jnp.int32(0), jnp.int32(T),
                                scale=HD ** -0.5)
            return jnp.sum(o).astype(jnp.bfloat16) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.bfloat16(1.0), None, length=REPS)
        return c

    t_fl = timeit(loopf, q, k, v) / REPS
    print(f"flash T=S=2048: {t_fl*1e3:7.2f} ms")

    # lm_head on the last token only
    t_lm = qshape(8, D, 128256)

    layer = t_q + 2 * t_kv + t_o + 2 * t_gu + t_dn + t_fl
    print(f"per-layer: {layer*1e3:.2f} ms; 32 layers: {layer*32*1e3:.1f} ms; "
          f"+lm_head {t_lm*1e3:.1f} ms")


if __name__ == "__main__":
    main()
