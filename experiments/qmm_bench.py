"""Microbench for the batched-decode qmm kernel (B=8/32, 8B shapes).

Times the three 8B projection shapes back-to-back over many iterations on
the real chip, reporting effective weight-stream bandwidth and the implied
aggregate decode rate, without building the whole model.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_q4k_like(key, K, N, group=32, sb=8):
    """Superblock q4_k-like planar arrays (packed nibbles + int8 sc/m + f16 d/dm)."""
    kq, ks, kb, kd, km = jax.random.split(key, 5)
    q = jax.random.randint(kq, (K // 2, N), 0, 255, jnp.int32).astype(jnp.uint8)
    G = K // group
    s = jax.random.randint(ks, (G, N), 0, 63, jnp.int32).astype(jnp.int8)
    b = jax.random.randint(kb, (G, N), 0, 63, jnp.int32).astype(jnp.int8)
    d = (jax.random.uniform(kd, (G // sb, N), jnp.float32) * 0.01).astype(jnp.float16)
    dm = (jax.random.uniform(km, (G // sb, N), jnp.float32) * 0.01).astype(jnp.float16)
    return q, s, b, d, dm


def main():
    if os.environ.get("MB_KERNEL", "v1") == "v2":
        from chatllm_tpu.ops.pallas.qmm_decode import \
            qmm_decode_pallas as qmm_pallas
    else:
        from chatllm_tpu.ops.pallas.qmm_kernel import qmm_pallas

    B = int(os.environ.get("MB_B", "32"))
    iters = int(os.environ.get("MB_ITERS", "20"))
    group, sb = 32, 8
    fmt = os.environ.get("MB_FMT", "q4k")

    # llama-3-8B per-layer projections: qkv+o [4096->6144/4096], mlp
    shapes = [(4096, 4096 + 2 * 1024), (4096, 4096),
              (4096, 2 * 14336), (14336, 4096)]
    key = jax.random.PRNGKey(0)
    layers = []
    for K, N in shapes:
        key, sub = jax.random.split(key)
        if fmt == "q4k":
            q, s, b, d, dm = make_q4k_like(sub, K, N, group, sb)
            layers.append((q, s, b, d, dm))
        else:  # plain q4: f16 scales, no superblock
            q = jax.random.randint(sub, (K // 2, N), 0, 255, jnp.int32).astype(jnp.uint8)
            s = (jax.random.uniform(sub, (K // group, N), jnp.float32) * 0.01
                 ).astype(jnp.float16)
            layers.append((q, s, None, None, None))

    xs = [jax.random.normal(jax.random.PRNGKey(i), (B, K), jnp.float32)
          for i, (K, N) in enumerate(shapes)]

    def run_once(xs, layers):
        outs = []
        for x, (q, s, b, d, dm) in zip(xs, layers):
            if d is not None:
                y = qmm_pallas(x, q, s, b, group=group, packed=True,
                               zero_point=0, d=d, dm=dm, sb=sb)
            else:
                y = qmm_pallas(x, q, s, group=group, packed=True, zero_point=8)
            outs.append(jnp.sum(y))
        return jnp.stack(outs)

    # the whole iteration loop runs on device (axon relay dispatch costs
    # ~ms per call; a host loop would measure dispatch, not the kernel)
    @jax.jit
    def run(xs, layers):
        def body(carry, _):
            # fold the previous output back into x so iterations can't be
            # CSE'd or reordered
            xs2 = [x + carry[i] * 1e-20 for i, x in enumerate(xs)]
            return run_once(xs2, layers), None
        r, _ = jax.lax.scan(body, jnp.zeros(len(xs), jnp.float32),
                            None, length=iters)
        return r

    r = run(xs, layers)
    _ = np.asarray(r)
    t0 = time.perf_counter()
    r = run(xs, layers)
    _ = np.asarray(r)
    dt = (time.perf_counter() - t0) / iters

    wbytes = 0
    for (K, N) in shapes:
        wbytes += K * N // 2                    # nibbles
        if fmt == "q4k":
            wbytes += 2 * (K // group) * N      # sc+m int8
            wbytes += 2 * 2 * (K // (group * sb)) * N  # d+dm f16
        else:
            wbytes += 2 * (K // group) * N      # f16 scales
    bw = wbytes / dt
    # implied aggregate tok/s if the whole 8B model ran at this bandwidth:
    # 32 layers x these shapes + lm_head a~1GB extra; scale by bench ratio
    total_model_bytes = 32 * wbytes + 4.5e8
    print(f"B={B} fmt={fmt} per-iter {dt*1e3:.2f} ms, weight-stream "
          f"{bw/1e9:.1f} GB/s, implied agg {B * bw / total_model_bytes:.0f} tok/s")


if __name__ == "__main__":
    main()
