"""Headline benchmark: Llama-3-8B-shaped q4-layout decode on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}

vs_baseline compares against the weight-bandwidth roofline for the *ideal*
q4_k byte footprint (~4.5 bits/weight) at this chip's HBM bandwidth — i.e.
1.0 means decode runs at the speed light allows for a perfectly packed
quantized model.  (BASELINE.md: the reference publishes no numbers; roofline
is the driver-defined target.)
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HBM_BW = {  # bytes/s, per chip
    "v5e": 819e9, "v5litepod": 819e9, "v5": 819e9,
    "v4": 1228e9, "v5p": 2765e9, "v6e": 1640e9,
}

PEAK_BF16_FLOPS = {  # per chip, dense bf16 MXU peak
    "v5e": 197e12, "v5litepod": 197e12, "v5": 197e12,
    "v4": 275e12, "v5p": 459e12, "v6e": 918e12,
}


def main():
    import jax
    import jax.numpy as jnp

    from chatllm_tpu.models.synthetic import (build_synthetic_params,
                                              llama3_8b_config, param_bytes)
    from chatllm_tpu.nn.transformer import init_cache, transformer_forward

    dev = jax.devices()[0]
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    bw = HBM_BW.get(gen, 819e9)

    max_len = int(os.environ.get("BENCH_CTX", "2048"))
    prompt_len = 512
    n_decode = int(os.environ.get("BENCH_STEPS", "48"))

    cfg = llama3_8b_config(max_length=max_len)
    # BENCH_CACHE=q8_0 runs the whole bench with the quantized KV cache —
    # at B=32/ctx-1024 KV reads equal the weight stream, so halving them
    # moves the composite bandwidth ceiling (BASELINE.md B=32 analysis)
    cache_env = os.environ.get("BENCH_CACHE", "").strip()
    if cache_env:
        import dataclasses
        cfg = dataclasses.replace(cfg, cache_dtype=cache_env)
    params = build_synthetic_params(cfg, os.environ.get("BENCH_FMT", "q4k"), zeros=True)
    cache = init_cache(cfg, 1, max_len)
    pbytes = param_bytes(params)

    import numpy as np

    @jax.jit
    def prefill(params, cache, ids, n_past):
        # last_index matches the production prefill (runtime/generate.py):
        # lm_head runs on the final position only
        logits, cache = transformer_forward(cfg, params, ids, cache, n_past,
                                            last_index=ids.shape[1] - 1)
        return jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32), cache

    # the whole greedy decode loop runs on device (lax.scan); the timing
    # sync is a data readback because the axon tunnel's block_until_ready
    # does not wait for real execution
    @functools.partial(jax.jit, donate_argnums=(1,))
    def decode_n(params, cache, tok, n_past):
        def body(carry, _):
            tok, cache, n_past = carry
            logits, cache = transformer_forward(cfg, params, tok[:, None], cache, n_past)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            return (nxt, cache, n_past + 1), nxt
        (tok, cache, n_past), toks = jax.lax.scan(
            body, (tok, cache, n_past), None, length=n_decode)
        return toks, cache

    ids = jnp.zeros((1, prompt_len), jnp.int32)

    # TTFT: compile+warm on first call (readback forces real execution),
    # measure the second call including logits readback
    tok, cache = prefill(params, cache, ids, jnp.int32(0))
    _ = np.asarray(tok)
    t0 = time.perf_counter()
    tok, cache = prefill(params, cache, ids, jnp.int32(0))
    _ = np.asarray(tok)
    ttft_ms = (time.perf_counter() - t0) * 1000

    # decode: warmup (compile) then timed
    toks, cache = decode_n(params, cache, tok, jnp.int32(prompt_len))
    _ = np.asarray(toks)
    t0 = time.perf_counter()
    toks, cache = decode_n(params, cache, tok, jnp.int32(prompt_len))
    _ = np.asarray(toks)
    dt = time.perf_counter() - t0
    tok_s = n_decode / dt

    # long-context TTFT: 2048-token prompt (exercises the Pallas flash
    # prefill kernel; ids fill the whole cache so S=2048 KV attention)
    long_len = min(2048, max_len)
    cache2 = init_cache(cfg, 1, max_len)
    ids2 = jnp.zeros((1, long_len), jnp.int32)
    try:
        tok2, cache2 = prefill(params, cache2, ids2, jnp.int32(0))
        _ = np.asarray(tok2)
        t0 = time.perf_counter()
        tok2, cache2 = prefill(params, cache2, ids2, jnp.int32(0))
        _ = np.asarray(tok2)
        ttft2k_ms = (time.perf_counter() - t0) * 1000
    except Exception:
        ttft2k_ms = -1.0
    del cache2

    # batched decode (continuous-batching throughput shape): B=8 streams
    BB = int(os.environ.get("BENCH_BATCH", "8"))
    del cache, toks, tok      # free the single-stream buffers
    # cap the batched KV footprint so params+cache fit HBM (B=32 x 2048 f16
    # cache alone is 8.6 GB on the 8B config)
    batched_len = min(max_len, 2048 if BB <= 8 else 1024)
    batched_len = int(os.environ.get("BENCH_BATCH_CTX", batched_len))
    cache_b = init_cache(cfg, BB, batched_len)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def decode_n_b(params, cache, tok, n_past):
        def body(carry, _):
            tok, cache, n_past = carry
            logits, cache = transformer_forward(cfg, params, tok, cache, n_past)
            nxt = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
            return (nxt, cache, n_past + 1), None
        (tok, cache, n_past), _ = jax.lax.scan(
            body, (tok, cache, n_past), None, length=n_decode)
        return tok, cache

    tok_b = jnp.zeros((BB, 1), jnp.int32)
    try:
        tb, cache_b = decode_n_b(params, cache_b, tok_b, jnp.int32(0))
        _ = np.asarray(tb)
        t0 = time.perf_counter()
        tb, cache_b = decode_n_b(params, cache_b, tok_b, jnp.int32(0))
        _ = np.asarray(tb)
        dt_b = time.perf_counter() - t0
        tok_s_batched = BB * n_decode / dt_b
    except Exception as e:
        print(f"batched decode failed: {type(e).__name__}: {str(e)[:400]}",
              file=sys.stderr)
        tok_s_batched = -1.0

    # B=32 aggregate (VERDICT r3 item #6: capture B=32 every round).
    # ctx capped at 1024 so params + 32-stream cache fit HBM.
    del cache_b
    B32 = 32
    b32_len = int(os.environ.get("BENCH_B32_CTX", "1024"))
    try:
        cache_32 = init_cache(cfg, B32, b32_len)
        tok_32 = jnp.zeros((B32, 1), jnp.int32)
        t32, cache_32 = decode_n_b(params, cache_32, tok_32, jnp.int32(0))
        _ = np.asarray(t32)
        t0 = time.perf_counter()
        t32, cache_32 = decode_n_b(params, cache_32, tok_32, jnp.int32(0))
        _ = np.asarray(t32)
        dt_32 = time.perf_counter() - t0
        tok_s_b32 = B32 * n_decode / dt_32
        del cache_32
    except Exception as e:
        print(f"B=32 decode failed: {type(e).__name__}: {str(e)[:400]}",
              file=sys.stderr)
        tok_s_b32 = -1.0

    # B=32 with the q8 KV cache: at this shape KV reads equal the weight
    # stream, so int8 KV moves the composite bandwidth ceiling ~33% up
    # (BASELINE.md B=32 analysis; serving should prefer --cache_dtype q8_0)
    try:
        import dataclasses

        cfg_q8 = dataclasses.replace(cfg, cache_dtype="q8_0")

        @functools.partial(jax.jit, donate_argnums=(1,))
        def decode_n_b_q8(params, cache, tok, n_past):
            def body(carry, _):
                tok, cache, n_past = carry
                logits, cache = transformer_forward(cfg_q8, params, tok,
                                                    cache, n_past)
                nxt = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
                return (nxt, cache, n_past + 1), None
            (tok, cache, n_past), _ = jax.lax.scan(
                body, (tok, cache, n_past), None, length=n_decode)
            return tok, cache

        cache_q8 = init_cache(cfg_q8, B32, b32_len)
        tok_32 = jnp.zeros((B32, 1), jnp.int32)
        t32, cache_q8 = decode_n_b_q8(params, cache_q8, tok_32, jnp.int32(0))
        _ = np.asarray(t32)
        t0 = time.perf_counter()
        t32, cache_q8 = decode_n_b_q8(params, cache_q8, tok_32, jnp.int32(0))
        _ = np.asarray(t32)
        tok_s_b32_q8 = B32 * n_decode / (time.perf_counter() - t0)
        del cache_q8
    except Exception as e:
        print(f"B=32 q8-KV decode failed: {type(e).__name__}: {str(e)[:400]}",
              file=sys.stderr)
        tok_s_b32_q8 = -1.0

    # roofline for ideal q4_k packing (4.5 bits/weight + f16 embed read ~0)
    n_params = 8.03e9
    ideal_bytes = n_params * 4.5 / 8
    roofline = bw / ideal_bytes

    # the measurable single-chip floor for B=1 decode on this part is the
    # MXU weight-load rate (~n_weights / (n_mxus*128 lanes) cycles), which
    # binds before HBM at small batch; report it for context
    mxu_floor_tok_s = 4 * 128 * 940e6 / n_params

    # attainable bound: this chip's sustained PURE-READ bandwidth (decode's
    # weight pass is read-only; the old a*x+b stream measured read+WRITE and
    # its single-shot timings carried the ~25-35 ms relay dispatch floor —
    # BASELINE.md "Pure-read roofline correction").  Reps-amortized pallas
    # DMA probe; divide by the bytes decode actually reads per token.
    try:
        from chatllm_tpu.ops.pallas.bw_probe import measure_read_bw

        bw_meas = measure_read_bw()
    except Exception as e:
        print(f"bw probe failed: {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr)
        bw_meas = -1.0
    embed_bytes = params["embed"].nbytes
    read_bytes = pbytes - embed_bytes
    # achieved_bw: the streaming rate the decode loop itself demonstrates
    # (read_bytes × tok/s).  attainable comes from the probe ONLY — if the
    # relay throttles the probe below achieved_bw the comparison is
    # inconsistent and vs_attainable is reported as -1 rather than letting
    # the ceiling be derived from the number under judgment.
    achieved_bw = read_bytes * tok_s
    probe_ok = bw_meas >= achieved_bw * 0.95
    attainable = bw_meas / read_bytes if (bw_meas > 0 and probe_ok) else -1.0

    # MFU / bandwidth-utilization (VERDICT r4 item #3: first-class fields).
    # prefill_mfu: model FLOPs (2·N·T, the standard proxy — attention adds
    # ~2% at 2048) over the chip's dense bf16 peak.  decode_bw_util: the
    # byte stream the decode loop demonstrably achieves over the SAME
    # session's measured attainable bandwidth (probe), -1 when the probe is
    # inconsistent (relay throttling) — never derived from spec sheet BW.
    peak_flops = PEAK_BF16_FLOPS.get(gen, 197e12)
    prefill_mfu = (2.0 * n_params * long_len / (ttft2k_ms / 1000) / peak_flops
                   if ttft2k_ms > 0 else -1.0)
    decode_bw_util = (achieved_bw / bw_meas if (bw_meas > 0 and probe_ok)
                      else -1.0)

    print(json.dumps({
        "metric": "llama3_8b_q4_decode",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / roofline, 4),
        "ttft_ms_512": round(ttft_ms, 1),
        "ttft_ms_2048": round(ttft2k_ms, 1),
        "prefill_mfu": round(prefill_mfu, 4),
        "decode_bw_util": round(decode_bw_util, 4),
        "batched8_tok_s": round(tok_s_batched, 1),
        "batched32_tok_s": round(tok_s_b32, 1),
        "batched32_q8kv_tok_s": round(tok_s_b32_q8, 1),
        "device": str(dev),
        "param_bytes_actual": pbytes,
        "read_bytes_per_token": read_bytes,
        "bw_measured_gb_s": round(bw_meas / 1e9, 1),
        "bw_achieved_gb_s": round(achieved_bw / 1e9, 1),
        "probe_consistent": bool(probe_ok),
        "attainable_tok_s": round(attainable, 1),
        "vs_attainable": round(tok_s / attainable, 4) if attainable > 0 else -1.0,
        "roofline_tok_s": round(roofline, 1),
        "mxu_floor_tok_s": round(mxu_floor_tok_s, 1),
    }))


if __name__ == "__main__":
    main()
