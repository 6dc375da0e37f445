"""Fused flash attention (online softmax) for TPU prefill.

Replaces the XLA einsum attention (ops/attention.py, the TPU analog of the
reference's CoreAttention, /root/reference/src/layers.h:1587) for long
contexts: the [T, S] score matrix never leaves VMEM, cutting attention HBM
traffic from O(H·T·S) f32 to O(T·D + S·D) — the difference between
bandwidth-bound and MXU-bound prefill at S ≥ 2k.

Design (per the TPU kernel playbook):
  - grid (B, Hq, T/bq, S/bk), KV innermost; q/k/v pre-transposed to
    [B, H, T, D] so every VMEM block is (sublane=seq, lane=head_dim) aligned.
  - per-(b, h, qi) running max/denominator/accumulator live in VMEM scratch,
    carried across the KV-block loop; output written on the last KV step.
  - causal blocks above the diagonal are skipped with `pl.when` (compute
    predication); GQA is folded into the k/v index maps (h // group).
  - masking semantics match attention_with_cache exactly: keys valid iff
    written (pos < n_past + n_tokens), causal (pos <= q_pos), and inside the
    sliding window; optional tanh logit softcap (Gemma).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(np_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                  *, scale, causal, sliding_window, logit_softcap,
                  block_q, block_k, n_kv_blocks):
    ki = pl.program_id(3)
    qi = pl.program_id(2)
    n_past = np_ref[0]
    n_tokens = np_ref[1]

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # skip blocks entirely above the causal diagonal / outside the window
    q_lo = n_past + qi * block_q                 # first query position
    q_hi = q_lo + block_q - 1                    # last query position
    k_lo = ki * block_k
    live = k_lo < n_past + n_tokens              # any key in block written
    if causal:
        live = jnp.logical_and(live, k_lo <= q_hi)
    if sliding_window > 0:
        live = jnp.logical_and(live, k_lo + block_k - 1 > q_lo - sliding_window)

    # interior blocks need no masking at all: every key in the block is
    # written, causally visible to every query row, and inside the window —
    # skip the [bq, bk] iota/compare/select VPU work for them (roughly half
    # the KV blocks of a causal prefill are interior)
    interior = k_lo + block_k <= n_past + n_tokens
    if causal:
        interior = jnp.logical_and(interior, k_lo + block_k - 1 <= q_lo)
    if sliding_window > 0:
        interior = jnp.logical_and(interior, k_lo > q_hi - sliding_window)

    def _update(s):
        m_prev = m_ref[:, :1]                                     # [bq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)                # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                                    # [bq, bk]
        corr = jnp.exp(m_prev - m_new)                            # [bq, 1]
        l_new = l_ref[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)

        v = v_ref[0, 0]                                           # [bk, Dv]
        pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * corr + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    def _scores():
        # native-dtype MXU inputs (bf16 at full rate), f32 accumulation
        q = q_ref[0, 0]                                           # [bq, D]
        k = k_ref[0, 0]                                           # [bk, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if logit_softcap > 0.0:
            s = jnp.tanh(s / logit_softcap) * logit_softcap
        return s

    @pl.when(jnp.logical_and(live, interior))
    def _compute_fast():
        _update(_scores())

    @pl.when(jnp.logical_and(live, jnp.logical_not(interior)))
    def _compute_masked():
        s = _scores()
        q_pos = q_lo + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_pos = k_lo + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        valid = k_pos < n_past + n_tokens
        if causal:
            valid = jnp.logical_and(valid, k_pos <= q_pos)
        if sliding_window > 0:
            valid = jnp.logical_and(valid, k_pos > q_pos - sliding_window)
        _update(jnp.where(valid, s, NEG_INF))

    @pl.when(ki == n_kv_blocks - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[...] / denom).astype(o_ref.dtype)


def flash_attention(q, k, v, n_past, n_tokens, *, scale,
                    causal=True, sliding_window=0, logit_softcap=0.0,
                    block_q=256, block_k=512, interpret=False):
    """q: [B, T, Hq, D]; k/v: [B, S, Hkv, D(v)] (cache layout, already holding
    this step's keys) → [B, T, Hq, Dv].  n_past/n_tokens may be traced."""
    B, T, Hq, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    Dv = v.shape[-1]
    G = Hq // Hkv
    block_q = min(block_q, T)
    block_k = min(block_k, S)
    assert T % block_q == 0 and S % block_k == 0
    n_kv_blocks = S // block_k

    qt = jnp.transpose(q, (0, 2, 1, 3))                  # [B, Hq, T, D]
    kt = jnp.transpose(k, (0, 2, 1, 3))                  # [B, Hkv, S, D]
    vt = jnp.transpose(v, (0, 2, 1, 3))
    scalars = jnp.stack([jnp.asarray(n_past, jnp.int32),
                         jnp.asarray(n_tokens, jnp.int32)])

    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal,
        sliding_window=sliding_window, logit_softcap=logit_softcap,
        block_q=block_q, block_k=block_k, n_kv_blocks=n_kv_blocks)

    out = pl.pallas_call(
        kernel,
        grid=(B, Hq, T // block_q, n_kv_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, qi, ki, G=G: (b, h // G, ki, 0)),
            pl.BlockSpec((1, 1, block_k, Dv),
                         lambda b, h, qi, ki, G=G: (b, h // G, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, Dv),
                               lambda b, h, qi, ki: (b, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, T, Dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, Dv), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(scalars, qt, kt, vt)
    return jnp.transpose(out, (0, 2, 1, 3))              # [B, T, Hq, Dv]
