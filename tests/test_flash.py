"""Flash-attention kernel vs the XLA einsum attention path (exact-math
equivalence, interpret mode on CPU)."""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from chatllm_tpu.ops.attention import attention_with_cache
from chatllm_tpu.ops.pallas.flash import flash_attention


def _case(B=1, T=128, S=256, Hq=4, Hkv=2, D=32, n_past=64, n_tokens=None,
          sliding_window=0, softcap=0.0, causal=True, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32))
    n_tokens = T if n_tokens is None else n_tokens
    scale = D ** -0.5
    ref = attention_with_cache(q, k, v, n_past, n_tokens, scale=scale,
                               causal=causal, sliding_window=sliding_window,
                               logit_softcap=softcap)
    out = flash_attention(q, k, v, n_past, n_tokens, scale=scale,
                          causal=causal, sliding_window=sliding_window,
                          logit_softcap=softcap, block_q=32, block_k=64,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_basic_gqa():
    _case()


def test_flash_padded_prefill():
    # only 100 of 128 query slots hold real tokens
    _case(n_tokens=100, n_past=0)


def test_flash_sliding_window():
    _case(sliding_window=96, seed=1)


def test_flash_softcap():
    _case(softcap=30.0, seed=2)


def test_flash_fresh_prefill_full_causal():
    _case(n_past=0, T=256, S=256, seed=3)


def test_flash_mqa_and_uneven_blocks():
    _case(Hq=4, Hkv=1, T=96, S=192, n_past=96, seed=4)
