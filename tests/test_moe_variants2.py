"""Round-2 MoE routing variants: Pangu grouped-argmax + router_scale,
GroveMoE big/little chunk experts — numpy-reference checks on the core
moe_mlp, plus loader registrations."""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp
from dataclasses import replace

from chatllm_tpu.models import ModelType
from chatllm_tpu.models.synthetic import tiny_config
from chatllm_tpu.nn.transformer import moe_mlp
from chatllm_tpu.ops.qtensor import DenseLinear


def _ref_expert(x, gw, uw, dw):
    g = x @ gw
    u = x @ uw
    silu = g / (1.0 + np.exp(-g)) * u
    return silu @ dw


def test_grouped_argmax_router_scale():
    rng = np.random.default_rng(0)
    H, F, E, K = 16, 24, 8, 4
    cfg = tiny_config(vocab=32, hidden=H, layers=1, heads=2, kv_heads=2,
                      inter=F, moe_layer=True, n_experts=E, top_k=K)
    cfg = replace(cfg, moe_grouped_argmax=True, moe_norm_topk_prob=False)
    x = rng.standard_normal((1, 3, H)).astype(np.float32)
    gate = rng.standard_normal((H, E)).astype(np.float32)
    rs = (rng.random(E) + 0.5).astype(np.float32)
    ex = {k: rng.standard_normal(s).astype(np.float32) * 0.3
          for k, s in (("gate", (E, H, F)), ("up", (E, H, F)), ("down", (E, F, H)))}
    p = {"gate": DenseLinear(w=jnp.asarray(gate)), "router_scale": jnp.asarray(rs),
         "experts": {k: jnp.asarray(v) for k, v in ex.items()}}
    y = np.asarray(moe_mlp(cfg, p, jnp.asarray(x)))

    # numpy reference: softmax probs; argmax within each group of E/K;
    # weight = probs[sel] * router_scale[sel]
    xt = x.reshape(-1, H)
    logits = xt @ gate
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    epg = E // K
    ref = np.zeros_like(xt)
    for n in range(xt.shape[0]):
        for g in range(K):
            grp = probs[n, g * epg:(g + 1) * epg]
            j = g * epg + int(np.argmax(grp))
            w = probs[n, j] * rs[j]
            ref[n] += w * _ref_expert(xt[n], ex["gate"][j], ex["up"][j], ex["down"][j])
    np.testing.assert_allclose(y.reshape(-1, H), ref, atol=2e-4, rtol=2e-4)


def test_grove_small_experts():
    rng = np.random.default_rng(1)
    H, F, F2, E, K, GRP = 16, 24, 8, 4, 2, 2
    cfg = tiny_config(vocab=32, hidden=H, layers=1, heads=2, kv_heads=2,
                      inter=F, moe_layer=True, n_experts=E, top_k=K)
    cfg = replace(cfg, moe_norm_topk_prob=False)
    x = rng.standard_normal((1, 2, H)).astype(np.float32)
    gate = rng.standard_normal((H, E)).astype(np.float32)
    big = {k: rng.standard_normal(s).astype(np.float32) * 0.3
           for k, s in (("gate", (E, H, F)), ("up", (E, H, F)), ("down", (E, F, H)))}
    E2 = E // GRP
    small = {k: rng.standard_normal(s).astype(np.float32) * 0.3
             for k, s in (("gate", (E2, H, F2)), ("up", (E2, H, F2)), ("down", (E2, F2, H)))}
    p = {"gate": DenseLinear(w=jnp.asarray(gate)),
         "experts": {k: jnp.asarray(v) for k, v in big.items()},
         "small_experts": {k: jnp.asarray(v) for k, v in small.items()}}
    y = np.asarray(moe_mlp(cfg, p, jnp.asarray(x)))

    xt = x.reshape(-1, H)
    logits = xt @ gate
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ref = np.zeros_like(xt)
    for n in range(xt.shape[0]):
        top = np.argsort(-probs[n])[:K]
        for j in top:
            w = probs[n, j]
            ref[n] += w * _ref_expert(xt[n], big["gate"][j], big["up"][j], big["down"][j])
            sj = j // GRP
            ref[n] += w * _ref_expert(xt[n], small["gate"][sj], small["up"][sj], small["down"][sj])
    np.testing.assert_allclose(y.reshape(-1, H), ref, atol=2e-4, rtol=2e-4)


def test_registrations():
    from chatllm_tpu.models.base import lookup_model
    from chatllm_tpu.models.misc_wave2 import GroveMoE, PanguMoE

    assert lookup_model(int(ModelType.PANGU_MOE)) is PanguMoE
    assert lookup_model(int(ModelType.GROVE_MOE)) is GroveMoE
