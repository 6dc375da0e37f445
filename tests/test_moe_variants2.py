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


def test_ernie_megrez_registered():
    from chatllm_tpu.models.base import lookup_model
    from chatllm_tpu.models.misc_wave2 import ErnieMoE, MegrezMoE

    assert lookup_model(int(ModelType.ERNIE_MOE)) is ErnieMoE
    assert lookup_model(int(ModelType.MEGREZ_MOE)) is MegrezMoE


def test_megrez_moe_expert_sharing(tmp_path):
    """SharedMoE layers alias the previous MoE layer's expert arrays."""
    import struct

    import torch
    import transformers

    from chatllm_tpu.ggmm.quants import GGMLType
    from chatllm_tpu.ggmm.writer import GGMMWriter
    from chatllm_tpu.models import RuntimeConfig, load_model
    from test_model_golden import _bpe_pieces

    rng = np.random.default_rng(3)
    V, H, F, MF, E = 256, 32, 48, 16, 4
    L = 4   # layer0 dense (first_k=1), layer1 moe, layer2 shared, layer3 moe
    path = str(tmp_path / "mg.bin")

    def t(shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.MEGREZ_MOE), 1, meta={})
        # 8i: n_kv, first_k_dense, moe_inter, moe_freq, n_routed, n_shared,
        # norm_topk, n_active; f theta; 3i shared_freq, n_group, topk_group;
        # f routed_scale
        w.write_config([int(GGMLType.F32), V, H, 2, L, F, 64, 1, 2, -1, -1,
                        2, 1, MF, 1, E, 1, 1, 2], fmt="19i")
        f.write(struct.pack("<f", 10000.0))
        f.write(struct.pack("<3i", 2, 2, 1))
        f.write(struct.pack("<f", 1.0))
        w._patch_offset(12)
        pieces = [(p, 1) for p in _bpe_pieces(V)]
        pieces[V - 3] = (b"<|role_start|>", 4)
        pieces[V - 2] = (b"<|role_end|>", 4)
        pieces[V - 1] = (b"<|turn_end|>", 4)
        w.write_vocab_bpe(pieces, [])
        w.write_tensor("model.embed_tokens.weight", t((V, H)), GGMLType.F32)
        for i in range(L):
            pfx = f"model.layers.{i}"
            w.write_tensor(f"{pfx}.input_layernorm.weight", np.ones(H, np.float32), GGMLType.F32)
            w.write_tensor(f"{pfx}.post_attention_layernorm.weight", np.ones(H, np.float32), GGMLType.F32)
            for pj in ("q_proj", "k_proj", "v_proj", "o_proj"):
                w.write_tensor(f"{pfx}.self_attn.{pj}.weight", t((H, H)), GGMLType.F32)
            dense = i < 1 or i % 1 != 0
            lt = "dense" if i < 1 else ("moe" if (i - 1) % 2 == 0 else "shared")
            if lt == "dense":
                for n in ("gate_proj", "up_proj", "down_proj"):
                    shape = (H, F) if n == "down_proj" else (F, H)
                    w.write_tensor(f"{pfx}.mlp.{n}.weight", t(shape), GGMLType.F32)
            else:
                w.write_tensor(f"{pfx}.mlp.gate.weight", t((E, H)), GGMLType.F32)
                w.write_tensor(f"{pfx}.mlp.gate.e_score_correction_bias",
                               t((E,)), GGMLType.F32)
                if lt == "moe":
                    for j in range(E):
                        for n, shape in (("gate_proj", (MF, H)), ("up_proj", (MF, H)),
                                         ("down_proj", (H, MF))):
                            w.write_tensor(f"{pfx}.mlp.experts.{j}.{n}.weight",
                                           t(shape), GGMLType.F32)
                for n, shape in (("gate_proj", (MF, H)), ("up_proj", (MF, H)),
                                 ("down_proj", (H, MF))):
                    w.write_tensor(f"{pfx}.mlp.shared_experts.{n}.weight",
                                   t(shape), GGMLType.F32)
        w.write_tensor("model.norm.weight", np.ones(H, np.float32), GGMLType.F32)
        w.write_tensor("lm_head.weight", t((V, H)), GGMLType.F32)
    model = load_model(path, RuntimeConfig(weight_dtype="float32",
                                           compute_dtype="float32",
                                           cache_dtype="float32"))
    layers = model.params["layers"]
    # layer2 (shared_moe) aliases layer1's expert arrays
    assert layers[2]["mlp"]["experts"] is layers[1]["mlp"]["experts"]
    assert layers[3]["mlp"]["experts"] is not layers[1]["mlp"]["experts"]
    logits, _ = model.forward_logits(np.array([[5, 9, 11]], np.int32))
    assert np.isfinite(np.asarray(logits)).all()
