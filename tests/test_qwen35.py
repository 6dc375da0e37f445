"""Qwen3.5 hybrid stack (reference models/qwen3_5.cpp; converter
QWen3_5Converter convert.py:5839).  The Gated-DeltaNet math is golden-tested
against HF Qwen3-Next's torch reference kernels
(torch_recurrent_gated_delta_rule / torch_causal_conv1d_update /
Qwen3NextRMSNormGated), which Qwen3.5 shares."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

torch = pytest.importorskip("torch")

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")

VOCAB = 300
HIDDEN, HEADS, KV, LAYERS, INTER, HEAD_DIM = 64, 4, 2, 2, 96, 16
CONV_K, NK, NV, DK, DV = 4, 2, 4, 8, 8
LA = [1, 0]                      # layer 0 DeltaNet, layer 1 gated attention


def test_gdn_vs_hf_reference():
    """Our gated_deltanet_block == HF torch pieces end to end on random
    weights (conv → l2norm/GQA → recurrence → gated RMSNorm → out_proj)."""
    import torch.nn.functional as F
    import jax.numpy as jnp

    from transformers.models.qwen3_next.modeling_qwen3_next import (
        torch_recurrent_gated_delta_rule)

    from chatllm_tpu.nn.transformer import (GDNConfig, TransformerConfig,
                                            gated_deltanet_block)
    from chatllm_tpu.ops.rope import RopeConfig

    rng = np.random.default_rng(3)
    B, T, H = 1, 5, HIDDEN
    g = GDNConfig(conv_kernel=CONV_K, num_k_heads=NK, num_v_heads=NV,
                  k_head_dim=DK, v_head_dim=DV)
    key_dim, value_dim, conv_dim = g.key_dim, g.value_dim, g.conv_dim

    W = {n: rng.standard_normal(s).astype(np.float32) * 0.2 for n, s in {
        "qkv": (H, conv_dim), "z": (H, value_dim), "b": (H, NV),
        "a": (H, NV), "o": (value_dim, H)}.items()}
    conv_w = rng.standard_normal((conv_dim, 1, CONV_K)).astype(np.float32) * 0.3
    dt_bias = rng.standard_normal(NV).astype(np.float32) * 0.1
    A_log = rng.standard_normal(NV).astype(np.float32) * 0.1
    norm_w = 1.0 + rng.standard_normal(DV).astype(np.float32) * 0.1
    x = rng.standard_normal((B, T, H)).astype(np.float32) * 0.5

    # ---- torch reference -------------------------------------------------
    xt = torch.tensor(x)
    mixed = xt @ torch.tensor(W["qkv"])                       # [B,T,conv_dim]
    padded = F.pad(mixed.transpose(1, 2), (CONV_K - 1, 0))
    conv = F.conv1d(padded, torch.tensor(conv_w), groups=conv_dim)
    mixed = F.silu(conv).transpose(1, 2)
    q = mixed[..., :key_dim].reshape(B, T, NK, DK)
    k = mixed[..., key_dim:2 * key_dim].reshape(B, T, NK, DK)
    v = mixed[..., 2 * key_dim:].reshape(B, T, NV, DV)
    q = q.repeat_interleave(NV // NK, dim=2)
    k = k.repeat_interleave(NV // NK, dim=2)
    beta = torch.sigmoid(xt @ torch.tensor(W["b"]))
    glog = -torch.exp(torch.tensor(A_log)) * F.softplus(
        xt @ torch.tensor(W["a"]) + torch.tensor(dt_bias))
    core, S_ref = torch_recurrent_gated_delta_rule(
        q, k, v, glog, beta, initial_state=None, output_final_state=True,
        use_qk_l2norm_in_kernel=True)
    z = (xt @ torch.tensor(W["z"])).reshape(B, T, NV, DV)
    cf = core.float()
    var = cf.pow(2).mean(-1, keepdim=True)
    normed = cf * torch.rsqrt(var + 1e-6) * torch.tensor(norm_w)
    gated = normed * F.silu(z.float())
    ref = (gated.reshape(B, T, value_dim) @ torch.tensor(W["o"])).numpy()

    # ---- ours ------------------------------------------------------------
    cfg = TransformerConfig(
        vocab_size=8, hidden_size=H, num_hidden_layers=1,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=8,
        max_length=32, norm_eps=1e-6, gdn=g,
        rope=RopeConfig(head_dim=16))
    from chatllm_tpu.ops.qtensor import DenseLinear

    p = {"qkv": DenseLinear(w=jnp.asarray(W["qkv"])),
         "z": DenseLinear(w=jnp.asarray(W["z"])),
         "b": DenseLinear(w=jnp.asarray(W["b"])),
         "a": DenseLinear(w=jnp.asarray(W["a"])),
         "o": DenseLinear(w=jnp.asarray(W["o"])), "conv_w": conv_w,
         "dt_bias": jnp.asarray(dt_bias), "A_log": jnp.asarray(A_log),
         "norm_w": jnp.asarray(norm_w)}
    conv_state = jnp.zeros((B, CONV_K - 1, 1, conv_dim), jnp.float32)
    S0 = jnp.zeros((B, NV, DK, DV), jnp.float32)
    out, new_conv, S = gated_deltanet_block(cfg, p, jnp.asarray(x),
                                            conv_state, S0)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(S), S_ref.numpy(), atol=2e-5)

    # streaming parity: same tokens fed 2 + 3 must give identical state
    out_a, conv_a, S_a = gated_deltanet_block(cfg, p, jnp.asarray(x[:, :2]),
                                              conv_state, S0)
    out_b, conv_b, S_b = gated_deltanet_block(cfg, p, jnp.asarray(x[:, 2:]),
                                              conv_a, S_a)
    np.testing.assert_allclose(np.asarray(out_b), ref[:, 2:], atol=2e-5)
    np.testing.assert_allclose(np.asarray(S_b), S_ref.numpy(), atol=2e-5)


def _pieces():
    from chatllm_tpu.tokenizer.processor import byte_level_encode

    pieces = [byte_level_encode(bytes([b])) for b in range(256)]
    pieces += [b"<|endoftext|>", b"<|im_start|>", b"<|im_end|>"]
    pieces += [f"<x{i}>".encode() for i in range(VOCAB - len(pieces))]
    return pieces


def make_tiny_qwen35(path):
    rng = np.random.default_rng(11)
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.QWEN3_5), 1, meta={})
        w.write_config([int(GGMLType.F32), VOCAB, HIDDEN, HEADS, LAYERS,
                        INTER, 256, -1, 0, -1, -1], fmt="11i")
        # n_kv, attn_gate, conv_k, k_dim, nk, nv, v_dim, head_dim
        f.write(struct.pack("<8i", KV, 1, CONV_K, DK, NK, NV, DV, HEAD_DIM))
        f.write(struct.pack("<f", 10000.0))                 # rope_theta
        # rope_dim, mrope[3], 0
        f.write(struct.pack("<5i", HEAD_DIM // 2, 2, 1, 1, 0))
        # moe_inter, shared_inter, topk, n_experts, tie, mtp
        f.write(struct.pack("<6i", -1, -1, -1, -1, 0, 0))
        f.write(struct.pack("<f", -1.0))                    # aux coef
        la = LA + [0] * (128 - len(LA))
        f.write(struct.pack("<128i", *la))
        w._patch_offset(12)
        w.write_vocab_bpe([(p, 1) for p in _pieces()], [])

        def t(name, *shape, scale=0.1):
            w.write_tensor(name, (rng.standard_normal(shape) * scale)
                           .astype(np.float32), GGMLType.F32)

        conv_dim = 2 * NK * DK + NV * DV
        t("model.embed_tokens.weight", VOCAB, HIDDEN)
        t("model.norm.weight", HIDDEN)
        t("lm_head.weight", VOCAB, HIDDEN)
        for i in range(LAYERS):
            pfx = f"model.layers.{i}"
            t(f"{pfx}.input_layernorm.weight", HIDDEN)
            t(f"{pfx}.post_attention_layernorm.weight", HIDDEN)
            if LA[i]:
                t(f"{pfx}.linear_attn.in_proj_qkv.weight", conv_dim, HIDDEN)
                t(f"{pfx}.linear_attn.in_proj_z.weight", NV * DV, HIDDEN)
                t(f"{pfx}.linear_attn.in_proj_b.weight", NV, HIDDEN)
                t(f"{pfx}.linear_attn.in_proj_a.weight", NV, HIDDEN)
                t(f"{pfx}.linear_attn.conv1d.weight", conv_dim, 1, CONV_K)
                t(f"{pfx}.linear_attn.dt_bias", NV)
                t(f"{pfx}.linear_attn.A_log", NV)
                t(f"{pfx}.linear_attn.norm.weight", DV)
                t(f"{pfx}.linear_attn.out_proj.weight", HIDDEN, NV * DV)
            else:
                t(f"{pfx}.self_attn.q_proj.weight", HEADS * HEAD_DIM, HIDDEN)
                t(f"{pfx}.self_attn.k_proj.weight", KV * HEAD_DIM, HIDDEN)
                t(f"{pfx}.self_attn.v_proj.weight", KV * HEAD_DIM, HIDDEN)
                t(f"{pfx}.self_attn.o_proj.weight", HIDDEN, HEADS * HEAD_DIM)
                t(f"{pfx}.self_attn.gate_proj.weight", HEADS * HEAD_DIM, HIDDEN)
                t(f"{pfx}.self_attn.q_norm.weight", HEAD_DIM)
                t(f"{pfx}.self_attn.k_norm.weight", HEAD_DIM)
            t(f"{pfx}.mlp.gate_proj.weight", INTER, HIDDEN)
            t(f"{pfx}.mlp.up_proj.weight", INTER, HIDDEN)
            t(f"{pfx}.mlp.down_proj.weight", HIDDEN, INTER)


def test_qwen35_generate_and_pad_invariance(tmp_path):
    path = str(tmp_path / "q35.bin")
    make_tiny_qwen35(path)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.gdn is not None
    assert model.cfg.layer_specs[0].linear_attn
    assert model.cfg.attn_out_gate

    ids = model.tokenizer.encode("hello there, how are you today?")
    eng = model.engine

    # single-shot prefill (bucket-padded) vs two-chunk prefill must agree:
    # the recurrent state may not absorb padded positions
    c1 = eng.new_cache(1, eng.max_length)
    l1, c1, n1 = eng.prefill(ids, c1, 0)
    c2 = eng.new_cache(1, eng.max_length)
    l2a, c2, n2 = eng.prefill(ids[:5], c2, 0)
    l2, c2, n2 = eng.prefill(ids[5:], c2, n2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               atol=2e-4, rtol=1e-4)

    # greedy decode runs and is deterministic
    from chatllm_tpu.runtime.generate import GenerationConfig

    out1 = model.generate(ids, GenerationConfig(do_sample=False,
                                                max_new_tokens=8))[0]
    out2 = model.generate(ids, GenerationConfig(do_sample=False,
                                                max_new_tokens=8))[0]
    assert list(out1) == list(out2)
    assert len(out1) == 8
