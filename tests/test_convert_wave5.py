"""Converter wave 5: GLM line, MiniCPM line, DeepSeek-v1 line, Solar,
Mistral2, Grok-1, Phi-4 and the type-alias tail."""
import json
import pickle
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import RuntimeConfig, load_model
from chatllm_tpu.tools.convert import convert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from test_convert import _byte_vocab_json  # noqa: E402
from test_convert_wave2 import RT32, V, _unigram_json  # noqa: E402
from test_convert_wave4 import IDS, _llama, _save_named, _sd  # noqa: E402


def _logits(m, ids=IDS):
    a = np.array([list(ids)], dtype=np.int32)
    l, _ = m.forward_logits(a)
    return np.asarray(l)[0]


def _ref(hf, ids=IDS):
    with torch.no_grad():
        return hf(torch.as_tensor([list(ids)], dtype=torch.int64)
                  ).logits[0].numpy()


# ---------------------------------------------------------------------------
# GLM line
# ---------------------------------------------------------------------------


def _glm1_sd(rng, L=2, H=64, F=256, V_=V):
    sd = {"transformer.word_embeddings.weight": rng.standard_normal(
              (V_, H)).astype(np.float32) * 0.05,
          "transformer.final_layernorm.weight":
              np.ones(H, np.float32) + rng.standard_normal(H).astype(np.float32) * 0.02,
          "transformer.final_layernorm.bias":
              rng.standard_normal(H).astype(np.float32) * 0.02}
    for i in range(L):
        p = f"transformer.layers.{i}"
        for nrm in ("input_layernorm", "post_attention_layernorm"):
            sd[f"{p}.{nrm}.weight"] = np.ones(H, np.float32)
            sd[f"{p}.{nrm}.bias"] = np.zeros(H, np.float32)
        sd[f"{p}.attention.query_key_value.weight"] = \
            rng.standard_normal((3 * H, H)).astype(np.float32) * 0.05
        sd[f"{p}.attention.query_key_value.bias"] = \
            rng.standard_normal(3 * H).astype(np.float32) * 0.02
        sd[f"{p}.attention.dense.weight"] = \
            rng.standard_normal((H, H)).astype(np.float32) * 0.05
        sd[f"{p}.attention.dense.bias"] = \
            rng.standard_normal(H).astype(np.float32) * 0.02
        sd[f"{p}.mlp.dense_h_to_4h.weight"] = \
            rng.standard_normal((F, H)).astype(np.float32) * 0.05
        sd[f"{p}.mlp.dense_h_to_4h.bias"] = \
            rng.standard_normal(F).astype(np.float32) * 0.02
        sd[f"{p}.mlp.dense_4h_to_h.weight"] = \
            rng.standard_normal((H, F)).astype(np.float32) * 0.05
        sd[f"{p}.mlp.dense_4h_to_h.bias"] = \
            rng.standard_normal(H).astype(np.float32) * 0.02
    return sd


def test_convert_chatglm1(tmp_path):
    """GLM-1: converter output must equal a directly-written fixture
    (raw tensor names are shared, so this pins the config layout)."""
    rng = np.random.default_rng(7)
    sd = _glm1_sd(rng)
    d = _save_named(tmp_path, sd,
                    {"architectures": ["ChatGLMModel"], "vocab_size": V,
                     "hidden_size": 64, "num_attention_heads": 2,
                     "num_layers": 2, "inner_hidden_size": 256,
                     "max_sequence_length": 64, "position_encoding_2d": True,
                     "bos_token_id": V - 1, "eos_token_id": V - 2,
                     "pad_token_id": 0, "multi_query_attention": None})
    out = str(tmp_path / "m.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 1
    fix = str(tmp_path / "fix.bin")
    with open(fix, "wb") as fh:
        w = GGMMWriter(fh, 1, 1, meta={"model_name": "t"})
        w.write_config([int(GGMLType.F32), V, 64, 2, 2, 256, 64,
                        V - 1, V - 2, 0, -1], fmt="11i")
        w.write_vocab_sp([(f"w{i}".encode(), -float(i)) for i in range(V)])
        for n, a in sd.items():
            w.write_tensor(n, a, GGMLType.F32 if a.ndim != 2 else GGMLType.F32)
    m2 = load_model(fix, RuntimeConfig(**RT32))
    np.testing.assert_allclose(_logits(m), _logits(m2), atol=1e-6)


def _glm2_sd(rng, L=2, H=64, F=96, kvg=1, V_=V):
    hd = H // 4
    sd = {"transformer.embedding.word_embeddings.weight":
              rng.standard_normal((V_, H)).astype(np.float32) * 0.05,
          "transformer.encoder.final_layernorm.weight":
              np.ones(H, np.float32),
          "transformer.output_layer.weight":
              rng.standard_normal((V_, H)).astype(np.float32) * 0.05}
    qkv_rows = H + 2 * kvg * hd
    for i in range(L):
        p = f"transformer.encoder.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = np.ones(H, np.float32)
        sd[f"{p}.post_attention_layernorm.weight"] = np.ones(H, np.float32)
        sd[f"{p}.self_attention.query_key_value.weight"] = \
            rng.standard_normal((qkv_rows, H)).astype(np.float32) * 0.05
        sd[f"{p}.self_attention.query_key_value.bias"] = \
            rng.standard_normal(qkv_rows).astype(np.float32) * 0.02
        sd[f"{p}.self_attention.dense.weight"] = \
            rng.standard_normal((H, H)).astype(np.float32) * 0.05
        sd[f"{p}.mlp.dense_h_to_4h.weight"] = \
            rng.standard_normal((2 * F, H)).astype(np.float32) * 0.05
        sd[f"{p}.mlp.dense_4h_to_h.weight"] = \
            rng.standard_normal((H, F)).astype(np.float32) * 0.05
    return sd


def _glm2_cfg(extra=None):
    c = {"architectures": ["ChatGLMModel"], "padded_vocab_size": V,
         "hidden_size": 64, "num_attention_heads": 4, "num_layers": 2,
         "ffn_hidden_size": 96, "seq_length": 128, "kv_channels": 16,
         "multi_query_attention": True, "multi_query_group_num": 1,
         "add_bias_linear": False, "add_qkv_bias": True,
         "apply_residual_connection_post_layernorm": False,
         "original_rope": True, "post_layer_norm": True, "rmsnorm": True,
         "eos_token_id": 2, "pad_token_id": 0, "vocab_size": V}
    c.update(extra or {})
    return c


def test_convert_chatglm2_and_3(tmp_path):
    rng = np.random.default_rng(8)
    sd = _glm2_sd(rng)
    d = _save_named(tmp_path, sd, _glm2_cfg())
    out = str(tmp_path / "m.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 2
    fix = str(tmp_path / "fix.bin")
    with open(fix, "wb") as fh:
        w = GGMMWriter(fh, 2, 1, meta={"model_name": "t"})
        w.write_config([int(GGMLType.F32), V, 64, 4, 2, 96, 128,
                        -1, 2, 0, -1, 1], fmt="12i")
        w.write_vocab_sp([(f"w{i}".encode(), -float(i)) for i in range(V)])
        for n, a in sd.items():
            w.write_tensor(n, a, GGMLType.F32)
    m2 = load_model(fix, RuntimeConfig(**RT32))
    np.testing.assert_allclose(_logits(m), _logits(m2), atol=1e-6)
    # chatglm3 flavor: remote-code auto_map flips the model type
    d3 = _save_named(tmp_path / "g3", sd, _glm2_cfg(
        {"auto_map": {"AutoModelForCausalLM":
                      "modeling_chatglm.ChatGLMForConditionalGeneration"},
         "_name_or_path": "THUDM/chatglm3-6b"}))
    out3 = str(tmp_path / "m3.bin")
    convert(d3, out3, "f32")
    assert int(load_model(out3, RuntimeConfig(**RT32)).model_type) == 3


def test_convert_chatglm4_tiktoken(tmp_path):
    """GLM-4 (old chatglm container): rope_ratio + tiktoken-mergeable-ranks
    vocab export."""
    import base64

    rng = np.random.default_rng(9)
    sd = _glm2_sd(rng)
    d = _save_named(tmp_path, sd, _glm2_cfg({"rope_ratio": 2.0}),
                    unigram=True)
    # tiktoken ranks: 256 single bytes + a few merged tokens
    lines = []
    for i in range(256):
        lines.append(base64.b64encode(bytes([i])) + b" " + str(i).encode())
    for j, tokb in enumerate([b"th", b"the", b" t"]):
        lines.append(base64.b64encode(tokb) + b" " + str(256 + j).encode())
    (tmp_path / "hf" / "tokenizer.model").write_bytes(b"\n".join(lines))
    out = str(tmp_path / "m.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 6
    assert m.cfg.rope.freq_base == pytest.approx(10000.0 * 2.0 ** 1.0, rel=1)
    ids = m.tokenizer.encode("the t")
    assert ids and all(i < 260 for i in ids)


# ---------------------------------------------------------------------------
# MiniCPM line
# ---------------------------------------------------------------------------


def test_convert_minicpm_v1_v2(tmp_path):
    import math

    for seed, tie, want in ((80, True, 0x1100), (81, False, 0x1101)):
        hf, cfg = _llama(seed, tie_word_embeddings=tie)
        sd = _sd(hf)
        scale_emb = 2.0
        with torch.no_grad():
            # (tied lm_head shares the tensor, so it scales along — matching
            # the loader, which ties to the converter-scaled table)
            hf.model.embed_tokens.weight.mul_(scale_emb)
        m_dir = _save_named(tmp_path / f"s{seed}", sd,
                            {**cfg.to_dict(),
                             "architectures": ["MiniCPMForCausalLM"],
                             "scale_emb": scale_emb,
                             "scale_depth": math.sqrt(2.0),
                             "dim_model_base": 64, "num_experts": None,
                             "rope_scaling": None, "hidden_act": "silu"})
        out = str(tmp_path / f"m{seed}.bin")
        convert(m_dir, out, "f32")
        m = load_model(out, RuntimeConfig(**RT32))
        assert int(m.model_type) == want
        np.testing.assert_allclose(_logits(m), _ref(hf), atol=3e-3,
                                   rtol=3e-3)


def test_convert_minicpm4_longrope(tmp_path):
    import math

    hf, cfg = _llama(82, tie_word_embeddings=True)
    sc = {"rope_type": "longrope", "short_factor": [1.0] * 8,
          "long_factor": [1.0] * 8,
          "original_max_position_embeddings": 128}
    d = _save_named(tmp_path, _sd(hf),
                    {**cfg.to_dict(),
                     "architectures": ["MiniCPMForCausalLM"],
                     "scale_emb": 1.0, "scale_depth": math.sqrt(2.0),
                     "dim_model_base": 64, "num_experts": None,
                     "eos_token_id": [2], "mup_denominator": None,
                     "rope_scaling": sc, "hidden_act": "silu"})
    out = str(tmp_path / "m.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 0x1111
    np.testing.assert_allclose(_logits(m), _ref(hf), atol=3e-3, rtol=3e-3)


def test_convert_minicpm_moe(tmp_path):
    """MiniCPM-MoE: HF Qwen2Moe oracle with biases zeroed, shared expert
    neutralized (down_proj=0).  norm_topk_prob TRUE: the reference's
    MiniCPMSparseMoE inherits GenericSparseMLP's default
    norm_topk_prob=true (src/layers.cpp:3727) and never overrides it."""
    import math

    torch.manual_seed(83)
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=4, num_hidden_layers=2, intermediate_size=96,
        moe_intermediate_size=48, shared_expert_intermediate_size=48,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=True, sliding_window=None)
    hf = transformers.Qwen2MoeForCausalLM(cfg).eval()
    with torch.no_grad():
        for n, p in hf.named_parameters():
            if n.endswith((".q_proj.bias", ".k_proj.bias", ".v_proj.bias")):
                p.zero_()
            if ".shared_expert." in n and n.endswith("down_proj.weight"):
                p.zero_()
    sd = _sd(hf)
    out_sd = {"model.embed_tokens.weight": sd["model.embed_tokens.weight"],
              "model.norm.weight": sd["model.norm.weight"]}
    for i in range(2):
        s = f"model.layers.{i}"
        for nm in ("input_layernorm.weight",
                   "post_attention_layernorm.weight",
                   "self_attn.q_proj.weight", "self_attn.k_proj.weight",
                   "self_attn.v_proj.weight", "self_attn.o_proj.weight"):
            out_sd[f"{s}.{nm}"] = sd[f"{s}.{nm}"]
        out_sd[f"{s}.mlp.gate.weight"] = sd[f"{s}.mlp.gate.weight"]
        for j in range(4):
            out_sd[f"{s}.mlp.experts.{j}.w1.weight"] = \
                sd[f"{s}.mlp.experts.{j}.gate_proj.weight"]
            out_sd[f"{s}.mlp.experts.{j}.w2.weight"] = \
                sd[f"{s}.mlp.experts.{j}.down_proj.weight"]
            out_sd[f"{s}.mlp.experts.{j}.w3.weight"] = \
                sd[f"{s}.mlp.experts.{j}.up_proj.weight"]
    d = _save_named(tmp_path, out_sd,
                    {"architectures": ["MiniCPMForCausalLM"], "vocab_size": V,
                     "hidden_size": 64, "num_attention_heads": 4,
                     "num_key_value_heads": 4, "num_hidden_layers": 2,
                     "intermediate_size": 48, "max_position_embeddings": 128,
                     "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
                     "scale_emb": 1.0, "scale_depth": math.sqrt(2.0),
                     "num_experts": 4, "num_experts_per_tok": 2,
                     "bos_token_id": 1, "eos_token_id": 2,
                     "rope_scaling": None, "hidden_act": "silu"})
    out = str(tmp_path / "m.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 0x1102
    np.testing.assert_allclose(_logits(m), _ref(hf), atol=3e-3, rtol=3e-3)


def test_convert_minicpm3_mla(tmp_path):
    """MiniCPM3 (MLA): param-level roundtrip — the converter's splits must
    land exactly in the loader's param tree (MLA math is oracled by
    tests/test_mla.py)."""
    rng = np.random.default_rng(84)
    H, heads, q_lora, kv_lora, nope, ropeD = 64, 4, 32, 16, 8, 8
    qd = nope + ropeD
    sd = {"model.embed_tokens.weight":
              rng.standard_normal((V, H)).astype(np.float32) * 0.05,
          "model.norm.weight": np.ones(H, np.float32)}
    for i in range(2):
        p = f"model.layers.{i}"
        sd[f"{p}.self_attn.q_a_proj.weight"] = rng.standard_normal(
            (q_lora, H)).astype(np.float32) * 0.05
        sd[f"{p}.self_attn.q_a_layernorm.weight"] = np.ones(q_lora, np.float32)
        sd[f"{p}.self_attn.q_b_proj.weight"] = rng.standard_normal(
            (heads * qd, q_lora)).astype(np.float32) * 0.05
        sd[f"{p}.self_attn.kv_a_proj_with_mqa.weight"] = rng.standard_normal(
            (kv_lora + ropeD, H)).astype(np.float32) * 0.05
        sd[f"{p}.self_attn.kv_a_layernorm.weight"] = np.ones(kv_lora,
                                                             np.float32)
        sd[f"{p}.self_attn.kv_b_proj.weight"] = rng.standard_normal(
            (heads * (nope + H // heads), kv_lora)).astype(np.float32) * 0.05
        sd[f"{p}.self_attn.o_proj.weight"] = rng.standard_normal(
            (H, heads * (H // heads))).astype(np.float32) * 0.05
        sd[f"{p}.mlp.gate_proj.weight"] = rng.standard_normal(
            (96, H)).astype(np.float32) * 0.05
        sd[f"{p}.mlp.up_proj.weight"] = rng.standard_normal(
            (96, H)).astype(np.float32) * 0.05
        sd[f"{p}.mlp.down_proj.weight"] = rng.standard_normal(
            (H, 96)).astype(np.float32) * 0.05
        sd[f"{p}.input_layernorm.weight"] = np.ones(H, np.float32)
        sd[f"{p}.post_attention_layernorm.weight"] = np.ones(H, np.float32)
    sc = {"type": "longrope", "short_factor": [1.0] * 16,
          "long_factor": [1.0] * 16,
          "original_max_position_embeddings": 128}
    d = _save_named(tmp_path, sd,
                    {"architectures": ["MiniCPM3ForCausalLM"],
                     "vocab_size": V, "hidden_size": H,
                     "num_attention_heads": heads, "num_hidden_layers": 2,
                     "intermediate_size": 96,
                     "max_position_embeddings": 128,
                     "num_key_value_heads": heads, "kv_lora_rank": kv_lora,
                     "q_lora_rank": q_lora, "qk_nope_head_dim": nope,
                     "qk_rope_head_dim": ropeD, "dim_model_base": H,
                     "scale_emb": 2.0, "scale_depth": 1.4142135,
                     "rope_scaling": sc, "hidden_act": "silu",
                     "bos_token_id": 1, "eos_token_id": [2]})
    out = str(tmp_path / "m.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 0x1110
    attn = m.params["layers"][0]["attn"]

    def _w(linear):
        a = np.asarray(linear.w if hasattr(linear, "w") else linear["w"])
        return a

    kv_a = sd["model.layers.0.self_attn.kv_a_proj_with_mqa.weight"]
    got = _w(attn["d_kv"])
    np.testing.assert_allclose(
        got, kv_a[:kv_lora].T if got.shape == (64, kv_lora)
        else kv_a[:kv_lora], atol=1e-6)
    got = _w(attn["k_pe"])
    np.testing.assert_allclose(
        got, kv_a[kv_lora:].T if got.shape == (64, ropeD)
        else kv_a[kv_lora:], atol=1e-6)
    kv_b = sd["model.layers.0.self_attn.kv_b_proj.weight"].reshape(
        heads, nope + H // heads, kv_lora)
    exp = kv_b[:, :nope].reshape(heads * nope, kv_lora)
    got = _w(attn["u_k_nope"])
    np.testing.assert_allclose(got, exp.T if got.shape == exp.T.shape
                               else exp, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m.params["embed"]),
        sd["model.embed_tokens.weight"] * 2.0, atol=1e-6)
    assert np.isfinite(_logits(m)).all()


def test_convert_minicpm_emb_and_reranker(tmp_path):
    hf, cfg = _llama(85, num_key_value_heads=2, tie_word_embeddings=True)
    sd = {k.replace("model.", "", 1) if k.startswith("model.") else k: v
          for k, v in _sd(hf).items() if k != "lm_head.weight"}
    sc = {"type": "longrope", "short_factor": [1.0] * 32,
          "long_factor": [1.0] * 32,
          "original_max_position_embeddings": 128}
    base_cfg = {**cfg.to_dict(), "scale_emb": 1.0,
                "scale_depth": 1.4142135, "rope_scaling": sc,
                "hidden_act": "silu"}
    sd_e = dict(sd)
    sd_e["head.weight"] = np.zeros((1, 64), np.float32)
    d = _save_named(tmp_path / "e", sd_e,
                    {**base_cfg, "architectures": ["MiniCPMModel"],
                     "_name_or_path": "openbmb/UltraRAG-Embedding"})
    out = str(tmp_path / "e.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    v1 = m.embed("hello world")
    assert v1.shape == (64,) and np.isfinite(v1).all()
    sd_r = dict(sd)
    sd_r["score.weight"] = np.random.default_rng(0).standard_normal(
        (1, 64)).astype(np.float32) * 0.1
    d2 = _save_named(tmp_path / "r", sd_r,
                     {**base_cfg,
                      "architectures": ["MiniCPMForSequenceClassification"],
                      "_name_or_path": "OpenBMB/UltraRAG-Reranker"})
    out2 = str(tmp_path / "r.bin")
    convert(d2, out2, "f32")
    m2 = load_model(out2, RuntimeConfig(**RT32))
    s = m2.qa_rank("q", "a")
    assert np.isfinite(s)


# ---------------------------------------------------------------------------
# DeepSeek v1 MoE / Solar / Mistral2 / Phi4 / Grok-1 / alias tail
# ---------------------------------------------------------------------------


def test_convert_deepseek_v1_moe(tmp_path):
    """DeepSeek-V1-MoE: first_k_dense + shared experts; oracle-free
    param-level roundtrip + finite forward (the MoE block itself is
    HF-oracled via OLMoE/Mixtral converters)."""
    rng = np.random.default_rng(86)
    H, F, MF = 64, 96, 48
    sd = {"model.embed_tokens.weight":
              rng.standard_normal((V, H)).astype(np.float32) * 0.05,
          "model.norm.weight": np.ones(H, np.float32),
          "lm_head.weight":
              rng.standard_normal((V, H)).astype(np.float32) * 0.05}
    for i in range(2):
        p = f"model.layers.{i}"
        for nm, shape in (("self_attn.q_proj", (H, H)),
                          ("self_attn.k_proj", (H, H)),
                          ("self_attn.v_proj", (H, H)),
                          ("self_attn.o_proj", (H, H))):
            sd[f"{p}.{nm}.weight"] = rng.standard_normal(
                shape).astype(np.float32) * 0.05
        sd[f"{p}.input_layernorm.weight"] = np.ones(H, np.float32)
        sd[f"{p}.post_attention_layernorm.weight"] = np.ones(H, np.float32)
        if i == 0:
            for nm in ("gate_proj", "up_proj"):
                sd[f"{p}.mlp.{nm}.weight"] = rng.standard_normal(
                    (F, H)).astype(np.float32) * 0.05
            sd[f"{p}.mlp.down_proj.weight"] = rng.standard_normal(
                (H, F)).astype(np.float32) * 0.05
        else:
            sd[f"{p}.mlp.gate.weight"] = rng.standard_normal(
                (4, H)).astype(np.float32) * 0.05
            for nm in ("gate_proj", "up_proj"):
                sd[f"{p}.mlp.shared_experts.{nm}.weight"] = \
                    rng.standard_normal((MF, H)).astype(np.float32) * 0.05
            sd[f"{p}.mlp.shared_experts.down_proj.weight"] = \
                rng.standard_normal((H, MF)).astype(np.float32) * 0.05
            for j in range(4):
                for nm in ("gate_proj", "up_proj"):
                    sd[f"{p}.mlp.experts.{j}.{nm}.weight"] = \
                        rng.standard_normal((MF, H)).astype(np.float32) * 0.05
                sd[f"{p}.mlp.experts.{j}.down_proj.weight"] = \
                    rng.standard_normal((H, MF)).astype(np.float32) * 0.05
    d = _save_named(tmp_path, sd,
                    {"architectures": ["DeepseekForCausalLM"],
                     "vocab_size": V, "hidden_size": H,
                     "num_attention_heads": 4, "num_key_value_heads": 4,
                     "num_hidden_layers": 2, "intermediate_size": F,
                     "max_position_embeddings": 128, "rope_theta": 10000.0,
                     "first_k_dense_replace": 1, "moe_intermediate_size": MF,
                     "moe_layer_freq": 1, "n_routed_experts": 4,
                     "n_shared_experts": 1, "norm_topk_prob": False,
                     "num_experts_per_tok": 2, "scoring_func": "softmax",
                     "attention_bias": False, "rope_scaling": None,
                     "bos_token_id": 1, "eos_token_id": 2},
                    unigram=False)
    out = str(tmp_path / "m.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 0x324
    assert np.isfinite(_logits(m)).all()
    # gigachat flavor re-types the same layout (byte-BPE tokenizer)
    dg = _save_named(tmp_path / "gc", sd,
                     json.loads((tmp_path / "hf" / "config.json").
                                read_text()),
                     unigram=False, specials=["<s>", "</s>"])
    convert(dg, str(tmp_path / "g.bin"), "f32", arch="gigachat")
    assert int(load_model(str(tmp_path / "g.bin"),
                          RuntimeConfig(**RT32)).model_type) == 0x325


def test_convert_solar(tmp_path):
    rng = np.random.default_rng(87)
    hf, cfg = _llama(87)
    sd = _sd(hf)
    d = _save_named(tmp_path, sd,
                    {**cfg.to_dict(), "architectures": ["SolarForCausalLM"],
                     "bskcn_1": [0], "bskcn_3": [1], "bskcn_2": [],
                     "bskcn_4": [], "bskcn_tv": [0.9, 0.8],
                     "sliding_window": 2048, "rope_scaling": None})
    out = str(tmp_path / "m.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 0x2300
    assert np.isfinite(_logits(m)).all()


def test_convert_mistral2_and_small31(tmp_path):
    hf, cfg = _llama(88, num_key_value_heads=2)
    # -a mistral2: HF names, permuted
    d = _save_named(tmp_path / "a", _sd(hf),
                    {**cfg.to_dict(),
                     "architectures": ["MistralForCausalLM"],
                     "head_dim": 16, "sliding_window": None},
                    unigram=False, specials=["<s>", "</s>", "[INST]",
                                             "[/INST]"])
    out = str(tmp_path / "a.bin")
    convert(d, out, "f32", arch="mistral2")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 0x606
    np.testing.assert_allclose(_logits(m), _ref(hf), atol=3e-3, rtol=3e-3)
    # -a mistral-small-3.1: consolidated names, pre-interleaved weights
    from chatllm_tpu.tools.convert import permute_rope
    sd = _sd(hf)
    cons = {"tok_embeddings.weight": sd["model.embed_tokens.weight"],
            "norm.weight": sd["model.norm.weight"],
            "output.weight": sd["lm_head.weight"],
            "vision_encoder.blah.weight": np.zeros((2, 2), np.float32)}
    for i in range(2):
        s = f"model.layers.{i}"
        c = f"layers.{i}"
        cons[f"{c}.attention.wq.weight"] = permute_rope(
            sd[f"{s}.self_attn.q_proj.weight"], 4)
        cons[f"{c}.attention.wk.weight"] = permute_rope(
            sd[f"{s}.self_attn.k_proj.weight"], 2)
        cons[f"{c}.attention.wv.weight"] = sd[f"{s}.self_attn.v_proj.weight"]
        cons[f"{c}.attention.wo.weight"] = sd[f"{s}.self_attn.o_proj.weight"]
        cons[f"{c}.attention_norm.weight"] = sd[f"{s}.input_layernorm.weight"]
        cons[f"{c}.ffn_norm.weight"] = \
            sd[f"{s}.post_attention_layernorm.weight"]
        cons[f"{c}.feed_forward.w1.weight"] = sd[f"{s}.mlp.gate_proj.weight"]
        cons[f"{c}.feed_forward.w2.weight"] = sd[f"{s}.mlp.down_proj.weight"]
        cons[f"{c}.feed_forward.w3.weight"] = sd[f"{s}.mlp.up_proj.weight"]
    d2 = _save_named(tmp_path / "b", cons,
                     {**cfg.to_dict(), "architectures": ["Whatever"],
                      "head_dim": 16, "sliding_window": None},
                     unigram=False, specials=["<s>", "</s>", "[INST]",
                                              "[/INST]"])
    out2 = str(tmp_path / "b.bin")
    convert(d2, out2, "f32", arch="mistral-small-3.1")
    m2 = load_model(out2, RuntimeConfig(**RT32))
    np.testing.assert_allclose(_logits(m2), _ref(hf), atol=3e-3, rtol=3e-3)


def test_convert_phi4(tmp_path):
    torch.manual_seed(89)
    cfg = transformers.Phi3Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128,
        original_max_position_embeddings=128, rope_theta=10000.0,
        sliding_window=None, rope_scaling=None, bos_token_id=1,
        eos_token_id=2, pad_token_id=0)
    hf = transformers.Phi3ForCausalLM(cfg).eval()
    d = _save_named(tmp_path, _sd(hf),
                    {**cfg.to_dict(), "architectures": ["Phi3ForCausalLM"]},
                    unigram=False, specials=["<|im_start|>", "<|im_sep|>",
                                             "<|im_end|>"])
    out = str(tmp_path / "m.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 0x531
    np.testing.assert_allclose(_logits(m), _ref(hf), atol=3e-3, rtol=3e-3)


def test_convert_grok1_base(tmp_path):
    """Grok-1 from the raw pickle layout: tiny config override, weights in
    tensorNNNNN_000 files, transposed like the xai dump."""
    rng = np.random.default_rng(90)
    H, heads, kv, F, L, NE = 64, 4, 2, 96, 1, 2
    cfgd = {"vocab_size": V, "hidden_size": H, "num_attention_heads": heads,
            "num_key_value_heads": kv, "num_hidden_layers": L,
            "intermediate_size": F, "max_position_embeddings": 128,
            "num_selected_experts": 2, "rope_theta": 10000,
            "experts": [0, 1], "eos_token_id": 2, "pad_token_id": 0,
            "embedding_multiplier_scale": 2.0,
            "output_multiplier_scale": 0.5}
    names = ["language_model.embed_tokens.weight",
             "language_model.norm.weight"]
    for i in range(L):
        names += [f"model.layers.{i}.experts.w1.weight",
                  f"model.layers.{i}.experts.w2.weight",
                  f"model.layers.{i}.experts.w3.weight",
                  f"model.layers.{i}.multi_head_attention.k_proj.weight",
                  f"model.layers.{i}.multi_head_attention.o_proj.weight",
                  f"model.layers.{i}.multi_head_attention.q_proj.weight",
                  f"model.layers.{i}.multi_head_attention.v_proj.weight",
                  f"model.layers.{i}.rms_norm.weight",
                  f"model.layers.{i}.rms_norm_1.weight",
                  f"model.layers.{i}.rms_norm_2.weight",
                  f"model.layers.{i}.rms_norm_3.weight",
                  f"model.layers.{i}.router.weight"]
    hd = H // heads
    shapes = {"language_model.embed_tokens.weight": (V, H),
              "language_model.norm.weight": (H,)}
    for i in range(L):
        p = f"model.layers.{i}"
        shapes[f"{p}.experts.w1.weight"] = (NE, H, F)     # stored transposed
        shapes[f"{p}.experts.w2.weight"] = (NE, F, H)
        shapes[f"{p}.experts.w3.weight"] = (NE, H, F)
        shapes[f"{p}.multi_head_attention.k_proj.weight"] = (H, kv * hd)
        shapes[f"{p}.multi_head_attention.o_proj.weight"] = (heads * hd, H)
        shapes[f"{p}.multi_head_attention.q_proj.weight"] = (H, heads * hd)
        shapes[f"{p}.multi_head_attention.v_proj.weight"] = (H, kv * hd)
        for nrm in ("rms_norm", "rms_norm_1", "rms_norm_2", "rms_norm_3"):
            shapes[f"{p}.{nrm}.weight"] = (H,)
        shapes[f"{p}.router.weight"] = (NE, H, NE)   # transposed (H, NE)?
    shapes[f"model.layers.0.router.weight"] = (H, NE)
    order = sorted(range(len(names)), key=lambda i: names[i])
    d = tmp_path / "grok"
    d.mkdir()
    arrays = {}
    for i, n in enumerate(names):
        a = rng.standard_normal(shapes[n]).astype(np.float32) * 0.05
        arrays[n] = a
        idx = order.index(i)
        with open(d / f"tensor{idx:05}_000", "wb") as fh:
            pickle.dump(a, fh)
    (d / "config.json").write_text(json.dumps(cfgd))
    (d / "tokenizer.json").write_text(json.dumps(_unigram_json()))
    out = str(tmp_path / "m.bin")
    convert(str(d), out, "f32", arch="grok-1-base")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 0x1500
    np.testing.assert_allclose(
        np.asarray(m.params["embed"]),
        arrays["language_model.embed_tokens.weight"] * 2.0, atol=1e-5)
    assert np.isfinite(_logits(m, IDS[:5])).all()


def test_convert_alias_tail(tmp_path):
    """Type-aliases: marco-o1 / qwq / readerlm-v2 / reka-flash-3 /
    deepseek-r1-distill-{llama,qwen,qwen3} / wizardcoder / deephermes."""
    # qwen2-based
    torch.manual_seed(91)
    qcfg = transformers.Qwen2Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, sliding_window=None)
    qhf = transformers.Qwen2ForCausalLM(qcfg).eval()
    for alias, want in (("marco-o1", 0x751), ("qwq", 0x752)):
        d = _save_named(tmp_path / alias, _sd(qhf),
                        {**qcfg.to_dict(),
                         "architectures": ["Qwen2ForCausalLM"]},
                        unigram=False,
                        specials=["<|endoftext|>", "<|im_start|>",
                                  "<|im_end|>"])
        out = str(tmp_path / f"{alias}.bin")
        convert(d, out, "f32", arch=alias)
        m = load_model(out, RuntimeConfig(**RT32))
        assert int(m.model_type) == want
        np.testing.assert_allclose(_logits(m), _ref(qhf), atol=3e-3,
                                   rtol=3e-3)
    # r1-distill-qwen (tie int layout + DS template)
    d = _save_named(tmp_path / "r1q", _sd(qhf),
                    {**qcfg.to_dict(),
                     "architectures": ["Qwen2ForCausalLM"]},
                    unigram=False,
                    specials=["<｜begin▁of▁sentence｜>",
                              "<｜end▁of▁sentence｜>", "<｜User｜>",
                              "<｜Assistant｜>"])
    out = str(tmp_path / "r1q.bin")
    convert(d, out, "f32", arch="deepseek-r1-distill-qwen")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 0x754
    assert m.tokenizer.user_token_id >= 0
    np.testing.assert_allclose(_logits(m), _ref(qhf), atol=3e-3, rtol=3e-3)
    # r1-distill-llama (forced llama3.2 layout)
    sc = {"rope_type": "llama3", "factor": 2.0, "low_freq_factor": 1.0,
          "high_freq_factor": 4.0, "original_max_position_embeddings": 64}
    lhf, lcfg = _llama(92, rope_scaling=dict(sc))
    d = _save_named(tmp_path / "r1l", _sd(lhf),
                    {**lcfg.to_dict(),
                     "architectures": ["LlamaForCausalLM"]},
                    unigram=False,
                    specials=["<｜begin▁of▁sentence｜>",
                              "<｜end▁of▁sentence｜>", "<｜User｜>",
                              "<｜Assistant｜>"])
    out = str(tmp_path / "r1l.bin")
    convert(d, out, "f32", arch="deepseek-r1-distill-llama")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 0x1706
    np.testing.assert_allclose(_logits(m), _ref(lhf), atol=3e-3, rtol=3e-3)
    # reka-flash-3 via plain llama3 layout
    rhf, rcfg = _llama(93)
    d = _save_named(tmp_path / "reka", _sd(rhf),
                    {**rcfg.to_dict(),
                     "architectures": ["LlamaForCausalLM"]},
                    unigram=False, specials=["<|endoftext|>"])
    out = str(tmp_path / "reka.bin")
    convert(d, out, "f32", arch="reka-flash-3")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 0x159
    np.testing.assert_allclose(_logits(m), _ref(rhf), atol=3e-3, rtol=3e-3)
