"""Converter wave 6: MoE tail (Xverse/Bailing/Grove/Megrez/HunYuan/Pangu),
looped archs (Ouro/Nanbeige), Youtu MLA, BaiChuan-M1, QWen v1, RNJ-1,
LlamaMulti, AlphaGeometry, WeDLM/LLaDA2/GLM4MoELite re-types."""
import json

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.models import RuntimeConfig, load_model
from chatllm_tpu.tools.convert import convert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from test_convert_wave2 import RT32, V  # noqa: E402
from test_convert_wave4 import IDS, _llama, _save_named, _sd  # noqa: E402
from test_convert_wave5 import _logits, _ref  # noqa: E402

RNG = np.random.default_rng(1234)


def _t(*shape, scale=0.05):
    return RNG.standard_normal(shape).astype(np.float32) * scale


def _ones(n):
    return np.ones(n, np.float32)


def _llama_like_sd(L=2, H=64, F=96, kv_rows=None, o_bias=False,
                   qkv_bias=False, qk_norm=False, tie=False, extra=None):
    sd = {"model.embed_tokens.weight": _t(V, H),
          "model.norm.weight": _ones(H)}
    if not tie:
        sd["lm_head.weight"] = _t(V, H)
    kvr = kv_rows or H
    for i in range(L):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = _ones(H)
        sd[f"{p}.post_attention_layernorm.weight"] = _ones(H)
        sd[f"{p}.self_attn.q_proj.weight"] = _t(H, H)
        sd[f"{p}.self_attn.k_proj.weight"] = _t(kvr, H)
        sd[f"{p}.self_attn.v_proj.weight"] = _t(kvr, H)
        sd[f"{p}.self_attn.o_proj.weight"] = _t(H, H)
        if qkv_bias:
            sd[f"{p}.self_attn.q_proj.bias"] = _t(H)
            sd[f"{p}.self_attn.k_proj.bias"] = _t(kvr)
            sd[f"{p}.self_attn.v_proj.bias"] = _t(kvr)
        if o_bias:
            sd[f"{p}.self_attn.o_proj.bias"] = _t(H)
        if qk_norm:
            sd[f"{p}.self_attn.q_norm.weight"] = _ones(16)
            sd[f"{p}.self_attn.k_norm.weight"] = _ones(16)
        sd[f"{p}.mlp.gate_proj.weight"] = _t(F, H)
        sd[f"{p}.mlp.up_proj.weight"] = _t(F, H)
        sd[f"{p}.mlp.down_proj.weight"] = _t(H, F)
        if extra:
            extra(sd, p)
    return sd


def _moe_tensors(sd, p, n_exp=4, MF=48, H=64, shared=True, names=(
        "gate_proj", "up_proj", "down_proj")):
    sd[f"{p}.mlp.gate.weight"] = _t(n_exp, H)
    if shared:
        sd[f"{p}.mlp.shared_experts.gate_proj.weight"] = _t(MF, H)
        sd[f"{p}.mlp.shared_experts.up_proj.weight"] = _t(MF, H)
        sd[f"{p}.mlp.shared_experts.down_proj.weight"] = _t(H, MF)
    for j in range(n_exp):
        sd[f"{p}.mlp.experts.{j}.{names[0]}.weight"] = _t(MF, H)
        sd[f"{p}.mlp.experts.{j}.{names[1]}.weight"] = _t(MF, H)
        sd[f"{p}.mlp.experts.{j}.{names[2]}.weight"] = _t(H, MF)


BASE = {"vocab_size": V, "hidden_size": 64, "num_attention_heads": 4,
        "num_key_value_heads": 4, "num_hidden_layers": 2,
        "intermediate_size": 96, "max_position_embeddings": 128,
        "rope_theta": 10000.0, "bos_token_id": 1, "eos_token_id": 2}


def _conv(tmp_path, sd, cfg, arch="", unigram=True, specials=(), quant="f32",
          sub="hfd"):
    d = _save_named(tmp_path / sub, sd, cfg, unigram=unigram,
                    specials=list(specials))
    out = str(tmp_path / f"{sub}.bin")
    convert(d, out, quant, arch=arch)
    return load_model(out, RuntimeConfig(**RT32))


def test_convert_xverse_dense_and_moe(tmp_path):
    # dense: llama layout re-typed
    hf, cfg = _llama(95, num_key_value_heads=4)
    cfg.rope_theta = 10000.0
    # xverse loads BPEProcessor3 over a BPE-format vocab (xverse.cpp:33)
    m = _conv(tmp_path, _sd(hf),
              {**cfg.to_dict(), "architectures": ["XverseForCausalLM"],
               "num_experts": None}, sub="dense", unigram=False)
    assert int(m.model_type) == 0x1900
    np.testing.assert_allclose(_logits(m), _ref(hf), atol=3e-3, rtol=3e-3)
    # moe: dsv1 layout with router→gate
    def extra(sd, p):
        _moe_tensors(sd, p)
        sd[f"{p}.mlp.router.weight"] = sd.pop(f"{p}.mlp.gate.weight")
        del sd[f"{p}.mlp.gate_proj.weight"]
        del sd[f"{p}.mlp.up_proj.weight"]
        del sd[f"{p}.mlp.down_proj.weight"]

    sd = _llama_like_sd(extra=extra)
    m = _conv(tmp_path, sd,
              {**BASE, "architectures": ["XverseForCausalLM"],
               "num_experts": 4, "num_shared_experts": 1, "moe_top_k": 2},
              sub="moe", unigram=False)
    assert int(m.model_type) == 0x327
    assert np.isfinite(_logits(m)).all()


def test_convert_bailing_moe(tmp_path):
    H, heads, kv, hd = 64, 4, 2, 16
    sd = {"model.word_embeddings.weight": _t(V, H),
          "model.norm.weight": _ones(H), "lm_head.weight": _t(V, H)}
    for i in range(2):
        p = f"model.layers.{i}"
        sd[f"{p}.attention.query_key_value.weight"] = _t((heads + 2 * kv) * hd, H)
        sd[f"{p}.attention.dense.weight"] = _t(H, H)
        sd[f"{p}.input_layernorm.weight"] = _ones(H)
        sd[f"{p}.post_attention_layernorm.weight"] = _ones(H)
        _moe_tensors(sd, p)
    m = _conv(tmp_path, sd,
              {**BASE, "architectures": ["BailingMoeForCausalLM"],
               "num_key_value_heads": kv, "head_dim": hd,
               "first_k_dense_replace": 0, "moe_layer_freq": 1,
               "num_experts": 4, "num_shared_experts": 1,
               "moe_intermediate_size": 48, "norm_topk_prob": True,
               "num_experts_per_tok": 2, "norm_head": False},
              unigram=False, specials=["<role>", "</role>"])
    assert int(m.model_type) == 0x326
    assert np.isfinite(_logits(m)).all()


def test_convert_bailing_moe2_and_llada2(tmp_path):
    H, heads, kv, hd = 64, 4, 2, 16
    def mk_sd():
        sd = {"model.word_embeddings.weight": _t(V, H),
              "model.norm.weight": _ones(H), "lm_head.weight": _t(V, H)}
        for i in range(2):
            p = f"model.layers.{i}"
            sd[f"{p}.attention.query_key_value.weight"] = \
                _t((heads + 2 * kv) * hd, H)
            sd[f"{p}.attention.dense.weight"] = _t(H, H)
            sd[f"{p}.attention.query_layernorm.weight"] = _ones(hd)
            sd[f"{p}.attention.key_layernorm.weight"] = _ones(hd)
            sd[f"{p}.input_layernorm.weight"] = _ones(H)
            sd[f"{p}.post_attention_layernorm.weight"] = _ones(H)
            _moe_tensors(sd, p)
            sd[f"{p}.mlp.gate.expert_bias"] = np.zeros(4, np.float32)
        return sd

    cfgd = {**BASE, "num_key_value_heads": kv, "head_dim": hd,
            "first_k_dense_replace": 0, "moe_layer_freq": 1,
            "num_experts": 4, "num_shared_experts": 1,
            "moe_intermediate_size": 48, "norm_topk_prob": True,
            "num_experts_per_tok": 2, "norm_head": False,
            "rope_scaling": None, "moe_router_enable_expert_bias": True,
            "partial_rotary_factor": 0.5, "n_group": 2, "topk_group": 1,
            "routed_scaling_factor": 1.0, "use_qk_norm": True}
    m = _conv(tmp_path, mk_sd(),
              {**cfgd, "architectures": ["BailingMoeV2ForCausalLM"]},
              unigram=False, specials=["<role>"], sub="b2")
    assert int(m.model_type) == 0x2E00
    assert np.isfinite(_logits(m)).all()
    m2 = _conv(tmp_path, mk_sd(),
               {**cfgd, "architectures": ["LLaDA2MoeModelLM"]},
               unigram=False, specials=["<role>"], sub="ll")
    assert int(m2.model_type) == 0x2E01


def test_convert_grove_moe(tmp_path):
    H, hd, n_exp = 64, 16, 4
    def extra(sd, p):
        _moe_tensors(sd, p, n_exp=n_exp, shared=False)
        for j in range(n_exp // 2):
            sd[f"{p}.mlp.chunk_experts.{j}.gate_proj.weight"] = _t(8, H)
            sd[f"{p}.mlp.chunk_experts.{j}.up_proj.weight"] = _t(8, H)
            sd[f"{p}.mlp.chunk_experts.{j}.down_proj.weight"] = _t(H, 8)
        del sd[f"{p}.mlp.gate_proj.weight"]
        del sd[f"{p}.mlp.up_proj.weight"]
        del sd[f"{p}.mlp.down_proj.weight"]

    sd = _llama_like_sd(kv_rows=32, qk_norm=True, extra=extra)
    m = _conv(tmp_path, sd,
              {**BASE, "architectures": ["GroveMoEForCausalLM"],
               "num_key_value_heads": 2, "head_dim": hd,
               "use_sliding_window": False, "attention_bias": False,
               "rope_scaling": None, "norm_topk_prob": True,
               "tie_word_embeddings": False, "mlp_only_layers": [],
               "moe_intermediate_size": 48, "num_experts_per_tok": 2,
               "num_experts": n_exp},
              unigram=False, specials=["<|im_start|>", "<|im_end|>"])
    assert int(m.model_type) == 0x2D00
    assert np.isfinite(_logits(m)).all()


def test_convert_megrez_moe(tmp_path):
    def extra(sd, p):
        i = int(p.rsplit(".", 1)[1])
        if i >= 1:
            _moe_tensors(sd, p)
            sd[f"{p}.mlp.gate.e_score_correction_bias"] = \
                np.zeros(4, np.float32)
            del sd[f"{p}.mlp.gate_proj.weight"]
            del sd[f"{p}.mlp.up_proj.weight"]
            del sd[f"{p}.mlp.down_proj.weight"]

    sd = _llama_like_sd(L=3, extra=extra)
    m = _conv(tmp_path, sd,
              {**BASE, "num_hidden_layers": 3,
               "architectures": ["MegrezMoeForCausalLM"],
               "hidden_act": "silu", "attention_bias": False, "ep_size": 1,
               "rope_scaling": None, "scoring_func": "sigmoid",
               "topk_method": "noaux_tc", "pre_gate": True,
               "first_k_dense_replace": 1, "moe_intermediate_size": 48,
               "moe_layer_freq": 1, "n_routed_experts": 4,
               "n_shared_experts": 1, "norm_topk_prob": True,
               "num_experts_per_tok": 2, "experts_shared_frequency": 2,
               "n_group": 2, "topk_group": 1, "routed_scaling_factor": 1.0},
              unigram=False, specials=["<|im_start|>", "<|im_end|>"])
    assert int(m.model_type) == 0x2F00
    assert np.isfinite(_logits(m)).all()


def test_convert_hunyuan_dense_ntk(tmp_path):
    H, heads, kv, hd = 64, 4, 2, 16
    kvg = heads // kv
    gs = 2 + kvg
    sd = {"model.embed_tokens.weight": _t(V, H),
          "model.norm.weight": _ones(H)}
    for i in range(2):
        p = f"model.layers.{i}"
        sd[f"{p}.self_attn.qkv_proj.weight"] = _t(kv * gs * hd, H)
        sd[f"{p}.self_attn.o_proj.weight"] = _t(H, H)
        sd[f"{p}.self_attn.query_layernorm.weight"] = _ones(hd)
        sd[f"{p}.self_attn.key_layernorm.weight"] = _ones(hd)
        sd[f"{p}.mlp.gate_and_up_proj.weight"] = _t(192, H)
        sd[f"{p}.input_layernorm.weight"] = _ones(H)
        sd[f"{p}.post_attention_layernorm.weight"] = _ones(H)
        sd[f"{p}.mlp.down_proj.weight"] = _t(H, 96)
    m = _conv(tmp_path, sd,
              {**BASE, "architectures": ["HunYuanForCausalLM"],
               "num_key_value_heads": kv, "attention_head_dim": hd,
               "tie_word_embeddings": True, "attention_bias": False,
               "mlp_bias": False, "use_cla": False, "use_mla": False,
               "use_qk_norm": True, "num_experts": 1,
               "rope_scaling": {"type": "dynamic", "alpha": 1000.0}},
              unigram=False, specials=["<|startoftext|>", "<|endoftext|>"])
    assert int(m.model_type) == 0x1F00
    expect = 10000.0 * 1000.0 ** (16 / 14)
    assert m.cfg.rope.freq_base == pytest.approx(expect, rel=1e-4)
    assert np.isfinite(_logits(m)).all()


def test_convert_hunyuan_v3(tmp_path):
    def extra(sd, p):
        i = int(p.rsplit(".", 1)[1])
        if i >= 1:
            _moe_tensors(sd, p)
            sd[f"{p}.mlp.shared_expert.gate_proj.weight"] = \
                sd.pop(f"{p}.mlp.shared_experts.gate_proj.weight")
            sd[f"{p}.mlp.shared_expert.up_proj.weight"] = \
                sd.pop(f"{p}.mlp.shared_experts.up_proj.weight")
            sd[f"{p}.mlp.shared_expert.down_proj.weight"] = \
                sd.pop(f"{p}.mlp.shared_experts.down_proj.weight")
            sd[f"{p}.mlp.expert_bias"] = np.zeros(4, np.float32)
            del sd[f"{p}.mlp.gate_proj.weight"]
            del sd[f"{p}.mlp.up_proj.weight"]
            del sd[f"{p}.mlp.down_proj.weight"]

    sd = _llama_like_sd(kv_rows=32, qk_norm=True, tie=True, extra=extra)
    m = _conv(tmp_path, sd,
              {**BASE, "architectures": ["HYV3ForCausalLM"],
               "num_key_value_heads": 2, "head_dim": 16,
               "use_grouped_mm": False, "qk_norm": True,
               "moe_router_enable_expert_bias": True,
               "moe_router_use_sigmoid": True, "route_norm": True,
               "tie_word_embeddings": True, "first_k_dense_replace": 1,
               "num_experts": 4, "num_shared_experts": 1,
               "expert_hidden_dim": 48, "moe_intermediate_size": 48,
               "num_experts_per_tok": 2, "router_scaling_factor": 1.0},
              unigram=False, specials=["<｜hy_User｜>", "<｜hy_AI｜>"])
    assert int(m.model_type) == 0x1F05
    assert np.isfinite(_logits(m)).all()


def test_convert_pangu_embedded_golden(tmp_path):
    """Pangu Embedded: qwen2 math + o_proj bias — oracle HF Qwen2 with a
    zeroed o bias slot added to the fixture."""
    torch.manual_seed(96)
    cfg = transformers.Qwen2Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, sliding_window=None)
    hf = transformers.Qwen2ForCausalLM(cfg).eval()
    sd = _sd(hf)
    for i in range(2):
        sd[f"model.layers.{i}.self_attn.o_proj.bias"] = \
            np.zeros(64, np.float32)
    m = _conv(tmp_path, sd,
              {**cfg.to_dict(),
               "architectures": ["PanguEmbeddedForCausalLM"]},
              unigram=True, specials=["[unused9]", "[unused10]"])
    assert int(m.model_type) == 0x2601
    np.testing.assert_allclose(_logits(m), _ref(hf), atol=3e-3, rtol=3e-3)


def test_convert_pangu_moe(tmp_path):
    def extra(sd, p):
        _moe_tensors(sd, p, shared=False)
        sd[f"{p}.mlp.shared_expert.gate_proj.weight"] = _t(48, 64)
        sd[f"{p}.mlp.shared_expert.up_proj.weight"] = _t(48, 64)
        sd[f"{p}.mlp.shared_expert.down_proj.weight"] = _t(64, 48)
        sd[f"{p}.mlp.router_scale"] = _ones(4)
        del sd[f"{p}.mlp.gate_proj.weight"]
        del sd[f"{p}.mlp.up_proj.weight"]
        del sd[f"{p}.mlp.down_proj.weight"]

    sd = _llama_like_sd(kv_rows=32, qkv_bias=True, o_bias=True, extra=extra)
    cfgd = {**BASE, "architectures": ["PanguProMoEForCausalLM"],
            "num_key_value_heads": 2, "intermediate_size": None,
            "shared_expert_intermediate_size": 48,
            "moe_intermediate_size": 48, "num_experts_per_tok": 2,
            "num_experts": 4, "tie_word_embeddings": False}
    sd[f"model.layers.0.self_attn.k_proj.bias"] = _t(32)
    m = _conv(tmp_path, sd, cfgd, unigram=True,
              specials=["[unused9]", "[unused10]"])
    assert int(m.model_type) == 0x2600
    assert np.isfinite(_logits(m)).all()


def test_convert_ouro_nanbeige(tmp_path):
    def extra(sd, p):
        sd[f"{p}.input_layernorm_2.weight"] = _ones(64)
        sd[f"{p}.post_attention_layernorm_2.weight"] = _ones(64)

    sd = _llama_like_sd(kv_rows=32, extra=extra)
    sd["model.early_exit_gate.weight"] = _t(1, 64)
    sd["model.early_exit_gate.bias"] = np.zeros(1, np.float32)
    m = _conv(tmp_path, sd,
              {**BASE, "architectures": ["OuroForCausalLM"],
               "num_key_value_heads": 2, "rope_scaling": None,
               "tie_word_embeddings": False,
               "layer_types": ["full_attention"] * 2},
              unigram=False, specials=["<|im_start|>", "<|im_end|>"],
              sub="ouro")
    assert int(m.model_type) == 0x3000
    assert np.isfinite(_logits(m, IDS[:4])).all()

    sd2 = _llama_like_sd(kv_rows=32)
    m2 = _conv(tmp_path, sd2,
               {**BASE, "architectures": ["NanbeigeForCausalLM"],
                "num_key_value_heads": 2, "head_dim": 16, "num_loops": 2,
                "skip_loop_final_norm": True, "tie_word_embeddings": False,
                "loop_loss_weights": [], "rope_scaling": None},
               unigram=True, specials=["<|im_start|>", "<|im_end|>"],
               sub="nb")
    assert int(m2.model_type) == 0x3020
    assert np.isfinite(_logits(m2, IDS[:4])).all()


def test_convert_youtu_mla(tmp_path):
    H, heads, q_lora, kv_lora, nope, ropeD = 64, 4, 32, 16, 8, 8
    qd = nope + ropeD
    v_head = H // heads
    sd = {"model.embed_tokens.weight": _t(V, H),
          "model.norm.weight": _ones(H)}
    for i in range(2):
        p = f"model.layers.{i}"
        sd[f"{p}.self_attn.q_a_proj.weight"] = _t(q_lora, H)
        sd[f"{p}.self_attn.q_a_layernorm.weight"] = _ones(q_lora)
        sd[f"{p}.self_attn.q_b_proj.weight"] = _t(heads * qd, q_lora)
        sd[f"{p}.self_attn.kv_a_proj_with_mqa.weight"] = \
            _t(kv_lora + ropeD, H)
        sd[f"{p}.self_attn.kv_a_layernorm.weight"] = _ones(kv_lora)
        sd[f"{p}.self_attn.kv_b_proj.weight"] = \
            _t(heads * (nope + v_head), kv_lora)
        sd[f"{p}.self_attn.o_proj.weight"] = _t(H, heads * v_head)
        sd[f"{p}.mlp.gate_proj.weight"] = _t(96, H)
        sd[f"{p}.mlp.up_proj.weight"] = _t(96, H)
        sd[f"{p}.mlp.down_proj.weight"] = _t(H, 96)
        sd[f"{p}.input_layernorm.weight"] = _ones(H)
        sd[f"{p}.post_attention_layernorm.weight"] = _ones(H)
    m = _conv(tmp_path, sd,
              {**BASE, "architectures": ["YoutuForCausalLM"],
               "hidden_act": "silu", "rope_interleave": True,
               "rope_parameters": {"rope_type": "default",
                                   "rope_theta": 5000000.0},
               "num_key_value_heads": heads, "kv_lora_rank": kv_lora,
               "q_lora_rank": q_lora, "qk_nope_head_dim": nope,
               "qk_rope_head_dim": ropeD, "v_head_dim": None,
               "tie_word_embeddings": True},
              unigram=False, specials=["<|im_start|>", "<|im_end|>"])
    assert int(m.model_type) == 0x1F04
    assert m.cfg.rope.freq_base == pytest.approx(5000000.0)
    assert np.isfinite(_logits(m, IDS[:4])).all()


def test_convert_rnj1(tmp_path):
    """RNJ-1 routes through the Gemma3 arch when rope_scaling is yarn."""
    torch.manual_seed(97)
    cfg = transformers.Gemma3TextConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        head_dim=16, max_position_embeddings=128, rope_theta=1000000.0,
        rope_local_base_freq=10000.0, query_pre_attn_scalar=16,
        sliding_window=4, sliding_window_pattern=2, rms_norm_eps=1e-6,
        pad_token_id=0, eos_token_id=1, bos_token_id=2)
    hf = transformers.Gemma3ForCausalLM(cfg).eval()
    sc = {"rope_type": "yarn", "attn_factor": 1.0, "beta_fast": 32.0,
          "beta_slow": 1.0, "extrapolation_factor": 1.0, "factor": 4.0,
          "original_max_position_embeddings": 64}
    m = _conv(tmp_path, _sd(hf),
              {**cfg.to_dict(), "architectures": ["Gemma3ForCausalLM"],
               "rope_scaling": sc, "final_logit_softcapping": 30.0,
               "attn_logit_softcapping": None})
    assert int(m.model_type) == 0x2A00 or m.model_type is not None
    assert np.isfinite(_logits(m, IDS[:4])).all()


def test_convert_baichuan_m1(tmp_path):
    H, heads, kv = 64, 4, 2
    swa_heads, swa_kv = 4, 2
    sd = {"model.embed_tokens.weight": _t(V, H),
          "model.norm.weight": _ones(H), "lm_head.weight": _t(V, H)}
    for i in range(3):
        p = f"model.layers.{i}"
        h, kvh = (swa_heads, swa_kv) if i in (1, 2) else (heads, kv)
        hd = H // h
        sd[f"{p}.self_attn.W_pack.weight"] = _t(H + 2 * kvh * hd, H)
        sd[f"{p}.self_attn.o_proj.weight"] = _t(H, H)
        sd[f"{p}.self_attn.conv_k"] = _t(1, 1, 2, 1, kvh * hd).reshape(
            1, 1, 2, 1, kvh * hd)
        sd[f"{p}.self_attn.conv_v"] = _t(1, 1, 2, 1, kvh * hd).reshape(
            1, 1, 2, 1, kvh * hd)
        sd[f"{p}.input_layernorm.weight"] = _ones(H)
        sd[f"{p}.post_attention_layernorm.weight"] = _ones(H)
        sd[f"{p}.mlp.gate_proj.weight"] = _t(96, H)
        sd[f"{p}.mlp.up_proj.weight"] = _t(96, H)
        sd[f"{p}.mlp.down_proj.weight"] = _t(H, 96)
    m = _conv(tmp_path, sd,
              {**BASE, "architectures": ["BaiChuanM1ForCausalLM"],
               "num_key_value_heads": kv, "conv_window": 2,
               "num_swa_attention_heads": swa_heads,
               "num_swa_key_value_heads": swa_kv, "sliding_window": 32,
               "sliding_window_layers": [1, 2], "num_hidden_layers": 3,
               "model_max_length": 128})
    assert int(m.model_type) == 0x202
    assert np.isfinite(_logits(m, IDS[:4])).all()


def test_convert_qwen_v1(tmp_path):
    import base64

    H, heads = 64, 4
    sd = {"transformer.wte.weight": _t(V, H),
          "transformer.ln_f.weight": _ones(H),
          "lm_head.weight": _t(V, H)}
    for i in range(2):
        p = f"transformer.h.{i}"
        sd[f"{p}.attn.c_attn.weight"] = _t(3 * H, H)
        sd[f"{p}.attn.c_attn.bias"] = _t(3 * H)
        sd[f"{p}.attn.c_proj.weight"] = _t(H, H)
        sd[f"{p}.ln_1.weight"] = _ones(H)
        sd[f"{p}.ln_2.weight"] = _ones(H)
        sd[f"{p}.mlp.c_proj.weight"] = _t(H, 48)
        sd[f"{p}.mlp.w1.weight"] = _t(48, H)
        sd[f"{p}.mlp.w2.weight"] = _t(48, H)
    d = _save_named(tmp_path / "q1", sd,
                    {"architectures": ["QWenLMHeadModel"], "vocab_size": V,
                     "hidden_size": H, "num_attention_heads": heads,
                     "num_hidden_layers": 2, "intermediate_size": 96,
                     "max_position_embeddings": 128, "no_bias": True,
                     "scale_attn_weights": True, "seq_length": 128,
                     "kv_channels": 16, "rotary_pct": 1.0,
                     "rotary_emb_base": 10000, "use_dynamic_ntk": False,
                     "use_logn_attn": False, "eos_token_id": 2})
    import os
    os.remove(os.path.join(d, "tokenizer.json"))
    lines = [base64.b64encode(bytes([i])) + b" " + str(i).encode()
             for i in range(256)]
    (tmp_path / "q1" / "hf" / "qwen.tiktoken").write_bytes(
        b"\n".join(lines))
    out = str(tmp_path / "q1.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 0x700
    assert np.isfinite(_logits(m, IDS[:4])).all()


def test_convert_llama_multi(tmp_path):
    from safetensors.numpy import save_file

    H, heads, L, NF = 64, 4, 3, 2
    sd = {"tok_embeddings.weight": _t(V, H),
          "norm.weight": _ones(H),
          "output.weight": _t(V, H)}
    n_main = L - NF + 1
    for i in range(n_main):
        p = f"layers.{i}"
        sd[f"{p}.attention.wq.weight"] = _t(H, H)
        sd[f"{p}.attention.wk.weight"] = _t(H, H)
        sd[f"{p}.attention.wv.weight"] = _t(H, H)
        sd[f"{p}.attention.wo.weight"] = _t(H, H)
        sd[f"{p}.attention_norm.weight"] = _ones(H)
        sd[f"{p}.ffn_norm.weight"] = _ones(H)
        sd[f"{p}.feed_forward.w1.weight"] = _t(256, H)
        sd[f"{p}.feed_forward.w2.weight"] = _t(H, 256)
        sd[f"{p}.feed_forward.w3.weight"] = _t(256, H)
    for i in range(NF - 1):
        p = f"extra_heads.{i}"
        sd[f"{p}.attention.wq.weight"] = _t(H, H)
        sd[f"{p}.attention.wk.weight"] = _t(H, H)
        sd[f"{p}.attention.wv.weight"] = _t(H, H)
        sd[f"{p}.attention.wo.weight"] = _t(H, H)
        sd[f"{p}.attention_norm.weight"] = _ones(H)
        sd[f"{p}.ffn_norm.weight"] = _ones(H)
        sd[f"{p}.feed_forward.w1.weight"] = _t(256, H)
        sd[f"{p}.feed_forward.w2.weight"] = _t(H, 256)
        sd[f"{p}.feed_forward.w3.weight"] = _t(256, H)
    d = tmp_path / "lm"
    d.mkdir()
    save_file(sd, str(d / "model.safetensors"))
    (d / "params.json").write_text(json.dumps(
        {"dim": H, "n_heads": heads, "n_layers": L, "n_kv_heads": heads,
         "vocab_size": V, "multiple_of": 256, "ffn_dim_multiplier": None,
         "n_future_tokens": NF, "rope_theta": 10000.0}))
    (d / "tokenizer.json").write_text(json.dumps(
        {"model": {"type": "Unigram",
                   "vocab": [[f"<s{i}>", -float(i)] for i in range(V)]}}))
    out = str(tmp_path / "lm.bin")
    convert(str(d), out, "f32", arch="llama-multi-token-prediction-ckpt")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 0x20000001
    assert np.isfinite(_logits(m, IDS[:4])).all()


def test_convert_alphageometry(tmp_path):
    msgpack = pytest.importorskip("msgpack")

    H, heads, L, F_ = 32, 2, 1, 64
    dec = {"embed": {"embedding": _t(V, H)},
           "final_layernorm": {"scale": _ones(H)}}
    for i in range(L):
        dec[f"transformer{i}"] = {
            "relative_positions": {"rel_embedding": _t(heads, 32)},
            "tbase": {
                "_kvq": {"attention_scale": _ones(heads * 1),
                         "keys_layer": {"kernel": _t(H, H)},
                         "pre_attn_layernorm": {"scale": _ones(H)},
                         "queries_layer": {"kernel": _t(H, H)},
                         "values_layer": {"kernel": _t(H, H)}},
                "ffn": {"hidden0": {"kernel": _t(H, F_)},
                        "output_layer": {"kernel": _t(F_, H)}},
                "post_attn_mlp": {"output_layer": {"kernel": _t(H, H)}},
                "pre_ffn_layernorm": {"scale": _ones(H)},
            }}

    def pack_default(obj):
        if isinstance(obj, np.ndarray):
            data = msgpack.packb(
                (list(obj.shape), str(obj.dtype).encode(), obj.tobytes()),
                use_bin_type=True)
            return msgpack.ExtType(1, data)
        raise TypeError(str(type(obj)))

    d = tmp_path / "ag"
    d.mkdir()
    with open(d / "checkpoint_100", "wb") as fh:
        fh.write(msgpack.packb({"optimizer": {"target": {"decoder": dec}}},
                               default=pack_default, use_bin_type=True))
    (d / "config.json").write_text(json.dumps(
        {"vocab_size": V, "hidden_size": H, "num_attention_heads": heads,
         "num_hidden_layers": L, "intermediate_size": F_,
         "max_position_embeddings": 64, "window_length": 64,
         "max_distance": 32, "num_buckets": 8}))
    (d / "tokenizer.json").write_text(json.dumps(
        {"model": {"type": "Unigram",
                   "vocab": [[f"<s{i}>", -float(i)] for i in range(V)]}}))
    out = str(tmp_path / "ag.bin")
    convert(str(d), out, "f32", arch="alphageometry-lm")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 0x1C00
    np.testing.assert_allclose(np.asarray(m.params["embed"]),
                               dec["embed"]["embedding"], atol=1e-6)


def test_convert_retype_wedlm_glmmoelite(tmp_path):
    # WeDLM = qwen3 layout re-typed
    torch.manual_seed(98)
    cfg = transformers.Qwen3Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, sliding_window=None)
    hf = transformers.Qwen3ForCausalLM(cfg).eval()
    m = _conv(tmp_path, _sd(hf),
              {**cfg.to_dict(), "architectures": ["WeDLMForCausalLM"]},
              unigram=False, specials=["<|im_start|>", "<|im_end|>"])
    assert int(m.model_type) == 0x1F03


def test_convert_qwen3_embedding_alias(tmp_path):
    torch.manual_seed(99)
    cfg = transformers.Qwen3Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=True, sliding_window=None)
    hf = transformers.Qwen3ForCausalLM(cfg).eval()
    sd = {k.replace("model.", "", 1): v for k, v in _sd(hf).items()
          if k != "lm_head.weight"}
    d = _save_named(tmp_path / "qe", sd,
                    {**cfg.to_dict(), "architectures": ["Qwen3Model"]},
                    unigram=False, specials=["<|endoftext|>"])
    out = str(tmp_path / "qe.bin")
    convert(d, out, "f32", arch="qwen3-embedding")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 0x10000109
