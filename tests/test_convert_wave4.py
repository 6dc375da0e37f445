"""Converter wave 4 (round-3 push, VERDICT item 2): dense long-tail HF
families — random-init checkpoint in the arch's native tensor naming →
tools/convert.py → load_model → logits match an exact torch oracle."""
import json

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.models import RuntimeConfig, load_model
from chatllm_tpu.tools.convert import convert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from test_convert import _save_hf_dir  # noqa: E402
from test_convert_wave2 import RT32, V, _check, _unigram_json  # noqa: E402

IDS = (7, 30, 102, 89, 5, 41, 77, 150)


def _llama(seed=60, **kw):
    torch.manual_seed(seed)
    kw.setdefault("num_key_value_heads", 2)
    kw.setdefault("tie_word_embeddings", False)
    kw.setdefault("attention_bias", False)
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-6, **kw)
    return transformers.LlamaForCausalLM(cfg).eval(), cfg


def _save_named(tmp_path, sd, cfg_dict, unigram=True, specials=()):
    from safetensors.numpy import save_file

    d = tmp_path / "hf"
    d.mkdir(parents=True)
    save_file({k: np.asarray(v, dtype=np.float32) for k, v in sd.items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(cfg_dict))
    if unigram:
        (d / "tokenizer.json").write_text(json.dumps(
            _unigram_json(list(specials))))
    else:
        from test_convert import _byte_vocab_json
        (d / "tokenizer.json").write_text(json.dumps(
            _byte_vocab_json(list(specials)), ensure_ascii=False))
    return str(d)


def _golden(tmp_path, hf, src, cfg_dict, unigram=True, specials=(),
            atol=3e-3, quant="f32", arch_flag=""):
    d = _save_named(tmp_path, src, cfg_dict, unigram, specials)
    out = str(tmp_path / "m.bin")
    convert(d, out, quant, arch=arch_flag)
    model = load_model(out, RuntimeConfig(**RT32))
    a = np.array([list(IDS)], dtype=np.int32)
    logits, _ = model.forward_logits(a)
    with torch.no_grad():
        ref = hf(torch.from_numpy(a.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=atol,
                               rtol=3e-3)
    return model


def _sd(hf):
    # np.array → own the buffer: .numpy() aliases the torch parameter and a
    # later in-place edit of the module would silently mutate the snapshot
    return {k: np.array(v.detach().float().numpy())
            for k, v in hf.state_dict().items()}


# ---------------------------------------------------------------------------


def test_convert_internlm_v1(tmp_path):
    """InternLM v1 (bias=True, MHA): biased-attention llama oracle."""
    hf, cfg = _llama(60, num_key_value_heads=4, attention_bias=True)
    m = _golden(tmp_path, hf, _sd(hf),
                {**cfg.to_dict(), "architectures": ["InternLMForCausalLM"],
                 "bias": True, "rotary": {"type": "dynamic", "base": 10000}})
    assert int(m.model_type) == 0x100


def test_convert_internlm_v2_as_v1(tmp_path):
    """InternLM v2-published-with-llama-names (bias=False, GQA + theta)."""
    hf, cfg = _llama(61)
    cfg.rope_theta = 1000000.0
    with torch.no_grad():
        hf = transformers.LlamaForCausalLM(cfg).eval()
    m = _golden(tmp_path, hf, _sd(hf),
                {**cfg.to_dict(), "architectures": ["InternLMForCausalLM"],
                 "bias": False,
                 "rotary": {"type": "dynamic", "base": 1000000.0}})
    assert int(m.model_type) == 0x101


def test_convert_internlm3(tmp_path):
    hf, cfg = _llama(62)
    m = _golden(tmp_path, hf, _sd(hf),
                {**cfg.to_dict(), "architectures": ["InternLM3ForCausalLM"],
                 "rope_scaling": {"rope_type": "dynamic", "factor": 1.0}})
    assert int(m.model_type) == 0x103


def test_convert_exaone(tmp_path):
    """EXAONE 3.x: transformer.h.* names, llama3 rope scaling."""
    scaling = {"rope_type": "llama3", "factor": 2.0, "low_freq_factor": 1.0,
               "high_freq_factor": 4.0,
               "original_max_position_embeddings": 64}
    hf, cfg = _llama(63, rope_scaling=dict(scaling))
    sd = _sd(hf)
    out = {"transformer.wte.weight": sd["model.embed_tokens.weight"],
           "transformer.ln_f.weight": sd["model.norm.weight"],
           "lm_head.weight": sd["lm_head.weight"]}
    for i in range(2):
        s, d = f"model.layers.{i}", f"transformer.h.{i}"
        out[f"{d}.attn.attention.q_proj.weight"] = sd[f"{s}.self_attn.q_proj.weight"]
        out[f"{d}.attn.attention.k_proj.weight"] = sd[f"{s}.self_attn.k_proj.weight"]
        out[f"{d}.attn.attention.v_proj.weight"] = sd[f"{s}.self_attn.v_proj.weight"]
        out[f"{d}.attn.attention.out_proj.weight"] = sd[f"{s}.self_attn.o_proj.weight"]
        out[f"{d}.ln_1.weight"] = sd[f"{s}.input_layernorm.weight"]
        out[f"{d}.ln_2.weight"] = sd[f"{s}.post_attention_layernorm.weight"]
        out[f"{d}.mlp.c_fc_0.weight"] = sd[f"{s}.mlp.gate_proj.weight"]
        out[f"{d}.mlp.c_fc_1.weight"] = sd[f"{s}.mlp.up_proj.weight"]
        out[f"{d}.mlp.c_proj.weight"] = sd[f"{s}.mlp.down_proj.weight"]
    cfgd = {k: v for k, v in cfg.to_dict().items()
            if k != "num_hidden_layers"}
    m = _golden(tmp_path, hf, out,
                {**cfgd, "architectures": ["ExaoneForCausalLM"],
                 "num_layers": 2, "activation_function": "silu",
                 "rope_scaling": scaling}, unigram=False,
                specials=["[BOS]", "[EOS]", "[|endofturn|]"])
    assert m.cfg.rope.freq_factors is not None


def test_convert_orion(tmp_path):
    """Orion: llama arch with biased LayerNorms — oracle is HF Llama with
    LlamaRMSNorm monkeypatched to nn.LayerNorm (same ctor signature)."""
    from transformers.models.llama import modeling_llama

    torch.manual_seed(64)
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=5000000.0,
        rms_norm_eps=1e-5,   # loader's LayerNorm eps (build_dense_config)
        tie_word_embeddings=False)
    orig = modeling_llama.LlamaRMSNorm
    modeling_llama.LlamaRMSNorm = torch.nn.LayerNorm
    try:
        hf = transformers.LlamaForCausalLM(cfg).eval()
    finally:
        modeling_llama.LlamaRMSNorm = orig
    with torch.no_grad():
        for n, p in hf.named_parameters():
            if "norm" in n:
                p.copy_(torch.randn_like(p) * 0.1 + (1.0 if n.endswith("weight") else 0.0))
    m = _golden(tmp_path, hf, _sd(hf),
                {**cfg.to_dict(), "architectures": ["OrionForCausalLM"],
                 "max_sequence_length": 128})
    assert m.cfg.norm_type == "layernorm"


def test_convert_telechat2(tmp_path):
    """TeleChat2: transformer.h names, fused key_value, o/down biases."""
    torch.manual_seed(65)
    H, heads, hd = 64, 4, 16
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=H, num_attention_heads=heads,
        num_key_value_heads=heads, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0,
        attention_bias=True, mlp_bias=True, tie_word_embeddings=False)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    with torch.no_grad():   # TeleChat2 has only o_proj and down_proj biases
        for n, p in hf.named_parameters():
            if n.endswith(("q_proj.bias", "k_proj.bias", "v_proj.bias",
                           "gate_proj.bias", "up_proj.bias")):
                p.zero_()
    sd = _sd(hf)
    out = {"transformer.word_embeddings.weight": sd["model.embed_tokens.weight"],
           "transformer.ln_f.weight": sd["model.norm.weight"],
           "lm_head.weight": sd["lm_head.weight"]}
    for i in range(2):
        s, d = f"model.layers.{i}", f"transformer.h.{i}"
        k = sd[f"{s}.self_attn.k_proj.weight"].reshape(heads, 1, hd, H)
        v = sd[f"{s}.self_attn.v_proj.weight"].reshape(heads, 1, hd, H)
        out[f"{d}.self_attention.key_value.weight"] = np.ascontiguousarray(
            np.concatenate([k, v], axis=1).reshape(2 * H, H))
        out[f"{d}.self_attention.query.weight"] = sd[f"{s}.self_attn.q_proj.weight"]
        out[f"{d}.self_attention.dense.weight"] = sd[f"{s}.self_attn.o_proj.weight"]
        out[f"{d}.self_attention.dense.bias"] = sd[f"{s}.self_attn.o_proj.bias"]
        out[f"{d}.input_layernorm.weight"] = sd[f"{s}.input_layernorm.weight"]
        out[f"{d}.post_attention_layernorm.weight"] = sd[f"{s}.post_attention_layernorm.weight"]
        out[f"{d}.mlp.gate_proj.weight"] = sd[f"{s}.mlp.gate_proj.weight"]
        out[f"{d}.mlp.up_proj.weight"] = sd[f"{s}.mlp.up_proj.weight"]
        out[f"{d}.mlp.down_proj.weight"] = sd[f"{s}.mlp.down_proj.weight"]
        out[f"{d}.mlp.down_proj.bias"] = sd[f"{s}.mlp.down_proj.bias"]
    _golden(tmp_path, hf, out,
            {"architectures": ["TeleChat2ForCausalLM"], "vocab_size": V,
             "hidden_size": H, "n_head": heads, "n_layer": 2,
             "ffn_hidden_size": 96, "seq_length": 128, "rms_norm_eps": 1e-6,
             "num_key_value_heads": heads, "base_seqlen": 8192,
             "training_seqlen": 8192, "bos_token_id": 1, "eos_token_id": 2,
             "hidden_act": None, "tie_word_embeddings": False,
             "apply_residual_connection_post_layernorm": False,
             "embed_layernorm": None})


def test_convert_smollm_alias(tmp_path):
    hf, cfg = _llama(66, tie_word_embeddings=True)
    d = _save_named(tmp_path, _sd(hf),
                    {**cfg.to_dict(), "architectures": ["LlamaForCausalLM"]},
                    unigram=False, specials=["<|endoftext|>", "<|im_start|>",
                                             "<|im_end|>"])
    out = str(tmp_path / "m.bin")
    convert(d, out, "f32", arch="smollm")
    m = load_model(out, RuntimeConfig(**RT32))
    a = np.array([list(IDS)], dtype=np.int32)
    logits, _ = m.forward_logits(a)
    with torch.no_grad():
        ref = hf(torch.from_numpy(a.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3,
                               rtol=3e-3)
    assert int(m.model_type) == 0x1701


def test_convert_instella(tmp_path):
    """Instella (pre-norm LMBlock4 + full-width qk-norm, NEOX rope): no HF
    class with the same math exists, so this is an equivalence test — the
    converter's output must load to the same logits as a directly-written
    GGMM fixture holding identical weights (the loader contract is the
    oracle, established by the zoo tests)."""
    import struct as _struct

    from chatllm_tpu.ggmm.quants import GGMLType
    from chatllm_tpu.ggmm.writer import GGMMWriter

    torch.manual_seed(67)
    cfg = transformers.Olmo2Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5,   # fixture writer has no config.json meta to
        tie_word_embeddings=False)   # carry eps; align on the default
    hf = transformers.Olmo2ForCausalLM(cfg).eval()
    sd = {}
    for k, a in _sd(hf).items():
        k = (k.replace(".post_attention_layernorm.",
                       ".pre_attention_layernorm.")
              .replace(".post_feedforward_layernorm.",
                       ".pre_feedforward_layernorm."))
        sd[k] = a
    d = _save_named(tmp_path, sd,
                    {**cfg.to_dict(),
                     "architectures": ["InstellaForCausalLM"]},
                    unigram=False, specials=["<|endoftext|>", "<|im_start|>",
                                             "<|im_end|>"])
    out = str(tmp_path / "m.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert int(m.model_type) == 0x2100
    assert m.cfg.qk_norm == "rmsnorm_full"
    # fixture path: identical weights through the hand-rolled writer
    ref_path = str(tmp_path / "fix.bin")
    with open(ref_path, "wb") as fh:
        w = GGMMWriter(fh, 0x2100, 1, meta={"model_name": "t"})
        w.write_config([int(GGMLType.F32), V, 64, 4, 2, 96, 128,
                        1, 2, -1, -1, 2], fmt="12i")
        fh.write(_struct.pack("<f", 10000.0))
        w._patch_offset(12)
        from test_convert import _byte_vocab_json
        bj = _byte_vocab_json(["<|endoftext|>", "<|im_start|>",
                               "<|im_end|>"])
        toks = [(t.encode(), 1) for t, _ in
                sorted(bj["model"]["vocab"].items(), key=lambda kv: kv[1])]
        w.write_vocab_bpe(toks, [mm if isinstance(mm, str) else
                                 f"{mm[0]} {mm[1]}"
                                 for mm in bj["model"]["merges"]])
        for n, a in sd.items():
            w.write_tensor(n, a, GGMLType.F32 if a.ndim != 2
                           else GGMLType.F32)
    m2 = load_model(ref_path, RuntimeConfig(**RT32))
    a = np.array([list(IDS)], dtype=np.int32)
    l1, _ = m.forward_logits(a)
    l2, _ = m2.forward_logits(a)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)


def test_convert_index(tmp_path):
    hf, cfg = _llama(68, num_key_value_heads=4)
    with torch.no_grad():   # reference norm_head: row-normalized lm_head
        hf.lm_head.weight.copy_(
            torch.nn.functional.normalize(hf.lm_head.weight))
    cd = {k: v for k, v in cfg.to_dict().items() if k != "rope_theta"}
    m = _golden(tmp_path, hf, _sd(hf),
                {**cd, "architectures": ["IndexForCausalLM"],
                 "norm_head": True, "rope_ratio": 1.0})
    assert int(m.model_type) == 0x1A00


def test_convert_zhinao(tmp_path):
    """Zhinao: fused interleaved qkv_proj (+bias) split — qwen2 oracle."""
    torch.manual_seed(69)
    heads, kv, hd, H = 4, 2, 16, 64
    cfg = transformers.Qwen2Config(
        vocab_size=V, hidden_size=H, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, sliding_window=None)
    hf = transformers.Qwen2ForCausalLM(cfg).eval()
    sd = _sd(hf)
    out = dict(sd)
    kvg = heads // kv
    for i in range(2):
        pfx = f"model.layers.{i}.self_attn"
        q = out.pop(f"{pfx}.q_proj.weight").reshape(kv, kvg * hd, H)
        k = out.pop(f"{pfx}.k_proj.weight").reshape(kv, hd, H)
        v = out.pop(f"{pfx}.v_proj.weight").reshape(kv, hd, H)
        out[f"{pfx}.qkv_proj.weight"] = np.ascontiguousarray(
            np.concatenate([q, k, v], axis=1).reshape((kvg + 2) * kv * hd, H))
        qb = out.pop(f"{pfx}.q_proj.bias").reshape(kv, kvg * hd)
        kb = out.pop(f"{pfx}.k_proj.bias").reshape(kv, hd)
        vb = out.pop(f"{pfx}.v_proj.bias").reshape(kv, hd)
        out[f"{pfx}.qkv_proj.bias"] = np.ascontiguousarray(
            np.concatenate([qb, kb, vb], axis=1).reshape(-1))
    _golden(tmp_path, hf, out,
            {**cfg.to_dict(), "architectures": ["ZhinaoForCausalLM"],
             "rope_scaling": None}, unigram=False,
            specials=["<|im_start|>", "<|im_end|>"])


def test_convert_aquila(tmp_path):
    # aquila loads default-regex BPEProcessor2 (aquila.cpp:185)
    hf, cfg = _llama(70)
    m = _golden(tmp_path, hf, _sd(hf),
                {**cfg.to_dict(), "architectures": ["AquilaForCausalLM"]},
                unigram=False)
    assert int(m.model_type) == 0x1707


def test_convert_jiutian(tmp_path):
    torch.manual_seed(71)
    cfg = transformers.Qwen2Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=True, sliding_window=None)
    hf = transformers.Qwen2ForCausalLM(cfg).eval()
    m = _golden(tmp_path, hf, _sd(hf),
                {**cfg.to_dict(), "architectures": ["JiutianForCausalLM"],
                 "qkv_bias": True}, unigram=False,
                specials=["<|im_start|>", "<|im_end|>"])
    assert int(m.model_type) == 0x2900


def test_convert_bluelm(tmp_path):
    """BlueLM: embed LayerNorm folded into the table at conversion."""
    torch.manual_seed(72)
    hf, cfg = _llama(72)
    sd = _sd(hf)
    g = np.random.default_rng(0).standard_normal(64).astype(np.float32) * 0.1 + 1.0
    b = np.random.default_rng(1).standard_normal(64).astype(np.float32) * 0.1
    emb = sd["model.embed_tokens.weight"]
    mu, var = emb.mean(1, keepdims=True), emb.var(1, keepdims=True)
    folded = (emb - mu) / np.sqrt(var + 1e-5) * g + b
    with torch.no_grad():   # oracle llama runs on the folded table
        hf.model.embed_tokens.weight.copy_(torch.from_numpy(folded))
    src = dict(sd)
    src["model.embed_layer_norm.weight"] = g
    src["model.embed_layer_norm.bias"] = b
    m = _golden(tmp_path, hf, src,
                {**cfg.to_dict(), "architectures": ["BlueLMForCausalLM"],
                 "use_stable_embedding": True,
                 "rope_scaling": {"type": "ntkmixed", "factor": 1.0,
                                  "power": 0.0}})
    assert int(m.model_type) == 0x800


def test_convert_apriel(tmp_path):
    """Apriel: llama + YaRN (factor 1 → identity scaling for the oracle)."""
    sc = {"rope_type": "yarn", "factor": 1.0, "beta_fast": 32.0,
          "beta_slow": 1.0, "original_max_position_embeddings": 128,
          "attention_factor": None}
    hf, cfg = _llama(73, rope_scaling=dict(sc))
    m = _golden(tmp_path, hf, _sd(hf),
                {**cfg.to_dict(), "architectures": ["AprielForCausalLM"],
                 "rope_scaling": sc, "mlp_bias": False},
                unigram=False, specials=["<|end|>"])
    assert int(m.model_type) == 0x2400


def test_convert_decilm(tmp_path):
    """DeciLM block_configs: one normal + one no-op-attention layer; the
    oracle zeroes that layer's o_proj so attention contributes nothing."""
    torch.manual_seed(74)
    scaling = {"rope_type": "llama3", "factor": 1.0, "low_freq_factor": 1.0,
               "high_freq_factor": 4.0,
               "original_max_position_embeddings": 128}
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=256,
        max_position_embeddings=128, rope_theta=10000.0,
        rope_scaling=dict(scaling), tie_word_embeddings=False)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    with torch.no_grad():
        hf.model.layers[1].self_attn.o_proj.weight.zero_()
    sd = _sd(hf)
    for n in ("input_layernorm.weight", "self_attn.q_proj.weight",
              "self_attn.k_proj.weight", "self_attn.v_proj.weight",
              "self_attn.o_proj.weight"):
        del sd[f"model.layers.1.{n}"]
    blocks = [{"attention": {"no_op": False, "n_heads_in_group": 2,
                             "num_sink_tokens": None,
                             "replace_with_linear": False, "sparsify": None,
                             "unshifted_sink": False,
                             "use_prefill_window_in_sink_attention": False,
                             "window_length": None},
               "ffn": {"no_op": False, "replace_with_linear": False,
                       "sparsify": None, "ffn_mult": 6.0}},
              {"attention": {"no_op": True, "n_heads_in_group": None,
                             "num_sink_tokens": None,
                             "replace_with_linear": False, "sparsify": None,
                             "unshifted_sink": False,
                             "use_prefill_window_in_sink_attention": False,
                             "window_length": None},
               "ffn": {"no_op": False, "replace_with_linear": False,
                       "sparsify": None, "ffn_mult": 6.0}}]
    cd = {k: v for k, v in cfg.to_dict().items()
          if k not in ("num_key_value_heads", "intermediate_size")}
    m = _golden(tmp_path, hf, sd,
                {**cd, "architectures": ["DeciLMForCausalLM"],
                 "num_key_value_heads": None, "intermediate_size": None,
                 "block_configs": blocks, "rope_scaling": scaling,
                 "mlp_bias": False}, unigram=False,
                specials=["<|begin_of_text|>", "<|end_of_text|>",
                          "<|eot_id|>"])
    assert int(m.model_type) == 0x2200


def test_convert_minicpm5_alias(tmp_path):
    hf, cfg = _llama(75, tie_word_embeddings=True)
    d = _save_named(tmp_path, _sd(hf),
                    {**cfg.to_dict(), "architectures": ["LlamaForCausalLM"],
                     "head_dim": 16, "rope_scaling": None},
                    unigram=False, specials=["<|im_end|>"])
    out = str(tmp_path / "m.bin")
    convert(d, out, "f32", arch="minicpm5")
    m = load_model(out, RuntimeConfig(**RT32))
    a = np.array([list(IDS)], dtype=np.int32)
    logits, _ = m.forward_logits(a)
    with torch.no_grad():
        ref = hf(torch.from_numpy(a.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3,
                               rtol=3e-3)
    assert int(m.model_type) == 0x1112


def test_convert_mellum(tmp_path):
    """Mellum: qwen3-MoE weight set + per-layer sparse/full tables + yarn
    (all-sparse config; the chatllm_tpu Mellum loader is MoE-only,
    misc_wave2.py:683)."""
    torch.manual_seed(76)
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, sliding_window=None, num_experts=4,
        num_experts_per_tok=2, moe_intermediate_size=48,
        norm_topk_prob=True, decoder_sparse_step=1, mlp_only_layers=[])
    hf = transformers.Qwen3MoeForCausalLM(cfg).eval()
    rp = {"full_attention": {"rope_type": "yarn", "rope_theta": 10000.0,
                             "factor": 1.0,
                             "original_max_position_embeddings": 128,
                             "beta_fast": 32.0, "beta_slow": 1.0,
                             "attention_factor": 1.0},
          "sliding_attention": {"rope_type": "default",
                                "rope_theta": 10000.0}}
    m = _golden(tmp_path, hf, _sd(hf),
                {**cfg.to_dict(), "architectures": ["MellumForCausalLM"],
                 "rope_parameters": rp, "attention_bias": False,
                 "use_sliding_window": False,
                 "layer_types": ["full_attention"] * 2,
                 "mlp_layer_types": ["sparse"] * 2},
                unigram=False, specials=["<|im_end|>"])
    assert int(m.model_type) == 0x3010
