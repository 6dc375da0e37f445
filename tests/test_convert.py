"""End-to-end HF→GGMM converter: tiny HF checkpoints on disk → convert →
load → logits match the HF model."""
import json
import os

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.models import RuntimeConfig, load_model
from chatllm_tpu.tools.convert import convert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
safetensors = pytest.importorskip("safetensors")

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")


def _byte_vocab_json(specials):
    from chatllm_tpu.tokenizer.processor import byte_level_encode

    vocab = {}
    for b in range(256):
        vocab[byte_level_encode(bytes([b])).decode("utf-8")] = b
    added = []
    for i, s in enumerate(specials):
        vocab[s] = 256 + i
        added.append({"content": s, "id": 256 + i, "special": True})
    return {
        "version": "1.0",
        "added_tokens": added,
        "model": {"type": "BPE", "vocab": vocab, "merges": []},
    }


def _save_hf_dir(tmp_path, hf, cfg_dict, specials):
    from safetensors.numpy import save_file

    d = tmp_path / "hf"
    d.mkdir()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(cfg_dict))
    (d / "tokenizer.json").write_text(
        json.dumps(_byte_vocab_json(specials), ensure_ascii=False))
    return str(d)


def test_convert_qwen2_roundtrip(tmp_path):
    torch.manual_seed(3)
    vocab = 260
    cfg = transformers.Qwen2Config(
        vocab_size=vocab, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, sliding_window=None)
    hf = transformers.Qwen2ForCausalLM(cfg).eval()
    d = _save_hf_dir(tmp_path, hf,
                     {**cfg.to_dict(), "architectures": ["Qwen2ForCausalLM"]},
                     ["<|endoftext|>", "<|im_start|>", "<|im_end|>",
                      "<pad3>"])

    out = str(tmp_path / "q2.bin")
    convert(d, out, "f32")
    model = load_model(out, RuntimeConfig(**RT32))
    ids = np.array([[7, 30, 102, 89, 5]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=2e-3, rtol=2e-3)

    # tokenizer survived the trip
    txt = "hello world"
    enc = model.tokenizer.encode(txt)
    assert model.tokenizer.decode(enc) == txt


def test_convert_llama3_q8(tmp_path):
    torch.manual_seed(4)
    vocab = 260
    cfg = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=500000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, attention_bias=False)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    d = _save_hf_dir(tmp_path, hf,
                     {**cfg.to_dict(), "architectures": ["LlamaForCausalLM"]},
                     ["<|begin_of_text|>", "<|end_of_text|>",
                      "<|start_header_id|>", "<|end_header_id|>"])

    out = str(tmp_path / "l3.bin")
    convert(d, out, "q8_0")
    model = load_model(out, RuntimeConfig(**RT32))
    ids = np.array([[7, 30, 102, 89, 5, 201]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    mine = np.asarray(logits)[0]
    err = np.linalg.norm(mine - ref) / np.linalg.norm(ref)
    assert err < 2e-2, err          # q8_0 quantization tolerance


def test_convert_rejects_unknown_arch(tmp_path):
    d = tmp_path / "hf2"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({"architectures": ["FooModel"]}))
    with pytest.raises(NotImplementedError, match="FooModel"):
        convert(str(d), str(tmp_path / "x.bin"))


def test_convert_llama31_rope_scaling(tmp_path):
    """ADVICE.md #4: 'llama3' rope scaling must survive conversion (emit
    LLAMA3_1/LLAMA3_2 with the four scaling fields, not plain LLAMA3)."""
    torch.manual_seed(6)
    vocab = 260
    cfg = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=256, rope_theta=500000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=True, attention_bias=False,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 32})
    hf = transformers.LlamaForCausalLM(cfg).eval()
    d = _save_hf_dir(tmp_path, hf,
                     {**cfg.to_dict(), "architectures": ["LlamaForCausalLM"]},
                     ["<|begin_of_text|>", "<|end_of_text|>",
                      "<|start_header_id|>", "<|end_header_id|>"])

    out = str(tmp_path / "l31.bin")
    convert(d, out, "f32")
    model = load_model(out, RuntimeConfig(**RT32))
    from chatllm_tpu.models import ModelType
    assert model.model_type == ModelType.LLAMA3_2       # tied + scaled
    assert model.cfg.rope.freq_factors is not None
    # positions beyond original_max_position_embeddings exercise the scaling
    ids = np.array([np.arange(64) % vocab], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3, rtol=3e-3)


def test_convert_mistral_roundtrip(tmp_path):
    """The MISTRAL loader reads n_kv, sliding_window AND rope_theta
    (models/mistral.h:5-10) plus an SP-score vocab — the converter must
    write all of them (rope_theta was silently dropped before round 2)."""
    torch.manual_seed(9)
    vocab = 260
    cfg = transformers.MistralConfig(
        vocab_size=vocab, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=2048, rope_theta=100000.0, sliding_window=64,
        rms_norm_eps=1e-5,   # loader default; GGMM Mistral config carries no eps
        tie_word_embeddings=False)
    hf = transformers.MistralForCausalLM(cfg).eval()
    d = _save_hf_dir(tmp_path, hf,
                     {**cfg.to_dict(), "architectures": ["MistralForCausalLM"]},
                     [])
    # Mistral loader expects SP-score vocab; give it a Unigram tokenizer.json
    uni = [[chr(b), -float(b)] for b in range(256)]
    uni += [["<s>", -300.0], ["</s>", -301.0], ["[INST]", -302.0],
            ["[/INST]", -303.0]]
    (tmp_path / "hf" / "tokenizer.json").write_text(json.dumps(
        {"version": "1.0", "added_tokens": [],
         "model": {"type": "Unigram", "vocab": uni}}))

    out = str(tmp_path / "mi.bin")
    convert(d, out, "f32")
    model = load_model(out, RuntimeConfig(**RT32))
    assert model.cfg.rope.freq_base == 100000.0          # theta survived
    assert model.cfg.layer_spec(0).sliding_window == 64
    ids = np.array([[7, 30, 102, 89, 5]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=2e-3, rtol=2e-3)


def test_convert_lora_merge(tmp_path):
    """-l adapter_dir folds (alpha/r)*B@A into the base weights
    (reference convert.py:681 LoRAState.merge_tensor)."""
    from safetensors.numpy import save_file

    torch.manual_seed(11)
    cfg = transformers.Qwen2Config(
        vocab_size=260, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, sliding_window=None)
    hf = transformers.Qwen2ForCausalLM(cfg).eval()
    d = _save_hf_dir(tmp_path, hf,
                     {**cfg.to_dict(), "architectures": ["Qwen2ForCausalLM"]},
                     ["<|endoftext|>"])

    # tiny adapter: rank-2 delta on layer-0 q_proj + full replace of norm
    rng = np.random.default_rng(0)
    A = rng.standard_normal((2, 64), dtype=np.float32) * 0.05
    B = rng.standard_normal((64, 2), dtype=np.float32) * 0.05
    new_norm = rng.standard_normal(64).astype(np.float32)
    ld = tmp_path / "lora"
    ld.mkdir()
    pfx = "base_model.model.model.layers.0"
    save_file({f"{pfx}.self_attn.q_proj.lora_A.weight": A,
               f"{pfx}.self_attn.q_proj.lora_B.weight": B,
               "base_model.model.model.norm.weight": new_norm},
              str(ld / "adapter_model.safetensors"))
    (ld / "adapter_config.json").write_text(json.dumps(
        {"peft_type": "LORA", "r": 2, "lora_alpha": 4,
         "fan_in_fan_out": False}))

    out = str(tmp_path / "ql.bin")
    convert(d, out, "f32", lora_dir=str(ld))

    # expected: HF model with the same merge applied manually
    with torch.no_grad():
        hf.model.layers[0].self_attn.q_proj.weight += torch.from_numpy(
            (B @ A) * np.float32(4 / 2))
        hf.model.norm.weight.copy_(torch.from_numpy(new_norm))
    model = load_model(out, RuntimeConfig(**RT32))
    ids = np.array([[7, 30, 102, 89, 5]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=2e-3, rtol=2e-3)


def test_convert_tensor_type_rules(tmp_path):
    """-tt regex/type overrides per-tensor storage; later flags win; block
    divisibility degrades q4_k->q8_0->f16 (reference convert.py:810,830)."""
    from chatllm_tpu.ggmm.quants import GGMLType
    from chatllm_tpu.ggmm.reader import GGMMFile

    torch.manual_seed(12)
    cfg = transformers.Qwen2Config(
        vocab_size=260, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=1, intermediate_size=96,
        max_position_embeddings=128, tie_word_embeddings=False,
        sliding_window=None)
    hf = transformers.Qwen2ForCausalLM(cfg).eval()
    d = _save_hf_dir(tmp_path, hf,
                     {**cfg.to_dict(), "architectures": ["Qwen2ForCausalLM"]},
                     ["<|endoftext|>"])
    out = str(tmp_path / "tt.bin")
    convert(d, out, "q8_0",
            tensor_types=[("model.embed", "f32"),
                          (".*embed_tokens.*", "f16"),   # later flag wins
                          ("lm_head", "q4_k")])          # 64 % 256 -> q8_0
    g = GGMMFile.open(out)
    try:
        by = {e.name: e.dtype for e in g.tensors.values()} \
            if isinstance(g.tensors, dict) else \
            {e.name: e.dtype for e in g.tensors}
        assert by["model.embed_tokens.weight"] == GGMLType.F16
        assert by["lm_head.weight"] == GGMLType.Q8_0      # q4_k fallback
        assert by["model.layers.0.mlp.gate_proj.weight"] == GGMLType.Q8_0
        assert by["model.norm.weight"] == GGMLType.F32    # 1d untouched
    finally:
        g.close()

    # the file still loads and runs
    model = load_model(out, RuntimeConfig(**RT32))
    logits, _ = model.forward_logits(np.array([[7, 30, 5]], dtype=np.int32))
    assert np.all(np.isfinite(np.asarray(logits)))
