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
