"""HF-golden logit tests for additional architectures (llama3: interleaved
rope + converter permutation; qwen3: per-head qk-norm)."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")


def _bpe_pieces(vocab):
    from chatllm_tpu.tokenizer.processor import byte_level_encode

    pieces = [byte_level_encode(bytes([b])) for b in range(256)]
    pieces += [f"<x{i}>".encode() for i in range(vocab - 256)]
    return pieces


def _permute(w, n_head):
    # HF half-split -> ggml interleaved (reference convert.py:1360)
    out, cin = w.shape
    return (w.reshape(n_head, 2, out // n_head // 2, cin)
             .swapaxes(1, 2).reshape(out, cin))


def make_tiny_llama3(path, *, vocab=256, hidden=64, heads=4, kv=2, layers=2,
                     inter=96, max_len=128):
    torch.manual_seed(1)
    cfg = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=layers,
        intermediate_size=inter, max_position_embeddings=max_len,
        rope_theta=50000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        attention_bias=False)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.LLAMA3), 1, meta={"model_name": "tiny-l3"})
        # llama v3 config: BaseConfig + n_kv + rope_theta (models/llama.h:103)
        w.write_config([int(GGMLType.F32), vocab, hidden, heads, layers, inter,
                        max_len, -1, 0, -1, -1, kv], fmt="12i")
        f.write(struct.pack("<f", 50000.0))
        w._patch_offset(12)
        w.write_vocab_bpe([(p, 1) for p in _bpe_pieces(vocab)], [])
        names = ["model.embed_tokens.weight"]
        for i in range(layers):
            names += [f"model.layers.{i}.{n}" for n in [
                "input_layernorm.weight", "mlp.down_proj.weight",
                "mlp.gate_proj.weight", "mlp.up_proj.weight",
                "post_attention_layernorm.weight",
                "self_attn.k_proj.weight", "self_attn.o_proj.weight",
                "self_attn.q_proj.weight", "self_attn.v_proj.weight"]]
        names += ["model.norm.weight", "lm_head.weight"]
        for n in names:
            arr = sd[n]
            if n.endswith("q_proj.weight"):
                arr = _permute(arr, heads)
            elif n.endswith("k_proj.weight"):
                arr = _permute(arr, kv)
            w.write_tensor(n, arr, GGMLType.F32 if arr.ndim != 2 else GGMLType.F32)
    return hf


def test_llama3_logits_match_hf(tmp_path):
    path = str(tmp_path / "tiny_l3.bin")
    hf = make_tiny_llama3(path)
    model = load_model(path, RuntimeConfig(**RT32))
    ids = np.array([[5, 77, 101, 32, 9, 200]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=2e-3, rtol=2e-3)


def make_tiny_qwen3(path, *, vocab=256, hidden=64, heads=4, kv=2, layers=2,
                    inter=96, head_dim=32, max_len=128,
                    model_type=None, extra_pieces=()):
    torch.manual_seed(2)
    cfg = transformers.Qwen3Config(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=layers,
        intermediate_size=inter, head_dim=head_dim,
        max_position_embeddings=max_len, rope_theta=10000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False, attention_bias=False)
    hf = transformers.Qwen3ForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(model_type or ModelType.QWEN3), 1,
                       meta={"model_name": "tiny-q3"})
        # models/qwen.h:746-760 layout
        vals = [int(GGMLType.F32), vocab, hidden, heads, layers, inter, max_len,
                -1, 0, -1, -1, kv, head_dim]
        w.write_config(vals, fmt="13i")
        f.write(struct.pack("<ff", 10000.0, -1.0))      # rope_theta, yarn_factor
        f.write(struct.pack("<6i", -1, 0, -1, -1, -1, 0))  # yarn_orig..norm_topk
        f.write(struct.pack("<i", 0))                   # tie
        f.write(struct.pack("<128i", *([0] * 128)))     # layer_is_sparse
        w._patch_offset(12)
        pieces = [(p, 1) for p in _bpe_pieces(vocab)]
        for j, (txt, typ) in enumerate(extra_pieces):
            pieces[vocab - len(extra_pieces) + j] = (txt, typ)
        w.write_vocab_bpe(pieces, [])
        names = ["model.embed_tokens.weight"]
        for i in range(layers):
            names += [f"model.layers.{i}.{n}" for n in [
                "input_layernorm.weight",
                "self_attn.q_proj.weight", "self_attn.k_proj.weight",
                "self_attn.v_proj.weight", "self_attn.o_proj.weight",
                "self_attn.q_norm.weight", "self_attn.k_norm.weight",
                "post_attention_layernorm.weight",
                "mlp.gate_proj.weight", "mlp.up_proj.weight",
                "mlp.down_proj.weight"]]
        names += ["model.norm.weight", "lm_head.weight"]
        for n in names:
            w.write_tensor(n, sd[n], GGMLType.F32)
    return hf


def test_qwen3_logits_match_hf(tmp_path):
    path = str(tmp_path / "tiny_q3.bin")
    hf = make_tiny_qwen3(path)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.qk_norm == "rmsnorm"
    ids = np.array([[5, 77, 101, 32, 9, 200, 3, 4]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=2e-3, rtol=2e-3)


def make_tiny_glm4_0414(path, *, vocab=256, hidden=64, heads=4, kv=2,
                        layers=2, inter=96, max_len=128):
    torch.manual_seed(9)
    cfg = transformers.Glm4Config(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=layers,
        intermediate_size=inter, partial_rotary_factor=0.5,
        head_dim=hidden // heads, attention_bias=False,
        max_position_embeddings=max_len, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=1, bos_token_id=None)
    hf = transformers.Glm4ForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.GLM4_0414), 1, meta={})
        rope_dim = (hidden // heads) // 2
        w.write_config([int(GGMLType.F32), vocab, hidden, heads, layers, inter,
                        max_len, -1, 0, -1, -1, kv, 0, rope_dim], fmt="14i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        w.write_vocab_bpe([(p, 1) for p in _bpe_pieces(vocab)], [])
        names = ["model.embed_tokens.weight"]
        for i in range(layers):
            names += [f"model.layers.{i}.{n}" for n in [
                "input_layernorm.weight",
                "mlp.down_proj.weight",
                "post_attention_layernorm.weight",
                "post_mlp_layernorm.weight",
                "post_self_attn_layernorm.weight",
                "self_attn.k_proj.weight", "self_attn.q_proj.weight",
                "self_attn.v_proj.weight", "self_attn.o_proj.weight"]]
        names += ["model.norm.weight", "lm_head.weight"]
        for n in names:
            w.write_tensor(n, sd[n], GGMLType.F32)
        # gate_up_proj split (converter GLM4Converter.state_dict_pp)
        for i in range(layers):
            gu = sd[f"model.layers.{i}.mlp.gate_up_proj.weight"]
            F2 = gu.shape[0] // 2
            w.write_tensor(f"model.layers.{i}.mlp.gate_proj.weight", gu[:F2], GGMLType.F32)
            w.write_tensor(f"model.layers.{i}.mlp.up_proj.weight", gu[F2:], GGMLType.F32)
    return hf


def test_glm4_0414_logits_match_hf(tmp_path):
    path = str(tmp_path / "tiny_glm4.bin")
    hf = make_tiny_glm4_0414(path)
    model = load_model(path, RuntimeConfig(**RT32))
    ids = np.array([[5, 77, 101, 32, 9, 200]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=2e-3, rtol=2e-3)
