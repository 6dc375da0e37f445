"""HF-golden logit tests, wave 3: OLMo2, StarCoder2, Cohere, Granite,
SmolLM3."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from test_model_golden import RT32, _bpe_pieces, _permute

IDS = np.array([[5, 77, 101, 32, 9, 200]], dtype=np.int32)


def _check(path, hf, atol=2e-3):
    model = load_model(path, RuntimeConfig(**RT32))
    logits, _ = model.forward_logits(IDS)
    with torch.no_grad():
        ref = hf(torch.from_numpy(IDS.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=atol, rtol=atol)
    return model


def _base_cfg_vals(vocab, hidden, heads, layers, inter, max_len):
    return [int(GGMLType.F32), vocab, hidden, heads, layers, inter, max_len,
            -1, 0, -1, -1]


def test_olmo2_matches_hf(tmp_path):
    vocab, hidden, heads, kv, layers, inter, max_len = 256, 64, 4, 2, 2, 96, 128
    torch.manual_seed(31)
    hf = transformers.Olmo2ForCausalLM(transformers.Olmo2Config(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=layers,
        intermediate_size=inter, max_position_embeddings=max_len,
        rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
        attention_bias=False, pad_token_id=0, eos_token_id=1)).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "olmo2.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.OLMo2), 1, meta={})
        w.write_config(_base_cfg_vals(vocab, hidden, heads, layers, inter, max_len)
                       + [kv], fmt="12i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        w.write_vocab_bpe([(p, 1) for p in _bpe_pieces(vocab)], [])
        names = ["model.embed_tokens.weight"]
        for i in range(layers):
            names += [f"model.layers.{i}.{n}" for n in [
                "mlp.down_proj.weight", "mlp.gate_proj.weight",
                "mlp.up_proj.weight", "post_attention_layernorm.weight",
                "post_feedforward_layernorm.weight",
                "self_attn.k_norm.weight", "self_attn.k_proj.weight",
                "self_attn.o_proj.weight", "self_attn.q_norm.weight",
                "self_attn.q_proj.weight", "self_attn.v_proj.weight"]]
        names += ["model.norm.weight", "lm_head.weight"]
        for n in names:
            w.write_tensor(n, sd[n], GGMLType.F32)
    _check(path, hf)


def test_starcoder2_matches_hf(tmp_path):
    vocab, hidden, heads, kv, layers, inter, max_len = 256, 64, 4, 2, 2, 96, 128
    torch.manual_seed(32)
    hf = transformers.Starcoder2ForCausalLM(transformers.Starcoder2Config(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=layers,
        intermediate_size=inter, max_position_embeddings=max_len,
        rope_theta=10000.0, norm_epsilon=1e-5, use_bias=True,
        tie_word_embeddings=False, sliding_window=64,
        hidden_act="gelu_pytorch_tanh")).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "sc2.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.STARCODER2), 1, meta={})
        w.write_config(_base_cfg_vals(vocab, hidden, heads, layers, inter, max_len)
                       + [kv, 64], fmt="13i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        w.write_vocab_bpe([(p, 1) for p in _bpe_pieces(vocab)], [])
        names = ["model.embed_tokens.weight"]
        for i in range(layers):
            for n in ["input_layernorm", "post_attention_layernorm"]:
                names += [f"model.layers.{i}.{n}.weight",
                          f"model.layers.{i}.{n}.bias"]
            for n in ["self_attn.q_proj", "self_attn.k_proj",
                      "self_attn.v_proj", "self_attn.o_proj",
                      "mlp.c_fc", "mlp.c_proj"]:
                names += [f"model.layers.{i}.{n}.weight",
                          f"model.layers.{i}.{n}.bias"]
        names += ["model.norm.weight", "model.norm.bias", "lm_head.weight"]
        for n in names:
            w.write_tensor(n, sd[n], GGMLType.F32)
    _check(path, hf)


def test_cohere_matches_hf(tmp_path):
    vocab, hidden, heads, kv, layers, inter, max_len = 256, 64, 4, 4, 2, 96, 128
    torch.manual_seed(33)
    hf = transformers.CohereForCausalLM(transformers.CohereConfig(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=layers,
        intermediate_size=inter, max_position_embeddings=max_len,
        rope_theta=10000.0, layer_norm_eps=1e-5, logit_scale=0.25,
        use_qk_norm=False, tie_word_embeddings=True)).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "cohere.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.COHERE_COMMAND_R), 1, meta={})
        w.write_config(_base_cfg_vals(vocab, hidden, heads, layers, inter, max_len)
                       + [kv], fmt="12i")
        f.write(struct.pack("<ff", 10000.0, 0.25))
        w._patch_offset(12)
        w.write_vocab_bpe([(p, 1) for p in _bpe_pieces(vocab)], [])
        names = ["model.embed_tokens.weight"]
        for i in range(layers):
            names += [f"model.layers.{i}.{n}" for n in [
                "input_layernorm.weight", "mlp.down_proj.weight",
                "mlp.gate_proj.weight", "mlp.up_proj.weight",
                "self_attn.k_proj.weight", "self_attn.o_proj.weight",
                "self_attn.q_proj.weight", "self_attn.v_proj.weight"]]
        names += ["model.norm.weight"]
        for n in names:
            w.write_tensor(n, sd[n], GGMLType.F32)
    _check(path, hf)


def test_granite_matches_hf(tmp_path):
    vocab, hidden, heads, kv, layers, inter, max_len = 256, 64, 4, 2, 2, 96, 128
    torch.manual_seed(34)
    hf = transformers.GraniteForCausalLM(transformers.GraniteConfig(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=layers,
        intermediate_size=inter, max_position_embeddings=max_len,
        rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
        attention_bias=False, attention_multiplier=0.1,
        embedding_multiplier=1.0, residual_multiplier=0.5,
        logits_scaling=2.0)).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "granite.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.GRANITE), 1, meta={})
        w.write_config(_base_cfg_vals(vocab, hidden, heads, layers, inter, max_len)
                       + [kv, 0], fmt="13i")
        # attention_multiplier, logits_scaling (raw, as the converter dumps
        # it — the loader inverts it because HF divides; the reference
        # multiplies the raw value, which disagrees with HF), residual, theta
        f.write(struct.pack("<4f", 0.1, 2.0, 0.5, 10000.0))
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
            w.write_tensor(n, arr, GGMLType.F32)
    _check(path, hf)


def test_smollm3_matches_hf(tmp_path):
    if not hasattr(transformers, "SmolLM3ForCausalLM"):
        pytest.skip("no SmolLM3 in transformers")
    vocab, hidden, heads, kv, layers, inter, max_len = 256, 64, 4, 2, 4, 96, 128
    torch.manual_seed(35)
    hf = transformers.SmolLM3ForCausalLM(transformers.SmolLM3Config(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=layers,
        intermediate_size=inter, max_position_embeddings=max_len,
        rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
        attention_bias=False, no_rope_layer_interval=4,
        use_sliding_window=False, pad_token_id=0, eos_token_id=1,
        bos_token_id=None)).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "smollm3.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.SMOLLM3), 1, meta={})
        w.write_config(_base_cfg_vals(vocab, hidden, heads, layers, inter, max_len)
                       + [kv, 4, 0], fmt="14i")
        f.write(struct.pack("<f", 10000.0))
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
            w.write_tensor(n, arr, GGMLType.F32)
    _check(path, hf)


def test_gemma3_matches_hf(tmp_path):
    if not hasattr(transformers, "Gemma3ForCausalLM"):
        pytest.skip("no Gemma3")
    vocab, hidden, heads, kv, layers, inter, max_len = 256, 64, 4, 2, 6, 96, 128
    hd = 16
    torch.manual_seed(36)
    hf = transformers.Gemma3ForCausalLM(transformers.Gemma3TextConfig(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=layers,
        intermediate_size=inter, head_dim=hd,
        max_position_embeddings=max_len, rope_theta=1000000.0,
        rope_local_base_freq=10000.0, sliding_window=32,
        sliding_window_pattern=3, query_pre_attn_scalar=hd,
        rms_norm_eps=1e-6, tie_word_embeddings=True,
        attention_bias=False, rope_scaling=None,
        pad_token_id=0, eos_token_id=1, bos_token_id=2)).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "g3.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.GEMMA3), 1, meta={})
        w.write_config(_base_cfg_vals(vocab, hidden, heads, layers, inter, max_len)
                       + [kv, hd, hd, 32, 3], fmt="16i")
        f.write(struct.pack("<3f", 10000.0, 1000000.0, 1.0))
        w._patch_offset(12)
        # gemma tokenizer is SP; write minimal SP vocab
        w.write_vocab_sp([(f"w{i}".encode(), -float(i)) for i in range(vocab)])
        names = ["model.embed_tokens.weight"]
        for i in range(layers):
            names += [f"model.layers.{i}.{n}" for n in [
                "input_layernorm.weight", "mlp.down_proj.weight",
                "mlp.gate_proj.weight", "mlp.up_proj.weight",
                "post_attention_layernorm.weight",
                "post_feedforward_layernorm.weight",
                "pre_feedforward_layernorm.weight",
                "self_attn.k_norm.weight", "self_attn.k_proj.weight",
                "self_attn.o_proj.weight", "self_attn.q_norm.weight",
                "self_attn.q_proj.weight", "self_attn.v_proj.weight"]]
        names += ["model.norm.weight"]
        for n in names:
            arr = sd[n]
            # converter folds (Gemma3Converter.pp): embed*sqrt(H), norms+1
            if n == "model.embed_tokens.weight":
                arr = arr * (hidden ** 0.5)
            elif (n.endswith("layernorm.weight") or n.endswith("norm.weight")):
                arr = 1 + arr
            w.write_tensor(n, arr, GGMLType.F32)
    _check(path, hf, atol=4e-3)


def test_phi2_matches_hf(tmp_path):
    vocab, hidden, heads, layers, inter, max_len = 256, 64, 4, 2, 128, 128
    torch.manual_seed(37)
    hf = transformers.PhiForCausalLM(transformers.PhiConfig(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=heads, num_hidden_layers=layers,
        intermediate_size=inter, max_position_embeddings=max_len,
        rope_theta=10000.0, partial_rotary_factor=0.5,
        layer_norm_eps=1e-5, hidden_act="gelu_new",
        tie_word_embeddings=False, qk_layernorm=False,
        pad_token_id=0, eos_token_id=1, bos_token_id=None)).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    rope_dim = int(0.5 * hidden // heads)
    path = str(tmp_path / "phi2.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.PHI2_V2), 1, meta={})
        w.write_config(_base_cfg_vals(vocab, hidden, heads, layers, inter, max_len)
                       + [rope_dim], fmt="12i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        w.write_vocab_bpe([(p, 1) for p in _bpe_pieces(vocab)], [])
        names = ["model.embed_tokens.weight"]
        for i in range(layers):
            for n in ["input_layernorm"]:
                names += [f"model.layers.{i}.{n}.bias", f"model.layers.{i}.{n}.weight"]
            for n in ["self_attn.q_proj", "self_attn.k_proj",
                      "self_attn.v_proj", "self_attn.dense",
                      "mlp.fc1", "mlp.fc2"]:
                names += [f"model.layers.{i}.{n}.bias", f"model.layers.{i}.{n}.weight"]
        names += ["model.final_layernorm.bias", "model.final_layernorm.weight",
                  "lm_head.bias", "lm_head.weight"]
        for n in names:
            w.write_tensor(n, sd[n], GGMLType.F32)
    _check(path, hf)
