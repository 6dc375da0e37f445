"""Phi-4 (llama-v3 arch + im_sep template) and Phi-3.5-MoE (sparsemixer
top-2 routing, LayerNorm blocks, biased attention) HF-golden tests
(reference models/phi.cpp:467-614, models/phi.h:246-380)."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model
from test_model_golden import _bpe_pieces, _permute

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")


def make_tiny_phi4(path, *, vocab=256, hidden=64, heads=4, kv=2, layers=2,
                   inter=96, max_len=128):
    torch.manual_seed(4)
    cfg = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=layers,
        intermediate_size=inter, max_position_embeddings=max_len,
        rope_theta=25000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        attention_bias=False)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    pieces = [(p, 1) for p in _bpe_pieces(vocab)]
    for j, t in enumerate([b"<|im_start|>", b"<|im_sep|>", b"<|im_end|>"]):
        pieces[vocab - 3 + j] = (t, 4)
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.PHI4), 1, meta={"model_name": "tiny-phi4"})
        w.write_config([int(GGMLType.F32), vocab, hidden, heads, layers, inter,
                        max_len, -1, 0, -1, -1, kv], fmt="12i")
        f.write(struct.pack("<f", 25000.0))
        w._patch_offset(12)
        w.write_vocab_bpe(pieces, [])
        names = ["model.embed_tokens.weight"]
        for i in range(layers):
            names += [f"model.layers.{i}.{n}" for n in [
                "input_layernorm.weight",
                "self_attn.q_proj.weight", "self_attn.k_proj.weight",
                "self_attn.v_proj.weight", "self_attn.o_proj.weight",
                "post_attention_layernorm.weight",
                "mlp.gate_proj.weight", "mlp.up_proj.weight",
                "mlp.down_proj.weight"]]
        names += ["model.norm.weight", "lm_head.weight"]
        for n in names:
            arr = sd[n]
            if n.endswith("q_proj.weight"):
                arr = _permute(arr, heads)
            elif n.endswith("k_proj.weight"):
                arr = _permute(arr, kv)
            w.write_tensor(n, arr, GGMLType.F32)
    return hf


def test_phi4_logits_and_template(tmp_path):
    path = str(tmp_path / "phi4.bin")
    hf = make_tiny_phi4(path)
    model = load_model(path, RuntimeConfig(**RT32))
    ids = np.array([[3, 99, 150, 7, 42, 11]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=2e-3, rtol=2e-3)

    tok = model.tokenizer
    tok.sys_prompt = "be brief"
    ids = []
    tok.chat_encoder.append_sys_prompt(ids)
    tok.chat_encoder.append_user(0, "hi", ids)
    tok.chat_encoder.append_ai_opening(0, ids)
    assert ids.count(tok.im_start_token_id) == 3
    assert ids.count(tok.im_sep_token_id) == 3
    assert ids.count(tok.im_end_token_id) == 2
    assert ids[-1] == tok.im_sep_token_id


@pytest.fixture(scope="module")
def phimoe_pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("phimoe")
    torch.manual_seed(6)
    cfg = transformers.PhimoeConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=48,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128,
        original_max_position_embeddings=128, rope_theta=10000.0,
        rope_scaling=None, sliding_window=None, attention_bias=True,
        lm_head_bias=True, router_jitter_noise=0.01,
        input_jitter_noise=0.0, tie_word_embeddings=False)
    hf = transformers.PhimoeForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp / "phimoe.bin")
    F = 128    # models/phi.h:189 MAX_FACTOR_LEN
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.PHI3_MOE), 1,
                       meta={"model_name": "tiny-phimoe"})
        # Phi3SU3 config + {num_experts_per_tok, num_local_experts}
        w.write_config([int(GGMLType.F32), 256, 64, 4, 2, 48, 128,
                        -1, 0, -1, -1,
                        128, 2, 128, 131072, 0], fmt="16i")
        f.write(struct.pack("<f", 10000.0))
        f.write(struct.pack(f"<{F}f", *([0.0] * F)))   # short_factor
        f.write(struct.pack(f"<{F}f", *([0.0] * F)))   # long_factor
        f.write(struct.pack("<ff", 0.0, 0.0))          # short/long mscale
        f.write(struct.pack("<2i", 2, 4))
        w._patch_offset(12)
        w.write_vocab_sp([(bytes([b]), -float(b)) for b in range(256)])
        w.write_tensor("model.embed_tokens.weight",
                       sd["model.embed_tokens.weight"], GGMLType.F32)
        for i in range(2):
            pfx = f"model.layers.{i}"
            w.write_tensor(f"{pfx}.input_layernorm.weight",
                           sd[f"{pfx}.input_layernorm.weight"], GGMLType.F32)
            w.write_tensor(f"{pfx}.input_layernorm.bias",
                           sd[f"{pfx}.input_layernorm.bias"], GGMLType.F32)
            for j in range(4):
                for ours, theirs in (("w1", "w1"), ("w2", "w2"), ("w3", "w3")):
                    w.write_tensor(
                        f"{pfx}.block_sparse_moe.experts.{j}.{ours}.weight",
                        sd[f"{pfx}.block_sparse_moe.experts.{j}.{theirs}.weight"],
                        GGMLType.F32)
            w.write_tensor(f"{pfx}.block_sparse_moe.gate.weight",
                           sd[f"{pfx}.block_sparse_moe.gate.weight"], GGMLType.F32)
            w.write_tensor(f"{pfx}.post_attention_layernorm.weight",
                           sd[f"{pfx}.post_attention_layernorm.weight"], GGMLType.F32)
            w.write_tensor(f"{pfx}.post_attention_layernorm.bias",
                           sd[f"{pfx}.post_attention_layernorm.bias"], GGMLType.F32)
            for pj in ("q_proj", "k_proj", "v_proj", "o_proj"):
                w.write_tensor(f"{pfx}.self_attn.{pj}.weight",
                               sd[f"{pfx}.self_attn.{pj}.weight"], GGMLType.F32)
                w.write_tensor(f"{pfx}.self_attn.{pj}.bias",
                               sd[f"{pfx}.self_attn.{pj}.bias"], GGMLType.F32)
        w.write_tensor("model.norm.weight", sd["model.norm.weight"], GGMLType.F32)
        w.write_tensor("model.norm.bias", sd["model.norm.bias"], GGMLType.F32)
        w.write_tensor("lm_head.weight", sd["lm_head.weight"], GGMLType.F32)
        w.write_tensor("lm_head.bias", sd["lm_head.bias"], GGMLType.F32)
    return hf, path


def test_phimoe_logits_match_hf(phimoe_pair):
    hf, path = phimoe_pair
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.moe_score_func == "sparsemixer"
    ids = np.array([[7, 30, 102, 89, 5, 200, 41, 77]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3, rtol=3e-3)
