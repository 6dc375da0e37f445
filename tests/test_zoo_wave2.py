"""Round-2 zoo wave: InternLM v1/v3, Mistral2 (tekken), Mistral3 (YaRN +
llama-4 positional attention scale).  Mistral2 is HF-golden; the others are
forward+template tests (no local HF class)."""
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

V = 256


def _sp_pieces(extra=()):
    toks = [(chr(b).encode(), -float(b)) for b in range(V - len(extra))]
    toks += [(s.encode(), -900.0 - i) for i, s in enumerate(extra)]
    return toks


def _llama_weights(w, sd, layers, permute_heads=None, names_style="hf"):
    if names_style == "hf":
        attn_pfx, in_norm, ffn_norm = "self_attn", "input_layernorm", "post_attention_layernorm"
    else:
        attn_pfx, in_norm, ffn_norm = "attn", "attention_norm", "ffn_norm"
    w.write_tensor("model.embed_tokens.weight", sd["model.embed_tokens.weight"],
                   GGMLType.F32)
    for i in range(layers):
        pfx = f"model.layers.{i}"
        w.write_tensor(f"{pfx}.{in_norm}.weight",
                       sd[f"{pfx}.input_layernorm.weight"], GGMLType.F32)
        for pj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            arr = sd[f"{pfx}.self_attn.{pj}.weight"]
            if permute_heads and pj == "q_proj":
                arr = _permute(arr, permute_heads[0])
            elif permute_heads and pj == "k_proj":
                arr = _permute(arr, permute_heads[1])
            w.write_tensor(f"{pfx}.{attn_pfx}.{pj}.weight", arr, GGMLType.F32)
            b = sd.get(f"{pfx}.self_attn.{pj}.bias")
            if b is not None:
                if permute_heads and pj == "q_proj":
                    b = _permute(b[:, None], permute_heads[0])[:, 0]
                elif permute_heads and pj == "k_proj":
                    b = _permute(b[:, None], permute_heads[1])[:, 0]
                w.write_tensor(f"{pfx}.{attn_pfx}.{pj}.bias", b, GGMLType.F32)
        w.write_tensor(f"{pfx}.{ffn_norm}.weight",
                       sd[f"{pfx}.post_attention_layernorm.weight"], GGMLType.F32)
        for mj in ("gate_proj", "up_proj", "down_proj"):
            w.write_tensor(f"{pfx}.mlp.{mj}.weight",
                           sd[f"{pfx}.mlp.{mj}.weight"], GGMLType.F32)
    w.write_tensor("model.norm.weight", sd["model.norm.weight"], GGMLType.F32)
    if "lm_head.weight" in sd:
        w.write_tensor("lm_head.weight", sd["lm_head.weight"], GGMLType.F32)


def test_internlm1_forward_and_template(tmp_path):
    torch.manual_seed(7)
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=4, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0,
        attention_bias=True, tie_word_embeddings=False)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    with torch.no_grad():
        # HF zero-inits attention biases; randomize so the test actually
        # checks bias loading + permutation
        for layer in hf.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj, layer.self_attn.o_proj):
                proj.bias.normal_(0, 0.05)
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "ilm1.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.INTERNLM), 1, meta={})
        w.write_config([int(GGMLType.F32), V, 64, 4, 2, 96, 128,
                        1, 2, -1, -1], fmt="11i")
        w._patch_offset(12)
        w.write_vocab_sp(_sp_pieces(["<eoa>", "<eoh>"]))
        _llama_weights(w, sd, 2, permute_heads=(4, 4))
    model = load_model(path, RuntimeConfig(**RT32))
    ids = np.array([[3, 99, 150, 7]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=5e-3, rtol=5e-3)

    tok = model.tokenizer
    assert tok.eoa_token_id in tok.terminate_ids
    ids = []
    tok.sys_prompt = "sys"
    tok.chat_encoder.append_sys_prompt(ids)
    tok.chat_encoder.append_user(0, "hi", ids)
    tok.chat_encoder.append_ai_opening(0, ids)
    text = tok.tp.decode(ids)
    assert "<|User|>:hi" in text and text.endswith("<|Bot|>:")


def test_internlm3_ntk_base_stretch(tmp_path):
    torch.manual_seed(8)
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=256, rope_theta=50000.0,
        attention_bias=False, tie_word_embeddings=False)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "ilm3.bin")
    factor, orig_max = 6.0, 64
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.INTERNLM3), 1, meta={})
        w.write_config([int(GGMLType.F32), V, 64, 4, 2, 96, 256,
                        1, 2, -1, -1, 2], fmt="12i")
        f.write(struct.pack("<ffi", 50000.0, factor, orig_max))
        w._patch_offset(12)
        w.write_vocab_sp(_sp_pieces(["<|im_start|>", "<|im_end|>"]))
        _llama_weights(w, sd, 2, permute_heads=(4, 2))
    model = load_model(path, RuntimeConfig(**RT32))
    # base' = theta * (factor*seq/orig - (factor-1))^(dim/(dim-2))
    dim = 16
    want = 50000.0 * (factor * 256 / orig_max - (factor - 1)) ** (dim / (dim - 2))
    np.testing.assert_allclose(model.cfg.rope.freq_base, want, rtol=1e-6)
    logits, _ = model.forward_logits(np.array([[5, 9, 11]], dtype=np.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_mistral2_golden(tmp_path):
    torch.manual_seed(9)
    cfg = transformers.MistralConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, head_dim=32, num_hidden_layers=2,
        intermediate_size=96, max_position_embeddings=128,
        rope_theta=100000.0, sliding_window=None, tie_word_embeddings=False)
    hf = transformers.MistralForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "m2.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.MISTRAL2), 1, meta={})
        w.write_config([int(GGMLType.F32), V, 64, 4, 2, 96, 128,
                        1, 2, -1, -1, 2, 32, -1], fmt="14i")
        f.write(struct.pack("<f", 100000.0))
        w._patch_offset(12)
        pieces = [(p, 1) for p in _bpe_pieces(V)]
        pieces[V - 2] = (b"[INST]", 4)
        pieces[V - 1] = (b"[/INST]", 4)
        w.write_vocab_bpe(pieces, [])
        _llama_weights(w, sd, 2, permute_heads=(4, 2))
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.resolved_head_dim() == 32
    ids = np.array([[3, 99, 150, 7, 8]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=2e-3, rtol=2e-3)


def test_mistral3_yarn_and_l4_scale(tmp_path):
    torch.manual_seed(10)
    cfg = transformers.MistralConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, num_hidden_layers=2,
        intermediate_size=96, max_position_embeddings=256,
        rope_theta=100000.0, sliding_window=None, tie_word_embeddings=False)
    hf = transformers.MistralForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "m3.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.MISTRAL3), 1, meta={})
        w.write_config([int(GGMLType.F32), V, 64, 4, 2, 96, 256,
                        1, 2, -1, -1,
                        2, -1, 0, 16], fmt="15i")
        f.write(struct.pack("<6f", 32.0, 1.0, 4.0, 0.1, 1.0, 1.0))
        f.write(struct.pack("<i", 64))
        f.write(struct.pack("<f", 100000.0))
        w._patch_offset(12)
        pieces = [(p, 1) for p in _bpe_pieces(V)]
        pieces[V - 4] = (b"[INST]", 4)
        pieces[V - 3] = (b"[/INST]", 4)
        pieces[V - 2] = (b"[THINK]", 4)
        pieces[V - 1] = (b"[/THINK]", 4)
        w.write_vocab_bpe(pieces, [])
        _llama_weights(w, sd, 2, names_style="mistral")
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.attn_scale_beta == pytest.approx(0.1)
    assert model.cfg.rope.ext_factor == 1.0
    # positions beyond orig_max get a bigger q scale; logits stay finite
    ids = np.random.default_rng(0).integers(0, 200, size=(1, 80)).astype(np.int32)
    logits, _ = model.forward_logits(ids)
    assert np.isfinite(np.asarray(logits)).all()
    # [THINK] decodes as <think>
    tid = model.tokenizer.tp.piece_to_id("[THINK]")
    assert model.tokenizer.tp.decode([tid]) == "<think>"
