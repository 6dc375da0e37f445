"""Persimmon + Fuyu HF-golden (reference /root/reference/models/adept.cpp;
converter PersimmonConverter/FuyuConverter, convert.py:6257/6370)."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

RT32 = dict(weight_dtype="float32", compute_dtype="float32",
            cache_dtype="float32")

VOCAB, HID, HEADS, LAYERS, INTER = 300, 64, 4, 2, 128


def _uni_pieces():
    toks = [(b"<unk>", -10.0), (b"<s>", -9.0), (b"</s>", -9.0),
            (b"|NEWLINE|", -9.0)]
    import string

    for ch in string.printable:
        toks.append((ch.encode(), -2.0))
    toks += [(f"<p{i}>".encode(), -20.0) for i in range(VOCAB - len(toks))]
    return toks


def _split_qkv(t, heads, head_dim):
    """PersimmonConverter.state_dict_pp qkv split (convert.py:6268)."""
    v = t.reshape(heads, 3, head_dim, *t.shape[1:])
    return v[:, 0].reshape(heads * head_dim, *t.shape[1:]), \
        v[:, 1].reshape(heads * head_dim, *t.shape[1:]), \
        v[:, 2].reshape(heads * head_dim, *t.shape[1:])


def _write_persimmon(w, sd, prefix=""):
    def wt(name, arr):
        w.write_tensor(name, np.ascontiguousarray(arr, np.float32),
                       GGMLType.F32)

    hd = HID // HEADS
    wt("model.embed_tokens.weight", sd[f"{prefix}model.embed_tokens.weight"])
    for i in range(LAYERS):
        src = f"{prefix}model.layers.{i}"
        dst = f"model.layers.{i}"
        qw, kw, vw = _split_qkv(sd[f"{src}.self_attn.query_key_value.weight"],
                                HEADS, hd)
        qb, kb, vb = _split_qkv(sd[f"{src}.self_attn.query_key_value.bias"],
                                HEADS, hd)
        wt(f"{dst}.self_attn.q_proj.weight", qw)
        wt(f"{dst}.self_attn.q_proj.bias", qb)
        wt(f"{dst}.self_attn.k_proj.weight", kw)
        wt(f"{dst}.self_attn.k_proj.bias", kb)
        wt(f"{dst}.self_attn.v_proj.weight", vw)
        wt(f"{dst}.self_attn.v_proj.bias", vb)
        for n in ["self_attn.dense", "self_attn.q_layernorm",
                  "self_attn.k_layernorm", "input_layernorm",
                  "post_attention_layernorm", "mlp.dense_h_to_4h",
                  "mlp.dense_4h_to_h"]:
            wt(f"{dst}.{n}.weight", sd[f"{src}.{n}.weight"])
            wt(f"{dst}.{n}.bias", sd[f"{src}.{n}.bias"])
    wt("model.final_layernorm.weight", sd[f"{prefix}model.final_layernorm.weight"])
    wt("model.final_layernorm.bias", sd[f"{prefix}model.final_layernorm.bias"])
    wt("lm_head.weight", sd["lm_head.weight"])


def make_tiny_persimmon(path):
    torch.manual_seed(11)
    cfg = transformers.PersimmonConfig(
        vocab_size=VOCAB, hidden_size=HID, num_attention_heads=HEADS,
        num_hidden_layers=LAYERS, intermediate_size=INTER,
        max_position_embeddings=128, partial_rotary_factor=0.5,
        hidden_act="relu2", qk_layernorm=True, rope_theta=10000.0,
        bos_token_id=1, eos_token_id=2, tie_word_embeddings=False)
    hf = transformers.PersimmonForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.PERSIMMON), 1, meta={})
        # BaseConfig 11i + n_kv + rope_dim + rope_theta
        w.write_config([int(GGMLType.F32), VOCAB, HID, HEADS, LAYERS, INTER,
                        128, 1, 2, -1, -1, HEADS, (HID // HEADS) // 2],
                       fmt="13i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        w.write_vocab_sp(_uni_pieces())
        _write_persimmon(w, sd)
    return hf


def test_persimmon_golden(tmp_path):
    path = str(tmp_path / "pers.bin")
    hf = make_tiny_persimmon(path)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.qk_norm == "layernorm"
    assert model.cfg.rope.resolved_rot_dim() == 8

    ids = np.array([[5, 9, 200, 31, 7]], np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids).long()).logits.numpy()
    ours, _ = model.forward_logits(ids)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4, rtol=3e-4)


def make_tiny_fuyu(path, patch=4):
    torch.manual_seed(12)
    tcfg = transformers.PersimmonConfig(
        vocab_size=VOCAB, hidden_size=HID, num_attention_heads=HEADS,
        num_hidden_layers=LAYERS, intermediate_size=INTER,
        max_position_embeddings=256, partial_rotary_factor=0.5,
        hidden_act="relu2", qk_layernorm=True, rope_theta=10000.0,
        bos_token_id=1, eos_token_id=2, tie_word_embeddings=False)
    cfg = transformers.FuyuConfig(text_config=tcfg.to_dict(), patch_size=patch,
                                  num_channels=3, bos_token_id=1,
                                  eos_token_id=2,
                                  # FuyuConfig's own hidden_size sizes the
                                  # vision projection; keep it tiny too
                                  hidden_size=HID, vocab_size=VOCAB,
                                  num_attention_heads=HEADS,
                                  num_hidden_layers=LAYERS,
                                  intermediate_size=INTER)
    hf = transformers.FuyuForCausalLM(cfg).eval()
    sd = {k.replace("model.language_model.", "model."): v.detach().float().numpy()
          for k, v in hf.state_dict().items()}
    prefix = ""
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.FUYU), 1,
                       meta={"preprocessor_config.json": {
                           "target_width": 64, "target_height": 64}})
        w.write_config([int(GGMLType.F32), VOCAB, HID, HEADS, LAYERS, INTER,
                        256, 1, 2, -1, -1, HEADS, (HID // HEADS) // 2],
                       fmt="13i")
        f.write(struct.pack("<fi", 10000.0, patch))
        w._patch_offset(12)
        w.write_vocab_sp(_uni_pieces())
        _write_persimmon(w, sd, prefix)
        w.write_tensor("vision_embed_tokens.weight",
                       sd["model.vision_embed_tokens.weight"].astype(np.float32),
                       GGMLType.F32)
        w.write_tensor("vision_embed_tokens.bias",
                       sd["model.vision_embed_tokens.bias"].astype(np.float32),
                       GGMLType.F32)
    return hf


def test_fuyu_vision_golden(tmp_path):
    path = str(tmp_path / "fuyu.bin")
    hf = make_tiny_fuyu(path)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.vision_embed is not None

    rng = np.random.default_rng(5)
    img = rng.standard_normal((8, 12, 3)).astype(np.float32)
    ours = np.asarray(model.encode_image(img))          # [2, 3, HID]

    # HF patchify: unfold over (C,H,W) → [N, p*p*C] in (y, x, c) order
    proc = transformers.FuyuImageProcessor(patch_size={"height": 4, "width": 4})
    t = torch.from_numpy(np.transpose(img, (2, 0, 1)))[None]
    patches = proc.patchify_image(t)                     # [1, N, p*p*3]
    with torch.no_grad():
        ref = hf.model.vision_embed_tokens(patches)[0].numpy()
    np.testing.assert_allclose(ours.reshape(-1, HID), ref,
                               atol=2e-4, rtol=2e-4)


def test_fuyu_chat_image(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from chatllm_tpu.runtime.generate import GenerationConfig

    path = str(tmp_path / "fuyu2.bin")
    make_tiny_fuyu(path)
    model = load_model(path, RuntimeConfig(**RT32))
    img = Image.fromarray(
        (np.random.default_rng(0).random((16, 20, 3)) * 255).astype(np.uint8))
    reply = model.chat_image(img, "what?",
                             GenerationConfig(do_sample=False,
                                              max_new_tokens=4))
    assert isinstance(reply, str)
