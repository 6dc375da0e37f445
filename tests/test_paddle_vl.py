"""PaddleOCR-VL: NaViT tower + ERNIE-0.3B mrope LLM + OCR chat flow
(reference models/ernie.cpp paddle::ocr :667, paddle::ocr::vit :306;
converter PaddleOCRVLConverter convert.py:10315)."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")

VOCAB = 300
HIDDEN, HEADS, KV, LAYERS, INTER, HEAD_DIM = 64, 4, 2, 2, 96, 16
MROPE = [4, 2, 2]                   # sums to HEAD_DIM//2
V_HIDDEN, V_HEADS, V_DEPTH, V_INTER, PATCH = 32, 2, 2, 48, 4
POSGRID = 6                         # learned pos table is 6×6


def _vocab():
    import string

    toks = [(b"<unk>", -10.0),
            (b"<|begin_of_sentence|>", 0.0),
            (b"</s>", 0.0),
            (b"<|end_of_sentence|>", 0.0),
            (b"<|IMAGE_START|>", 0.0),
            (b"<|IMAGE_END|>", 0.0)]
    toks += [(ch.encode(), -2.0) for ch in string.printable]
    toks += [(f"<t{i}>".encode(), -20.0) for i in range(VOCAB - len(toks))]
    return toks


def make_tiny_paddle(path, tie=False):
    rng = np.random.default_rng(77)
    meta = {
        "config.json": {"vision_config": {
            "hidden_size": V_HIDDEN, "num_hidden_layers": V_DEPTH,
            "num_attention_heads": V_HEADS, "intermediate_size": V_INTER,
            "patch_size": PATCH, "spatial_merge_size": 2,
            "image_size": POSGRID * PATCH}},
        "preprocessor_config.json": {
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5]},
    }
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.PADDLE_OCR_VL), 1, meta=meta)
        w.write_config([int(GGMLType.F32), VOCAB, HIDDEN, HEADS, LAYERS,
                        INTER, 128, 1, 2, -1, -1, KV, HEAD_DIM], fmt="13i")
        f.write(struct.pack("<f", 10000.0))
        f.write(struct.pack("<4i", *MROPE, 1 if tie else 0))
        w._patch_offset(12)
        w.write_vocab_sp(_vocab())

        def t(name, *shape, scale=0.1):
            w.write_tensor(name, (rng.standard_normal(shape) * scale)
                           .astype(np.float32), GGMLType.F32)

        t("model.embed_tokens.weight", VOCAB, HIDDEN)
        t("model.norm.weight", HIDDEN, scale=1.0)
        if not tie:
            t("lm_head.weight", VOCAB, HIDDEN)
        for i in range(LAYERS):
            pfx = f"model.layers.{i}"
            t(f"{pfx}.input_layernorm.weight", HIDDEN, scale=1.0)
            t(f"{pfx}.post_attention_layernorm.weight", HIDDEN, scale=1.0)
            t(f"{pfx}.self_attn.q_proj.weight", HEADS * HEAD_DIM, HIDDEN)
            t(f"{pfx}.self_attn.k_proj.weight", KV * HEAD_DIM, HIDDEN)
            t(f"{pfx}.self_attn.v_proj.weight", KV * HEAD_DIM, HIDDEN)
            t(f"{pfx}.self_attn.o_proj.weight", HIDDEN, HEADS * HEAD_DIM)
            t(f"{pfx}.mlp.gate_proj.weight", INTER, HIDDEN)
            t(f"{pfx}.mlp.up_proj.weight", INTER, HIDDEN)
            t(f"{pfx}.mlp.down_proj.weight", HIDDEN, INTER)
        # tower (converter name list, convert.py:10360-10405)
        t("visual.embeddings.patch_embedding.weight",
          V_HIDDEN, 3, PATCH, PATCH)
        t("visual.embeddings.patch_embedding.bias", V_HIDDEN)
        t("visual.embeddings.position_embedding.weight",
          POSGRID * POSGRID, V_HIDDEN)
        t("visual.post_layernorm.weight", V_HIDDEN, scale=1.0)
        t("visual.post_layernorm.bias", V_HIDDEN)
        for i in range(V_DEPTH):
            pfx = f"visual.layers.{i}"
            for n in ("layer_norm1", "layer_norm2"):
                t(f"{pfx}.{n}.weight", V_HIDDEN, scale=1.0)
                t(f"{pfx}.{n}.bias", V_HIDDEN)
            for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
                t(f"{pfx}.self_attn.{n}.weight", V_HIDDEN, V_HIDDEN)
                t(f"{pfx}.self_attn.{n}.bias", V_HIDDEN)
            t(f"{pfx}.mlp.fc1.weight", V_INTER, V_HIDDEN)
            t(f"{pfx}.mlp.fc1.bias", V_INTER)
            t(f"{pfx}.mlp.fc2.weight", V_HIDDEN, V_INTER)
            t(f"{pfx}.mlp.fc2.bias", V_HIDDEN)
        m2 = 4 * V_HIDDEN
        t("mlp_AR.pre_norm.weight", V_HIDDEN, scale=1.0)
        t("mlp_AR.pre_norm.bias", V_HIDDEN)
        t("mlp_AR.linear_1.weight", m2, m2)
        t("mlp_AR.linear_1.bias", m2)
        t("mlp_AR.linear_2.weight", HIDDEN, m2)
        t("mlp_AR.linear_2.bias", HIDDEN)


def test_paddle_template():
    """bos + 'User: {u}\\nAssistant:\\n' template (ernie.cpp:730-758)."""
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.bin")
        make_tiny_paddle(path)
        model = load_model(path, RuntimeConfig(**RT32))
        tok = model.tokenizer
        ids = []
        tok.chat_encoder.append_sys_prompt(ids)
        assert ids == [tok.bos_token_id]
        tok.chat_encoder.append_user(0, "hi", ids)
        tok.chat_encoder.append_ai_opening(0, ids)
        assert tok.decode(ids[1:]) == "User: hi\nAssistant:\n"
        assert 3 in tok.terminate_ids  # <|end_of_sentence|>


def test_paddle_tower_and_chat(tmp_path):
    from PIL import Image

    from chatllm_tpu.runtime.generate import GenerationConfig

    path = str(tmp_path / "paddle.bin")
    make_tiny_paddle(path)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.vis_cfg is not None
    assert model.cfg.rope.mrope_sections == (4, 2, 2)

    img = Image.fromarray(
        (np.random.default_rng(4).random((20, 28, 3)) * 255).astype(np.uint8))
    emb, (gh, gw) = model.encode_image(img)
    # 20×28 pads to 24×32 → grid 6×8 → merged 3×4
    assert (gh, gw) == (3, 4)
    assert emb.shape == (12, HIDDEN)
    assert np.isfinite(np.asarray(emb)).all()

    reply = model.chat_image(img, "read this",
                             GenerationConfig(do_sample=False,
                                              max_new_tokens=4))
    assert isinstance(reply, str)


def test_paddle_pos_embed_interp_identity():
    """At the native grid the interpolation must be exact passthrough."""
    import jax.numpy as jnp

    from chatllm_tpu.nn.vit import _paddle_pos_embed

    table = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((POSGRID * POSGRID, 8)), jnp.float32)
    out = _paddle_pos_embed(table, POSGRID, POSGRID, POSGRID)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table), atol=1e-6)


def test_paddle_tied_head(tmp_path):
    path = str(tmp_path / "paddle_tied.bin")
    make_tiny_paddle(path, tie=True)
    model = load_model(path, RuntimeConfig(**RT32))
    ids = model.tokenizer.encode("hello")
    logits, _ = model.forward_logits(ids)
    assert logits.shape[-1] == VOCAB
    assert np.isfinite(np.asarray(logits)).all()
