"""Youtu-VL + Penguin-VL towers and chat flows (reference models/hunyuan.cpp
youtu::vit/vl :1068/1263, penguin::vit/vl :1591/1875)."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

torch = pytest.importorskip("torch")

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")

VOCAB = 300
V_HIDDEN, V_HEADS, V_DEPTH, V_INTER, PATCH = 32, 2, 2, 48, 4


def test_penguin_2d_rope_wrongness():
    """Frequencies must NOT restart at the h/w boundary
    (hunyuan.cpp:1690 reproduces Penguin's own buggy rope)."""
    from chatllm_tpu.nn.qwen_vit import penguin_2d_rope_cos_sin

    d = 16
    cos, sin = penguin_2d_rope_cos_sin(2, 3, d, 10000.0)
    assert cos.shape == (6, d // 2)
    # token (h=1, w=2): pairs 0..3 use h angle, 4..7 use w angle
    idx = 1 * 3 + 2
    np.testing.assert_allclose(np.asarray(cos)[idx, 0], np.cos(1.0), rtol=1e-6)
    f4 = 10000.0 ** (-2.0 * 4 / d)      # continues the progression
    np.testing.assert_allclose(np.asarray(sin)[idx, 4], np.sin(2.0 * f4),
                               rtol=1e-6)


def _write_youtu_vit(w, rng):
    def t(name, *shape, scale=0.1):
        w.write_tensor(name, (rng.standard_normal(shape) * scale)
                       .astype(np.float32), GGMLType.F32)

    t("visual.embeddings.patch_embedding.weight", V_HIDDEN, PATCH * PATCH * 3)
    t("visual.embeddings.patch_embedding.bias", V_HIDDEN)
    t("visual.post_layernorm.weight", V_HIDDEN, scale=1.0)
    t("visual.post_layernorm.bias", V_HIDDEN)
    for i in range(V_DEPTH):
        pfx = f"visual.layers.{i}"
        for n in ("layer_norm1", "layer_norm2"):
            t(f"{pfx}.{n}.weight", V_HIDDEN, scale=1.0)
            t(f"{pfx}.{n}.bias", V_HIDDEN)
        for n in ("q", "k", "v", "o"):
            t(f"{pfx}.self_attn.{n}_proj.weight", V_HIDDEN, V_HIDDEN)
            t(f"{pfx}.self_attn.{n}_proj.bias", V_HIDDEN)
        t(f"{pfx}.mlp.fc0.weight", V_INTER, V_HIDDEN)
        t(f"{pfx}.mlp.fc0.bias", V_INTER)
        t(f"{pfx}.mlp.fc1.weight", V_HIDDEN, V_INTER)
        t(f"{pfx}.mlp.fc1.bias", V_HIDDEN)
    m2 = 4 * V_HIDDEN
    t("merger.ln_q.weight", V_HIDDEN, scale=1.0)
    t("merger.mlp.0.weight", m2, m2)
    t("merger.mlp.0.bias", m2)
    t("merger.mlp.2.weight", 64, m2)
    t("merger.mlp.2.bias", 64)


def make_tiny_youtu_vl(path):
    rng = np.random.default_rng(51)
    hidden, heads, layers, inter = 64, 4, 2, 96
    kv_rank, qk_nope, qk_rope, v_dim = 32, 16, 8, 16
    meta = {
        "config.json": {"vision_config": {
            "hidden_size": V_HIDDEN, "num_hidden_layers": V_DEPTH,
            "num_attention_heads": V_HEADS, "intermediate_size": V_INTER,
            "patch_size": PATCH, "window_size": 2 * 2 * PATCH,
            "fullatt_block_indexes": [1], "tokens_per_second": 2,
            "out_hidden_size": hidden, "num_channels": 3}},
        "preprocessor_config.json": {
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5]},
    }
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.YOUTU_VL), 1, meta=meta)
        # youtu llm Config (hunyuan.cpp:928): 7i + f
        w.write_config([int(GGMLType.F32), VOCAB, hidden, heads, layers,
                        inter, 128, -1, 1, -1, -1,
                        heads, kv_rank, 0, qk_nope, qk_rope, v_dim, 0],
                       fmt="18i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        from chatllm_tpu.tokenizer.processor import byte_level_encode

        specials = ["<|User|>", "<|Assistant|>", "<think>", "</think>",
                    "<|vision_start|>", "<|vision_end|>"]
        pieces = [byte_level_encode(bytes([b])) for b in range(256)]
        pieces += [s.encode() for s in specials]
        pieces += [f"<x{i}>".encode() for i in range(VOCAB - len(pieces))]
        w.write_vocab_bpe([(p, 1) for p in pieces], [])

        def t(name, *shape, scale=0.1):
            w.write_tensor(name, (rng.standard_normal(shape) * scale)
                           .astype(np.float32), GGMLType.F32)

        t("model.embed_tokens.weight", VOCAB, hidden)
        t("model.norm.weight", hidden, scale=1.0)
        t("lm_head.weight", VOCAB, hidden)
        for i in range(layers):
            pfx = f"model.layers.{i}"
            t(f"{pfx}.self_attn.d_kv_proj.weight", kv_rank, hidden)
            t(f"{pfx}.self_attn.k_pe_proj.weight", qk_rope, hidden)
            t(f"{pfx}.self_attn.kv_norm.weight", kv_rank, scale=1.0)
            t(f"{pfx}.self_attn.u_k_nope_proj.weight", heads * qk_nope, kv_rank)
            t(f"{pfx}.self_attn.u_v_proj.weight", heads * v_dim, kv_rank)
            t(f"{pfx}.self_attn.q_proj.weight", heads * (qk_nope + qk_rope),
              hidden)
            t(f"{pfx}.self_attn.o_proj.weight", hidden, heads * v_dim)
            t(f"{pfx}.input_layernorm.weight", hidden, scale=1.0)
            t(f"{pfx}.post_attention_layernorm.weight", hidden, scale=1.0)
            t(f"{pfx}.mlp.gate_proj.weight", inter, hidden)
            t(f"{pfx}.mlp.up_proj.weight", inter, hidden)
            t(f"{pfx}.mlp.down_proj.weight", hidden, inter)
        _write_youtu_vit(w, rng)


def test_youtu_vl_smoke(tmp_path):
    from PIL import Image

    from chatllm_tpu.runtime.generate import GenerationConfig

    path = str(tmp_path / "youtu_vl.bin")
    make_tiny_youtu_vl(path)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.vis_cfg is not None and model.vis_cfg.is_youtu
    assert model.tokenizer.vision_start_id >= 0

    img = Image.fromarray(
        (np.random.default_rng(6).random((24, 32, 3)) * 255).astype(np.uint8))
    emb = model.encode_image(img)
    assert emb.shape[-1] == 64
    reply = model.chat_image(img, "hi",
                             GenerationConfig(do_sample=False,
                                              max_new_tokens=4))
    assert isinstance(reply, str)


def make_tiny_penguin_vl(path):
    rng = np.random.default_rng(52)
    hidden, heads, kv, layers, inter, head_dim = 64, 4, 2, 2, 96, 16
    meta = {
        "config.json": {
            "vision_encoder_config": {
                "hidden_size": V_HIDDEN, "num_hidden_layers": V_DEPTH,
                "num_attention_heads": V_HEADS, "num_key_value_heads": 1,
                "intermediate_size": V_INTER, "head_dim": 16,
                "patch_size": PATCH, "num_channels": 3,
                "rope_theta": 10000.0},
            "vision_projector_type": "mlp2x_gelu"},
        "preprocessor_config.json": {
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5]},
    }
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.PENGUIN_VL), 1, meta=meta)
        w.write_config([int(GGMLType.F32), VOCAB, hidden, heads, layers,
                        inter, 128, -1, 0, -1, -1, kv, head_dim], fmt="13i")
        f.write(struct.pack("<ff", 10000.0, -1.0))
        f.write(struct.pack("<6i", -1, 0, -1, -1, -1, 0))
        f.write(struct.pack("<i", 0))
        f.write(struct.pack("<128i", *([0] * 128)))
        w._patch_offset(12)
        from chatllm_tpu.tokenizer.processor import byte_level_encode

        specials = ["<|endoftext|>", "<|im_start|>", "<|im_end|>"]
        pieces = [byte_level_encode(bytes([b])) for b in range(256)]
        pieces += [s.encode() for s in specials]
        pieces += [f"<x{i}>".encode() for i in range(VOCAB - len(pieces))]
        w.write_vocab_bpe([(p, 1) for p in pieces], [])

        def t(name, *shape, scale=0.1):
            w.write_tensor(name, (rng.standard_normal(shape) * scale)
                           .astype(np.float32), GGMLType.F32)

        t("model.embed_tokens.weight", VOCAB, hidden)
        t("model.norm.weight", hidden, scale=1.0)
        t("lm_head.weight", VOCAB, hidden)
        for i in range(layers):
            pfx = f"model.layers.{i}"
            t(f"{pfx}.input_layernorm.weight", hidden, scale=1.0)
            t(f"{pfx}.self_attn.q_proj.weight", heads * head_dim, hidden)
            t(f"{pfx}.self_attn.k_proj.weight", kv * head_dim, hidden)
            t(f"{pfx}.self_attn.v_proj.weight", kv * head_dim, hidden)
            t(f"{pfx}.self_attn.o_proj.weight", hidden, heads * head_dim)
            t(f"{pfx}.self_attn.q_norm.weight", head_dim, scale=1.0)
            t(f"{pfx}.self_attn.k_norm.weight", head_dim, scale=1.0)
            t(f"{pfx}.post_attention_layernorm.weight", hidden, scale=1.0)
            t(f"{pfx}.mlp.gate_proj.weight", inter, hidden)
            t(f"{pfx}.mlp.up_proj.weight", inter, hidden)
            t(f"{pfx}.mlp.down_proj.weight", hidden, inter)
        # penguin tower
        t("visual.embeddings.patch_embedding.weight", V_HIDDEN, 3, PATCH, PATCH)
        t("visual.embeddings.patch_embedding.bias", V_HIDDEN)
        t("visual.norm.weight", V_HIDDEN, scale=1.0)
        t("vision_projector.readout.0.weight", hidden, V_HIDDEN)
        t("vision_projector.readout.0.bias", hidden)
        t("vision_projector.readout.2.weight", hidden, hidden)
        t("vision_projector.readout.2.bias", hidden)
        for i in range(V_DEPTH):
            pfx = f"visual.layers.{i}"
            t(f"{pfx}.input_layernorm.weight", V_HIDDEN, scale=1.0)
            t(f"{pfx}.post_attention_layernorm.weight", V_HIDDEN, scale=1.0)
            t(f"{pfx}.self_attn.q_proj.weight", V_HEADS * 16, V_HIDDEN)
            t(f"{pfx}.self_attn.k_proj.weight", 1 * 16, V_HIDDEN)
            t(f"{pfx}.self_attn.v_proj.weight", 1 * 16, V_HIDDEN)
            t(f"{pfx}.self_attn.o_proj.weight", V_HIDDEN, V_HEADS * 16)
            t(f"{pfx}.self_attn.q_norm.weight", 16, scale=1.0)
            t(f"{pfx}.self_attn.k_norm.weight", 16, scale=1.0)
            t(f"{pfx}.mlp.gate_proj.weight", V_INTER, V_HIDDEN)
            t(f"{pfx}.mlp.up_proj.weight", V_INTER, V_HIDDEN)
            t(f"{pfx}.mlp.down_proj.weight", V_HIDDEN, V_INTER)


def test_penguin_vl_smoke(tmp_path):
    from PIL import Image

    from chatllm_tpu.runtime.generate import GenerationConfig

    path = str(tmp_path / "penguin_vl.bin")
    make_tiny_penguin_vl(path)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.vis_cfg is not None
    img = Image.fromarray(
        (np.random.default_rng(7).random((24, 24, 3)) * 255).astype(np.uint8))
    emb = model.encode_image(img)
    assert emb.shape[-1] == 64
    assert np.isfinite(np.asarray(emb)).all()
    reply = model.chat_image(img, "hi",
                             GenerationConfig(do_sample=False,
                                              max_new_tokens=4))
    assert isinstance(reply, str)
