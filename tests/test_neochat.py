"""NeoChat: qwen3-config LLM with Neo 3-D rope + per-half qk norms,
conv+rope2d vision embedder, bidirectional image-span VQA flow
(reference models/neochat.cpp; no public converter or HF class exists —
coverage is structural)."""
import struct

import numpy as np

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")

VOCAB = 300
HIDDEN, HEADS, KV, LAYERS, INTER, HEAD_DIM = 64, 4, 2, 2, 96, 16
V_HIDDEN, PATCH, MERGE = 32, 4, 2


def _pieces():
    from chatllm_tpu.tokenizer.processor import byte_level_encode

    pieces = [byte_level_encode(bytes([b])) for b in range(256)]
    pieces += [b"<|endoftext|>", b"<|im_start|>", b"<|im_end|>",
               b"<IMG_CONTEXT>", b"<img>", b"</img>"]
    pieces += [f"<x{i}>".encode() for i in range(VOCAB - len(pieces))]
    return pieces


def make_tiny_neochat(path):
    rng = np.random.default_rng(9)
    meta = {
        "config.json": {"vision_config": {
            "hidden_size": V_HIDDEN, "patch_size": PATCH,
            "downsample_ratio": 0.5, "rope_theta_vision": 10000.0,
            "min_pixels": 64, "max_pixels": 4096}},
    }
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.NEOCHAT), 1, meta=meta)
        w.write_config([int(GGMLType.F32), VOCAB, HIDDEN, HEADS, LAYERS,
                        INTER, 256, -1, 0, -1, -1, KV, HEAD_DIM], fmt="13i")
        f.write(struct.pack("<ff", 10000.0, -1.0))
        f.write(struct.pack("<6i", -1, 0, -1, -1, -1, 0))
        f.write(struct.pack("<i", 0))                   # tie
        f.write(struct.pack("<128i", *([0] * 128)))
        w._patch_offset(12)
        w.write_vocab_bpe([(p, 1) for p in _pieces()], [])

        def t(name, *shape, scale=0.1):
            w.write_tensor(name, (rng.standard_normal(shape) * scale)
                           .astype(np.float32), GGMLType.F32)

        t("model.embed_tokens.weight", VOCAB, HIDDEN)
        t("model.norm.weight", HIDDEN, scale=1.0)
        t("lm_head.weight", VOCAB, HIDDEN)
        for i in range(LAYERS):
            pfx = f"model.layers.{i}"
            t(f"{pfx}.input_layernorm.weight", HIDDEN, scale=1.0)
            t(f"{pfx}.post_attention_layernorm.weight", HIDDEN, scale=1.0)
            t(f"{pfx}.self_attn.q_proj.weight", HEADS * HEAD_DIM, HIDDEN)
            t(f"{pfx}.self_attn.k_proj.weight", KV * HEAD_DIM, HIDDEN)
            t(f"{pfx}.self_attn.v_proj.weight", KV * HEAD_DIM, HIDDEN)
            t(f"{pfx}.self_attn.o_proj.weight", HIDDEN, HEADS * HEAD_DIM)
            for n in ("q_norm", "q_norm_hw", "k_norm", "k_norm_hw"):
                t(f"{pfx}.self_attn.{n}.weight", HEAD_DIM // 2, scale=1.0)
            t(f"{pfx}.mlp.gate_proj.weight", INTER, HIDDEN)
            t(f"{pfx}.mlp.up_proj.weight", INTER, HIDDEN)
            t(f"{pfx}.mlp.down_proj.weight", HIDDEN, INTER)
        t("vision.embeddings.patch_embedding.weight", V_HIDDEN, 3, PATCH, PATCH)
        t("vision.embeddings.patch_embedding.bias", V_HIDDEN)
        t("vision.embeddings.dense_embedding.weight",
          HIDDEN, V_HIDDEN, MERGE, MERGE)
        t("vision.embeddings.dense_embedding.bias", HIDDEN)


def test_neochat_template(tmp_path):
    path = str(tmp_path / "neo.bin")
    make_tiny_neochat(path)
    model = load_model(path, RuntimeConfig(**RT32))
    tok = model.tokenizer
    ids = []
    tok.chat_encoder.append_user(0, "hi", ids)
    tok.chat_encoder.append_ai_opening(0, ids)
    # empty sys prompt → straight to user; non-think opening has the empty
    # think block (neochat.cpp append_ai_opening:1678-1696)
    assert tok.decode(ids) == "user\nhi\nassistant\n<think>\n\n</think>\n\n"
    ids2 = []
    tok.chat_encoder.append_user(0, "/gen a cat", ids2)
    tok.chat_encoder.append_ai_opening(0, ids2)
    txt = tok.decode(ids2)
    assert "image generation" in txt           # default gen system prompt
    assert ids2[-1] == tok.img_start_token_id  # <img> opening in gen mode


def test_neochat_text_generate(tmp_path):
    from chatllm_tpu.runtime.generate import GenerationConfig

    path = str(tmp_path / "neo.bin")
    make_tiny_neochat(path)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.cfg.rope.layout == "neo3d"
    assert model.cfg.qk_norm == "rmsnorm_halves"
    ids = model.tokenizer.encode("hello world, this is a test")
    out1 = model.generate(ids, GenerationConfig(do_sample=False,
                                                max_new_tokens=6))[0]
    out2 = model.generate(ids, GenerationConfig(do_sample=False,
                                                max_new_tokens=6))[0]
    assert list(out1) == list(out2) and len(out1) == 6

    # chunked prefill == single-shot prefill (rope/cache consistency)
    eng = model.engine
    c1 = eng.new_cache(1, eng.max_length)
    l1, _, _ = eng.prefill(ids, c1, 0)
    c2 = eng.new_cache(1, eng.max_length)
    l2a, c2, n2 = eng.prefill(ids[:4], c2, 0)
    l2, _, _ = eng.prefill(ids[4:], c2, n2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               atol=2e-4, rtol=1e-4)


def test_neochat_vqa(tmp_path):
    from PIL import Image

    from chatllm_tpu.runtime.generate import GenerationConfig

    path = str(tmp_path / "neo.bin")
    make_tiny_neochat(path)
    model = load_model(path, RuntimeConfig(**RT32))

    img = Image.fromarray((np.random.default_rng(6).random((16, 24, 3))
                           * 255).astype(np.uint8))
    emb, (gh, gw) = model.encode_image(img)
    # 16×24 → grid 4×6 → merged 2×3
    assert (gh, gw) == (2, 3)
    assert emb.shape == (6, HIDDEN)

    reply = model.chat_image(img, "what is this?",
                             GenerationConfig(do_sample=False,
                                              max_new_tokens=4))
    assert isinstance(reply, str)
