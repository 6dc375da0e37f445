"""Step-VL: Qwen3-config LLM + CLIP-style layer-scale tower + pan-and-scan
chat flow (reference models/step.cpp; converter StepVLConverter
convert.py:9911).  No native HF class (trust_remote_code upstream), so
coverage is structural."""
import struct

import numpy as np

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")

VOCAB = 300
HIDDEN, HEADS, KV, LAYERS, INTER, HEAD_DIM = 64, 4, 2, 2, 96, 16
V_WIDTH, V_HEADS, V_DEPTH, PATCH, IMG = 32, 2, 2, 4, 32   # grid 8 → proj 2×2
V_INTER = int(V_WIDTH * (8960.0 / 1536))


def _pieces():
    from chatllm_tpu.tokenizer.processor import byte_level_encode

    pieces = [byte_level_encode(bytes([b])) for b in range(256)]
    specials = [b"<|endoftext|>", b"<|im_start|>", b"<|im_end|>",
                b"<im_start>", b"<im_end>", b"<patch_start>", b"<patch_end>",
                b"<patch_newline>", b"<think>", b"</think>"]
    pieces += specials
    pieces += [f"<x{i}>".encode() for i in range(VOCAB - len(pieces))]
    return pieces


def make_tiny_step(path):
    rng = np.random.default_rng(5)
    meta = {
        "config.json": {"vision_config": {
            "image_size": IMG, "patch_size": PATCH, "width": V_WIDTH,
            "layers": V_DEPTH, "heads": V_HEADS, "hidden_act": "quick_gelu"}},
    }
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.STEP_VL), 1, meta=meta)
        # v3 Config (models/qwen.h:746)
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
            t(f"{pfx}.self_attn.q_norm.weight", HEAD_DIM, scale=1.0)
            t(f"{pfx}.self_attn.k_norm.weight", HEAD_DIM, scale=1.0)
            t(f"{pfx}.mlp.gate_proj.weight", INTER, HIDDEN)
            t(f"{pfx}.mlp.up_proj.weight", INTER, HIDDEN)
            t(f"{pfx}.mlp.down_proj.weight", HIDDEN, INTER)
        # tower (StepVLConverter.get_weight_names)
        t("visual.positional_embedding", (IMG // PATCH) ** 2, V_WIDTH)
        t("visual.conv1.weight", V_WIDTH, 3, PATCH, PATCH)
        t("visual.ln_pre.weight", V_WIDTH, scale=1.0)
        t("visual.ln_pre.bias", V_WIDTH)
        for i in range(V_DEPTH):
            pfx = f"visual.blocks.{i}"
            for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
                t(f"{pfx}.attn.{n}.weight", V_WIDTH, V_WIDTH)
                t(f"{pfx}.attn.{n}.bias", V_WIDTH)
            t(f"{pfx}.ls_1.gamma", V_WIDTH, scale=1.0)
            t(f"{pfx}.ls_2.gamma", V_WIDTH, scale=1.0)
            for n in ("ln_1", "ln_2"):
                t(f"{pfx}.{n}.weight", V_WIDTH, scale=1.0)
                t(f"{pfx}.{n}.bias", V_WIDTH)
            t(f"{pfx}.mlp.c_fc.weight", V_INTER, V_WIDTH)
            t(f"{pfx}.mlp.c_fc.bias", V_INTER)
            t(f"{pfx}.mlp.c_proj.weight", V_WIDTH, V_INTER)
            t(f"{pfx}.mlp.c_proj.bias", V_WIDTH)
        t("visual.vit_downsampler1.weight", V_WIDTH * 2, V_WIDTH, 3, 3)
        t("visual.vit_downsampler1.bias", V_WIDTH * 2)
        t("visual.vit_downsampler2.weight", V_WIDTH * 4, V_WIDTH * 2, 3, 3)
        t("visual.vit_downsampler2.bias", V_WIDTH * 4)
        t("visual.vit_large_projector.weight", HIDDEN, V_WIDTH * 4)


def test_step_template(tmp_path):
    """ChatML + forced '<think>\\n' assistant opening (step.cpp:606-611)."""
    path = str(tmp_path / "step.bin")
    make_tiny_step(path)
    model = load_model(path, RuntimeConfig(**RT32))
    tok = model.tokenizer
    assert tok.sys_prompt == ""
    ids = []
    tok.chat_encoder.append_user(0, "hi", ids)
    tok.chat_encoder.append_ai_opening(0, ids)
    assert ids[0] == tok.im_start_token_id
    assert tok.im_end_token_id in ids
    assert tok.decode(ids) == "user\nhi\nassistant\n<think>\n"
    assert tok.patch_start_token_id >= 0
    assert tok.image_start_token_id >= 0


def test_step_tower_shapes(tmp_path):
    path = str(tmp_path / "step.bin")
    make_tiny_step(path)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.vis_cfg is not None
    from PIL import Image

    img = Image.fromarray((np.random.default_rng(1).random((IMG, IMG, 3))
                           * 255).astype(np.uint8))
    emb = model._encode_view(img)
    # grid 8 → two stride-2 convs → 2×2 = 4 tokens
    assert emb.shape == (4, HIDDEN)
    assert np.isfinite(np.asarray(emb)).all()


def test_step_pan_and_scan_shapes():
    from PIL import Image

    from chatllm_tpu.runtime.vision import step_pan_and_scan

    # small square: no windows (long<=728, ratio 1 < 1.5)
    img = Image.new("RGB", (600, 600))
    crops, per_row = step_pan_and_scan(img, image_size=728)
    assert len(crops) == 1 and crops[0].size == (728, 728)

    # wide image beyond 728: 504 windows activate
    img = Image.new("RGB", (2000, 800))
    crops, per_row = step_pan_and_scan(img, image_size=728)
    assert len(crops) > 1
    assert all(c.size == (504, 504) for c in crops[1:])
    assert per_row >= 2


def test_step_chat_image(tmp_path):
    from PIL import Image

    from chatllm_tpu.runtime.generate import GenerationConfig

    path = str(tmp_path / "step.bin")
    make_tiny_step(path)
    model = load_model(path, RuntimeConfig(**RT32))
    model.do_pan_and_scan = False     # tiny tower: single whole view
    img = Image.fromarray((np.random.default_rng(2).random((40, 56, 3))
                           * 255).astype(np.uint8))
    reply = model.chat_image(img, "describe",
                             GenerationConfig(do_sample=False,
                                              max_new_tokens=4))
    assert isinstance(reply, str)
