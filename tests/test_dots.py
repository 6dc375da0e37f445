"""dots.ocr: qwen2 LLM + NaViT 2-D-rope RMSNorm tower + OCR chat flow
(reference models/dots.cpp; converter DotsOCRConverter convert.py:9627).
No native HF class exists (trust_remote_code upstream), so coverage is
structural: template byte-parity, tower shape/finiteness, merge ordering,
and the end-to-end chat_image path."""
import struct

import numpy as np

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")

VOCAB = 300
HIDDEN, HEADS, KV, LAYERS, INTER = 64, 4, 2, 2, 96
V_HIDDEN, V_HEADS, V_DEPTH, V_INTER, PATCH, MERGE = 32, 2, 2, 48, 4, 2


def _pieces():
    from chatllm_tpu.tokenizer.processor import byte_level_encode

    pieces = [byte_level_encode(bytes([b])) for b in range(256)]
    specials = [b"<|endoftext|>", b"[PAD]", b"<|user|>", b"<|assistant|>",
                b"<|endofuser|>", b"<|endofassistant|>", b"<|img|>",
                b"<|endofimg|>", b"<|system|>", b"<|endofsystem|>"]
    pieces += specials
    pieces += [f"<x{i}>".encode() for i in range(VOCAB - len(pieces))]
    return pieces, {s.decode(): 256 + i for i, s in enumerate(specials)}


def make_tiny_dots(path):
    rng = np.random.default_rng(42)
    meta = {
        "config.json": {"vision_config": {
            "hidden_size": V_HIDDEN, "num_hidden_layers": V_DEPTH,
            "num_attention_heads": V_HEADS, "intermediate_size": V_INTER,
            "patch_size": PATCH, "spatial_merge_size": MERGE,
            "temporal_patch_size": 1, "rms_norm_eps": 1e-5}},
        "preprocessor_config.json": {
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
            "min_pixels": 64, "max_pixels": 4096},
    }
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.DOTS_OCR), 1, meta=meta)
        # QWen2Converter config layout
        w.write_config([int(GGMLType.F32), VOCAB, HIDDEN, HEADS, LAYERS, INTER,
                        256, -1, 0, -1, -1, KV, 0], fmt="13i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        pieces, _ = _pieces()
        w.write_vocab_bpe([(p, 1) for p in pieces], [])

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
            for n in ("q_proj", "k_proj", "v_proj"):
                dim = HEADS * 16 if n == "q_proj" else KV * 16
                t(f"{pfx}.self_attn.{n}.weight", dim, HIDDEN)
                t(f"{pfx}.self_attn.{n}.bias", dim)
            t(f"{pfx}.self_attn.o_proj.weight", HIDDEN, HEADS * 16)
            t(f"{pfx}.mlp.gate_proj.weight", INTER, HIDDEN)
            t(f"{pfx}.mlp.up_proj.weight", INTER, HIDDEN)
            t(f"{pfx}.mlp.down_proj.weight", HIDDEN, INTER)
        # tower (DotsOCRConverter.get_weight_names)
        t("vision_model.patch_embed.proj.weight", V_HIDDEN, 3, PATCH, PATCH)
        t("vision_model.patch_embed.proj.bias", V_HIDDEN)
        t("vision_model.patch_embed.norm.weight", V_HIDDEN, scale=1.0)
        t("vision_model.post_trunk_norm.weight", V_HIDDEN, scale=1.0)
        for i in range(V_DEPTH):
            pfx = f"vision_model.layers.{i}"
            t(f"{pfx}.norm1.weight", V_HIDDEN, scale=1.0)
            t(f"{pfx}.norm2.weight", V_HIDDEN, scale=1.0)
            for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
                t(f"{pfx}.attn.{n}.weight", V_HIDDEN, V_HIDDEN)
            t(f"{pfx}.mlp.gate_proj.weight", V_INTER, V_HIDDEN)
            t(f"{pfx}.mlp.up_proj.weight", V_INTER, V_HIDDEN)
            t(f"{pfx}.mlp.down_proj.weight", V_HIDDEN, V_INTER)
        m2 = MERGE * MERGE * V_HIDDEN
        t("vision_model.merger.ln_q.weight", V_HIDDEN, scale=1.0)
        t("vision_model.merger.ln_q.bias", V_HIDDEN)
        t("vision_model.merger.mlp.fc0.weight", m2, m2)
        t("vision_model.merger.mlp.fc0.bias", m2)
        t("vision_model.merger.mlp.fc1.weight", HIDDEN, m2)
        t("vision_model.merger.mlp.fc1.bias", HIDDEN)


def test_dots_template(tmp_path):
    """<|user|>u<|endofuser|><|assistant|>ai<|endofassistant|> with special
    terminators (dots.cpp Tokenizer::load:317-341, encoders :360-391)."""
    path = str(tmp_path / "dots.bin")
    make_tiny_dots(path)
    model = load_model(path, RuntimeConfig(**RT32))
    tok = model.tokenizer
    ids = []
    tok.chat_encoder.append_sys_prompt(ids)
    assert ids == []                       # empty default system prompt
    tok.chat_encoder.append_user(0, "hi", ids)
    tok.chat_encoder.append_ai_opening(0, ids)
    assert ids[0] == tok.user_token_id
    assert ids[-2] == tok.end_user_token_id
    assert ids[-1] == tok.assistant_token_id
    assert tok.end_assistant_token_id in tok.terminate_ids
    assert tok.end_user_token_id in tok.terminate_ids
    tok.sys_prompt = "sys"
    sids = []
    tok.chat_encoder.append_sys_prompt(sids)
    assert tok.decode(sids) == "<|system|>sys<|endofsystem|>\n"


def test_dots_merge_order():
    """Patch permutation must walk 2×2 merge blocks in raster order
    (TensorPosHelper::prepare, dots.cpp:85-113)."""
    from chatllm_tpu.nn.vit import _merge_block_order

    perm, ph, pw = _merge_block_order(4, 4, 2)
    assert perm.tolist()[:8] == [0, 1, 4, 5, 2, 3, 6, 7]
    assert ph.tolist()[:8] == [0, 0, 1, 1, 0, 0, 1, 1]
    assert pw.tolist()[:8] == [0, 1, 0, 1, 2, 3, 2, 3]


def test_dots_tower_and_chat(tmp_path):
    from PIL import Image

    from chatllm_tpu.runtime.generate import GenerationConfig

    path = str(tmp_path / "dots.bin")
    make_tiny_dots(path)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.vis_cfg is not None

    img = Image.fromarray(
        (np.random.default_rng(4).random((20, 28, 3)) * 255).astype(np.uint8))
    emb, (gh, gw) = model.encode_image(img)
    # 20×28 pads to 24×32 → grid 6×8 → merged 3×4
    assert (gh, gw) == (3, 4)
    assert emb.shape == (12, HIDDEN)
    assert np.isfinite(np.asarray(emb)).all()

    reply = model.chat_image(img, "OCR:",
                             GenerationConfig(do_sample=False,
                                              max_new_tokens=4))
    assert isinstance(reply, str)
