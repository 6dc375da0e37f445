"""Kimi-VL + LocateAnything: MoonViT tower unit tests (merge order, 2-D
interleaved rope, bicubic pos-embed), v3-light config parse, and chat_image
smoke (reference models/moonshot.cpp kimi::vl, models/locateanything.cpp)."""
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
HIDDEN, HEADS, LAYERS, INTER = 64, 4, 2, 96
KV_RANK, NOPE, ROPE_D, V_DIM, MOE_INTER = 32, 16, 8, 16, 32
N_ROUTED, N_SHARED, TOP_K, FIRST_DENSE = 4, 1, 2, 1
V_HIDDEN, V_HEADS, V_DEPTH, V_INTER, PATCH = 32, 2, 2, 48, 4
POS_H = POS_W = 6

SPECIALS = ["<|im_end|>", "<|im_user|>", "<|im_assistant|>", "<|im_system|>",
            "<|im_middle|>", "<|media_start|>", "<|media_content|>",
            "<|media_end|>", "<|media_pad|>"]


def _vit_tensors(w, rng, projector: str, lm_hidden: int):
    def t(name, *shape, scale=0.1):
        w.write_tensor(name, (rng.standard_normal(shape) * scale)
                       .astype(np.float32), GGMLType.F32)

    t("vision_model.patch_embed.proj.weight", V_HIDDEN, 3, PATCH, PATCH)
    t("vision_model.patch_embed.proj.bias", V_HIDDEN)
    t("vision_model.patch_embed.pos_emb.weight", POS_H, POS_W, V_HIDDEN)
    t("vision_model.final_layernorm.weight", V_HIDDEN, scale=1.0)
    t("vision_model.final_layernorm.bias", V_HIDDEN)
    for i in range(V_DEPTH):
        pfx = f"vision_model.encoder.blocks.{i}"
        for n in ("norm0", "norm1"):
            t(f"{pfx}.{n}.weight", V_HIDDEN, scale=1.0)
            t(f"{pfx}.{n}.bias", V_HIDDEN)
        for n in ("q", "k", "v", "o"):
            t(f"{pfx}.attn.{n}_proj.weight", V_HIDDEN, V_HIDDEN)
            t(f"{pfx}.attn.{n}_proj.bias", V_HIDDEN)
        t(f"{pfx}.mlp.fc0.weight", V_INTER, V_HIDDEN)
        t(f"{pfx}.mlp.fc0.bias", V_INTER)
        t(f"{pfx}.mlp.fc1.weight", V_HIDDEN, V_INTER)
        t(f"{pfx}.mlp.fc1.bias", V_HIDDEN)
    m2 = 4 * V_HIDDEN
    if projector == "kimi":
        t("multi_modal_projector.pre_norm.weight", V_HIDDEN, scale=1.0)
        t("multi_modal_projector.pre_norm.bias", V_HIDDEN)
        t("multi_modal_projector.linear_1.weight", m2, m2)
        t("multi_modal_projector.linear_1.bias", m2)
        t("multi_modal_projector.linear_2.weight", lm_hidden, m2)
        t("multi_modal_projector.linear_2.bias", lm_hidden)
    else:
        t("mlp1.0.weight", m2, scale=1.0)
        t("mlp1.0.bias", m2)
        t("mlp1.1.weight", lm_hidden, m2)
        t("mlp1.1.bias", lm_hidden)
        t("mlp1.3.weight", lm_hidden, lm_hidden)
        t("mlp1.3.bias", lm_hidden)


def _vis_meta():
    return {
        "config.json": {"vision_config": {
            "hidden_size": V_HIDDEN, "num_hidden_layers": V_DEPTH,
            "num_attention_heads": V_HEADS, "intermediate_size": V_INTER,
            "patch_size": PATCH, "init_pos_emb_height": POS_H,
            "init_pos_emb_width": POS_W, "merge_kernel_size": [2, 2]}},
        "preprocessor_config.json": {
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
            "in_token_limit": 4096},
        "tokenizer_config.json": {"added_tokens_decoder": {
            str(256 + i): {"content": s} for i, s in enumerate(SPECIALS)}},
    }


def make_tiny_kimi_vl(path):
    from chatllm_tpu.tokenizer.processor import byte_level_encode

    rng = np.random.default_rng(41)
    meta = {"model_name": "tiny-kimivl", **_vis_meta()}
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.KIMI_VL), 1, meta=meta)
        # v3_light layout: v2_light Config, no q_lora/topk_group ints
        vals = [int(GGMLType.F32), VOCAB, HIDDEN, HEADS, LAYERS, INTER,
                128, -1, 0, -1, -1,
                HEADS, FIRST_DENSE, KV_RANK, MOE_INTER, 1, 1, N_ROUTED,
                N_SHARED, 0, TOP_K, NOPE, ROPE_D, 128, V_DIM]
        w.write_config(vals, fmt=f"{len(vals)}i")
        f.write(struct.pack("<7f", 32.0, 1.0, 1.0, 1.0, 1.0, 10000.0, 1.0))
        w._patch_offset(12)
        pieces = [byte_level_encode(bytes([b])) for b in range(256)]
        pieces += [s.encode() for s in SPECIALS]
        pieces += [f"<x{i}>".encode() for i in range(VOCAB - len(pieces))]
        w.write_vocab_bpe([(p, 1) for p in pieces], [])

        def t(name, *shape, scale=0.1):
            w.write_tensor(name, (rng.standard_normal(shape) * scale)
                           .astype(np.float32), GGMLType.F32)

        t("model.embed_tokens.weight", VOCAB, HIDDEN)
        t("model.norm.weight", HIDDEN, scale=1.0)
        t("lm_head.weight", VOCAB, HIDDEN)
        for i in range(LAYERS):
            pfx = f"model.layers.{i}"
            t(f"{pfx}.self_attn.d_kv_proj.weight", KV_RANK, HIDDEN)
            t(f"{pfx}.self_attn.k_pe_proj.weight", ROPE_D, HIDDEN)
            t(f"{pfx}.self_attn.kv_norm.weight", KV_RANK, scale=1.0)
            t(f"{pfx}.self_attn.u_k_nope_proj.weight", HEADS * NOPE, KV_RANK)
            t(f"{pfx}.self_attn.u_v_proj.weight", HEADS * V_DIM, KV_RANK)
            t(f"{pfx}.self_attn.q_proj.weight", HEADS * (NOPE + ROPE_D), HIDDEN)
            t(f"{pfx}.self_attn.o_proj.weight", HIDDEN, HEADS * V_DIM)
            t(f"{pfx}.input_layernorm.weight", HIDDEN, scale=1.0)
            t(f"{pfx}.post_attention_layernorm.weight", HIDDEN, scale=1.0)
            if i >= FIRST_DENSE:
                t(f"{pfx}.mlp.gate.weight", N_ROUTED, HIDDEN)
                t(f"{pfx}.mlp.gate.e_score_correction_bias", N_ROUTED)
                for j in range(N_ROUTED):
                    for n in ("gate_proj", "up_proj", "down_proj"):
                        shp = (MOE_INTER, HIDDEN) if n != "down_proj" else \
                            (HIDDEN, MOE_INTER)
                        t(f"{pfx}.mlp.experts.{j}.{n}.weight", *shp)
                for n in ("gate_proj", "up_proj", "down_proj"):
                    shp = (MOE_INTER * N_SHARED, HIDDEN) if n != "down_proj" \
                        else (HIDDEN, MOE_INTER * N_SHARED)
                    t(f"{pfx}.mlp.shared_experts.{n}.weight", *shp)
            else:
                t(f"{pfx}.mlp.gate_proj.weight", INTER, HIDDEN)
                t(f"{pfx}.mlp.up_proj.weight", INTER, HIDDEN)
                t(f"{pfx}.mlp.down_proj.weight", HIDDEN, INTER)
        _vit_tensors(w, rng, "kimi", HIDDEN)


def test_merge_patches_order():
    from chatllm_tpu.nn.kimi_vit import merge_patches

    gh, gw, C = 4, 4, 2
    x = np.arange(gh * gw * C, dtype=np.float32).reshape(gh * gw, C)
    out = np.asarray(merge_patches(x, gh, gw, (2, 2)))
    assert out.shape == (4, 8)
    # first merged block = patches (0,0),(0,1),(1,0),(1,1) raster
    np.testing.assert_array_equal(out[0].reshape(4, C),
                                  x[[0, 1, 4, 5]])
    # second block = (0,2),(0,3),(1,2),(1,3)
    np.testing.assert_array_equal(out[1].reshape(4, C),
                                  x[[2, 3, 6, 7]])


def test_kimi_2d_rope_layout():
    from chatllm_tpu.nn.kimi_vit import kimi_2d_rope_cos_sin

    d = 16
    cos, sin = kimi_2d_rope_cos_sin(2, 3, d)
    assert cos.shape == (6, d // 2)
    # pair 0 = w angle at freq0=1.0; pair 1 = h angle at freq0
    # token (h=1, w=2) is index 1*3+2=5
    np.testing.assert_allclose(np.asarray(cos)[5, 0], np.cos(2.0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sin)[5, 1], np.sin(1.0), rtol=1e-6)
    # pair 2 = w at freq1 = base^(-4/d)
    f1 = 10000.0 ** (-4.0 / d)
    np.testing.assert_allclose(np.asarray(sin)[5, 2], np.sin(2.0 * f1),
                               rtol=1e-6)


@pytest.fixture(scope="module")
def kimi(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("kimi") / "tiny_kimivl.bin")
    make_tiny_kimi_vl(path)
    return load_model(path, RuntimeConfig(**RT32))


def test_kimi_load_and_template(kimi):
    tok = kimi.tokenizer
    assert tok.im_end_token_id == 256
    assert tok.media_start_token_id == 261
    ids = []
    tok.chat_encoder.append_user(0, "hi", ids)
    assert ids[0] == tok.im_user_token_id
    assert tok.im_middle_token_id in ids and ids[-1] == tok.im_end_token_id
    assert kimi.cfg.moe_score_func == "sigmoid"
    assert kimi.vis_cfg is not None


def test_kimi_tower_shapes(kimi):
    import jax.numpy as jnp

    from chatllm_tpu.nn.kimi_vit import kimi_vit_forward

    gh, gw = 6, 4
    rng = np.random.default_rng(3)
    frames = rng.standard_normal((gh * PATCH, gw * PATCH, 3)).astype(np.float32)
    out = kimi_vit_forward(kimi.vis_cfg, kimi.vis_params,
                           jnp.asarray(frames), gh, gw)
    assert out.shape == (gh * gw // 4, HIDDEN)
    assert np.isfinite(np.asarray(out)).all()


def test_kimi_chat_image_smoke(kimi):
    from PIL import Image

    from chatllm_tpu.runtime.generate import GenerationConfig

    img = Image.fromarray(
        (np.random.default_rng(4).random((24, 32, 3)) * 255).astype(np.uint8))
    reply = kimi.chat_image(img, "hi",
                            GenerationConfig(do_sample=False, max_new_tokens=4))
    assert isinstance(reply, str)


def make_tiny_locate(path):
    import transformers
    from chatllm_tpu.tokenizer.processor import byte_level_encode

    torch.manual_seed(42)
    cfg = transformers.Qwen2Config(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_attention_heads=HEADS,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=INTER,
        max_position_embeddings=128, tie_word_embeddings=False)
    hf = transformers.Qwen2ForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    rng = np.random.default_rng(43)
    meta = {"model_name": "tiny-locate", **_vis_meta()}
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.LocateAnything), 1, meta=meta)
        w.write_config([int(GGMLType.F32), VOCAB, HIDDEN, HEADS, 2, INTER,
                        128, -1, 0, -1, -1, 2, 0], fmt="13i")
        f.write(struct.pack("<f", 10000.0))
        f.write(struct.pack("<I", 0))                   # tie flag
        w._patch_offset(12)
        specials = ["<|endoftext|>", "<|im_start|>", "<|im_end|>",
                    "<img>", "</img>"]
        pieces = [byte_level_encode(bytes([b])) for b in range(256)]
        pieces += [s.encode() for s in specials]
        pieces += [f"<x{i}>".encode() for i in range(VOCAB - len(pieces))]
        w.write_vocab_bpe([(p, 1) for p in pieces], [])
        names = ["model.embed_tokens.weight"]
        for i in range(2):
            names += [f"model.layers.{i}.{n}" for n in [
                "input_layernorm.weight",
                "self_attn.q_proj.weight", "self_attn.q_proj.bias",
                "self_attn.k_proj.weight", "self_attn.k_proj.bias",
                "self_attn.v_proj.weight", "self_attn.v_proj.bias",
                "self_attn.o_proj.weight",
                "post_attention_layernorm.weight",
                "mlp.gate_proj.weight", "mlp.up_proj.weight",
                "mlp.down_proj.weight"]]
        names += ["model.norm.weight", "lm_head.weight"]
        for n in names:
            w.write_tensor(n, sd[n], GGMLType.F32)
        _vit_tensors(w, rng, "locate", HIDDEN)


def test_locate_anything_smoke(tmp_path):
    from PIL import Image

    from chatllm_tpu.runtime.generate import GenerationConfig

    path = str(tmp_path / "locate.bin")
    make_tiny_locate(path)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.tokenizer.image_start_token_id >= 0
    assert model.vis_cfg.projector == "locate"
    img = Image.fromarray(
        (np.random.default_rng(5).random((24, 24, 3)) * 255).astype(np.uint8))
    reply = model.chat_image(img, "find the cat",
                             GenerationConfig(do_sample=False,
                                              max_new_tokens=4))
    assert isinstance(reply, str)
