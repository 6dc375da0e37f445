"""Gemma3-Vis HF-golden: SigLIP tower + avg-pool projector vs HF
Gemma3ForConditionalGeneration.get_image_features (reference
models/gemma.cpp siglip namespace:246)."""
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

VOCAB, HID, HEADS, KV, LAYERS, INTER, HD = 262, 64, 4, 2, 2, 96, 16
VH, VL, VHEADS, VINTER, PATCH, IMG = 32, 2, 2, 64, 8, 32
MM_TOKENS = 4   # grid 4x4 pooled 2x2


def make_tiny_gemma3vis(path):
    torch.manual_seed(17)
    cfg = transformers.Gemma3Config(
        text_config=dict(
            vocab_size=VOCAB, hidden_size=HID, num_attention_heads=HEADS,
            num_key_value_heads=KV, num_hidden_layers=LAYERS,
            intermediate_size=INTER, head_dim=HD,
            max_position_embeddings=128, rope_theta=1000000.0,
            rope_local_base_freq=10000.0, sliding_window=32,
            sliding_window_pattern=3, query_pre_attn_scalar=HD,
            rms_norm_eps=1e-6, tie_word_embeddings=True,
            attention_bias=False, rope_scaling=None),
        vision_config=dict(
            hidden_size=VH, num_hidden_layers=VL, num_attention_heads=VHEADS,
            intermediate_size=VINTER, patch_size=PATCH, image_size=IMG,
            num_channels=3, layer_norm_eps=1e-6),
        mm_tokens_per_image=MM_TOKENS,
        image_token_index=VOCAB - 1, boi_token_index=VOCAB - 3,
        eoi_token_index=VOCAB - 2, pad_token_id=0, eos_token_id=1,
        bos_token_id=2)
    hf = transformers.Gemma3ForConditionalGeneration(cfg).eval()
    sd = {k.replace("model.language_model.", "model.")
          .replace("model.vision_tower.vision_model.", "vision_model.")
          .replace("model.multi_modal_projector.", "multi_modal_projector."):
          v.detach().float().numpy() for k, v in hf.state_dict().items()}

    meta = {
        "config.json": {
            "mm_tokens_per_image": MM_TOKENS,
            "vision_config": {
                "hidden_size": VH, "num_hidden_layers": VL,
                "num_attention_heads": VHEADS, "intermediate_size": VINTER,
                "patch_size": PATCH, "image_size": IMG,
                "layer_norm_eps": 1e-6,
            },
        },
        "preprocessor_config.json": {"image_mean": [0.5] * 3,
                                     "image_std": [0.5] * 3},
    }
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.GEMMA3Vis), 1, meta=meta)
        w.write_config([int(GGMLType.F32), VOCAB, HID, HEADS, LAYERS, INTER,
                        128, 2, 1, 0, -1] + [KV, HD, HD, 32, 3], fmt="16i")
        f.write(struct.pack("<3f", 10000.0, 1000000.0, 1.0))
        w._patch_offset(12)
        pieces = [(b"<pad>", -1.0), (b"<eos>", -1.0), (b"<bos>", -1.0)]
        pieces += [(f"w{i}".encode(), -float(i)) for i in range(3, VOCAB - 3)]
        pieces += [(b"<start_of_image>", -1.0), (b"<end_of_image>", -1.0),
                   (b"<image_soft_token>", -1.0)]
        w.write_vocab_sp(pieces)

        def wt(name, arr):
            w.write_tensor(name, np.ascontiguousarray(arr, np.float32),
                           GGMLType.F32)

        # LM with converter folds (embed*sqrt(H), norms 1+w)
        names = ["model.embed_tokens.weight"]
        for i in range(LAYERS):
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
            if n == "model.embed_tokens.weight":
                arr = arr * (HID ** 0.5)
            elif n.endswith("norm.weight"):
                arr = 1 + arr
            wt(n, arr)

        # vision tower (converter renames, convert.py:6630-6655)
        wt("vision_model.embeddings.patch_embedding.weight",
           sd["vision_model.embeddings.patch_embedding.weight"])
        wt("vision_model.embeddings.patch_embedding.bias",
           sd["vision_model.embeddings.patch_embedding.bias"])
        wt("vision_model.embeddings.position_embedding.weight",
           sd["vision_model.embeddings.position_embedding.weight"])
        wt("vision_model.post_layernorm.weight",
           sd["vision_model.post_layernorm.weight"])
        wt("vision_model.post_layernorm.bias",
           sd["vision_model.post_layernorm.bias"])
        for i in range(VL):
            src = f"vision_model.encoder.layers.{i}"
            for a, b in [("self_attn.q_proj", "self_attn.q_proj"),
                         ("self_attn.k_proj", "self_attn.k_proj"),
                         ("self_attn.v_proj", "self_attn.v_proj"),
                         ("self_attn.out_proj", "self_attn.o_proj"),
                         ("mlp.fc1", "mlp.fc0"), ("mlp.fc2", "mlp.fc1"),
                         ("layer_norm1", "input_layernorm"),
                         ("layer_norm2", "post_attention_layernorm")]:
                wt(f"{src}.{b}.weight", sd[f"{src}.{a}.weight"])
                wt(f"{src}.{b}.bias", sd[f"{src}.{a}.bias"])
        wt("multi_modal_projector.mm_input_projection.weight",
           sd["multi_modal_projector.mm_input_projection_weight"])
        wt("multi_modal_projector.mm_soft_emb_norm.weight",
           1.0 + sd["multi_modal_projector.mm_soft_emb_norm.weight"])
    return hf


def test_gemma3vis_tower_golden(tmp_path):
    path = str(tmp_path / "g3v.bin")
    hf = make_tiny_gemma3vis(path)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.vis_cfg is not None
    assert model.image_token_count() == MM_TOKENS

    rng = np.random.default_rng(9)
    px = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(torch.from_numpy(px)).numpy()
    ours = np.asarray(model.encode_images(np.transpose(px, (0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref.reshape(-1, HID),
                               atol=3e-4, rtol=3e-4)


def test_gemma3vis_chat_image(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from chatllm_tpu.runtime.generate import GenerationConfig

    path = str(tmp_path / "g3v2.bin")
    make_tiny_gemma3vis(path)
    model = load_model(path, RuntimeConfig(**RT32))
    img = Image.fromarray(
        (np.random.default_rng(1).random((40, 48, 3)) * 255).astype(np.uint8))
    reply = model.chat_image(img, "what?",
                             GenerationConfig(do_sample=False,
                                              max_new_tokens=4))
    assert isinstance(reply, str)
