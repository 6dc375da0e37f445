"""SmolVLM HF-golden: tiny HF SmolVLMForConditionalGeneration → GGMM with
converter names (/root/reference/convert.py SmolVLMConverter:2221) → our
tower+connector output matches HF's, and chat_image runs end-to-end."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
PIL = pytest.importorskip("PIL")

RT32 = dict(weight_dtype="float32", compute_dtype="float32",
            cache_dtype="float32")

VOCAB, HID, HEADS, KV, LAYERS, INTER = 320, 64, 4, 2, 2, 96
VH, VL, VHEADS, VINTER, PATCH, IMG, SF = 32, 2, 2, 64, 8, 32, 2


def make_tiny_smolvlm(path):
    from test_model_golden import _bpe_pieces

    from chatllm_tpu.ggmm.writer import GGMMWriter

    torch.manual_seed(7)
    cfg = transformers.SmolVLMConfig(
        text_config=dict(
            vocab_size=VOCAB, hidden_size=HID, num_attention_heads=HEADS,
            num_key_value_heads=KV, num_hidden_layers=LAYERS,
            intermediate_size=INTER, max_position_embeddings=256,
            rope_theta=10000.0, rms_norm_eps=1e-5,
            tie_word_embeddings=False),
        vision_config=dict(
            hidden_size=VH, num_hidden_layers=VL, num_attention_heads=VHEADS,
            intermediate_size=VINTER, patch_size=PATCH, image_size=IMG,
            num_channels=3),
        scale_factor=SF, image_token_id=VOCAB - 1)
    hf = transformers.SmolVLMForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    meta = {
        "model_name": "tiny-smolvlm",
        "config.json": {
            "scale_factor": SF,
            "vision_config": {
                "hidden_size": VH, "num_hidden_layers": VL,
                "num_attention_heads": VHEADS, "intermediate_size": VINTER,
                "patch_size": PATCH,
                "size": {"longest_edge": IMG},
                "max_image_size": {"longest_edge": IMG},
            },
        },
        "preprocessor_config.json": {
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
        },
    }
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.SMOL_VLM), 1, meta=meta)
        # SmolLM config layout: BaseConfig 11i + (n_kv, rope_theta) "if"
        vals = [int(GGMLType.F32), VOCAB, HID, HEADS, LAYERS, INTER, 256,
                -1, 1, -1, -1, KV]
        w.write_config(vals, fmt="12i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)   # re-patch config-end offset for the extra float
        pieces = _bpe_pieces(256) + [
            b"<|im_start|>", b"<|im_end|>", b"<|endoftext|>",
            b"<end_of_utterance>", b"<fake_token_around_image>",
            b"<global-img>", b"<tool_call>"]
        pieces += [f"<pad{i}>".encode() for i in range(VOCAB - len(pieces))]
        w.write_vocab_bpe([(p, 1) for p in pieces], [])

        def wt(name, arr):
            w.write_tensor(name, np.ascontiguousarray(arr, np.float32),
                           GGMLType.F32)

        # LM (llama family names)
        wt("model.embed_tokens.weight", sd["model.text_model.embed_tokens.weight"])
        for i in range(LAYERS):
            src = f"model.text_model.layers.{i}"
            dst = f"model.layers.{i}"
            for n in ["input_layernorm.weight",
                      "self_attn.q_proj.weight", "self_attn.k_proj.weight",
                      "self_attn.v_proj.weight", "self_attn.o_proj.weight",
                      "post_attention_layernorm.weight",
                      "mlp.gate_proj.weight", "mlp.up_proj.weight",
                      "mlp.down_proj.weight"]:
                wt(f"{dst}.{n}", sd[f"{src}.{n}"])
        wt("model.norm.weight", sd["model.text_model.norm.weight"])
        wt("lm_head.weight", sd["lm_head.weight"])

        # vision tower with converter names (fc1->fc0, fc2->fc1,
        # out_proj->o_proj, post_layernorm->final_layernorm)
        vm = "model.vision_model"
        wt("vision_model.embeddings.patch_embedding.weight",
           sd[f"{vm}.embeddings.patch_embedding.weight"])
        wt("vision_model.embeddings.patch_embedding.bias",
           sd[f"{vm}.embeddings.patch_embedding.bias"])
        wt("vision_model.embeddings.position_embedding.weight",
           sd[f"{vm}.embeddings.position_embedding.weight"])
        wt("vision_model.final_layernorm.weight",
           sd[f"{vm}.post_layernorm.weight"])
        wt("vision_model.final_layernorm.bias",
           sd[f"{vm}.post_layernorm.bias"])
        for i in range(VL):
            src = f"{vm}.encoder.layers.{i}"
            dst = f"vision_model.encoder.layers.{i}"
            for a, b in [("self_attn.q_proj", "self_attn.q_proj"),
                         ("self_attn.k_proj", "self_attn.k_proj"),
                         ("self_attn.v_proj", "self_attn.v_proj"),
                         ("self_attn.out_proj", "self_attn.o_proj"),
                         ("mlp.fc1", "mlp.fc0"), ("mlp.fc2", "mlp.fc1"),
                         ("layer_norm1", "layer_norm1"),
                         ("layer_norm2", "layer_norm2")]:
                wt(f"{dst}.{b}.weight", sd[f"{src}.{a}.weight"])
                wt(f"{dst}.{b}.bias", sd[f"{src}.{a}.bias"])
        wt("multi_modal_projector.proj.weight",
           sd["model.connector.modality_projection.proj.weight"])
    return hf


def test_smolvlm_tower_golden(tmp_path):
    path = str(tmp_path / "tiny_svlm.bin")
    hf = make_tiny_smolvlm(path)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.vis_cfg is not None
    assert model.image_token_count() == (IMG // PATCH // SF) ** 2

    rng = np.random.default_rng(3)
    px = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        hid = hf.model.vision_model(
            torch.from_numpy(px)).last_hidden_state
        ref = hf.model.connector(hid).numpy()          # [1, N, lm_hidden]
    ours = np.asarray(model.encode_images(np.transpose(px, (0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref.reshape(-1, HID),
                               atol=2e-4, rtol=2e-4)


def test_smolvlm_chat_image(tmp_path):
    from PIL import Image

    from chatllm_tpu.runtime.generate import GenerationConfig

    path = str(tmp_path / "tiny_svlm2.bin")
    make_tiny_smolvlm(path)
    model = load_model(path, RuntimeConfig(**RT32))
    img = Image.fromarray(
        (np.random.default_rng(0).random((40, 56, 3)) * 255).astype(np.uint8))
    reply = model.chat_image(img, "describe",
                             GenerationConfig(do_sample=False,
                                              max_new_tokens=4))
    assert isinstance(reply, str)
