"""InternVL end-to-end: tiny synthetic Qwen3 LLM + InternViT tower,
image → tiles → vit → pixel-shuffle → projector → spliced prompt → generate."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
PIL = pytest.importorskip("PIL")


def make_tiny_internvl(path, *, vocab=300, hidden=64, vis_hidden=32,
                       vis_layers=2, vis_heads=2, vis_inter=64,
                       patch=8, image_size=32):
    from test_model_golden import _bpe_pieces, make_tiny_qwen3

    rng = np.random.default_rng(13)
    # write a qwen3 base file content manually with INTERN_VL model type
    from chatllm_tpu.ggmm.writer import GGMMWriter

    torch.manual_seed(2)
    heads, kv, layers, inter, head_dim, max_len = 4, 2, 2, 96, 16, 256
    cfg = transformers.Qwen3Config(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=layers,
        intermediate_size=inter, head_dim=head_dim,
        max_position_embeddings=max_len, rope_theta=10000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False, attention_bias=False)
    hf = transformers.Qwen3ForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    meta = {
        "model_name": "tiny-internvl",
        "config.json": {
            "vision_config": {
                "hidden_size": vis_hidden, "num_hidden_layers": vis_layers,
                "num_attention_heads": vis_heads,
                "intermediate_size": vis_inter, "patch_size": patch,
                "image_size": image_size, "num_channels": 3,
            },
            "downsample_ratio": 0.5,
            "use_thumbnail": True,
            "template": "internvl2_5",
        },
    }
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.INTERN_VL), 1, meta=meta)
        vals = [int(GGMLType.F32), vocab, hidden, heads, layers, inter, max_len,
                -1, 0, -1, -1, kv, head_dim]
        w.write_config(vals, fmt="13i")
        f.write(struct.pack("<ff", 10000.0, -1.0))
        f.write(struct.pack("<6i", -1, 0, -1, -1, -1, 0))
        f.write(struct.pack("<i", 0))
        f.write(struct.pack("<128i", *([0] * 128)))
        w._patch_offset(12)
        pieces = _bpe_pieces(256) + [b"<img>", b"</img>", b"<|im_start|>",
                                     b"<|im_end|>", b"<|endoftext|>"]
        pieces += [f"<pad{i}>".encode() for i in range(vocab - len(pieces))]
        w.write_vocab_bpe([(p, 1) for p in pieces], [])
        names = ["model.embed_tokens.weight"]
        for i in range(layers):
            names += [f"model.layers.{i}.{n}" for n in [
                "input_layernorm.weight",
                "self_attn.q_proj.weight", "self_attn.k_proj.weight",
                "self_attn.v_proj.weight", "self_attn.o_proj.weight",
                "self_attn.q_norm.weight", "self_attn.k_norm.weight",
                "post_attention_layernorm.weight",
                "mlp.gate_proj.weight", "mlp.up_proj.weight",
                "mlp.down_proj.weight"]]
        names += ["model.norm.weight", "lm_head.weight"]
        for n in names:
            w.write_tensor(n, sd[n], GGMLType.F32)

        # vision tower (random weights, converter names)
        def wt(name, shape):
            w.write_tensor(name, rng.standard_normal(shape).astype(np.float32) * 0.05,
                           GGMLType.F32)

        n_patches = (image_size // patch) ** 2
        wt("visual.embeddings.class_embedding", (vis_hidden,))
        wt("visual.embeddings.patch_embedding.weight", (vis_hidden, 3, patch, patch))
        wt("visual.embeddings.patch_embedding.bias", (vis_hidden,))
        wt("visual.embeddings.position_embedding", (1, n_patches + 1, vis_hidden))
        for i in range(vis_layers):
            pfx = f"visual.layers.{i}"
            for n, shape in [("self_attn.q_proj", (vis_hidden, vis_hidden)),
                             ("self_attn.k_proj", (vis_hidden, vis_hidden)),
                             ("self_attn.v_proj", (vis_hidden, vis_hidden)),
                             ("self_attn.o_proj", (vis_hidden, vis_hidden)),
                             ("mlp.fc1", (vis_inter, vis_hidden)),
                             ("mlp.fc2", (vis_hidden, vis_inter))]:
                wt(f"{pfx}.{n}.weight", shape)
                wt(f"{pfx}.{n}.bias", (shape[0],))
            for n in ("norm1", "norm2"):
                wt(f"{pfx}.{n}.weight", (vis_hidden,))
                wt(f"{pfx}.{n}.bias", (vis_hidden,))
            wt(f"{pfx}.ls1", (vis_hidden,))
            wt(f"{pfx}.ls2", (vis_hidden,))
        ratio = 4  # (1/0.5)^2
        wt("vision_projector.0.weight", (vis_hidden * ratio,))
        wt("vision_projector.0.bias", (vis_hidden * ratio,))
        wt("vision_projector.1.weight", (hidden, vis_hidden * ratio))
        wt("vision_projector.1.bias", (hidden,))
        wt("vision_projector.3.weight", (hidden, hidden))
        wt("vision_projector.3.bias", (hidden,))


def test_internvl_chat_image(tmp_path):
    from PIL import Image

    path = str(tmp_path / "tiny_ivl.bin")
    make_tiny_internvl(path)
    rt = RuntimeConfig(weight_dtype="float32", compute_dtype="float32",
                       cache_dtype="float32")
    model = load_model(path, rt)
    assert model.vis_cfg is not None
    assert model.image_token_count() == (32 // 8 // 2) ** 2  # 4

    img = Image.fromarray(
        (np.random.default_rng(0).random((48, 64, 3)) * 255).astype(np.uint8))
    from chatllm_tpu.runtime.generate import GenerationConfig

    reply = model.chat_image(img, "what is this?",
                             GenerationConfig(do_sample=False, max_new_tokens=4),
                             max_tiles=2)
    assert isinstance(reply, str)


def test_internvl_encode_images_shape(tmp_path):
    path = str(tmp_path / "tiny_ivl2.bin")
    make_tiny_internvl(path)
    model = load_model(path, RuntimeConfig(weight_dtype="float32",
                                           compute_dtype="float32"))
    tiles = np.random.default_rng(1).standard_normal((3, 32, 32, 3)).astype(np.float32)
    emb = np.asarray(model.encode_images(tiles))
    assert emb.shape == (3 * 4, 64)
