"""GLM-4V HF-golden tests: bicubic pos-embed tower, chunked partial-rotary
M-RoPE LLM forward, chat_image flow (reference models/glm_vl.cpp; converter
GLM4VConverter convert.py:4152)."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")

VOCAB = 300
HIDDEN, HEADS, KV, LAYERS, INTER = 64, 4, 2, 2, 96
ROPE_DIM = 8                        # partial_rotary_factor 0.5 × head_dim 16
MROPE = [2, 1, 1]                   # sums to ROPE_DIM//2
V_HIDDEN, V_HEADS, V_DEPTH, V_INTER, PATCH = 32, 2, 2, 48, 4
MERGE, REF_SIZE = 2, 16             # 4×4 learned pos grid

EOS = 256                           # <|endoftext|>
BOI, EOI, IMG_PAD = 266, 267, 268


def _pieces():
    from chatllm_tpu.tokenizer.processor import byte_level_encode

    pieces = [byte_level_encode(bytes([b])) for b in range(256)]
    specials = [b"<|endoftext|>", b"[MASK]", b"[gMASK]", b"[sMASK]",
                b"<sop>", b"<eop>", b"<|system|>", b"<|user|>",
                b"<|assistant|>", b"<|observation|>", b"<|begin_of_image|>",
                b"<|end_of_image|>", b"<|image|>", b"<|begin_of_video|>",
                b"<|end_of_video|>"]
    pieces += specials
    pieces += [f"<x{i}>".encode() for i in range(VOCAB - len(pieces))]
    return pieces


def _permute_pair_rope_nope(w, n_head, rope_dim):
    """convert.py:6247 — rope dims pair→NeoX reorder, nope dims untouched."""
    hd = w.shape[0] // n_head
    r = w.reshape(n_head, hd, *w.shape[1:])
    rot, other = r[:, :rope_dim], r[:, rope_dim:]
    rot = rot.reshape(n_head, rope_dim // 2, 2, *w.shape[1:]
                      ).swapaxes(1, 2).reshape(rot.shape)
    return np.concatenate([rot, other], axis=1).reshape(w.shape)


def make_tiny_glm4v(path):
    torch.manual_seed(13)
    cfg = transformers.Glm4vConfig(
        text_config=dict(
            vocab_size=VOCAB, hidden_size=HIDDEN, num_attention_heads=HEADS,
            num_key_value_heads=KV, num_hidden_layers=LAYERS,
            intermediate_size=INTER, max_position_embeddings=256,
            rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
            attention_bias=False, partial_rotary_factor=0.5,
            rope_scaling={"rope_type": "default", "mrope_section": MROPE,
                          "partial_rotary_factor": 0.5}),
        vision_config=dict(
            depth=V_DEPTH, hidden_size=V_HIDDEN, intermediate_size=V_INTER,
            num_heads=V_HEADS, patch_size=PATCH, spatial_merge_size=MERGE,
            temporal_patch_size=2, out_hidden_size=HIDDEN,
            image_size=REF_SIZE, rms_norm_eps=1e-5, attention_bias=False),
        image_token_id=IMG_PAD, video_start_token_id=269,
        video_end_token_id=270, image_start_token_id=BOI,
        image_end_token_id=EOI)
    hf = transformers.Glm4vForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    meta = {
        "model_name": "tiny-glm4v",
        "config.json": {
            "model_type": "glm4v",
            "vision_config": {
                "model_type": "glm4v_vision",
                "depth": V_DEPTH, "hidden_size": V_HIDDEN,
                "intermediate_size": V_INTER, "num_heads": V_HEADS,
                "patch_size": PATCH, "spatial_merge_size": MERGE,
                "temporal_patch_size": 2, "out_hidden_size": HIDDEN,
                "image_size": REF_SIZE, "rms_norm_eps": 1e-5,
            },
        },
        "preprocessor_config.json": {
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
        },
    }
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.GLM4V), 1, meta=meta)
        # dump_llama_like_config + {n_kv, attn_bias, rope_dim} + theta +
        # mrope_section[4] (convert.py:4200-4228)
        w.write_config([int(GGMLType.F32), VOCAB, HIDDEN, HEADS, LAYERS,
                        INTER, 256, -1, EOS, -1, -1, KV, 0, ROPE_DIM],
                       fmt="14i")
        f.write(struct.pack("<f", 10000.0))
        f.write(struct.pack("<4i", *(MROPE + [0])))
        w._patch_offset(12)
        w.write_vocab_bpe([(p, 1) for p in _pieces()], [])

        # text (GLM4Converter names; q/k rope-dims permuted pair→NeoX)
        def t(name):
            return sd["model.language_model." + name]

        w.write_tensor("model.embed_tokens.weight",
                       t("embed_tokens.weight"), GGMLType.F32)
        for i in range(LAYERS):
            pfx = f"layers.{i}"
            for n in ("input_layernorm.weight",
                      "post_attention_layernorm.weight",
                      "post_self_attn_layernorm.weight",
                      "post_mlp_layernorm.weight",
                      "self_attn.v_proj.weight", "self_attn.o_proj.weight"):
                w.write_tensor(f"model.{pfx}.{n}", t(f"{pfx}.{n}"),
                               GGMLType.F32)
            for n in ("self_attn.q_proj.weight", "self_attn.k_proj.weight"):
                nh = HEADS if "q_proj" in n else KV
                w.write_tensor(f"model.{pfx}.{n}",
                               _permute_pair_rope_nope(t(f"{pfx}.{n}"), nh,
                                                       ROPE_DIM), GGMLType.F32)
            gu = t(f"{pfx}.mlp.gate_up_proj.weight")
            w.write_tensor(f"model.{pfx}.mlp.gate_proj.weight",
                           gu[:INTER], GGMLType.F32)
            w.write_tensor(f"model.{pfx}.mlp.up_proj.weight",
                           gu[INTER:], GGMLType.F32)
            w.write_tensor(f"model.{pfx}.mlp.down_proj.weight",
                           t(f"{pfx}.mlp.down_proj.weight"), GGMLType.F32)
        w.write_tensor("model.norm.weight", t("norm.weight"), GGMLType.F32)
        w.write_tensor("lm_head.weight", sd["lm_head.weight"], GGMLType.F32)

        # vision (GLM4VConverter: blocks→layers, qkv split, proj→o_proj)
        def v(name):
            return sd["model.visual." + name]

        pe = v("patch_embed.proj.weight")               # [h, 3, 2, p, p]
        w.write_tensor("visual.patch_embed.proj.0.weight", pe[:, :, 0],
                       GGMLType.F32)
        w.write_tensor("visual.patch_embed.proj.1.weight", pe[:, :, 1],
                       GGMLType.F32)
        w.write_tensor("visual.patch_embed.proj.bias",
                       v("patch_embed.proj.bias"), GGMLType.F32)
        for n in ("post_conv_layernorm.weight", "post_layernorm.weight",
                  "downsample.weight", "downsample.bias",
                  "embeddings.position_embedding.weight",
                  "merger.proj.weight", "merger.post_projection_norm.weight",
                  "merger.post_projection_norm.bias", "merger.gate_proj.weight",
                  "merger.up_proj.weight", "merger.down_proj.weight"):
            w.write_tensor(f"visual.{n}", v(n), GGMLType.F32)
        for i in range(V_DEPTH):
            qkv = v(f"blocks.{i}.attn.qkv.weight")
            q, k, vv = np.split(qkv, 3, axis=0)
            w.write_tensor(f"visual.layers.{i}.attn.q_proj.weight", q,
                           GGMLType.F32)
            w.write_tensor(f"visual.layers.{i}.attn.k_proj.weight", k,
                           GGMLType.F32)
            w.write_tensor(f"visual.layers.{i}.attn.v_proj.weight", vv,
                           GGMLType.F32)
            w.write_tensor(f"visual.layers.{i}.attn.o_proj.weight",
                           v(f"blocks.{i}.attn.proj.weight"), GGMLType.F32)
            for n in ("norm1.weight", "norm2.weight", "mlp.gate_proj.weight",
                      "mlp.up_proj.weight", "mlp.down_proj.weight"):
                w.write_tensor(f"visual.layers.{i}.{n}",
                               v(f"blocks.{i}.{n}"), GGMLType.F32)
    return hf


def _hf_pixel_values(frames, gh, gw):
    p, m = PATCH, MERGE
    x = frames.transpose(0, 3, 1, 2)
    x = x.reshape(1, 2, 3, gh // m, m, p, gw // m, m, p)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return x.reshape(gh * gw, 3 * 2 * p * p)


@pytest.fixture(scope="module")
def g4v(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("g4v") / "tiny_glm4v.bin")
    hf = make_tiny_glm4v(path)
    model = load_model(path, RuntimeConfig(**RT32))
    return hf, model


def test_tokenizer_specials(g4v):
    _, model = g4v
    tok = model.tokenizer
    assert tok.begin_of_image_id == BOI
    assert tok.end_of_image_id == EOI
    assert tok.user_token_id == 263


def test_vision_tower_golden(g4v):
    """Bicubic pos-embed interpolation (non-square grid ≠ ref grid) +
    downsample/merger vs HF visual."""
    import jax.numpy as jnp

    from chatllm_tpu.nn.glm_vit import glm_vit_forward

    hf, model = g4v
    gh, gw = 6, 4
    rng = np.random.default_rng(7)
    frames = rng.standard_normal((2, gh * PATCH, gw * PATCH, 3)).astype(np.float32)

    mine = np.asarray(glm_vit_forward(model.vis_cfg, model.vis_params,
                                      jnp.asarray(frames), gh, gw))
    pv = torch.from_numpy(_hf_pixel_values(frames, gh, gw))
    with torch.no_grad():
        ref = hf.model.visual(pv, grid_thw=torch.tensor([[1, gh, gw]])).numpy()
    assert mine.shape == ref.shape
    err = np.linalg.norm(mine - ref) / max(np.linalg.norm(ref), 1e-9)
    assert err < 2e-3, err


def test_glm_mrope_logits_golden(g4v):
    """Full multimodal forward: spliced image embeds + GLM 3-D positions
    (t, t+h, t+w) vs the HF model."""
    import jax.numpy as jnp

    from chatllm_tpu.models.glm_vl import build_glm_3d_pos
    from chatllm_tpu.nn.glm_vit import glm_vit_forward
    from chatllm_tpu.nn.transformer import embed_tokens, init_cache, \
        transformer_forward

    hf, model = g4v
    gh, gw = 4, 4
    rng = np.random.default_rng(8)
    frames = rng.standard_normal((2, gh * PATCH, gw * PATCH, 3)).astype(np.float32)
    media = glm_vit_forward(model.vis_cfg, model.vis_params,
                            jnp.asarray(frames), gh, gw)
    n_img = (gh // MERGE) * (gw // MERGE)

    pre = [5, 77, 101, BOI]
    mid = [EOI, 9, 42, 7]
    ids = pre + [IMG_PAD] * n_img + mid

    emb_pre = embed_tokens(model.cfg, model.params, jnp.asarray([pre], jnp.int32))[0]
    emb_mid = embed_tokens(model.cfg, model.params, jnp.asarray([mid], jnp.int32))[0]
    embeds = jnp.concatenate([emb_pre, media.astype(emb_pre.dtype), emb_mid],
                             axis=0)[None]
    positions, t_next = build_glm_3d_pos(
        [("text", len(pre)), ("image", (gh // MERGE, gw // MERGE)),
         ("text", len(mid))])
    assert t_next == len(pre) + max(gh, gw) // MERGE + len(mid)

    cache = init_cache(model.cfg, 1, 64)
    logits, _ = transformer_forward(
        model.cfg, model.params, None, cache, 0,
        positions=jnp.asarray(positions)[:, None, :], input_embeds=embeds)

    pv = torch.from_numpy(_hf_pixel_values(frames, gh, gw))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]), pixel_values=pv,
                 image_grid_thw=torch.tensor([[1, gh, gw]])).logits[0].numpy()
    mine = np.asarray(logits)[0, :len(ids)]
    np.testing.assert_allclose(mine, ref, atol=3e-3, rtol=3e-3)


def test_chat_image_smoke(g4v):
    from PIL import Image

    from chatllm_tpu.runtime.generate import GenerationConfig

    _, model = g4v
    img = Image.fromarray(
        (np.random.default_rng(2).random((24, 32, 3)) * 255).astype(np.uint8))
    reply = model.chat_image(img, "hi",
                             GenerationConfig(do_sample=False, max_new_tokens=4))
    assert isinstance(reply, str)
    assert model.engine.pos_delta == 0
