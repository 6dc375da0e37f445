"""Qwen3-VL HF-golden tests: learned-pos-embed ViT tower with DeepStack
taps, interleaved M-RoPE LLM forward with deepstack residual injection,
and the chat_image flow (reference models/qwen.cpp v3_vl :2491-2776;
converter Qwen3VLConverter convert.py:5707)."""
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
HIDDEN, HEADS, KV, LAYERS, INTER, HEAD_DIM = 64, 4, 2, 2, 96, 16
V_HIDDEN, V_HEADS, V_DEPTH, V_INTER, PATCH = 32, 2, 3, 48, 4
MERGE = 2
N_POS = 16                       # 4x4 learned pos-embed grid
DS_IDX = (0, 1)                  # deepstack taps
MROPE = [4, 2, 2]                # sums to head_dim//2


def _pieces():
    from chatllm_tpu.tokenizer.processor import byte_level_encode

    pieces = [byte_level_encode(bytes([b])) for b in range(256)]
    specials = [b"<|endoftext|>", b"<|im_start|>", b"<|im_end|>",
                b"<|vision_start|>", b"<|vision_end|>", b"<|image_pad|>",
                b"<|video_pad|>"]
    pieces += specials
    pieces += [f"<x{i}>".encode() for i in range(VOCAB - len(pieces))]
    return pieces, {s.decode(): 256 + i for i, s in enumerate(specials)}


def make_tiny_qwen3vl(path):
    torch.manual_seed(11)
    _, sp = _pieces()
    cfg = transformers.Qwen3VLConfig(
        text_config=dict(
            vocab_size=VOCAB, hidden_size=HIDDEN, num_attention_heads=HEADS,
            num_key_value_heads=KV, num_hidden_layers=LAYERS,
            intermediate_size=INTER, head_dim=HEAD_DIM,
            max_position_embeddings=256, rope_theta=10000.0,
            rms_norm_eps=1e-6, tie_word_embeddings=False,
            rope_scaling={"rope_type": "default", "mrope_section": MROPE,
                          "mrope_interleaved": True}),
        vision_config=dict(
            depth=V_DEPTH, hidden_size=V_HIDDEN, intermediate_size=V_INTER,
            num_heads=V_HEADS, patch_size=PATCH, spatial_merge_size=MERGE,
            temporal_patch_size=2, out_hidden_size=HIDDEN,
            num_position_embeddings=N_POS,
            deepstack_visual_indexes=list(DS_IDX),
            hidden_act="gelu_pytorch_tanh"),
        image_token_id=sp["<|image_pad|>"],
        video_token_id=sp["<|video_pad|>"],
        vision_start_token_id=sp["<|vision_start|>"],
        vision_end_token_id=sp["<|vision_end|>"])
    hf = transformers.Qwen3VLForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    sd = {k.replace("model.language_model.", "model.")
           .replace("model.visual.", "visual."): v for k, v in sd.items()}

    meta = {
        "model_name": "tiny-qwen3vl",
        "config.json": {
            "model_type": "qwen3_vl",
            "vision_config": {
                "depth": V_DEPTH, "hidden_size": V_HIDDEN,
                "intermediate_size": V_INTER, "num_heads": V_HEADS,
                "patch_size": PATCH, "spatial_merge_size": MERGE,
                "temporal_patch_size": 2,
                "num_position_embeddings": N_POS,
                "deepstack_visual_indexes": list(DS_IDX),
            },
        },
        "preprocessor_config.json": {
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
            "merge_size": MERGE, "min_pixels": 64, "max_pixels": 4096,
        },
    }
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.QWEN3_VL), 1, meta=meta)
        # v3 Config (models/qwen.h:746) + mrope_section[4] (qwen.cpp:2491)
        w.write_config([int(GGMLType.F32), VOCAB, HIDDEN, HEADS, LAYERS,
                        INTER, 256, -1, 0, -1, -1, KV, HEAD_DIM], fmt="13i")
        f.write(struct.pack("<ff", 10000.0, -1.0))
        f.write(struct.pack("<6i", -1, 0, -1, -1, -1, 0))
        f.write(struct.pack("<i", 0))                   # tie
        f.write(struct.pack("<128i", *([0] * 128)))
        f.write(struct.pack("<4i", *(MROPE + [0])))
        w._patch_offset(12)
        pieces, _ = _pieces()
        w.write_vocab_bpe([(p, 1) for p in pieces], [])

        names = ["model.embed_tokens.weight"]
        for i in range(LAYERS):
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

        # vision tower with converter transforms (convert.py:5711-5742)
        pe = sd["visual.patch_embed.proj.weight"]       # [h, 3, 2, p, p]
        w.write_tensor("visual.patch_embed.proj.0.weight", pe[:, :, 0],
                       GGMLType.F32)
        w.write_tensor("visual.patch_embed.proj.1.weight", pe[:, :, 1],
                       GGMLType.F32)
        w.write_tensor("visual.patch_embed.proj.bias",
                       sd["visual.patch_embed.proj.bias"], GGMLType.F32)
        w.write_tensor("visual.pos_embed.weight",
                       sd["visual.pos_embed.weight"], GGMLType.F32)
        for i in range(V_DEPTH):
            pfx = f"visual.blocks.{i}"
            for part in ("weight", "bias"):
                qkv = sd[f"{pfx}.attn.qkv.{part}"]
                q, k, v = np.split(qkv, 3, axis=0)
                w.write_tensor(f"{pfx}.attn.q_proj.{part}", q, GGMLType.F32)
                w.write_tensor(f"{pfx}.attn.k_proj.{part}", k, GGMLType.F32)
                w.write_tensor(f"{pfx}.attn.v_proj.{part}", v, GGMLType.F32)
            for n in ("attn.proj.weight", "attn.proj.bias",
                      "norm1.weight", "norm1.bias",
                      "norm2.weight", "norm2.bias"):
                w.write_tensor(f"{pfx}.{n}", sd[f"{pfx}.{n}"], GGMLType.F32)
            for ours, hfname in (("mlp.fc0", "mlp.linear_fc1"),
                                 ("mlp.fc1", "mlp.linear_fc2")):
                for part in ("weight", "bias"):
                    w.write_tensor(f"{pfx}.{ours}.{part}",
                                   sd[f"{pfx}.{hfname}.{part}"], GGMLType.F32)
        for mp in ["merger."] + [f"deepstack_merger_list.{j}."
                                 for j in range(len(DS_IDX))]:
            for part in ("weight", "bias"):
                w.write_tensor(f"visual.{mp}norm.{part}",
                               sd[f"visual.{mp}norm.{part}"], GGMLType.F32)
                for ours, hfname in (("mlp.fc0", "linear_fc1"),
                                     ("mlp.fc1", "linear_fc2")):
                    w.write_tensor(f"visual.{mp}{ours}.{part}",
                                   sd[f"visual.{mp}{hfname}.{part}"],
                                   GGMLType.F32)
    return hf, sp


def _hf_pixel_values(frames, gh, gw):
    """frames [2, H, W, 3] -> HF flattened patches [gh*gw, 3*2*p*p]
    (merge-block raster order, Qwen2VLImageProcessor._preprocess)."""
    p, m = PATCH, MERGE
    x = frames.transpose(0, 3, 1, 2)                    # [T, C, H, W]
    x = x.reshape(1, 2, 3, gh // m, m, p, gw // m, m, p)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return x.reshape(gh * gw, 3 * 2 * p * p)


@pytest.fixture(scope="module")
def vl3(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("q3vl") / "tiny_qwen3vl.bin")
    hf, sp = make_tiny_qwen3vl(path)
    model = load_model(path, RuntimeConfig(**RT32))
    return hf, sp, model


def test_vision_tower_golden(vl3):
    """Bilinear pos-embed interpolation + full attention + deepstack taps
    vs HF visual (non-square grid so interpolation is exercised)."""
    import jax.numpy as jnp

    from chatllm_tpu.nn.qwen_vit import grid_layout, qwen3_vit_forward

    hf, sp, model = vl3
    gh, gw = 6, 4
    rng = np.random.default_rng(5)
    frames = rng.standard_normal((2, gh * PATCH, gw * PATCH, 3)).astype(np.float32)

    layout = grid_layout(model.vis_cfg, gh, gw)
    mine, ds = qwen3_vit_forward(model.vis_cfg, model.vis_params,
                                 jnp.asarray(frames), layout, gh, gw)
    mine = np.asarray(mine)

    pv = torch.from_numpy(_hf_pixel_values(frames, gh, gw))
    grid = torch.tensor([[1, gh, gw]])
    with torch.no_grad():
        ref, ref_ds = hf.model.visual(pv, grid_thw=grid)
    ref = ref.numpy()
    assert mine.shape == ref.shape
    err = np.linalg.norm(mine - ref) / max(np.linalg.norm(ref), 1e-9)
    assert err < 2e-3, err
    assert len(ds) == len(ref_ds) == len(DS_IDX)
    for d, rd in zip(ds, ref_ds):
        e = np.linalg.norm(np.asarray(d) - rd.numpy()) / \
            max(np.linalg.norm(rd.numpy()), 1e-9)
        assert e < 2e-3, e


def test_imrope_deepstack_logits_golden(vl3):
    """Full multimodal forward: spliced image embeddings, interleaved
    M-RoPE positions, deepstack residuals vs the HF model."""
    import jax.numpy as jnp

    from chatllm_tpu.models.qwen_vl import build_3d_pos
    from chatllm_tpu.nn.qwen_vit import grid_layout, qwen3_vit_forward
    from chatllm_tpu.nn.transformer import embed_tokens, init_cache, \
        transformer_forward

    hf, sp, model = vl3
    gh, gw = 4, 4
    rng = np.random.default_rng(6)
    frames = rng.standard_normal((2, gh * PATCH, gw * PATCH, 3)).astype(np.float32)

    layout = grid_layout(model.vis_cfg, gh, gw)
    media, ds = qwen3_vit_forward(model.vis_cfg, model.vis_params,
                                  jnp.asarray(frames), layout, gh, gw)
    n_img = (gh // MERGE) * (gw // MERGE)

    pre = [5, 77, 101, sp["<|vision_start|>"]]
    mid = [sp["<|vision_end|>"], 9, 42, 7]
    ids = pre + [sp["<|image_pad|>"]] * n_img + mid

    emb_pre = embed_tokens(model.cfg, model.params, jnp.asarray([pre], jnp.int32))[0]
    emb_mid = embed_tokens(model.cfg, model.params, jnp.asarray([mid], jnp.int32))[0]
    embeds = jnp.concatenate([emb_pre, media.astype(emb_pre.dtype), emb_mid],
                             axis=0)[None]
    T = len(ids)
    er = model._deepstack_residuals(ds, len(pre), T)
    assert er.shape == (len(DS_IDX), 1, T, HIDDEN)

    positions, t_next = build_3d_pos(
        [("text", len(pre)), ("image", (gh // MERGE, gw // MERGE)),
         ("text", len(mid))])
    cache = init_cache(model.cfg, 1, 64)
    logits, _ = transformer_forward(
        model.cfg, model.params, None, cache, 0,
        positions=jnp.asarray(positions)[:, None, :], input_embeds=embeds,
        extra_residuals=er)

    pv = torch.from_numpy(_hf_pixel_values(frames, gh, gw))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]), pixel_values=pv,
                 image_grid_thw=torch.tensor([[1, gh, gw]])).logits[0].numpy()
    mine = np.asarray(logits)[0, :T]
    np.testing.assert_allclose(mine, ref, atol=3e-3, rtol=3e-3)


def test_chat_image_smoke(vl3):
    from PIL import Image

    from chatllm_tpu.runtime.generate import GenerationConfig

    _, _, model = vl3
    img = Image.fromarray(
        (np.random.default_rng(1).random((24, 32, 3)) * 255).astype(np.uint8))
    reply = model.chat_image(img, "hi",
                             GenerationConfig(do_sample=False, max_new_tokens=4))
    assert isinstance(reply, str)
    assert model.engine.pos_delta == 0


def test_interleaved_mrope_axis_ids():
    """Interleaved layout [THWTHW...T] with H/W capped at 3*section and
    T filling the tail (HF apply_interleaved_mrope)."""
    from chatllm_tpu.ops.rope import RopeConfig, mrope_axis_ids

    cfg = RopeConfig(head_dim=16, mrope_sections=(4, 2, 2),
                     mrope_interleaved=True)
    ids = list(mrope_axis_ids(cfg))
    assert ids == [0, 1, 2, 0, 1, 2, 0, 0]
