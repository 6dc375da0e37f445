"""Converter wave 7b: the VL tail (Kimi/LocateAnything/dots/Step/Youtu/
Penguin/PaddleOCR/NEOChat/InternVL-chat/GLM-OCR) + Gemma4/Gemma4Unified."""
import json

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.reader import GGMMFile
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model
from chatllm_tpu.tools.convert import convert

torch = pytest.importorskip("torch")

RT32 = dict(weight_dtype="float32", compute_dtype="float32",
            cache_dtype="float32")
RNG = np.random.default_rng(99)
IDS = (5, 9, 23, 71, 112, 7)


def _t(*shape, scale=0.1):
    return (RNG.standard_normal(shape) * scale).astype(np.float32)


def _ones(n):
    return np.ones(n, np.float32)


def _save_hf(tmp_path, sd, cfg, name="hf"):
    from test_convert_wave7 import _save_hf as save

    return save(tmp_path, sd, cfg, name=name)


def _logits(m, ids=IDS):
    a = np.array([list(ids)], dtype=np.int32)
    l, _ = m.forward_logits(a)
    return np.asarray(l)[0]


# LLM geometry shared by the qwen3-based archs
V, H, HEADS, KV, INTER, HD = 262, 64, 4, 2, 96, 16


def _qwen3_txt_cfg(**kw):
    d = {"vocab_size": V, "hidden_size": H, "num_attention_heads": HEADS,
         "num_key_value_heads": KV, "num_hidden_layers": 1,
         "intermediate_size": INTER, "max_position_embeddings": 256,
         "head_dim": HD, "rope_theta": 10000.0, "tie_word_embeddings": False,
         "bos_token_id": -1, "eos_token_id": 0}
    d.update(kw)
    return d


def _qwen3_sd(prefix=""):
    from test_convert_wave7 import _qwen3_llm_sd

    return _qwen3_llm_sd(prefix=prefix, V=V, H=H, L=1)


# ---------------------------------------------------------------------------
# MoonViT pair
# ---------------------------------------------------------------------------

def _moonvit_hf_sd(vh=32, depth=2, inter=48, patch=4, pos=8):
    """HF names: vision_tower.encoder.blocks with fused wqkv + wo."""
    sd = {}
    for i in range(depth):
        p = f"vision_tower.encoder.blocks.{i}"
        sd[f"{p}.wqkv.weight"] = _t(3 * vh, vh)
        sd[f"{p}.wqkv.bias"] = _t(3 * vh)
        sd[f"{p}.wo.weight"] = _t(vh, vh)
        sd[f"{p}.wo.bias"] = _t(vh)
        for n in ("norm0", "norm1"):
            sd[f"{p}.{n}.weight"] = _ones(vh)
            sd[f"{p}.{n}.bias"] = _t(vh)
        sd[f"{p}.mlp.fc0.weight"] = _t(inter, vh)
        sd[f"{p}.mlp.fc0.bias"] = _t(inter)
        sd[f"{p}.mlp.fc1.weight"] = _t(vh, inter)
        sd[f"{p}.mlp.fc1.bias"] = _t(vh)
    sd["vision_tower.encoder.final_layernorm.weight"] = _ones(vh)
    sd["vision_tower.encoder.final_layernorm.bias"] = _t(vh)
    sd["vision_tower.patch_embed.proj.weight"] = _t(vh, 3, patch, patch)
    sd["vision_tower.patch_embed.proj.bias"] = _t(vh)
    sd["vision_tower.patch_embed.pos_emb.weight"] = _t(pos, pos, vh)
    return sd


def _vis_cfg_moonvit(vh=32, depth=2, inter=48, patch=4, pos=8):
    return {"hidden_size": vh, "num_hidden_layers": depth,
            "num_attention_heads": 2, "intermediate_size": inter,
            "patch_size": patch, "init_pos_emb_height": pos,
            "init_pos_emb_width": pos, "merge_kernel_size": [2, 2]}


def test_convert_locate_anything(tmp_path):
    vh = 32
    sd = {}
    # qwen2-style LLM with biases, under language_model.
    base = {"model.embed_tokens.weight": _t(V, H),
            "model.norm.weight": _ones(H), "lm_head.weight": _t(V, H)}
    p = "model.layers.0"
    base[f"{p}.input_layernorm.weight"] = _ones(H)
    base[f"{p}.post_attention_layernorm.weight"] = _ones(H)
    for n, rows in (("q_proj", HEADS * HD), ("k_proj", KV * HD),
                    ("v_proj", KV * HD)):
        base[f"{p}.self_attn.{n}.weight"] = _t(rows, H)
        base[f"{p}.self_attn.{n}.bias"] = _t(rows)
    base[f"{p}.self_attn.o_proj.weight"] = _t(H, HEADS * HD)
    base[f"{p}.mlp.gate_proj.weight"] = _t(INTER, H)
    base[f"{p}.mlp.up_proj.weight"] = _t(INTER, H)
    base[f"{p}.mlp.down_proj.weight"] = _t(H, INTER)
    sd.update({f"language_model.{k}": v for k, v in base.items()})
    tower = _moonvit_hf_sd(vh)
    sd.update(tower)
    m2 = 4 * vh
    sd["mlp1.0.weight"] = _ones(m2)
    sd["mlp1.0.bias"] = _t(m2)
    sd["mlp1.1.weight"] = _t(H, m2)
    sd["mlp1.1.bias"] = _t(H)
    sd["mlp1.3.weight"] = _t(H, H)
    sd["mlp1.3.bias"] = _t(H)
    cfg = {"architectures": ["LocateAnythingForConditionalGeneration"],
           **_qwen3_txt_cfg(num_hidden_layers=1),
           "vision_config": _vis_cfg_moonvit(vh)}
    d = _save_hf(tmp_path, sd, cfg)
    out = str(tmp_path / "locate.bin")
    convert(d, out, "f32")
    gf = GGMMFile.open(out)
    assert gf.model_type == int(ModelType.LocateAnything)
    # fused wqkv split oracle
    got_q = gf.tensor_f32("vision_model.encoder.blocks.0.attn.q_proj.weight")
    np.testing.assert_allclose(
        got_q, tower["vision_tower.encoder.blocks.0.wqkv.weight"][:vh])
    got_k = gf.tensor_f32("vision_model.encoder.blocks.0.attn.k_proj.weight")
    np.testing.assert_allclose(
        got_k, tower["vision_tower.encoder.blocks.0.wqkv.weight"][vh:2 * vh])
    m = load_model(out, RuntimeConfig(**RT32))
    assert getattr(m, "vis_params", None) is not None
    assert _logits(m).shape == (len(IDS), V)


def test_convert_kimi_vl(tmp_path):
    # DSv3-light text config under text_config + MoonViT tower
    vh = 32
    kv_rank, nope, rope_d, v_dim = 16, 8, 8, 8
    sd = {}
    lm = {"model.embed_tokens.weight": _t(V, H),
          "model.norm.weight": _ones(H), "lm_head.weight": _t(V, H)}
    p = "model.layers.0"
    lm[f"{p}.self_attn.kv_a_proj_with_mqa.weight"] = _t(kv_rank + rope_d, H)
    lm[f"{p}.self_attn.kv_a_layernorm.weight"] = _ones(kv_rank)
    lm[f"{p}.self_attn.kv_b_proj.weight"] = _t(HEADS * (nope + v_dim), kv_rank)
    lm[f"{p}.self_attn.q_proj.weight"] = _t(HEADS * (nope + rope_d), H)
    lm[f"{p}.self_attn.o_proj.weight"] = _t(H, HEADS * v_dim)
    lm[f"{p}.input_layernorm.weight"] = _ones(H)
    lm[f"{p}.post_attention_layernorm.weight"] = _ones(H)
    for n in ("gate_proj", "up_proj", "down_proj"):
        shp = (INTER, H) if n != "down_proj" else (H, INTER)
        lm[f"{p}.mlp.{n}.weight"] = _t(*shp)
    sd.update({f"language_model.{k}": v for k, v in lm.items()})
    sd.update(_moonvit_hf_sd(vh))
    m2 = 4 * vh
    sd["multi_modal_projector.pre_norm.weight"] = _ones(vh)
    sd["multi_modal_projector.pre_norm.bias"] = _t(vh)
    sd["multi_modal_projector.linear_1.weight"] = _t(m2, m2)
    sd["multi_modal_projector.linear_1.bias"] = _t(m2)
    sd["multi_modal_projector.linear_2.weight"] = _t(H, m2)
    sd["multi_modal_projector.linear_2.bias"] = _t(H)
    cfg = {"architectures": ["KimiVLForConditionalGeneration"],
           "text_config": {
               "vocab_size": V, "hidden_size": H,
               "num_attention_heads": HEADS, "num_hidden_layers": 1,
               "intermediate_size": INTER, "max_position_embeddings": 128,
               "num_key_value_heads": HEADS,
               "kv_lora_rank": kv_rank, "q_lora_rank": None,
               "qk_nope_head_dim": nope, "qk_rope_head_dim": rope_d,
               "v_head_dim": v_dim, "first_k_dense_replace": 1,
               "moe_layer_freq": 1, "n_group": 1, "n_routed_experts": None,
               "n_shared_experts": None, "num_experts_per_tok": None,
               "norm_topk_prob": False, "rope_theta": 10000.0,
               "bos_token_id": -1, "eos_token_id": 0},
           "vision_config": _vis_cfg_moonvit(vh)}
    d = _save_hf(tmp_path, sd, cfg)
    out = str(tmp_path / "kimi.bin")
    convert(d, out, "f32")
    gf = GGMMFile.open(out)
    assert gf.model_type == int(ModelType.KIMI_VL)
    assert gf.has_tensor("model.layers.0.self_attn.d_kv_proj.weight")
    assert gf.has_tensor("vision_model.patch_embed.pos_emb.weight")
    m = load_model(out, RuntimeConfig(**RT32))
    assert _logits(m).shape == (len(IDS), V)


# ---------------------------------------------------------------------------
# DotsOCR
# ---------------------------------------------------------------------------

def test_convert_dots_ocr(tmp_path):
    import test_dots as T

    vh, vd, vi = T.V_HIDDEN, T.V_DEPTH, T.V_INTER
    sd = {}
    lm = {"model.embed_tokens.weight": _t(V, H),
          "model.norm.weight": _ones(H), "lm_head.weight": _t(V, H)}
    p = "model.layers.0"
    lm[f"{p}.input_layernorm.weight"] = _ones(H)
    lm[f"{p}.post_attention_layernorm.weight"] = _ones(H)
    for n, rows in (("q_proj", HEADS * HD), ("k_proj", KV * HD),
                    ("v_proj", KV * HD)):
        lm[f"{p}.self_attn.{n}.weight"] = _t(rows, H)
        lm[f"{p}.self_attn.{n}.bias"] = _t(rows)
    lm[f"{p}.self_attn.o_proj.weight"] = _t(H, HEADS * HD)
    for n in ("gate_proj", "up_proj", "down_proj"):
        shp = (INTER, H) if n != "down_proj" else (H, INTER)
        lm[f"{p}.mlp.{n}.weight"] = _t(*shp)
    sd.update(lm)
    qkv = _t(3 * vh, vh)
    for i in range(vd):
        p = f"vision_tower.blocks.{i}"
        sd[f"{p}.attn.qkv.weight"] = qkv if i == 0 else _t(3 * vh, vh)
        sd[f"{p}.attn.proj.weight"] = _t(vh, vh)
        sd[f"{p}.mlp.fc1.weight"] = _t(vi, vh)
        sd[f"{p}.mlp.fc3.weight"] = _t(vi, vh)
        sd[f"{p}.mlp.fc2.weight"] = _t(vh, vi)
        sd[f"{p}.norm1.weight"] = _ones(vh)
        sd[f"{p}.norm2.weight"] = _ones(vh)
    m2 = T.MERGE * T.MERGE * vh
    sd["vision_tower.merger.ln_q.weight"] = _ones(vh)
    sd["vision_tower.merger.ln_q.bias"] = _t(vh)
    sd["vision_tower.merger.mlp.0.weight"] = _t(m2, m2)
    sd["vision_tower.merger.mlp.0.bias"] = _t(m2)
    sd["vision_tower.merger.mlp.2.weight"] = _t(H, m2)
    sd["vision_tower.merger.mlp.2.bias"] = _t(H)
    sd["vision_tower.patch_embed.patchifier.proj.weight"] = \
        _t(vh, 3, T.PATCH, T.PATCH)
    sd["vision_tower.patch_embed.patchifier.proj.bias"] = _t(vh)
    sd["vision_tower.patch_embed.patchifier.norm.weight"] = _ones(vh)
    sd["vision_tower.post_trunk_norm.weight"] = _ones(vh)
    cfg = {"architectures": ["DotsOCRForCausalLM"],
           **_qwen3_txt_cfg(),
           "vision_config": {
               "hidden_size": vh, "num_hidden_layers": vd,
               "num_attention_heads": T.V_HEADS, "intermediate_size": vi,
               "patch_size": T.PATCH, "spatial_merge_size": T.MERGE,
               "temporal_patch_size": 1, "rms_norm_eps": 1e-5,
               "post_norm": True, "use_bias": False}}
    d = _save_hf(tmp_path, sd, cfg)
    out = str(tmp_path / "dots.bin")
    convert(d, out, "f32")
    gf = GGMMFile.open(out)
    assert gf.model_type == int(ModelType.DOTS_OCR)
    np.testing.assert_allclose(
        gf.tensor_f32("vision_model.layers.0.attn.q_proj.weight"), qkv[:vh])
    assert gf.has_tensor("vision_model.layers.0.mlp.gate_proj.weight")
    m = load_model(out, RuntimeConfig(**RT32))
    assert _logits(m).shape == (len(IDS), V)


# ---------------------------------------------------------------------------
# StepVL: in_proj split + permute_pair oracle
# ---------------------------------------------------------------------------

def test_convert_step_vl(tmp_path):
    import test_step_vl as T

    vw, vheads, vd, vi = T.V_WIDTH, T.V_HEADS, T.V_DEPTH, T.V_INTER
    sd = _qwen3_sd()
    in_proj_w = _t(3 * vw, vw)
    in_proj_b = _t(3 * vw)
    for i in range(vd):
        p = f"vision_model.transformer.resblocks.{i}"
        sd[f"{p}.attn.in_proj_weight"] = in_proj_w if i == 0 else _t(3 * vw, vw)
        sd[f"{p}.attn.in_proj_bias"] = in_proj_b if i == 0 else _t(3 * vw)
        sd[f"{p}.attn.out_proj.weight"] = _t(vw, vw)
        sd[f"{p}.attn.out_proj.bias"] = _t(vw)
        sd[f"{p}.ls_1.gamma"] = _ones(vw)
        sd[f"{p}.ls_2.gamma"] = _ones(vw)
        for n in ("ln_1", "ln_2"):
            sd[f"{p}.{n}.weight"] = _ones(vw)
            sd[f"{p}.{n}.bias"] = _t(vw)
        sd[f"{p}.mlp.c_fc.weight"] = _t(vi, vw)
        sd[f"{p}.mlp.c_fc.bias"] = _t(vi)
        sd[f"{p}.mlp.c_proj.weight"] = _t(vw, vi)
        sd[f"{p}.mlp.c_proj.bias"] = _t(vw)
    sd["vision_model.positional_embedding"] = \
        _t((T.IMG // T.PATCH) ** 2, vw)
    sd["vision_model.conv1.weight"] = _t(vw, 3, T.PATCH, T.PATCH)
    sd["vision_model.ln_pre.weight"] = _ones(vw)
    sd["vision_model.ln_pre.bias"] = _t(vw)
    sd["vision_model.vit_downsampler1.weight"] = _t(vw * 2, vw, 3, 3)
    sd["vision_model.vit_downsampler1.bias"] = _t(vw * 2)
    sd["vision_model.vit_downsampler2.weight"] = _t(vw * 4, vw * 2, 3, 3)
    sd["vision_model.vit_downsampler2.bias"] = _t(vw * 4)
    sd["vit_large_projector.weight"] = _t(H, vw * 4)
    cfg = {"architectures": ["StepVLForConditionalGeneration"],
           "text_config": _qwen3_txt_cfg(rope_scaling=None),
           "vision_config": {"image_size": T.IMG, "patch_size": T.PATCH,
                             "width": vw, "layers": vd, "heads": vheads,
                             "hidden_act": "quick_gelu"}}
    d = _save_hf(tmp_path, sd, cfg)
    out = str(tmp_path / "step.bin")
    convert(d, out, "f32")
    gf = GGMMFile.open(out)
    assert gf.model_type == int(ModelType.STEP_VL)
    from chatllm_tpu.tools.convert_extra4 import _permute_pair_np

    np.testing.assert_allclose(
        gf.tensor_f32("visual.blocks.0.attn.q_proj.weight"),
        _permute_pair_np(in_proj_w[:vw], vheads))
    np.testing.assert_allclose(
        gf.tensor_f32("visual.blocks.0.attn.v_proj.bias"),
        in_proj_b[2 * vw:])
    m = load_model(out, RuntimeConfig(**RT32))
    assert _logits(m).shape == (len(IDS), V)


# ---------------------------------------------------------------------------
# PenguinVL / InternVLChatModel / NEOChat (qwen3 text + tower renames)
# ---------------------------------------------------------------------------

def test_convert_penguin_vl(tmp_path):
    vh, vd, vi = 32, 1, 48
    sd = {}
    sd.update({f"model.{k[len('model.'):]}" if k.startswith("model.") else k: v
               for k, v in _qwen3_sd().items()})
    for i in range(vd):
        p = f"model.vision_encoder.vision_encoder.encoder.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = _ones(vh)
        sd[f"{p}.post_attention_layernorm.weight"] = _ones(vh)
        for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
            sd[f"{p}.self_attn.{n}.weight"] = _t(vh, vh)
        sd[f"{p}.self_attn.q_norm.weight"] = _ones(16)
        sd[f"{p}.self_attn.k_norm.weight"] = _ones(16)
        for n in ("gate_proj", "up_proj"):
            sd[f"{p}.mlp.{n}.weight"] = _t(vi, vh)
        sd[f"{p}.mlp.down_proj.weight"] = _t(vh, vi)
    sd["model.vision_encoder.vision_encoder.norm.weight"] = _ones(vh)
    sd["model.vision_encoder.vision_encoder.embeddings."
       "patch_embedding.weight"] = _t(vh, 3, 4, 4)
    sd["model.vision_encoder.vision_encoder.embeddings."
       "patch_embedding.bias"] = _t(vh)
    sd["model.vision_projector.readout.0.weight"] = _t(H, vh)
    sd["model.vision_projector.readout.0.bias"] = _t(H)
    sd["model.vision_projector.readout.2.weight"] = _t(H, H)
    sd["model.vision_projector.readout.2.bias"] = _t(H)
    cfg = {"architectures": ["PenguinVLQwen3ForCausalLM"],
           **_qwen3_txt_cfg(),
           "vision_projector_type": "mlp",
           "vision_encoder_config": {
               "hidden_size": vh, "num_hidden_layers": vd,
               "num_attention_heads": 2, "num_key_value_heads": 2,
               "intermediate_size": vi, "patch_size": 4, "head_dim": 16}}
    d = _save_hf(tmp_path, sd, cfg)
    out = str(tmp_path / "penguin.bin")
    convert(d, out, "f32")
    gf = GGMMFile.open(out)
    assert gf.model_type == int(ModelType.PENGUIN_VL)
    assert gf.has_tensor("visual.layers.0.self_attn.q_norm.weight")
    assert gf.has_tensor("vision_projector.readout.0.weight")
    m = load_model(out, RuntimeConfig(**RT32))
    assert _logits(m).shape == (len(IDS), V)


def test_convert_internvl_chat(tmp_path):
    vh, vd, vi = 32, 1, 48
    sd = {f"language_model.{k}": v for k, v in _qwen3_sd().items()}
    qkv = _t(3 * vh, vh)
    for i in range(vd):
        p = f"vision_model.encoder.layers.{i}"
        sd[f"{p}.attn.qkv.weight"] = qkv
        sd[f"{p}.attn.qkv.bias"] = _t(3 * vh)
        sd[f"{p}.attn.proj.weight"] = _t(vh, vh)
        sd[f"{p}.attn.proj.bias"] = _t(vh)
        sd[f"{p}.mlp.fc1.weight"] = _t(vi, vh)
        sd[f"{p}.mlp.fc1.bias"] = _t(vi)
        sd[f"{p}.mlp.fc2.weight"] = _t(vh, vi)
        sd[f"{p}.mlp.fc2.bias"] = _t(vh)
        sd[f"{p}.norm1.weight"] = _ones(vh)
        sd[f"{p}.norm1.bias"] = _t(vh)
        sd[f"{p}.norm2.weight"] = _ones(vh)
        sd[f"{p}.norm2.bias"] = _t(vh)
        sd[f"{p}.ls1"] = _ones(vh)
        sd[f"{p}.ls2"] = _ones(vh)
    sd["vision_model.embeddings.class_embedding"] = _t(1, 1, vh)
    sd["vision_model.embeddings.patch_embedding.weight"] = _t(vh, 3, 4, 4)
    sd["vision_model.embeddings.patch_embedding.bias"] = _t(vh)
    sd["vision_model.embeddings.position_embedding"] = _t(1, 65, vh)
    m2 = vh * 4
    sd["mlp1.0.weight"] = _ones(m2)
    sd["mlp1.0.bias"] = _t(m2)
    sd["mlp1.1.weight"] = _t(H, m2)
    sd["mlp1.1.bias"] = _t(H)
    sd["mlp1.3.weight"] = _t(H, H)
    sd["mlp1.3.bias"] = _t(H)
    cfg = {"architectures": ["InternVLChatModel"],
           "llm_config": {**_qwen3_txt_cfg(),
                          "architectures": ["Qwen3ForCausalLM"]},
           "vision_config": {"architectures": ["InternVisionModel"],
                             "hidden_size": vh, "num_hidden_layers": vd,
                             "num_attention_heads": 2,
                             "intermediate_size": vi, "patch_size": 4,
                             "image_size": 32,
                             "downsample_ratio": 0.5}}
    d = _save_hf(tmp_path, sd, cfg)
    out = str(tmp_path / "ivl.bin")
    convert(d, out, "f32")
    gf = GGMMFile.open(out)
    assert gf.model_type == int(ModelType.INTERN_VL)
    np.testing.assert_allclose(
        gf.tensor_f32("visual.layers.0.self_attn.k_proj.weight"),
        qkv[vh:2 * vh])
    m = load_model(out, RuntimeConfig(**RT32))
    assert _logits(m).shape == (len(IDS), V)


def test_convert_neochat(tmp_path):
    sd = {f"language_model.{k}": v for k, v in _qwen3_sd().items()}
    # mirror weights for the image-generation expert (mot_gen)
    base = _qwen3_sd()
    p = "model.layers.0"
    for n in ("input_layernorm", "post_attention_layernorm"):
        sd[f"language_model.{p}.{n}_mot_gen.weight"] = _ones(H)
    for n in ("gate_proj", "up_proj"):
        sd[f"language_model.{p}.mlp_mot_gen.{n}.weight"] = _t(INTER, H)
    sd[f"language_model.{p}.mlp_mot_gen.down_proj.weight"] = _t(H, INTER)
    for n, rows in (("q_proj", HEADS * HD), ("k_proj", KV * HD),
                    ("v_proj", KV * HD)):
        sd[f"language_model.{p}.self_attn.{n}_mot_gen.weight"] = _t(rows, H)
    sd[f"language_model.{p}.self_attn.o_proj_mot_gen.weight"] = \
        _t(H, HEADS * HD)
    # NEOChat qk-norms span half a head each (reference models/neochat.cpp:
    # 457-464 constructs them with head_dim/2): the base q_norm/k_norm from
    # the qwen3 fixture are resized, and the hw/mot_gen variants added.
    for n in ("q_norm", "k_norm"):
        sd[f"language_model.{p}.self_attn.{n}.weight"] = _ones(HD // 2)
        sd[f"language_model.{p}.self_attn.{n}_hw.weight"] = _ones(HD // 2)
        sd[f"language_model.{p}.self_attn.{n}_hw_mot_gen.weight"] = \
            _ones(HD // 2)
        sd[f"language_model.{p}.self_attn.{n}_mot_gen.weight"] = \
            _ones(HD // 2)
    sd["language_model.model.norm_mot_gen.weight"] = _ones(H)
    # flow-matching modules + vision embedders
    pd = 4 * 4 * 3
    for stem in ("fm_modules.fm_head", "fm_modules.noise_scale_embedder.mlp",
                 "fm_modules.timestep_embedder.mlp"):
        inn = H if "fm_head" in stem else 256
        outn = pd if "fm_head" in stem else H
        sd[f"{stem}.0.weight"] = _t(H, inn)
        sd[f"{stem}.0.bias"] = _t(H)
        sd[f"{stem}.2.weight"] = _t(outn, H)
        sd[f"{stem}.2.bias"] = _t(outn)
    for pref in ("fm_modules.vision_model_mot_gen", "vision_model"):
        sd[f"{pref}.embeddings.dense_embedding.weight"] = _t(H, pd)
        sd[f"{pref}.embeddings.dense_embedding.bias"] = _t(H)
        sd[f"{pref}.embeddings.patch_embedding.weight"] = _t(H, 3, 4, 4)
        sd[f"{pref}.embeddings.patch_embedding.bias"] = _t(H)
    cfg = {"architectures": ["NEOChatModel"],
           "llm_config": {**_qwen3_txt_cfg(),
                          "architectures": ["Qwen3ForCausalLM"]},
           "vision_config": {"patch_size": 4, "image_size": 32}}
    d = _save_hf(tmp_path, sd, cfg)
    out = str(tmp_path / "neo.bin")
    convert(d, out, "f32")
    gf = GGMMFile.open(out)
    assert gf.model_type == int(ModelType.NEOCHAT)
    assert gf.has_tensor("model.layers.0.mlp_mot_gen.gate_proj.weight")
    assert gf.has_tensor("fm_modules.fm_head.0.weight")
    assert gf.has_tensor("vision.embeddings.patch_embedding.weight")
    m = load_model(out, RuntimeConfig(**RT32))
    assert _logits(m).shape == (len(IDS), V)


# ---------------------------------------------------------------------------
# PaddleOCR-VL
# ---------------------------------------------------------------------------

def test_convert_paddle_ocr_vl(tmp_path):
    import test_paddle_vl as T

    vh, vd, vi = T.V_HIDDEN, T.V_DEPTH, T.V_INTER
    lm = {}
    for k, v in _qwen3_sd().items():
        if "q_norm" in k or "k_norm" in k or k == "lm_head.weight":
            continue
        lm[k] = v
    sd = dict(lm)
    for i in range(vd):
        p = f"visual.vision_model.encoder.layers.{i}"
        for n in ("layer_norm1", "layer_norm2"):
            sd[f"{p}.{n}.weight"] = _ones(vh)
            sd[f"{p}.{n}.bias"] = _t(vh)
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{p}.self_attn.{n}.weight"] = _t(vh, vh)
            sd[f"{p}.self_attn.{n}.bias"] = _t(vh)
        sd[f"{p}.mlp.fc1.weight"] = _t(vi, vh)
        sd[f"{p}.mlp.fc1.bias"] = _t(vi)
        sd[f"{p}.mlp.fc2.weight"] = _t(vh, vi)
        sd[f"{p}.mlp.fc2.bias"] = _t(vh)
    sd["mlp_AR.linear_1.weight"] = _t(H, vh * 4)
    sd["mlp_AR.linear_1.bias"] = _t(H)
    sd["mlp_AR.linear_2.weight"] = _t(H, H)
    sd["mlp_AR.linear_2.bias"] = _t(H)
    sd["mlp_AR.pre_norm.weight"] = _ones(vh * 4)
    sd["mlp_AR.pre_norm.bias"] = _t(vh * 4)
    sd["visual.vision_model.head.attention.in_proj_bias"] = _t(3 * vh)
    sd["visual.vision_model.head.attention.in_proj_weight"] = _t(3 * vh, vh)
    sd["visual.vision_model.head.attention.out_proj.weight"] = _t(vh, vh)
    sd["visual.vision_model.head.attention.out_proj.bias"] = _t(vh)
    sd["visual.vision_model.head.layernorm.weight"] = _ones(vh)
    sd["visual.vision_model.head.layernorm.bias"] = _t(vh)
    sd["visual.vision_model.head.mlp.fc1.weight"] = _t(vi, vh)
    sd["visual.vision_model.head.mlp.fc1.bias"] = _t(vi)
    sd["visual.vision_model.head.mlp.fc2.weight"] = _t(vh, vi)
    sd["visual.vision_model.head.mlp.fc2.bias"] = _t(vh)
    sd["visual.vision_model.head.probe"] = _t(1, 1, vh)
    sd["visual.vision_model.post_layernorm.weight"] = _ones(vh)
    sd["visual.vision_model.post_layernorm.bias"] = _t(vh)
    sd["visual.vision_model.embeddings.packing_position_embedding.weight"] = \
        _t(1024, vh)
    sd["visual.vision_model.embeddings.patch_embedding.weight"] = \
        _t(vh, 3, T.PATCH, T.PATCH)
    sd["visual.vision_model.embeddings.patch_embedding.bias"] = _t(vh)
    sd["visual.vision_model.embeddings.position_embedding.weight"] = \
        _t(T.POSGRID ** 2, vh)
    cfg = {"architectures": ["PaddleOCRVLForConditionalGeneration"],
           **_qwen3_txt_cfg(tie_word_embeddings=True),
           "use_bias": False,
           "rope_scaling": {"mrope_section": [16, 24, 24]},
           "vision_config": {
               "hidden_size": vh, "num_hidden_layers": vd,
               "num_attention_heads": T.V_HEADS, "intermediate_size": vi,
               "patch_size": T.PATCH, "image_size": T.POSGRID * T.PATCH,
               "spatial_merge_size": 2}}
    d = _save_hf(tmp_path, sd, cfg)
    # PaddleOCR-VL ships a sentencepiece tokenizer (reference ernie.cpp:39
    # loads the llama-v2 SP processor); replace the default byte-BPE
    # tokenizer.json with a Unigram one so the converter emits SP records.
    specials = ["<|begin_of_sentence|>", "<|end_of_sentence|>", "</s>",
                "<|IMAGE_START|>", "<|IMAGE_END|>"]
    pieces = [[f"<s{i}>", -float(i)] for i in range(V - len(specials))]
    pieces += [[t, -1000.0] for t in specials]
    (tmp_path / "hf" / "tokenizer.json").write_text(
        json.dumps({"model": {"type": "Unigram", "vocab": pieces}}))
    out = str(tmp_path / "paddle.bin")
    convert(d, out, "f32")
    gf = GGMMFile.open(out)
    assert gf.model_type == int(ModelType.PADDLE_OCR_VL)
    assert gf.has_tensor("visual.layers.0.self_attn.out_proj.weight")
    assert gf.has_tensor("visual.head.probe")
    m = load_model(out, RuntimeConfig(**RT32))
    assert _logits(m).shape == (len(IDS), V)


# ---------------------------------------------------------------------------
# Gemma4 / Gemma4Unified pack oracle against the direct writer
# ---------------------------------------------------------------------------

def _gemma4_cfg_json(T, layers, layer_is_swa, n_kv_shared, moe=True,
                     ple=True, arch="Gemma4ForConditionalGeneration"):
    return {
        "architectures": [arch],
        "text_config": {
            "vocab_size": T.V, "hidden_size": T.HID,
            "num_attention_heads": T.HEADS, "num_hidden_layers": layers,
            "intermediate_size": T.INTER, "max_position_embeddings": 128,
            "bos_token_id": 2, "eos_token_id": 1, "pad_token_id": 0,
            "attention_bias": False,
            "hidden_activation": "gelu_pytorch_tanh",
            "tie_word_embeddings": True,
            "vocab_size_per_layer_input": T.V,
            "attention_k_eq_v": True, "global_head_dim": T.GHD,
            "head_dim": T.HD,
            "hidden_size_per_layer_input": T.DPL if ple else 0,
            "enable_moe_block": moe, "moe_intermediate_size": T.MOE_INTER,
            "num_experts": T.NEXP, "top_k_experts": T.TOPK,
            "num_global_key_value_heads": T.GKV,
            "num_key_value_heads": T.KV,
            "num_kv_shared_layers": n_kv_shared,
            "sliding_window": T.SWA, "use_double_wide_mlp": True,
            "layer_types": ["sliding_attention" if s else "full_attention"
                            for s in layer_is_swa[:layers]],
            "final_logit_softcapping": 30.0,
            "rope_parameters": {
                "full_attention": {"partial_rotary_factor": 0.5,
                                   "rope_theta": 1000000.0},
                "sliding_attention": {"rope_theta": 10000.0}},
        },
        "vision_config": None, "audio_config": None,
    }


def test_convert_gemma4_pack_oracle(tmp_path):
    import test_gemma4 as T

    layers, swa, shared = 6, T.LAYER_IS_SWA, 2
    sd = T._gen_state(T._rng(7), layers, swa, shared)
    direct = str(tmp_path / "direct.bin")
    T._write_gemma4(direct, sd, layers=layers, layer_is_swa=swa,
                    n_kv_shared=shared)
    m_ref = load_model(direct, RuntimeConfig(**RT32))

    # HF form: language_model prefix, unscaled embeddings, fused experts
    hf = {}
    for k, v in sd.items():
        if k == "model.embed_tokens.weight":
            v = v / (T.HID ** 0.5)
        elif k == "model.embed_tokens_per_layer.weight":
            v = v / (T.DPL ** 0.5)
        hf[f"model.language_model.{k[len('model.'):]}"
           if k.startswith("model.") else k] = v
    # fuse experts back into stacked tensors
    for i in range(layers):
        p = f"model.language_model.layers.{i}"
        gates = [hf.pop(f"{p}.mlp.experts.{j}.gate_proj.weight")
                 for j in range(T.NEXP)]
        ups = [hf.pop(f"{p}.mlp.experts.{j}.up_proj.weight")
               for j in range(T.NEXP)]
        downs = [hf.pop(f"{p}.mlp.experts.{j}.down_proj.weight")
                 for j in range(T.NEXP)]
        hf[f"{p}.experts.gate_up_proj"] = np.stack(
            [np.concatenate([g, u], axis=0) for g, u in zip(gates, ups)])
        hf[f"{p}.experts.down_proj"] = np.stack(downs)
    cfg = _gemma4_cfg_json(T, layers, swa, shared)
    d = _save_hf(tmp_path, hf, cfg)
    out = str(tmp_path / "conv.bin")
    convert(d, out, "f32")
    gf = GGMMFile.open(out)
    assert gf.model_type == int(ModelType.GEMMA4)
    m = load_model(out, RuntimeConfig(**RT32))
    ids = (5, 9, 23, 71, 112, 7)
    np.testing.assert_allclose(_logits(m, ids), _logits(m_ref, ids),
                               atol=3e-4, rtol=3e-4)


def test_convert_gemma4_unified(tmp_path):
    import test_gemma4 as T

    layers, swa, shared = 6, T.LAYER_IS_SWA, 2
    sd = T._gen_state(T._rng(8), layers, swa, shared)
    hf = {}
    for k, v in sd.items():
        if k == "model.embed_tokens.weight":
            v = v / (T.HID ** 0.5)
        elif k == "model.embed_tokens_per_layer.weight":
            v = v / (T.DPL ** 0.5)
        hf[f"model.language_model.{k[len('model.'):]}"
           if k.startswith("model.") else k] = v
    for i in range(layers):
        p = f"model.language_model.layers.{i}"
        gates = [hf.pop(f"{p}.mlp.experts.{j}.gate_proj.weight")
                 for j in range(T.NEXP)]
        ups = [hf.pop(f"{p}.mlp.experts.{j}.up_proj.weight")
               for j in range(T.NEXP)]
        downs = [hf.pop(f"{p}.mlp.experts.{j}.down_proj.weight")
                 for j in range(T.NEXP)]
        hf[f"{p}.experts.gate_up_proj"] = np.stack(
            [np.concatenate([g, u], axis=0) for g, u in zip(gates, ups)])
        hf[f"{p}.experts.down_proj"] = np.stack(downs)
    # unified embedders
    pos = _t(16, 2, T.HID)
    hf["model.vision_embedder.pos_embedding"] = pos
    hf["model.vision_embedder.patch_dense.weight"] = _t(T.HID, 48)
    hf["model.vision_embedder.patch_dense.bias"] = _t(T.HID)
    for n in ("patch_ln1", "patch_ln2", "pos_norm"):
        hf[f"model.vision_embedder.{n}.weight"] = _ones(T.HID)
        hf[f"model.vision_embedder.{n}.bias"] = _t(T.HID)
    hf["model.embed_audio.embedding_projection.weight"] = _t(T.HID, T.HID)
    hf["model.embed_vision.embedding_projection.weight"] = _t(T.HID, T.HID)
    cfg = _gemma4_cfg_json(T, layers, swa, shared,
                           arch="Gemma4UnifiedForConditionalGeneration")
    d = _save_hf(tmp_path, hf, cfg)
    out = str(tmp_path / "uni.bin")
    convert(d, out, "f32")
    gf = GGMMFile.open(out)
    assert gf.model_type == int(ModelType.GEMMA4_Unified)
    np.testing.assert_allclose(
        gf.tensor_f32("model.vision_embedder.pos_embedding_x"), pos[:, 0, :])
    np.testing.assert_allclose(
        gf.tensor_f32("model.vision_embedder.pos_embedding_y"), pos[:, 1, :])
    m = load_model(out, RuntimeConfig(**RT32))
    assert _logits(m).shape[1] == T.V
