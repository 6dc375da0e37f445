"""HF checkpoint → GGMM converters, wave 7b: the VL tail + Gemma4.

Same emitter contract as convert.py; reference class cited per-function
(/root/reference/convert.py)."""
from __future__ import annotations

import struct

import numpy as np

from ..ggmm.quants import GGMLType
from ..models.model_types import ModelType
from .convert import (_base_vals, _llama_like_names, convert_deepseek_v3,
                      convert_qwen2)
from .convert_extra3 import _emit, _qwen3_cfg_write, _txt_cfg


def _permute_pair_np(w: np.ndarray, n_head: int) -> np.ndarray:
    """reference permute_pair (convert.py:1365): interleaved rotary pairs →
    split-half layout, per head; works on weights [out, in] and biases."""
    return (w.reshape(n_head, w.shape[0] // n_head // 2, 2, *w.shape[1:])
             .swapaxes(1, 2).reshape(w.shape))


def _pass_bias(names):
    """Expand a name list of prefixes into .bias/.weight pairs."""
    out = []
    for n in names:
        out += [f"{n}.bias", f"{n}.weight"]
    return out


# ---------------------------------------------------------------------------
# MoonViT archs: KimiVL (DSv3 base) and LocateAnything (Qwen2 base)
# reference KimiVLConverter convert.py:8284, LocateAnythingConverter :8372
# ---------------------------------------------------------------------------

def _moonvit_pp(sd: dict, vis_hidden: int) -> dict:
    """vision_tower.* → vision_model.* with wqkv split and wo→o_proj
    (KimiVLConverter.state_dict_pp:8288-8318)."""
    r = {}
    for name, t in sd.items():
        if name.startswith("vision_tower.encoder."):
            name = name.replace("vision_tower.encoder.",
                                "vision_model.encoder.")
            if ".wo." in name:
                r[name.replace(".wo.", ".attn.o_proj.")] = t
            elif name.endswith(".wqkv.bias") or name.endswith(".wqkv.weight"):
                q, k, v = (t[:vis_hidden], t[vis_hidden:2 * vis_hidden],
                           t[2 * vis_hidden:])
                r[name.replace(".wqkv.", ".attn.q_proj.")] = q
                r[name.replace(".wqkv.", ".attn.k_proj.")] = k
                r[name.replace(".wqkv.", ".attn.v_proj.")] = v
            elif ".final_layernorm." in name:
                r[name.replace("encoder.", "")] = t
            else:
                r[name] = t
        elif name.startswith("vision_tower."):
            r[name.replace("vision_tower.", "vision_model.")] = t
        else:
            r[name] = t
    return r


def _moonvit_names(n_layers: int):
    names = []
    for i in range(n_layers):
        p = f"vision_model.encoder.blocks.{i}"
        names += _pass_bias([f"{p}.attn.q_proj", f"{p}.attn.k_proj",
                             f"{p}.attn.v_proj", f"{p}.attn.o_proj",
                             f"{p}.mlp.fc0", f"{p}.mlp.fc1",
                             f"{p}.norm0", f"{p}.norm1"])
    return names


def convert_kimi_vl(w, f, cfg, sd, dtype):
    """KimiVLForConditionalGeneration → KimiVL (reference KimiVLConverter,
    convert.py:8284): DeepSeek-V3 text LLM + MoonViT tower +
    multi_modal_projector."""
    vis = cfg["vision_config"]
    txt = dict(cfg["text_config"])
    for k in ("bos_token_id", "eos_token_id", "pad_token_id",
              "sep_token_id"):
        txt.setdefault(k, cfg.get(k))
    sd = _moonvit_pp(sd, int(vis["hidden_size"]))
    lm_sd = {k: v for k, v in sd.items()
             if k.startswith(("model.", "lm_head."))}
    convert_deepseek_v3(w, f, txt, lm_sd, dtype)
    w.patch_model_type(int(ModelType.KIMI_VL))
    names = _moonvit_names(int(vis["num_hidden_layers"]))
    names += _pass_bias(["multi_modal_projector.linear_1",
                         "multi_modal_projector.linear_2",
                         "multi_modal_projector.pre_norm",
                         "vision_model.final_layernorm"])
    names += ["vision_model.patch_embed.pos_emb.weight",
              "vision_model.patch_embed.proj.bias",
              "vision_model.patch_embed.proj.weight"]
    _emit(w, sd, names, dtype)


def convert_locate_anything(w, f, cfg, sd, dtype):
    """LocateAnythingForConditionalGeneration → LocateAnything (reference
    LocateAnythingConverter, convert.py:8372): qwen2 text (+tie flag) +
    MoonViT tower + mlp1 projector."""
    vis = cfg["vision_config"]
    txt = _txt_cfg(cfg)
    sd = _moonvit_pp(sd, int(vis["hidden_size"]))
    tie = bool(txt.get("tie_word_embeddings", False))
    lm_sd = {k: v for k, v in sd.items()
             if k.startswith(("model.", "lm_head."))}
    convert_qwen2(w, f, txt, lm_sd, dtype)
    f.write(struct.pack("<i", int(tie)))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.LocateAnything))
    names = _moonvit_names(int(vis["num_hidden_layers"]))
    names += _pass_bias(["mlp1.0", "mlp1.1", "mlp1.3",
                         "vision_model.final_layernorm"])
    names += ["vision_model.patch_embed.pos_emb.weight",
              "vision_model.patch_embed.proj.bias",
              "vision_model.patch_embed.proj.weight"]
    _emit(w, sd, names, dtype)


# ---------------------------------------------------------------------------
# DotsOCR — reference DotsOCRConverter, convert.py:9627
# ---------------------------------------------------------------------------

def convert_dots_ocr(w, f, cfg, sd, dtype):
    """DotsOCRForCausalLM → DotsOCR: qwen2 text config; NaViT-style tower
    renamed to vision_model.layers with fused qkv split and
    fc1/fc3/fc2 → gate/up/down."""
    vis = cfg["vision_config"]
    vh = int(vis["hidden_size"])
    r = {}
    for name, t in sd.items():
        if not name.startswith("vision_tower"):
            r[name] = t
            continue
        if name.startswith("vision_tower.blocks."):
            name = name.replace("vision_tower.blocks.", "vision_model.layers.")
            if ".attn.proj." in name:
                r[name.replace(".proj.", ".o_proj.")] = t
            elif ".qkv." in name:
                r[name.replace(".qkv.", ".q_proj.")] = t[:vh]
                r[name.replace(".qkv.", ".k_proj.")] = t[vh:2 * vh]
                r[name.replace(".qkv.", ".v_proj.")] = t[2 * vh:]
            elif ".fc3" in name:
                r[name.replace(".fc3.", ".up_proj.")] = t
            elif ".fc2" in name:
                r[name.replace(".fc2.", ".down_proj.")] = t
            elif ".fc1" in name:
                r[name.replace(".fc1.", ".gate_proj.")] = t
            else:
                r[name] = t
        elif name.startswith("vision_tower.merger"):
            name = name.replace("vision_tower.merger.", "vision_model.merger.")
            name = name.replace(".mlp.0.", ".mlp.fc0.")
            name = name.replace(".mlp.2.", ".mlp.fc1.")
            r[name] = t
        elif name.startswith("vision_tower.patch_embed.patchifier."):
            r[name.replace("vision_tower.patch_embed.patchifier.",
                           "vision_model.patch_embed.")] = t
        else:
            r[name.replace("vision_tower.", "vision_model.")] = t
    sd = r
    txt = _txt_cfg(cfg)
    lm_sd = {k: v for k, v in sd.items()
             if k.startswith(("model.", "lm_head."))}
    convert_qwen2(w, f, txt, lm_sd, dtype)
    w.patch_model_type(int(ModelType.DOTS_OCR))
    names = []
    for i in range(int(vis["num_hidden_layers"])):
        p = f"vision_model.layers.{i}"
        names += [f"{p}.attn.q_proj.weight", f"{p}.attn.k_proj.weight",
                  f"{p}.attn.v_proj.weight", f"{p}.attn.o_proj.weight",
                  f"{p}.mlp.up_proj.weight", f"{p}.mlp.down_proj.weight",
                  f"{p}.mlp.gate_proj.weight",
                  f"{p}.norm1.weight", f"{p}.norm2.weight"]
    names += ["vision_model.merger.ln_q.bias", "vision_model.merger.ln_q.weight",
              "vision_model.merger.mlp.fc0.bias",
              "vision_model.merger.mlp.fc0.weight",
              "vision_model.merger.mlp.fc1.bias",
              "vision_model.merger.mlp.fc1.weight",
              "vision_model.patch_embed.norm.weight",
              "vision_model.patch_embed.proj.bias",
              "vision_model.patch_embed.proj.weight",
              "vision_model.post_trunk_norm.weight"]
    _emit(w, sd, names, dtype)


# ---------------------------------------------------------------------------
# StepVL — reference StepVLConverter, convert.py:9911
# ---------------------------------------------------------------------------

def convert_step_vl(w, f, cfg, sd, dtype):
    """StepVLForConditionalGeneration → StepVL: qwen3 text config; CLIP
    tower: in_proj split into q/k/v with the interleaved-pair permute on
    q/k, out_proj→o_proj."""
    vis = cfg["vision_config"]
    width, heads = int(vis["width"]), int(vis["heads"])
    txt = dict(cfg["text_config"])
    assert txt.get("rope_scaling") is None
    for k in ("bos_token_id", "eos_token_id", "pad_token_id",
              "sep_token_id"):
        txt.setdefault(k, cfg.get(k))
    r = {}
    for name, t in sd.items():
        if name.startswith("vision_model.transformer.resblocks."):
            name = name.replace("vision_model.transformer.resblocks.",
                                "visual.blocks.")
            if name.endswith(("in_proj_weight", "in_proj_bias")):
                q, k, v = t[:width], t[width:2 * width], t[2 * width:]
                r[name.replace(".in_proj_", ".q_proj.")] = \
                    _permute_pair_np(q, heads)
                r[name.replace(".in_proj_", ".k_proj.")] = \
                    _permute_pair_np(k, heads)
                r[name.replace(".in_proj_", ".v_proj.")] = v
            else:
                r[name.replace(".attn.out_proj.", ".attn.o_proj.")] = t
        elif name.startswith("vision_model."):
            r[name.replace("vision_model.", "visual.")] = t
        elif name.startswith("vit_large_projector"):
            r["visual." + name] = t
        else:
            r[name] = t
    sd = r
    _qwen3_cfg_write(w, f, txt, dtype, ModelType.STEP_VL)
    names = _llama_like_names(txt["num_hidden_layers"],
                              tie=bool(txt.get("tie_word_embeddings")),
                              qk_norm=True)
    for i in range(int(vis["layers"])):
        p = f"visual.blocks.{i}"
        names += _pass_bias([f"{p}.attn.o_proj", f"{p}.attn.q_proj",
                             f"{p}.attn.k_proj", f"{p}.attn.v_proj"])
        names += [f"{p}.ls_1.gamma", f"{p}.ls_2.gamma",
                  f"{p}.ln_1.weight", f"{p}.ln_1.bias",
                  f"{p}.ln_2.weight", f"{p}.ln_2.bias",
                  f"{p}.mlp.c_fc.weight", f"{p}.mlp.c_fc.bias",
                  f"{p}.mlp.c_proj.weight", f"{p}.mlp.c_proj.bias"]
    names += ["visual.positional_embedding", "visual.conv1.weight",
              "visual.ln_pre.weight", "visual.ln_pre.bias",
              "visual.vit_downsampler1.weight", "visual.vit_downsampler1.bias",
              "visual.vit_downsampler2.weight", "visual.vit_downsampler2.bias",
              "visual.vit_large_projector.weight"]
    _emit(w, sd, names, dtype)


# ---------------------------------------------------------------------------
# YoutuVL — reference YoutuVLConverter, convert.py:10046
# ---------------------------------------------------------------------------

def convert_youtu_vl(w, f, cfg, sd, dtype):
    """YoutuVLForConditionalGeneration → YoutuVL: Youtu MLA LLM + SigLIP2
    tower (siglip2.vision_model → visual, out_proj→o_proj, fc1/fc2→fc0/fc1)."""
    from .convert_extra2 import convert_youtu

    vis = cfg["vision_config"]
    r, lm = {}, {}
    for name, t in sd.items():
        if not name.startswith("siglip2."):
            lm[name] = t
            continue
        name = name.replace("siglip2.vision_model.encoder.", "visual.")
        name = name.replace("siglip2.vision_model.", "visual.")
        name = name.replace(".out_proj.", ".o_proj.")
        name = name.replace(".mlp.fc1.", ".mlp.fc0.")
        name = name.replace(".mlp.fc2.", ".mlp.fc1.")
        # merger lives at top level in the reference weight list
        name = name.replace("visual.merger.", "merger.")
        r[name] = t
    convert_youtu(w, f, cfg, lm, dtype)
    w.patch_model_type(int(ModelType.YOUTU_VL))
    names = []
    for i in range(int(vis["num_hidden_layers"])):
        p = f"visual.layers.{i}"
        names += _pass_bias([f"{p}.self_attn.q_proj", f"{p}.self_attn.k_proj",
                             f"{p}.self_attn.v_proj", f"{p}.self_attn.o_proj",
                             f"{p}.mlp.fc0", f"{p}.mlp.fc1",
                             f"{p}.layer_norm1", f"{p}.layer_norm2"])
    names += ["visual.post_layernorm.bias", "visual.post_layernorm.weight",
              "merger.ln_q.weight",
              "merger.mlp.0.bias", "merger.mlp.0.weight",
              "merger.mlp.2.bias", "merger.mlp.2.weight",
              "visual.embeddings.patch_embedding.bias",
              "visual.embeddings.patch_embedding.weight"]
    _emit(w, r, names, dtype)


# ---------------------------------------------------------------------------
# PenguinVL — reference PenguinVLConverter, convert.py:10115
# ---------------------------------------------------------------------------

def convert_penguin_vl(w, f, cfg, sd, dtype):
    """PenguinVLQwen3ForCausalLM → PenguinVL: qwen3 text config at top
    level; qk-normed rope-free SigLIP-style tower + mlp readout projector."""
    vis = cfg["vision_encoder_config"]
    assert str(cfg.get("vision_projector_type", "mlp")).startswith("mlp")
    r = {}
    for name, t in sd.items():
        if name.startswith("model.vision_encoder.vision_encoder.encoder."):
            r[name.replace("model.vision_encoder.vision_encoder.encoder.",
                           "visual.")] = t
        elif name.startswith("model.vision_encoder.vision_encoder."):
            r[name.replace("model.vision_encoder.vision_encoder.",
                           "visual.")] = t
        elif name.startswith("model.vision_projector."):
            r[name.replace("model.vision_projector.",
                           "vision_projector.")] = t
        else:
            r[name] = t
    sd = r
    txt = _txt_cfg(cfg)
    _qwen3_cfg_write(w, f, txt, dtype, ModelType.PENGUIN_VL)
    names = _llama_like_names(txt["num_hidden_layers"],
                              tie=bool(txt.get("tie_word_embeddings")),
                              qk_norm=True)
    for i in range(int(vis["num_hidden_layers"])):
        p = f"visual.layers.{i}"
        names += [f"{p}.input_layernorm.weight",
                  f"{p}.mlp.down_proj.weight", f"{p}.mlp.gate_proj.weight",
                  f"{p}.mlp.up_proj.weight",
                  f"{p}.post_attention_layernorm.weight",
                  f"{p}.self_attn.k_proj.weight",
                  f"{p}.self_attn.k_norm.weight",
                  f"{p}.self_attn.q_proj.weight",
                  f"{p}.self_attn.q_norm.weight",
                  f"{p}.self_attn.v_proj.weight",
                  f"{p}.self_attn.o_proj.weight"]
    names += ["visual.norm.weight",
              "vision_projector.readout.0.bias",
              "vision_projector.readout.0.weight",
              "vision_projector.readout.2.bias",
              "vision_projector.readout.2.weight",
              "visual.embeddings.patch_embedding.bias",
              "visual.embeddings.patch_embedding.weight"]
    _emit(w, sd, names, dtype)


# ---------------------------------------------------------------------------
# PaddleOCR-VL — reference PaddleOCRVLConverter, convert.py:10315
# ---------------------------------------------------------------------------

def convert_paddle_ocr_vl(w, f, cfg, sd, dtype):
    """PaddleOCRVLForConditionalGeneration → PaddleOCRVL: ernie-style llama
    text (NEOX rope, no permute) + [kv, head_dim, theta, mrope[3], tie];
    NaViT tower with the attention-pool head."""
    assert not cfg.get("use_bias")
    vis = cfg["vision_config"]
    txt = _txt_cfg(cfg)
    heads = txt["num_attention_heads"]
    kv = txt.get("num_key_value_heads", heads)
    head_dim = txt.get("head_dim") or txt["hidden_size"] // heads
    tie = txt.get("tie_word_embeddings")
    tie = True if tie is None else bool(tie)
    mrope = list((txt.get("rope_scaling") or {}).get("mrope_section")
                 or (16, 24, 24))
    w.write_config(_base_vals(txt, dtype) + [kv, head_dim], fmt="13i")
    f.write(struct.pack("<f", float(txt.get("rope_theta", 10000.0))))
    f.write(struct.pack("<4i", mrope[0], mrope[1], mrope[2], int(tie)))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.PADDLE_OCR_VL))
    r = {}
    for name, t in sd.items():
        name = name.replace("visual.vision_model.encoder.", "visual.")
        name = name.replace("visual.vision_model.", "visual.")
        r[name] = t
    sd = r
    if tie:
        sd.setdefault("lm_head.weight", sd["model.embed_tokens.weight"])
    names = _llama_like_names(txt["num_hidden_layers"], tie=tie)
    for i in range(int(vis["num_hidden_layers"])):
        p = f"visual.layers.{i}"
        names += [f"{p}.layer_norm1.bias", f"{p}.layer_norm1.weight",
                  f"{p}.layer_norm2.bias", f"{p}.layer_norm2.weight",
                  f"{p}.mlp.fc1.bias", f"{p}.mlp.fc1.weight",
                  f"{p}.mlp.fc2.bias", f"{p}.mlp.fc2.weight",
                  f"{p}.self_attn.k_proj.bias", f"{p}.self_attn.k_proj.weight",
                  f"{p}.self_attn.out_proj.bias",
                  f"{p}.self_attn.out_proj.weight",
                  f"{p}.self_attn.q_proj.bias", f"{p}.self_attn.q_proj.weight",
                  f"{p}.self_attn.v_proj.bias", f"{p}.self_attn.v_proj.weight"]
    names += ["mlp_AR.linear_1.bias", "mlp_AR.linear_1.weight",
              "mlp_AR.linear_2.bias", "mlp_AR.linear_2.weight",
              "mlp_AR.pre_norm.bias", "mlp_AR.pre_norm.weight",
              "visual.head.attention.in_proj_bias",
              "visual.head.attention.in_proj_weight",
              "visual.head.attention.out_proj.bias",
              "visual.head.attention.out_proj.weight",
              "visual.head.layernorm.bias", "visual.head.layernorm.weight",
              "visual.head.mlp.fc1.bias", "visual.head.mlp.fc1.weight",
              "visual.head.mlp.fc2.bias", "visual.head.mlp.fc2.weight",
              "visual.head.probe",
              "visual.post_layernorm.bias", "visual.post_layernorm.weight",
              "visual.embeddings.packing_position_embedding.weight",
              "visual.embeddings.patch_embedding.bias",
              "visual.embeddings.patch_embedding.weight",
              "visual.embeddings.position_embedding.weight"]
    _emit(w, sd, names, dtype)


# ---------------------------------------------------------------------------
# NEOChat — reference NEOChatConverter, convert.py:10407
# ---------------------------------------------------------------------------

def convert_neochat(w, f, cfg, sd, dtype):
    """NEOChatModel → NEOChat: qwen3 LLM (llm_config) with mirrored
    *_mot_gen image-generation weights + flow-matching modules + dense/patch
    vision embedder."""
    txt = dict(cfg["llm_config"])
    assert txt["architectures"][0] == "Qwen3ForCausalLM", \
        "NEOChat MoE text model not supported yet"
    for k in ("bos_token_id", "eos_token_id", "pad_token_id",
              "sep_token_id"):
        txt.setdefault(k, cfg.get(k))
    r = {}
    for name, t in sd.items():
        if name.startswith("language_model."):
            r[name.replace("language_model.", "")] = t
        elif name.startswith("vision_model."):
            r[name.replace("vision_model.", "vision.")] = t
        else:
            r[name] = t
    sd = r
    _qwen3_cfg_write(w, f, txt, dtype, ModelType.NEOCHAT)
    names = ["fm_modules.fm_head.0.bias", "fm_modules.fm_head.0.weight",
             "fm_modules.fm_head.2.bias", "fm_modules.fm_head.2.weight",
             "fm_modules.noise_scale_embedder.mlp.0.bias",
             "fm_modules.noise_scale_embedder.mlp.0.weight",
             "fm_modules.noise_scale_embedder.mlp.2.bias",
             "fm_modules.noise_scale_embedder.mlp.2.weight",
             "fm_modules.timestep_embedder.mlp.0.bias",
             "fm_modules.timestep_embedder.mlp.0.weight",
             "fm_modules.timestep_embedder.mlp.2.bias",
             "fm_modules.timestep_embedder.mlp.2.weight",
             "fm_modules.vision_model_mot_gen.embeddings.dense_embedding.bias",
             "fm_modules.vision_model_mot_gen.embeddings.dense_embedding.weight",
             "fm_modules.vision_model_mot_gen.embeddings.patch_embedding.bias",
             "fm_modules.vision_model_mot_gen.embeddings.patch_embedding.weight"]
    llm_names = _llama_like_names(txt["num_hidden_layers"],
                                  tie=bool(txt.get("tie_word_embeddings")),
                                  qk_norm=True)
    names += llm_names
    for n in llm_names:
        if "_layernorm." in n:
            names.append(n.replace("_layernorm.", "_layernorm_mot_gen."))
        elif ".mlp." in n:
            names.append(n.replace(".mlp.", ".mlp_mot_gen."))
        elif ".self_attn." in n:
            if "_norm." in n:
                names.append(n.replace("_norm.", "_norm_hw."))
                names.append(n.replace("_norm.", "_norm_hw_mot_gen."))
                names.append(n.replace("_norm.", "_norm_mot_gen."))
            elif "_proj." in n:
                names.append(n.replace("_proj.", "_proj_mot_gen."))
    names += ["model.norm_mot_gen.weight",
              "vision.embeddings.dense_embedding.bias",
              "vision.embeddings.dense_embedding.weight",
              "vision.embeddings.patch_embedding.bias",
              "vision.embeddings.patch_embedding.weight"]
    _emit(w, sd, names, dtype)


# ---------------------------------------------------------------------------
# InternVLChatModel (remote-code) — reference InternVLConverter,
# convert.py:10173
# ---------------------------------------------------------------------------

def convert_internvl_chat(w, f, cfg, sd, dtype):
    """InternVLChatModel → InternVL (remote-code naming: llm_config +
    InternVisionModel with fused qkv and ls1/ls2 layer scales)."""
    txt = dict(cfg["llm_config"])
    assert txt["architectures"][0] == "Qwen3ForCausalLM", \
        "InternVLChatModel MoE text model not supported yet"
    vis = cfg["vision_config"]
    for k in ("bos_token_id", "eos_token_id", "pad_token_id",
              "sep_token_id"):
        txt.setdefault(k, cfg.get(k))
    r = {}
    for name, t in sd.items():
        if name.startswith("language_model."):
            r[name.replace("language_model.", "")] = t
        elif name.startswith("vision_model.encoder.layers."):
            name = name.replace("vision_model.encoder.layers.",
                                "visual.layers.")
            if ".attn.qkv." in name:
                third = t.shape[0] // 3
                r[name.replace(".attn.qkv.", ".self_attn.q_proj.")] = \
                    t[:third]
                r[name.replace(".attn.qkv.", ".self_attn.k_proj.")] = \
                    t[third:2 * third]
                r[name.replace(".attn.qkv.", ".self_attn.v_proj.")] = \
                    t[2 * third:]
            elif ".attn.proj." in name:
                r[name.replace(".attn.proj.", ".self_attn.o_proj.")] = t
            else:
                r[name] = t
        elif name.startswith("vision_model."):
            r[name.replace("vision_model.", "visual.")] = t
        elif name.startswith("mlp1."):
            r[name.replace("mlp1.", "vision_projector.")] = t
        else:
            r[name] = t
    sd = r
    _qwen3_cfg_write(w, f, txt, dtype, ModelType.INTERN_VL)
    names = _llama_like_names(txt["num_hidden_layers"],
                              tie=bool(txt.get("tie_word_embeddings")),
                              qk_norm=True)
    for i in range(int(vis["num_hidden_layers"])):
        p = f"visual.layers.{i}"
        names += _pass_bias([f"{p}.self_attn.q_proj", f"{p}.self_attn.k_proj",
                             f"{p}.self_attn.v_proj", f"{p}.self_attn.o_proj",
                             f"{p}.mlp.fc1", f"{p}.mlp.fc2",
                             f"{p}.norm1", f"{p}.norm2"])
        names += [f"{p}.ls1", f"{p}.ls2"]
    names += ["vision_projector.0.bias", "vision_projector.0.weight",
              "vision_projector.1.bias", "vision_projector.1.weight",
              "vision_projector.3.bias", "vision_projector.3.weight",
              "visual.embeddings.class_embedding",
              "visual.embeddings.patch_embedding.bias",
              "visual.embeddings.patch_embedding.weight",
              "visual.embeddings.position_embedding"]
    _emit(w, sd, names, dtype)


# ---------------------------------------------------------------------------
# GLM-OCR — reference GLMOCRConverter, convert.py:4264
# ---------------------------------------------------------------------------

def convert_glm_ocr(w, f, cfg, sd, dtype):
    """GlmOcrForConditionalGeneration → GLM_OCR: GLM4V layout + an appended
    head_dim i32; MTP tail weights dropped (reference prints the same
    warning)."""
    from .convert import convert_glm4v

    tcfg = _txt_cfg(cfg)
    heads = tcfg["num_attention_heads"]
    head_dim = tcfg.get("head_dim") or tcfg["hidden_size"] // heads
    convert_glm4v(w, f, cfg, sd, dtype)
    f.write(struct.pack("<i", int(head_dim)))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.GLM_OCR))


# ---------------------------------------------------------------------------
# Gemma4 / Gemma4Unified — reference Gemma4Converter convert.py:6785,
# Gemma4UnifiedConverter :7132
# ---------------------------------------------------------------------------

def _gemma4_aud_pos_embed(hidden_size: int) -> np.ndarray:
    """Gemma4Converter.gen_aud_pos_embed (convert.py:6803)."""
    import math

    num = hidden_size // 2
    inc = math.log(10000.0) / max(num - 1, 1)
    inv = np.exp(np.arange(num) * -inc)
    pos = np.arange(12, -1, -1)[:, None]
    t = pos * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def _gemma4_cfg(w, f, cfg, dtype, mtype):
    txt = dict(cfg["text_config"])
    for k in ("bos_token_id", "eos_token_id", "pad_token_id",
              "sep_token_id"):
        txt.setdefault(k, cfg.get(k))
    MAX_LAYERS = 128
    assert txt["tie_word_embeddings"]
    L = txt["num_hidden_layers"]
    layer_types = txt.get("layer_types") or []
    swa = [1 if (i < len(layer_types)
                 and layer_types[i] == "sliding_attention") else 0
           for i in range(MAX_LAYERS)]
    moe = bool(txt.get("enable_moe_block"))
    rp = txt["rope_parameters"]
    w.write_config(_base_vals(txt, dtype), fmt="11i")
    vals = [1 if txt.get("attention_k_eq_v") else 0,
            int(txt["global_head_dim"]), int(txt["head_dim"]),
            int(txt.get("hidden_size_per_layer_input") or 0),
            int(txt["moe_intermediate_size"]) if moe else -1,
            int(txt["num_experts"]) if moe else -1,
            int(txt["num_global_key_value_heads"])
            if txt.get("num_global_key_value_heads") is not None else -1,
            int(txt["num_key_value_heads"]),
            int(txt.get("num_kv_shared_layers") or 0),
            int(txt["sliding_window"]),
            int(txt["top_k_experts"]) if moe else -1,
            1 if txt.get("use_double_wide_mlp") else 0]
    f.write(struct.pack("<%di" % (12 + MAX_LAYERS), *(vals + swa)))
    f.write(struct.pack(
        "<4f", float(txt.get("final_logit_softcapping") or 0.0),
        float(rp["full_attention"].get("partial_rotary_factor", 1.0)),
        float(rp["full_attention"]["rope_theta"]),
        float(rp["sliding_attention"]["rope_theta"])))
    w._patch_offset(12)
    w.patch_model_type(int(mtype))
    return txt, L, swa, moe


def _gemma4_llm_pp(sd: dict, txt: dict) -> dict:
    """language_model prefix strip + embedding scaling + fused expert split
    (Gemma4Converter.state_dict_pp:6820-6870).  NOTE: convert()'s global
    _strip_prefixes has already turned model.language_model. into model.."""
    r = {}
    h_scale = float(txt["hidden_size"]) ** 0.5
    ple_scale = float(txt.get("hidden_size_per_layer_input") or 0) ** 0.5
    for name, t in sd.items():
        if name == "model.embed_tokens.weight":
            r[name] = t * h_scale
        elif name == "model.embed_tokens_per_layer.weight":
            r[name] = t * ple_scale
        elif name.endswith(".experts.down_proj") and t.ndim == 3:
            for j in range(t.shape[0]):
                r[name.replace("experts.down_proj",
                               f"mlp.experts.{j}.down_proj.weight")] = \
                    np.ascontiguousarray(t[j])
        elif name.endswith(".experts.gate_up_proj") and t.ndim == 3:
            half = t.shape[1] // 2
            for j in range(t.shape[0]):
                r[name.replace("experts.gate_up_proj",
                               f"mlp.experts.{j}.gate_proj.weight")] = \
                    np.ascontiguousarray(t[j, :half])
                r[name.replace("experts.gate_up_proj",
                               f"mlp.experts.{j}.up_proj.weight")] = \
                    np.ascontiguousarray(t[j, half:])
        else:
            r[name] = t
    return r


def _gemma4_llm_names(txt: dict):
    """Gemma4Converter.get_llm_weight_names (convert.py:7060-7130)."""
    L = txt["num_hidden_layers"]
    layer_types = txt.get("layer_types") or []
    moe = bool(txt.get("enable_moe_block"))
    ple = int(txt.get("hidden_size_per_layer_input") or 0) > 0
    n_shared = int(txt.get("num_kv_shared_layers") or 0)
    first_shared = L - n_shared
    k_eq_v = bool(txt.get("attention_k_eq_v"))
    names = ["model.embed_tokens.weight"]
    if ple:
        names += ["model.embed_tokens_per_layer.weight",
                  "model.per_layer_model_projection.weight",
                  "model.per_layer_projection_norm.weight"]
    for i in range(L):
        kv_shared = n_shared > 0 and i >= first_shared
        sliding = i < len(layer_types) and layer_types[i] == "sliding_attention"
        alt = k_eq_v and not sliding
        p = f"model.layers.{i}"
        names += [f"{p}.input_layernorm.weight", f"{p}.layer_scalar",
                  f"{p}.mlp.down_proj.weight", f"{p}.mlp.gate_proj.weight",
                  f"{p}.mlp.up_proj.weight",
                  f"{p}.post_attention_layernorm.weight",
                  f"{p}.post_feedforward_layernorm.weight",
                  f"{p}.pre_feedforward_layernorm.weight",
                  f"{p}.self_attn.o_proj.weight",
                  f"{p}.self_attn.q_norm.weight",
                  f"{p}.self_attn.q_proj.weight"]
        if moe:
            names += [f"{p}.router.per_expert_scale",
                      f"{p}.router.proj.weight", f"{p}.router.scale",
                      f"{p}.post_feedforward_layernorm_1.weight",
                      f"{p}.post_feedforward_layernorm_2.weight",
                      f"{p}.pre_feedforward_layernorm_2.weight"]
            for j in range(int(txt["num_experts"])):
                names += [f"{p}.mlp.experts.{j}.down_proj.weight",
                          f"{p}.mlp.experts.{j}.gate_proj.weight",
                          f"{p}.mlp.experts.{j}.up_proj.weight"]
        if not kv_shared:
            names += [f"{p}.self_attn.k_norm.weight",
                      f"{p}.self_attn.k_proj.weight"]
            if not alt:
                names += [f"{p}.self_attn.v_proj.weight"]
        if ple:
            names += [f"{p}.per_layer_input_gate.weight",
                      f"{p}.per_layer_projection.weight",
                      f"{p}.post_per_layer_input_norm.weight"]
    names += ["model.norm.weight"]
    return names


def convert_gemma4(w, f, cfg, sd, dtype):
    """Gemma4ForConditionalGeneration → Gemma4 (reference Gemma4Converter,
    convert.py:6785): PLE/KV-shared/k-as-v/cascaded-MoE text stack + SigLIP
    visual + conformer audio towers."""
    txt, L, swa, moe = _gemma4_cfg(w, f, cfg, dtype, ModelType.GEMMA4)
    vis = cfg.get("vision_config") or {}
    aud = cfg.get("audio_config")
    r = {}
    for name, t in sd.items():
        if name.startswith("model.vision_tower.encoder.layers."):
            name = name.replace("model.vision_tower.encoder.layers.",
                                "visual.blocks.")
            r[name.replace(".linear.weight", ".weight")] = t
        elif name.startswith("model.vision_tower."):
            r[name.replace("model.vision_tower.", "visual.")] = t
        elif name.startswith("model.audio_tower.layers."):
            name = name.replace("model.audio_tower.layers.", "audio.layers.")
            r[name.replace(".linear.weight", ".weight")] = t
        elif name.startswith("model.audio_tower."):
            r[name.replace("model.audio_tower.", "audio.")] = t
        elif name == "model.embed_audio.embedding_projection.weight":
            r["audio.embedding_projection.weight"] = t
        elif name == "model.embed_vision.embedding_projection.weight":
            r["visual.embedding_projection.weight"] = t
        else:
            r[name] = t
    if aud is not None and "audio.output_proj.bias" in r:
        r["audio.pos_embed.weight"] = \
            _gemma4_aud_pos_embed(int(aud["hidden_size"]))
    sd = _gemma4_llm_pp(r, txt)
    names = _gemma4_llm_names(txt)
    # visual tower (get_vis_weight_names, convert.py:7001) — text-only
    # fine-tunes may ship without it
    has_vis = "visual.patch_embedder.input_proj.weight" in sd
    if has_vis:
        names += ["visual.patch_embedder.input_proj.weight",
                  "visual.patch_embedder.position_embedding_table",
                  "visual.embedding_projection.weight"]
    if has_vis and vis.get("standardize"):
        names += ["visual.std_bias", "visual.std_scale"]
    for i in range(int(vis.get("num_hidden_layers") or 0) if has_vis else 0):
        p = f"visual.blocks.{i}"
        names += [f"{p}.input_layernorm.weight",
                  f"{p}.mlp.down_proj.weight", f"{p}.mlp.gate_proj.weight",
                  f"{p}.mlp.up_proj.weight",
                  f"{p}.post_attention_layernorm.weight",
                  f"{p}.post_feedforward_layernorm.weight",
                  f"{p}.pre_feedforward_layernorm.weight",
                  f"{p}.self_attn.k_norm.weight",
                  f"{p}.self_attn.k_proj.weight",
                  f"{p}.self_attn.o_proj.weight",
                  f"{p}.self_attn.q_norm.weight",
                  f"{p}.self_attn.q_proj.weight",
                  f"{p}.self_attn.v_proj.weight"]
    if aud is not None and "audio.output_proj.bias" in sd:
        assert not aud.get("use_clipped_linears"), \
            "clipped-linear audio towers not supported"
        names += ["audio.output_proj.bias", "audio.output_proj.weight",
                  "audio.pos_embed.weight",
                  "audio.subsample_conv_projection.input_proj_linear.weight",
                  "audio.subsample_conv_projection.layer0.conv.weight",
                  "audio.subsample_conv_projection.layer0.norm.weight",
                  "audio.subsample_conv_projection.layer1.conv.weight",
                  "audio.subsample_conv_projection.layer1.norm.weight",
                  "audio.embedding_projection.weight"]
        for i in range(int(aud["num_hidden_layers"])):
            p = f"audio.layers.{i}"
            names += [f"{p}.lconv1d.conv_norm.weight",
                      f"{p}.lconv1d.depthwise_conv1d.weight",
                      f"{p}.lconv1d.linear_end.weight",
                      f"{p}.lconv1d.linear_start.weight",
                      f"{p}.lconv1d.pre_layer_norm.weight",
                      f"{p}.norm_out.weight", f"{p}.norm_post_attn.weight",
                      f"{p}.norm_pre_attn.weight",
                      f"{p}.self_attn.k_proj.weight",
                      f"{p}.self_attn.per_dim_scale",
                      f"{p}.self_attn.post.weight",
                      f"{p}.self_attn.q_proj.weight",
                      f"{p}.self_attn.relative_k_proj.weight",
                      f"{p}.self_attn.v_proj.weight"]
            for j in (1, 2):
                names += [f"{p}.feed_forward{j}.ffw_layer_1.weight",
                          f"{p}.feed_forward{j}.ffw_layer_2.weight",
                          f"{p}.feed_forward{j}.post_layer_norm.weight",
                          f"{p}.feed_forward{j}.pre_layer_norm.weight"]
    _emit(w, sd, names, dtype)


def convert_gemma4_unified(w, f, cfg, sd, dtype):
    """Gemma4UnifiedForConditionalGeneration → Gemma4Unified (reference
    Gemma4UnifiedConverter, convert.py:7132): Gemma4 text stack + raw
    patch/pos vision embedder (no towers)."""
    txt, L, swa, moe = _gemma4_cfg(w, f, cfg, dtype, ModelType.GEMMA4_Unified)
    r = {}
    for name, t in sd.items():
        if name == "model.vision_embedder.pos_embedding":
            r[name + "_x"] = np.ascontiguousarray(t[:, 0, :])
            r[name + "_y"] = np.ascontiguousarray(t[:, 1, :])
        elif name == "model.embed_audio.embedding_projection.weight":
            r["audio.embedding_projection.weight"] = t
        elif name == "model.embed_vision.embedding_projection.weight":
            r["visual.embedding_projection.weight"] = t
        else:
            r[name] = t
    sd = _gemma4_llm_pp(r, txt)
    names = _gemma4_llm_names(txt)
    names += ["audio.embedding_projection.weight",
              "visual.embedding_projection.weight",
              "model.vision_embedder.pos_embedding_x",
              "model.vision_embedder.pos_embedding_y",
              "model.vision_embedder.patch_dense.bias",
              "model.vision_embedder.patch_dense.weight",
              "model.vision_embedder.patch_ln1.bias",
              "model.vision_embedder.patch_ln1.weight",
              "model.vision_embedder.patch_ln2.bias",
              "model.vision_embedder.patch_ln2.weight",
              "model.vision_embedder.pos_norm.bias",
              "model.vision_embedder.pos_norm.weight"]
    _emit(w, sd, names, dtype)


EXTRA_CONVERTERS4 = {
    "KimiVLForConditionalGeneration": convert_kimi_vl,
    "LocateAnythingForConditionalGeneration": convert_locate_anything,
    "DotsOCRForCausalLM": convert_dots_ocr,
    "StepVLForConditionalGeneration": convert_step_vl,
    "YoutuVLForConditionalGeneration": convert_youtu_vl,
    "PenguinVLQwen3ForCausalLM": convert_penguin_vl,
    "PaddleOCRVLForConditionalGeneration": convert_paddle_ocr_vl,
    "NEOChatModel": convert_neochat,
    "InternVLChatModel": convert_internvl_chat,
    "GlmOcrForConditionalGeneration": convert_glm_ocr,
    "Gemma4ForConditionalGeneration": convert_gemma4,
    "Gemma4UnifiedForConditionalGeneration": convert_gemma4_unified,
}
