"""HF checkpoint → GGMM converters, wave 6 (MoE tail + exotic formats).

Same emitter contract as convert.py / convert_extra.py; reference class
cited per-function."""
from __future__ import annotations

import struct

import numpy as np

from ..ggmm.quants import GGMLType
from ..models.model_types import ModelType
from .convert import _base_vals, _llama_like_names, permute_rope
from .convert_extra import _emit, _permuted


# ---------------------------------------------------------------------------
# DeepSeek-v1-layout MoE family: Xverse, Bailing, Megrez
# ---------------------------------------------------------------------------

def _dsv1_weight_names(cfg):
    """reference DeepSeekV1Converter.get_weight_names:7766."""
    names = ["model.embed_tokens.weight", "model.norm.weight",
             "lm_head.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight"]
        if (i >= cfg["first_k_dense_replace"]
                and i % cfg["moe_layer_freq"] == 0):
            names += [f"{pfx}.mlp.gate.weight",
                      f"{pfx}.mlp.shared_experts.gate_proj.weight",
                      f"{pfx}.mlp.shared_experts.up_proj.weight",
                      f"{pfx}.mlp.shared_experts.down_proj.weight"]
            for j in range(cfg["n_routed_experts"]):
                names += [f"{pfx}.mlp.experts.{j}.gate_proj.weight",
                          f"{pfx}.mlp.experts.{j}.up_proj.weight",
                          f"{pfx}.mlp.experts.{j}.down_proj.weight"]
        else:
            names += [f"{pfx}.mlp.gate_proj.weight",
                      f"{pfx}.mlp.up_proj.weight",
                      f"{pfx}.mlp.down_proj.weight"]
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.weight"]
    return names


def _dsv1_ints(cfg):
    return [cfg["num_key_value_heads"], cfg["first_k_dense_replace"],
            cfg["moe_intermediate_size"], cfg["moe_layer_freq"],
            cfg["n_routed_experts"], cfg["n_shared_experts"],
            1 if cfg.get("norm_topk_prob") else 0,
            cfg["num_experts_per_tok"]]


def convert_xverse(w, f, cfg, sd, dtype):
    """XverseForCausalLM (reference dispatch 10857): dense → llama layout
    typed XVERSE; MoE → DeepSeekV1 layout with mlp.router → mlp.gate
    (XverseMoEConverter:7808)."""
    from .convert import convert_llama

    if not cfg.get("num_experts"):
        convert_llama(w, f, cfg, sd, dtype)
        w.patch_model_type(int(ModelType.XVERSE))
        return
    cfg = dict(cfg)
    cfg.update(num_key_value_heads=cfg["num_attention_heads"],
               first_k_dense_replace=0,
               moe_intermediate_size=cfg["intermediate_size"],
               moe_layer_freq=1, n_routed_experts=cfg["num_experts"],
               n_shared_experts=cfg["num_shared_experts"],
               norm_topk_prob=True,
               num_experts_per_tok=cfg["moe_top_k"])
    new = {}
    for name, arr in sd.items():
        if name.endswith("mlp.router.weight"):
            new[name.replace(".router.", ".gate.")] = arr
        else:
            new[name] = arr
    new = _permuted(cfg, new)
    w.write_config(_base_vals(cfg, dtype) + _dsv1_ints(cfg), fmt="19i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta") or 10000.0)))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.XVERSEMOE))
    _emit(w, new, _dsv1_weight_names(cfg), dtype)


def _bailing_remap(cfg, sd, *, permute, qk_norm=False):
    heads = cfg["num_attention_heads"]
    kv = cfg["num_key_value_heads"]
    hd = cfg["head_dim"] or cfg["hidden_size"] // heads
    new = {}
    for name, arr in sd.items():
        if name == "model.word_embeddings.weight":
            new["model.embed_tokens.weight"] = arr
        elif name == "lm_head.weight":
            if cfg.get("norm_head"):
                arr = arr / (np.linalg.norm(arr, axis=0, keepdims=True)
                             + 1e-7)
            new[name] = arr
        elif name.endswith("query_key_value.weight"):
            q = arr[:heads * hd]
            k = arr[heads * hd:(heads + kv) * hd]
            v = arr[(heads + kv) * hd:]
            if permute:
                q, k = permute_rope(q, heads), permute_rope(k, kv)
            new[name.replace("attention.query_key_value",
                             "self_attn.q_proj")] = q
            new[name.replace("attention.query_key_value",
                             "self_attn.k_proj")] = k
            new[name.replace("attention.query_key_value",
                             "self_attn.v_proj")] = v
        elif name.endswith("attention.dense.weight"):
            new[name.replace("attention.dense", "self_attn.o_proj")] = arr
        elif qk_norm and name.endswith("attention.query_layernorm.weight"):
            new[name.replace("attention.query_layernorm",
                             "self_attn.q_norm")] = arr
        elif qk_norm and name.endswith("attention.key_layernorm.weight"):
            new[name.replace("attention.key_layernorm",
                             "self_attn.k_norm")] = arr
        else:
            new[name] = arr
    return new


def convert_bailing_moe(w, f, cfg, sd, dtype):
    """BailingMoeForCausalLM / Ling (reference BailingMoeConverter:7841):
    DeepSeekV1 layout + trailing head_dim."""
    cfg = dict(cfg)
    cfg.setdefault("moe_layer_freq", 1)
    cfg["n_routed_experts"] = cfg["num_experts"]
    cfg["n_shared_experts"] = cfg["num_shared_experts"]
    head_dim = cfg.get("head_dim") or (cfg["hidden_size"] //
                                       cfg["num_attention_heads"])
    cfg["head_dim"] = head_dim
    new = _bailing_remap(cfg, sd, permute=True)
    w.write_config(_base_vals(cfg, dtype) + _dsv1_ints(cfg), fmt="19i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta") or 10000.0)))
    f.write(struct.pack("<i", head_dim))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.BAILINGMOE))
    _emit(w, new, _dsv1_weight_names(cfg), dtype)


def convert_bailing_moe2(w, f, cfg, sd, dtype, *, mtype=None):
    """BailingMoeV2ForCausalLM / Ring (reference BailingMoe2Converter:7899):
    + qk-norm, grouped routing, expert bias; NO rope permute (partial
    rotary)."""
    assert cfg.get("rope_scaling") is None
    assert cfg.get("moe_router_enable_expert_bias")
    cfg = dict(cfg)
    cfg.setdefault("moe_layer_freq", 1)
    cfg["n_routed_experts"] = cfg["num_experts"]
    cfg["n_shared_experts"] = cfg["num_shared_experts"]
    head_dim = cfg.get("head_dim") or (cfg["hidden_size"] //
                                       cfg["num_attention_heads"])
    cfg["head_dim"] = head_dim
    new = _bailing_remap(cfg, sd, permute=False, qk_norm=True)
    w.write_config(_base_vals(cfg, dtype) + _dsv1_ints(cfg), fmt="19i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta") or 10000.0)))
    f.write(struct.pack("<i", head_dim))
    f.write(struct.pack(
        "<iiif", int(head_dim * cfg.get("partial_rotary_factor", 1.0)),
        cfg["n_group"], cfg["topk_group"],
        float(cfg["routed_scaling_factor"])))
    w._patch_offset(12)
    w.patch_model_type(int(mtype if mtype is not None
                           else ModelType.BAILING_MOE2))
    names = _dsv1_weight_names(cfg)
    for i in range(cfg["num_hidden_layers"]):
        names += [f"model.layers.{i}.self_attn.k_norm.weight",
                  f"model.layers.{i}.self_attn.q_norm.weight"]
        if (i >= cfg["first_k_dense_replace"]
                and i % cfg["moe_layer_freq"] == 0):
            names.append(f"model.layers.{i}.mlp.gate.expert_bias")
    _emit(w, new, names, dtype)


def convert_llada2(w, f, cfg, sd, dtype):
    convert_bailing_moe2(w, f, cfg, sd, dtype, mtype=ModelType.LLADA2)


def convert_megrez_moe(w, f, cfg, sd, dtype):
    """MegrezMoeForCausalLM (reference MegrezMoEConverter:9717): DSv1 layout
    + {experts_shared_frequency, n_group, topk_group, routed_scaling}, with
    expert stacks shared across layer groups."""
    assert not cfg.get("attention_bias") and cfg.get("ep_size", 1) == 1
    assert cfg.get("rope_scaling") is None
    assert cfg["scoring_func"] == "sigmoid"
    assert cfg["topk_method"] == "noaux_tc" and cfg.get("pre_gate")
    w.write_config(_base_vals(cfg, dtype) + _dsv1_ints(cfg), fmt="19i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta") or 10000.0)))
    f.write(struct.pack("<iiif", cfg["experts_shared_frequency"],
                        cfg["n_group"], cfg["topk_group"],
                        float(cfg["routed_scaling_factor"])))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.MEGREZ_MOE))
    names = ["model.embed_tokens.weight", "model.norm.weight",
             "lm_head.weight"]
    fkd = cfg["first_k_dense_replace"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight"]
        if i >= fkd and i % cfg["moe_layer_freq"] == 0:
            names += [f"{pfx}.mlp.gate.e_score_correction_bias",
                      f"{pfx}.mlp.gate.weight",
                      f"{pfx}.mlp.shared_experts.gate_proj.weight",
                      f"{pfx}.mlp.shared_experts.up_proj.weight",
                      f"{pfx}.mlp.shared_experts.down_proj.weight"]
            if (i - fkd) % cfg["experts_shared_frequency"] == 0:
                for j in range(cfg["n_routed_experts"]):
                    names += [f"{pfx}.mlp.experts.{j}.gate_proj.weight",
                              f"{pfx}.mlp.experts.{j}.up_proj.weight",
                              f"{pfx}.mlp.experts.{j}.down_proj.weight"]
        else:
            names += [f"{pfx}.mlp.gate_proj.weight",
                      f"{pfx}.mlp.up_proj.weight",
                      f"{pfx}.mlp.down_proj.weight"]
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.weight"]
    _emit(w, _permuted(cfg, sd), names, dtype)


# ---------------------------------------------------------------------------
# HunYuan dense (dynamic-NTK prefold) and V3 MoE
# ---------------------------------------------------------------------------

def convert_hunyuan_dense(w, f, cfg, sd, dtype):
    """HunYuanForCausalLM (reference HunYuanDenseConverter:8455): fused
    qkv/gate_up split, qk full norm, NTK alpha folded into theta."""
    assert cfg.get("tie_word_embeddings")
    assert cfg["rope_scaling"]["type"] == "dynamic"
    assert cfg.get("use_qk_norm")
    heads = cfg["num_attention_heads"]
    kv = cfg["num_key_value_heads"]
    hd = cfg["hidden_size"] // heads
    kvg = heads // kv
    gs = 2 + kvg
    new = {}
    for name, arr in sd.items():
        if name.endswith("mlp.gate_and_up_proj.weight"):
            half = arr.shape[0] // 2
            new[name.replace("gate_and_up_proj", "gate_proj")] = arr[half:]
            new[name.replace("gate_and_up_proj", "up_proj")] = arr[:half]
        elif name.endswith(".qkv_proj.weight"):
            h = arr.shape[0] // (gs * hd)
            v = arr.reshape(h, gs, hd, cfg["hidden_size"])
            new[name.replace("qkv_proj", "q_proj")] = \
                v[:, :kvg].reshape(h * kvg * hd, -1)
            new[name.replace("qkv_proj", "k_proj")] = \
                v[:, -2].reshape(h * hd, -1)
            new[name.replace("qkv_proj", "v_proj")] = \
                v[:, -1].reshape(h * hd, -1)
        else:
            new[name] = arr
    head_dim = cfg.get("attention_head_dim", hd)
    theta = float(cfg.get("rope_theta", 10000.0)) * \
        float(cfg["rope_scaling"]["alpha"]) ** (head_dim / (head_dim - 2))
    w.write_config(_base_vals(cfg, dtype) + [kv], fmt="12i")
    f.write(struct.pack("<f", theta))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.HUNYUAN_DENSE))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.mlp.down_proj.weight",
                  f"{pfx}.mlp.gate_proj.weight",
                  f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.key_layernorm.weight",
                  f"{pfx}.self_attn.query_layernorm.weight"]
    names.append("model.norm.weight")
    _emit(w, new, names, dtype)


def convert_hunyuan_v3(w, f, cfg, sd, dtype):
    """HYV3ForCausalLM (reference HunYuanV3Converter:8647): sigmoid-routed
    grouped MoE with expert bias + shared expert."""
    assert not cfg.get("use_grouped_mm") and cfg.get("qk_norm")
    assert cfg.get("moe_router_enable_expert_bias")
    assert cfg.get("moe_router_use_sigmoid") and cfg.get("route_norm")
    tie = bool(cfg.get("tie_word_embeddings", False))
    new = {}
    for name, arr in sd.items():
        name = (name.replace(".mlp.router.gate.", ".mlp.gate.")
                    .replace(".shared_mlp.", ".shared_expert."))
        new[name] = arr
    w.write_config(_base_vals(cfg, dtype) + [
        cfg["num_key_value_heads"], cfg["head_dim"],
        cfg["first_k_dense_replace"], cfg["num_experts"],
        cfg["num_shared_experts"], cfg["expert_hidden_dim"],
        cfg["moe_intermediate_size"], cfg["num_experts_per_tok"],
        int(tie)], fmt="20i")
    f.write(struct.pack("<2f", float(cfg["rope_theta"]),
                        float(cfg["router_scaling_factor"])))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.HUNYUAN_V3))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        if i >= cfg["first_k_dense_replace"]:
            for j in range(cfg["num_experts"]):
                names += [f"{pfx}.mlp.experts.{j}.down_proj.weight",
                          f"{pfx}.mlp.experts.{j}.gate_proj.weight",
                          f"{pfx}.mlp.experts.{j}.up_proj.weight"]
            names += [f"{pfx}.mlp.expert_bias", f"{pfx}.mlp.gate.weight",
                      f"{pfx}.mlp.shared_expert.down_proj.weight",
                      f"{pfx}.mlp.shared_expert.gate_proj.weight",
                      f"{pfx}.mlp.shared_expert.up_proj.weight"]
        else:
            names += [f"{pfx}.mlp.down_proj.weight",
                      f"{pfx}.mlp.gate_proj.weight",
                      f"{pfx}.mlp.up_proj.weight"]
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.k_norm.weight",
                  f"{pfx}.self_attn.q_norm.weight"]
    names.append("model.norm.weight")
    if not tie:
        names.append("lm_head.weight")
    elif "lm_head.weight" in new:
        pass
    _emit(w, new, names, dtype)


# ---------------------------------------------------------------------------
# Grove / Pangu / Ouro / Nanbeige / Youtu / RNJ / BaiChuanM1
# ---------------------------------------------------------------------------

def convert_grove_moe(w, f, cfg, sd, dtype):
    """GroveMoEForCausalLM (reference GroveMoEConverter:9288): qwen3-MoE
    weight set + per-group chunk experts, names sorted."""
    assert not cfg.get("use_sliding_window") and not cfg.get("attention_bias")
    assert cfg.get("rope_scaling") is None and cfg.get("norm_topk_prob")
    assert not cfg.get("tie_word_embeddings")
    assert cfg.get("mlp_only_layers") == []
    n_layers = cfg["num_hidden_layers"]
    n_exp = cfg["num_experts"]
    epg = 2
    w.write_config(_base_vals(cfg, dtype) +
                   [cfg["num_key_value_heads"], cfg["head_dim"]], fmt="13i")
    f.write(struct.pack("<f", float(cfg["rope_theta"])))
    f.write(struct.pack("<5i", cfg["moe_intermediate_size"],
                        cfg["num_experts_per_tok"], n_exp, epg, 128))
    f.write(struct.pack("<f", 0.05))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.GROVE_MOE))
    names = ["model.embed_tokens.weight", "model.norm.weight",
             "lm_head.weight"]
    for i in range(n_layers):
        pfx = f"model.layers.{i}"
        names.append(f"{pfx}.input_layernorm.weight")
        for j in range(n_exp):
            names += [f"{pfx}.mlp.experts.{j}.down_proj.weight",
                      f"{pfx}.mlp.experts.{j}.gate_proj.weight",
                      f"{pfx}.mlp.experts.{j}.up_proj.weight"]
        names.append(f"{pfx}.mlp.gate.weight")
        names += [f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.k_norm.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.q_norm.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight"]
        for j in range(n_exp // epg):
            names += [f"{pfx}.mlp.chunk_experts.{j}.down_proj.weight",
                      f"{pfx}.mlp.chunk_experts.{j}.gate_proj.weight",
                      f"{pfx}.mlp.chunk_experts.{j}.up_proj.weight"]
    names.sort()
    _emit(w, sd, names, dtype)


def convert_pangu_embedded(w, f, cfg, sd, dtype):
    """PanguEmbeddedForCausalLM (reference PanguEmbeddedConverter:5548):
    biased qkv/o, NEOX rope — no permute."""
    tie = bool(cfg.get("tie_word_embeddings", False))
    w.write_config(_base_vals(cfg, dtype) +
                   [cfg["num_key_value_heads"], int(tie)], fmt="13i")
    f.write(struct.pack("<f", float(cfg["rope_theta"])))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.PANGU_EMBEDDED))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.mlp.down_proj.weight",
                  f"{pfx}.mlp.gate_proj.weight",
                  f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.k_proj.bias",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.q_proj.bias",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.v_proj.bias",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.self_attn.o_proj.bias"]
    names.append("model.norm.weight")
    if not tie:
        names.append("lm_head.weight")
    _emit(w, sd, names, dtype)


def convert_pangu_moe(w, f, cfg, sd, dtype):
    """PanguProMoEForCausalLM (reference PanguMoEConverter:5487): grouped
    router + shared expert + per-layer router_scale."""
    assert not cfg.get("tie_word_embeddings")
    cfg = dict(cfg)
    assert cfg.get("intermediate_size") is None
    cfg["intermediate_size"] = cfg["shared_expert_intermediate_size"]
    w.write_config(_base_vals(cfg, dtype) +
                   [cfg["num_key_value_heads"], cfg["moe_intermediate_size"],
                    cfg["num_experts_per_tok"], cfg["num_experts"]],
                   fmt="15i")
    f.write(struct.pack("<f", float(cfg["rope_theta"])))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.PANGU_MOE))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names.append(f"{pfx}.input_layernorm.weight")
        for j in range(cfg["num_experts"]):
            names += [f"{pfx}.mlp.experts.{j}.down_proj.weight",
                      f"{pfx}.mlp.experts.{j}.gate_proj.weight",
                      f"{pfx}.mlp.experts.{j}.up_proj.weight"]
        names += [f"{pfx}.mlp.gate.weight",
                  f"{pfx}.mlp.shared_expert.down_proj.weight",
                  f"{pfx}.mlp.shared_expert.gate_proj.weight",
                  f"{pfx}.mlp.shared_expert.up_proj.weight",
                  f"{pfx}.mlp.router_scale",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.k_proj.bias",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.q_proj.bias",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.v_proj.bias",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.self_attn.o_proj.bias"]
    names += ["model.norm.weight", "lm_head.weight"]
    _emit(w, sd, names, dtype)


def convert_ouro(w, f, cfg, sd, dtype):
    """OuroForCausalLM (reference OuroConverter:9791): looped llama with
    twin per-phase norms + early-exit gate."""
    assert cfg.get("rope_scaling") is None
    w.write_config(_base_vals(cfg, dtype) +
                   [cfg["num_key_value_heads"]], fmt="12i")
    f.write(struct.pack("<f", float(cfg["rope_theta"])))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.OURO))
    names = _llama_like_names(cfg["num_hidden_layers"], tie=False)
    for i in range(cfg["num_hidden_layers"]):
        names += [f"model.layers.{i}.input_layernorm_2.weight",
                  f"model.layers.{i}.post_attention_layernorm_2.weight"]
    names += ["model.early_exit_gate.bias", "model.early_exit_gate.weight"]
    _emit(w, _permuted(cfg, sd), names, dtype)


def convert_nanbeige(w, f, cfg, sd, dtype):
    """NanbeigeForCausalLM (reference NanbeigeConverter:10479): looped
    llama with head_dim + skip_loop_final_norm."""
    assert not cfg.get("loop_loss_weights")
    assert cfg.get("rope_scaling") is None
    tie = bool(cfg.get("tie_word_embeddings", False))
    head_dim = cfg.get("head_dim") or (cfg["hidden_size"] //
                                       cfg["num_attention_heads"])
    w.write_config(_base_vals(cfg, dtype) + [
        cfg["num_key_value_heads"], head_dim, cfg["num_loops"],
        1 if cfg.get("skip_loop_final_norm") else 0, int(tie)], fmt="16i")
    f.write(struct.pack("<f", float(cfg["rope_theta"])))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.NANBEIGE))
    if tie:
        sd.setdefault("lm_head.weight", sd["model.embed_tokens.weight"])
    _emit(w, _permuted(cfg, sd),
          _llama_like_names(cfg["num_hidden_layers"], tie=tie), dtype)


def convert_youtu(w, f, cfg, sd, dtype):
    """YoutuForCausalLM (reference YoutuConverter:9993): MiniCPM3-style MLA
    splits, tied head, default rope."""
    from .convert_extra import convert_minicpm3  # noqa: F401 (split logic)

    assert cfg.get("rope_interleave")
    rp = cfg.get("rope_parameters")
    theta = (float(rp["rope_theta"]) if rp is not None
             else float(cfg["rope_theta"]))
    if rp is not None:
        assert rp["rope_type"] == "default"
    cfg = dict(cfg)
    v_head = cfg.get("v_head_dim") or (cfg["hidden_size"] //
                                       cfg["num_attention_heads"])
    cfg["v_head_dim"] = v_head
    assert cfg.get("tie_word_embeddings")
    w.write_config(_base_vals(cfg, dtype) + [
        cfg["num_key_value_heads"], cfg["kv_lora_rank"], cfg["q_lora_rank"],
        cfg["qk_nope_head_dim"], cfg["qk_rope_head_dim"], v_head,
        int(bool(cfg["tie_word_embeddings"]))], fmt="18i")
    f.write(struct.pack("<f", theta))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.YOUTU))
    new = {}
    H = cfg["num_attention_heads"]
    nope = cfg["qk_nope_head_dim"]
    for name, arr in sd.items():
        if name.endswith("kv_a_proj_with_mqa.weight"):
            new[name.replace("kv_a_proj_with_mqa", "d_kv_proj")] = \
                arr[:cfg["kv_lora_rank"]]
            new[name.replace("kv_a_proj_with_mqa", "k_pe_proj")] = \
                arr[cfg["kv_lora_rank"]:]
        elif name.endswith("kv_a_layernorm.weight"):
            new[name.replace("kv_a_layernorm", "kv_norm")] = arr
        elif name.endswith("kv_b_proj.weight"):
            v = arr.reshape(H, nope + v_head, cfg["kv_lora_rank"])
            new[name.replace("kv_b_proj", "u_k_nope_proj")] = \
                v[:, :nope].reshape(H * nope, -1)
            new[name.replace("kv_b_proj", "u_v_proj")] = \
                v[:, nope:].reshape(H * v_head, -1)
        elif name.endswith("q_a_proj.weight"):
            new[name.replace("q_a_proj", "d_q_proj")] = arr
        elif name.endswith("q_a_layernorm.weight"):
            new[name.replace("q_a_layernorm", "q_norm")] = arr
        elif name.endswith("q_b_proj.weight"):
            new[name.replace("q_b_proj", "u_q_proj")] = arr
        else:
            new[name] = arr
    names = ["model.embed_tokens.weight", "model.norm.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.self_attn.d_q_proj.weight",
                  f"{pfx}.self_attn.q_norm.weight",
                  f"{pfx}.self_attn.u_q_proj.weight",
                  f"{pfx}.self_attn.d_kv_proj.weight",
                  f"{pfx}.self_attn.k_pe_proj.weight",
                  f"{pfx}.self_attn.kv_norm.weight",
                  f"{pfx}.self_attn.u_k_nope_proj.weight",
                  f"{pfx}.self_attn.u_v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.mlp.gate_proj.weight",
                  f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.mlp.down_proj.weight",
                  f"{pfx}.input_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.weight"]
    _emit(w, new, names, dtype)


def convert_rnj(w, f, cfg, sd, dtype):
    """Gemma3ForCausalLM + yarn rope_scaling → RNJ-1 (reference
    RNJ_1Converter:7182): gemma3 layout with scaling/softcaps moved to the
    yarn tail."""
    from .convert import convert_gemma3

    cfg = dict(cfg)
    sc = cfg.pop("rope_scaling")
    final_cap = cfg.pop("final_logit_softcapping", None)
    attn_cap = cfg.pop("attn_logit_softcapping", None)
    convert_gemma3(w, f, cfg, sd, dtype)
    f.seek(0, 2)
    f.write(struct.pack(
        "<fffffiff", float(sc["attn_factor"]), float(sc["beta_fast"]),
        float(sc["beta_slow"]), float(sc["extrapolation_factor"]),
        float(sc["factor"]), int(sc["original_max_position_embeddings"]),
        final_cap if final_cap is not None else -1.0,
        attn_cap if attn_cap is not None else -1.0))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.RNJ_1))


def convert_baichuan_m1(w, f, cfg, sd, dtype):
    """BaiChuanM1ForCausalLM (reference BaiChuanM1Converter:3493): W_pack
    split per-layer (SWA layers use their own head counts), conv_k/conv_v
    squeeze, normalized lm_head."""
    import re as _re

    assert cfg["conv_window"] == 2
    swa_layers = cfg["sliding_window_layers"]
    pattern = swa_layers[1] - swa_layers[0]
    assert swa_layers == list(range(1, cfg["num_hidden_layers"], pattern))
    new = {}
    for name, arr in sd.items():
        if name == "lm_head.weight":
            new[name] = arr / np.maximum(
                np.linalg.norm(arr, axis=1, keepdims=True), 1e-12)
        elif name.endswith("W_pack.weight"):
            lid = int(_re.findall(r"layers\.([0-9]+)\.self_attn", name)[0])
            if lid in swa_layers:
                h, kvh = (cfg["num_swa_attention_heads"],
                          cfg["num_swa_key_value_heads"])
            else:
                h, kvh = (cfg["num_attention_heads"],
                          cfg["num_key_value_heads"])
            hd = cfg["hidden_size"] // h
            k_size = hd * kvh
            new[name.replace("W_pack", "q_proj")] = arr[:cfg["hidden_size"]]
            new[name.replace("W_pack", "k_proj")] = \
                arr[cfg["hidden_size"]:cfg["hidden_size"] + k_size]
            new[name.replace("W_pack", "v_proj")] = \
                arr[cfg["hidden_size"] + k_size:]
        elif name.endswith((".conv_k", ".conv_v")):
            s = arr.shape
            new[name] = arr.reshape(s[2], s[4])
        else:
            new[name] = arr
    w.write_config(_base_vals(cfg, dtype) + [
        cfg["num_key_value_heads"], cfg["conv_window"],
        cfg["num_swa_attention_heads"], cfg["num_swa_key_value_heads"],
        cfg["sliding_window"], pattern], fmt="17i")
    f.write(struct.pack("<f", float(cfg["rope_theta"])))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.BAICHUAN_M1))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.mlp.down_proj.weight",
                  f"{pfx}.mlp.gate_proj.weight",
                  f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.conv_k",
                  f"{pfx}.self_attn.conv_v"]
    names += ["model.norm.weight", "lm_head.weight"]
    _emit(w, new, names, dtype)


# ---------------------------------------------------------------------------
# QWen v1 (GPT-style names, tiktoken vocab, file version 2)
# ---------------------------------------------------------------------------

def _export_qwen_tiktoken(w, model_dir):
    import os

    from .convert_extra import _export_tiktoken_vocab

    # qwen v1 ships qwen.tiktoken; reuse the mergeable-ranks exporter by
    # aliasing the filename
    src = os.path.join(model_dir, "qwen.tiktoken")
    if os.path.isfile(src) and not os.path.isfile(
            os.path.join(model_dir, "tokenizer.model")):
        import shutil
        import tempfile

        tmpd = tempfile.mkdtemp()
        shutil.copy(src, os.path.join(tmpd, "tokenizer.model"))
        _export_tiktoken_vocab(w, tmpd)
    else:
        _export_tiktoken_vocab(w, model_dir)


def convert_qwen_v1(w, f, cfg, sd, dtype):
    """QWenLMHeadModel (reference QWenConverter:4690): fused c_attn split
    three-way, intermediate_size halved, flags {dynamic_ntk, logn_attn},
    FILE_VERSION 2."""
    cfg = dict(cfg)
    cfg.setdefault("hidden_size", cfg.get("n_embd"))
    cfg.setdefault("num_attention_heads", cfg.get("n_head"))
    cfg.setdefault("num_hidden_layers", cfg.get("n_layer"))
    cfg.setdefault("max_position_embeddings", cfg.get("n_positions"))
    cfg.setdefault("intermediate_size", cfg.get("ffn_hidden_size"))
    assert cfg.get("no_bias") and cfg.get("scale_attn_weights")
    assert cfg["kv_channels"] * cfg["num_attention_heads"] == \
        cfg["hidden_size"]
    rope_dim = int(cfg["kv_channels"] * cfg["rotary_pct"])
    flags = (1 if cfg.get("use_dynamic_ntk") else 0) | \
            (2 if cfg.get("use_logn_attn") else 0)
    vals = _base_vals(cfg, dtype)
    vals[5] = cfg["intermediate_size"] // 2
    w.write_config(vals + [cfg["seq_length"], rope_dim, flags], fmt="14i")
    f.write(struct.pack("<f", float(cfg["rotary_emb_base"])))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.QWEN))
    if hasattr(w, "patch_file_version"):
        w.patch_file_version(2)
    new = dict(sd)
    for name in list(sd):
        if name.endswith("attn.c_attn.weight") or \
                name.endswith("attn.c_attn.bias"):
            arr = new.pop(name)
            r = arr.shape[0] // 3
            new[name.replace("c_attn", "q_proj")] = arr[:r]
            new[name.replace("c_attn", "k_proj")] = arr[r:2 * r]
            new[name.replace("c_attn", "v_proj")] = arr[2 * r:]
    names = ["transformer.wte.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"transformer.h.{i}"
        names += [f"{pfx}.attn.k_proj.weight", f"{pfx}.attn.k_proj.bias",
                  f"{pfx}.attn.q_proj.weight", f"{pfx}.attn.q_proj.bias",
                  f"{pfx}.attn.v_proj.weight", f"{pfx}.attn.v_proj.bias",
                  f"{pfx}.attn.c_proj.weight",
                  f"{pfx}.ln_1.weight", f"{pfx}.ln_2.weight",
                  f"{pfx}.mlp.c_proj.weight",
                  f"{pfx}.mlp.w1.weight", f"{pfx}.mlp.w2.weight"]
    names += ["transformer.ln_f.weight", "lm_head.weight"]
    w._vocab_override = _export_qwen_tiktoken
    _emit(w, new, names, dtype)


# ---------------------------------------------------------------------------
# llama-multi / alphageometry / qwen3-emb / forced-type wrappers
# ---------------------------------------------------------------------------

def convert_llama_multi(w, f, cfg, sd, dtype):
    """-a llama-multi-token-prediction-ckpt (reference
    LlamaMultiConverter:2311): params.json config, consolidated names,
    extra future-token heads; NO rope permute (native interleaved)."""
    cfg = dict(cfg)
    hidden_dim = 4 * cfg["dim"]
    inter = int(2 * hidden_dim / 3)
    if cfg.get("ffn_dim_multiplier") is not None:
        inter = int(cfg["ffn_dim_multiplier"] * inter)
    mo = cfg["multiple_of"]
    inter = mo * ((inter + mo - 1) // mo)
    n_future = cfg["n_future_tokens"]
    cfg.update(hidden_size=cfg["dim"], num_attention_heads=cfg["n_heads"],
               num_hidden_layers=cfg["n_layers"] - n_future + 1,
               intermediate_size=inter, max_position_embeddings=4096,
               num_key_value_heads=cfg["n_kv_heads"], bos_token_id=1,
               eos_token_id=2, vocab_size=cfg["vocab_size"])
    w.write_config(_base_vals(cfg, dtype) +
                   [cfg["num_key_value_heads"]], fmt="12i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta", 10000.0))))
    f.write(struct.pack("<i", n_future))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.LLAMA_MULTI))
    mapping = {
        "tok_embeddings.weight": "embed_tokens.weight",
        "attention_norm.weight": "input_layernorm.weight",
        "feed_forward.w1.weight": "mlp.gate_proj.weight",
        "feed_forward.w2.weight": "mlp.down_proj.weight",
        "feed_forward.w3.weight": "mlp.up_proj.weight",
        "ffn_norm.weight": "post_attention_layernorm.weight",
        "attention.wk.weight": "self_attn.k_proj.weight",
        "attention.wo.weight": "self_attn.o_proj.weight",
        "attention.wq.weight": "self_attn.q_proj.weight",
        "attention.wv.weight": "self_attn.v_proj.weight",
        "model.output.weight": "lm_head.weight",
    }
    new = {}
    for name, arr in sd.items():
        nn = "model." + name
        for k, v in mapping.items():
            if nn.endswith(k):
                nn = nn.replace(k, v)
                break
        new[nn] = arr
    names = _llama_like_names(cfg["num_hidden_layers"], tie=False)
    for i in range(n_future - 1):
        pfx = f"model.extra_heads.{i}"
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.mlp.down_proj.weight",
                  f"{pfx}.mlp.gate_proj.weight",
                  f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight"]
    _emit(w, new, names, dtype)


_ALPHAGEO_MAP = {
    "relative_positions.rel_embedding": "rel_embedding.weight",
    "tbase._kvq.attention_scale": "self_attn.attention_scale.weight",
    "tbase._kvq.keys_layer.kernel": "self_attn.k_proj.weight",
    "tbase._kvq.pre_attn_layernorm.scale": "input_layernorm.weight",
    "tbase._kvq.queries_layer.kernel": "self_attn.q_proj.weight",
    "tbase._kvq.values_layer.kernel": "self_attn.v_proj.weight",
    "tbase.ffn.hidden0.kernel": "mlp.hidden0.weight",
    "tbase.ffn.output_layer.kernel": "mlp.output_layer.weight",
    "tbase.post_attn_mlp.output_layer.kernel": "self_attn.o_proj.weight",
    "tbase.pre_ffn_layernorm.scale": "post_attention_layernorm.weight",
}


def convert_alphageometry(w, f, cfg, sd, dtype):
    """-a alphageometry-lm (reference AlphaGeometryLMConverter:7403 +
    convert_alphageometry_lm:10592): meliad flax msgpack checkpoint; f32
    only.  Like grok, the hardcoded config can be overridden by config.json."""
    import glob
    import os

    import msgpack

    assert dtype == GGMLType.F32, "alphageometry must be converted with -t f32"
    base = {"vocab_size": 1024, "pad_token_id": 0, "eos_token_id": 1,
            "bos_token_id": 2, "sep_token_id": -1, "hidden_size": 1024,
            "intermediate_size": 4096, "num_attention_heads": 8,
            "num_hidden_layers": 12, "max_position_embeddings": 1024,
            "window_length": 1024, "max_distance": 128, "num_buckets": 32}
    base.update({k: v for k, v in cfg.items() if k in base})
    cfg = base
    w.write_config(_base_vals(cfg, dtype) +
                   [cfg["window_length"], cfg["max_distance"],
                    cfg["num_buckets"]], fmt="14i")
    w.patch_model_type(int(ModelType.ALPHAGEO_LM))

    def ext_unpack(code, data):
        if code in (1, 3):
            shape, dtype_name, buffer = msgpack.unpackb(data, raw=True)
            dt = np.float16 if dtype_name == b"bfloat16" \
                else np.dtype(dtype_name)
            a = np.frombuffer(buffer, dtype=dt).reshape(shape)
            return a if code == 1 else a[()]
        if code == 2:
            t = msgpack.unpackb(data)
            return complex(t[0], t[1])
        return msgpack.ExtType(code, data)

    files = sorted(glob.glob(os.path.join(w._model_dir, "checkpoint_*")))
    with open(files[-1], "rb") as fh:
        state = msgpack.unpack(fh, ext_hook=ext_unpack, raw=False)
    dec = state["optimizer"]["target"]["decoder"]
    flat = {}

    def visit(o, path):
        if isinstance(o, dict):
            if "__msgpack_chunked_array__" in o:
                shape = tuple(o["shape"][str(i)]
                              for i in range(len(o["shape"])))
                flat[path] = np.concatenate(
                    [o["chunks"][str(i)]
                     for i in range(len(o["chunks"]))]).reshape(shape)
            else:
                for k in o:
                    visit(o[k], path + "." + k)
        else:
            flat[path] = np.asarray(o)

    visit(dec, "model")
    new = {}
    for name, arr in flat.items():
        arr = np.asarray(arr, np.float32)
        if arr.ndim >= 2 and "embed.embedding" not in name:
            arr = np.ascontiguousarray(np.swapaxes(arr, -1, -2))
        if name == "model.embed.embedding":
            nn = "model.embed_tokens.weight"
        elif name == "model.final_layernorm.scale":
            nn = "model.norm.weight"
        else:
            nn = name.replace("model.transformer", "model.layers.")
            for k, v in _ALPHAGEO_MAP.items():
                if nn.endswith(k):
                    nn = nn.replace(k, v)
                    break
        new[nn] = arr
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.rel_embedding.weight",
                  f"{pfx}.input_layernorm.weight",
                  f"{pfx}.self_attn.attention_scale.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.mlp.hidden0.weight",
                  f"{pfx}.mlp.output_layer.weight"]
    names.append("model.norm.weight")
    _emit(w, new, names, GGMLType.F32)


convert_alphageometry._no_sd = True


def convert_qwen3_emb(w, f, cfg, sd, dtype):
    """-a qwen3-embedding (reference QWen3EmbConverter:6205): qwen3 layout,
    all names under model.*, no lm_head."""
    from .convert import convert_qwen3

    cfg = dict(cfg)
    cfg["tie_word_embeddings"] = True   # drops lm_head from the name list
    sd = {("model." + k if not k.startswith("model.") else k): v
          for k, v in sd.items() if k != "lm_head.weight"}
    convert_qwen3(w, f, cfg, sd, dtype)
    w.patch_model_type(int(ModelType.QWEN3_Embedding))


def _forced(base_key, mtype):
    def fn(w, f, cfg, sd, dtype):
        from . import convert as _c

        _c.ARCH_CONVERTERS[base_key](w, f, cfg, sd, dtype)
        w.patch_model_type(int(mtype))
    return fn


EXTRA_CONVERTERS2 = {
    "XverseForCausalLM": convert_xverse,
    "BailingMoeForCausalLM": convert_bailing_moe,
    "BailingMoeV2ForCausalLM": convert_bailing_moe2,
    "LLaDA2MoeModelLM": convert_llada2,
    "MegrezMoeForCausalLM": convert_megrez_moe,
    "HunYuanForCausalLM": convert_hunyuan_dense,
    "HYV3ForCausalLM": convert_hunyuan_v3,
    "GroveMoEForCausalLM": convert_grove_moe,
    "PanguEmbeddedForCausalLM": convert_pangu_embedded,
    "PanguProMoEForCausalLM": convert_pangu_moe,
    "OuroForCausalLM": convert_ouro,
    "NanbeigeForCausalLM": convert_nanbeige,
    "YoutuForCausalLM": convert_youtu,
    "BaiChuanM1ForCausalLM": convert_baichuan_m1,
    "QWenLMHeadModel": convert_qwen_v1,
    "WeDLMForCausalLM": _forced("Qwen3ForCausalLM", ModelType.WEDLM),
    "Glm4MoeLiteForCausalLM": _forced("DeepseekV3ForCausalLM",
                                      ModelType.GLM_MOE_LITE),
}

EXTRA_ALIASES2 = {
    "llama-multi-token-prediction-ckpt": (convert_llama_multi, None),
    "alphageometry-lm": (convert_alphageometry, None),
    "qwen3-embedding": (convert_qwen3_emb, None),
    "qwen3-reranker": ("Qwen3ForCausalLM", ModelType.QWEN3_ReRanker),
    "qwen-qanything": ("QWenLMHeadModel", None),
}
