"""HF checkpoint → GGMM converters, wave 3+ (round-3 converter push).

Extends tools/convert.py's ARCH_CONVERTERS/ARCH_ALIASES toward the
reference's full 133-class coverage (/root/reference/convert.py).  Same
contract as convert.py's emitters: each ``convert_*(w, f, cfg, sd, dtype)``
writes the arch's config block (reference ``dump_config`` layout, cited
per-function), patches the model type, and emits tensors in the reference's
``get_weight_names`` order so the files also load in the reference binary.
"""
from __future__ import annotations

import struct

import numpy as np

from ..ggmm.quants import GGMLType
from ..models.model_types import ModelType
from .convert import _base_vals, _llama_like_names, permute_rope


def _emit(w, sd, names, dtype):
    for n in names:
        arr = sd[n]
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def _permuted(cfg: dict, sd: dict, heads=None, kv=None) -> dict:
    """Apply the llama q/k rope permutation (reference convert.py:1360)."""
    heads = heads if heads is not None else cfg["num_attention_heads"]
    kv = kv if kv is not None else cfg.get("num_key_value_heads", heads)
    out = dict(sd)
    for n, arr in sd.items():
        if n.endswith("q_proj.weight"):
            out[n] = permute_rope(arr, heads)
        elif n.endswith("k_proj.weight"):
            out[n] = permute_rope(arr, kv)
    return out


# ---------------------------------------------------------------------------
# InternLM family (reference InternLMConverter:1370, InternLM3Converter:2021)
# ---------------------------------------------------------------------------

def _permute_rope_vec(b: np.ndarray, n_head: int) -> np.ndarray:
    """permute_rope for a 1-d bias (same lane reorder applied to rows)."""
    n = b.shape[0]
    return (b.reshape(n_head, 2, n // n_head // 2)
             .swapaxes(1, 2).reshape(n))


def convert_internlm(w, f, cfg, sd, dtype):
    """InternLM v1/v2-published-as-v1: `bias` picks MHA-biased v1 (base
    config only) vs GQA v2 (+n_kv, theta, scaling) — reference
    convert.py:10805-10808 + InternLMConverter.dump_config.  Deviation:
    we also permute q/k *biases* — the rope lane reorder must apply to the
    whole projection output, the reference's pp only touches .weight."""
    bias = bool(cfg.get("bias", False))
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads") or heads
    rotary = cfg.get("rotary") or {}
    theta = float(rotary.get("base", 10000.0))
    scaling = float(rotary.get("scaling_factor", 1.0))
    if bias:
        w.write_config(_base_vals(cfg, dtype), fmt="11i")
        w.patch_model_type(int(ModelType.INTERNLM))
    else:
        w.write_config(_base_vals(cfg, dtype) + [kv], fmt="12i")
        f.write(struct.pack("<ff", theta, scaling))
        w._patch_offset(12)
        w.patch_model_type(int(ModelType.INTERNLM2))
    sd = dict(_permuted(cfg, sd, heads, kv))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        if bias:
            for p, nh in (("q_proj", heads), ("k_proj", kv)):
                bn = f"{pfx}.self_attn.{p}.bias"
                sd[bn] = _permute_rope_vec(sd[bn], nh)
            names += [f"{pfx}.self_attn.{p}.{s}" for p in
                      ("q_proj", "k_proj", "v_proj", "o_proj")
                      for s in ("weight", "bias")]
        else:
            names += [f"{pfx}.self_attn.{p}.weight" for p in
                      ("q_proj", "k_proj", "v_proj", "o_proj")]
        names += [f"{pfx}.mlp.gate_proj.weight",
                  f"{pfx}.mlp.down_proj.weight",
                  f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.input_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.weight"]
    names += ["model.norm.weight", "lm_head.weight"]
    _emit(w, sd, names, dtype)


def convert_internlm3(w, f, cfg, sd, dtype):
    """InternLM3 (reference InternLM3Converter:2021): llama + dynamic-NTK
    rope config {n_kv}i {theta}f {factor}f {max_pos}i."""
    scaling = cfg.get("rope_scaling") or {}
    assert scaling.get("rope_type", "dynamic") == "dynamic"
    w.write_config(_base_vals(cfg, dtype) +
                   [cfg["num_key_value_heads"]], fmt="12i")
    f.write(struct.pack("<ffi", float(cfg.get("rope_theta", 10000.0)),
                        float(scaling.get("factor", 1.0)),
                        cfg["max_position_embeddings"]))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.INTERNLM3))
    tie = bool(cfg.get("tie_word_embeddings", False))
    if tie:
        sd.setdefault("lm_head.weight", sd["model.embed_tokens.weight"])
    _emit(w, _permuted(cfg, sd),
          _llama_like_names(cfg["num_hidden_layers"], tie=False), dtype)


# ---------------------------------------------------------------------------
# EXAONE 3.x (reference ExaoneConverter:2048 — llama-3.2 layout under
# transformer.h.* names)
# ---------------------------------------------------------------------------

_EXAONE_RENAMES = [
    ("attn.attention.k_proj.weight", "self_attn.k_proj.weight"),
    ("attn.attention.out_proj.weight", "self_attn.o_proj.weight"),
    ("attn.attention.q_proj.weight", "self_attn.q_proj.weight"),
    ("attn.attention.v_proj.weight", "self_attn.v_proj.weight"),
    ("ln_1.weight", "input_layernorm.weight"),
    ("ln_2.weight", "post_attention_layernorm.weight"),
    ("mlp.c_fc_0.weight", "mlp.gate_proj.weight"),
    ("mlp.c_fc_1.weight", "mlp.up_proj.weight"),
    ("mlp.c_proj.weight", "mlp.down_proj.weight"),
]


def convert_exaone(w, f, cfg, sd, dtype):
    cfg = dict(cfg)
    cfg["num_hidden_layers"] = cfg.get("num_layers",
                                       cfg.get("num_hidden_layers"))
    new = {}
    for name, arr in sd.items():
        if name == "transformer.ln_f.weight":
            name = "model.norm.weight"
        elif name == "transformer.wte.weight":
            name = "model.embed_tokens.weight"
        else:
            name = name.replace("transformer.h", "model.layers")
            for a, b in _EXAONE_RENAMES:
                name = name.replace(a, b)
        new[name] = arr
    sd = _permuted(cfg, new)
    scaling = cfg.get("rope_scaling") or {}
    assert scaling.get("rope_type", scaling.get("type")) == "llama3", \
        "EXAONE requires llama3-style rope scaling (Llama32 config layout)"
    tie = bool(cfg.get("tie_word_embeddings", False))
    w.write_config(_base_vals(cfg, dtype) +
                   [cfg["num_key_value_heads"]], fmt="12i")
    f.write(struct.pack(
        "<fifffi", float(cfg.get("rope_theta", 10000.0)),
        int(scaling.get("original_max_position_embeddings",
                        cfg["max_position_embeddings"])),
        float(scaling.get("factor", 1.0)),
        float(scaling.get("low_freq_factor", 1.0)),
        float(scaling.get("high_freq_factor", 4.0)), int(tie)))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.EXAONE))
    if tie:
        sd.setdefault("lm_head.weight", sd["model.embed_tokens.weight"])
    _emit(w, sd, _llama_like_names(cfg["num_hidden_layers"], tie=False), dtype)


# ---------------------------------------------------------------------------
# Orion (reference OrionConverter:2439 — llama arch with biased LayerNorms)
# ---------------------------------------------------------------------------

def convert_orion(w, f, cfg, sd, dtype):
    scaling = cfg.get("rope_scaling")
    vals = _base_vals(cfg, dtype)
    vals[6] = int(cfg.get("max_sequence_length")
                  or cfg["max_position_embeddings"])
    w.write_config(vals + [cfg["num_key_value_heads"]], fmt="12i")
    f.write(struct.pack("<ff", float(scaling if scaling is not None else 1.0),
                        float(cfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.ORION))
    sd = _permuted(cfg, sd)
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.input_layernorm.bias",
                  f"{pfx}.mlp.down_proj.weight",
                  f"{pfx}.mlp.gate_proj.weight",
                  f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.bias",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight"]
    names += ["model.norm.weight", "model.norm.bias", "lm_head.weight"]
    _emit(w, sd, names, dtype)


# ---------------------------------------------------------------------------
# TeleChat2 (reference TeleChat2Converter:2090 — transformer.h.* names,
# fused key_value, o/down biases)
# ---------------------------------------------------------------------------

def convert_telechat2(w, f, cfg, sd, dtype):
    cfg = dict(cfg)
    cfg["num_attention_heads"] = cfg["n_head"]
    cfg["num_hidden_layers"] = cfg["n_layer"]
    cfg["intermediate_size"] = cfg["ffn_hidden_size"]
    cfg["max_position_embeddings"] = cfg["seq_length"]
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads") or heads
    hd = cfg["hidden_size"] // heads
    new = {}
    for name, arr in sd.items():
        if name == "transformer.ln_f.weight":
            name = "model.norm.weight"
        elif name == "transformer.word_embeddings.weight":
            name = "model.embed_tokens.weight"
        else:
            name = (name.replace("transformer.h", "model.layers")
                        .replace(".self_attention.", ".self_attn.")
                        .replace(".dense.", ".o_proj.")
                        .replace(".query.", ".q_proj."))
        if name.endswith("key_value.weight"):
            # fused rows are (head, [k;v], head_dim) over *query* head count
            # (reference state_dict_pp views by n_head)
            v = arr.reshape(heads, 2, hd, arr.shape[1])
            wk = v[:, 0].reshape(cfg["hidden_size"], arr.shape[1])
            wv = v[:, 1].reshape(cfg["hidden_size"], arr.shape[1])
            new[name.replace("key_value.weight", "k_proj.weight")] = \
                permute_rope(wk, kv) if kv else wk
            new[name.replace("key_value.weight", "v_proj.weight")] = wv
        elif name.endswith("q_proj.weight"):
            new[name] = permute_rope(arr, heads)
        else:
            new[name] = arr
    w.write_config(_base_vals(cfg, dtype) +
                   [kv, int(cfg.get("base_seqlen") or 0)], fmt="13i")
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.TELECHAT2))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.mlp.down_proj.weight",
                  f"{pfx}.mlp.down_proj.bias",
                  f"{pfx}.mlp.gate_proj.weight",
                  f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.self_attn.o_proj.bias",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight"]
    names += ["model.norm.weight", "lm_head.weight"]
    _emit(w, new, names, dtype)


# ---------------------------------------------------------------------------
# small llama-likes: SmolLM (tied llama3), Instella, Index, Zhinao, Aquila2,
# JiuTian, BlueLM, Apriel, DeciLM, MiniCPM5, Mellum
# ---------------------------------------------------------------------------

def convert_smollm(w, f, cfg, sd, dtype):
    """-a smollm (reference SmolLMConverter:2180): llama3 config, tied head."""
    kv = cfg.get("num_key_value_heads", cfg["num_attention_heads"])
    w.write_config(_base_vals(cfg, dtype) + [kv], fmt="12i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.SMOLLM))
    _emit(w, _permuted(cfg, sd),
          _llama_like_names(cfg["num_hidden_layers"], tie=True), dtype)


def convert_instella(w, f, cfg, sd, dtype):
    """Instella (reference InstellaConverter:3360): OLMo-2-style post-norms
    + full-projection qk-norm, NEOX rope (no permute)."""
    assert not cfg.get("tie_word_embeddings")
    w.write_config(_base_vals(cfg, dtype) +
                   [cfg["num_key_value_heads"]], fmt="12i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.INSTELLA))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.mlp.down_proj.weight",
                  f"{pfx}.mlp.gate_proj.weight",
                  f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.pre_attention_layernorm.weight",
                  f"{pfx}.pre_feedforward_layernorm.weight",
                  f"{pfx}.self_attn.k_norm.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.self_attn.q_norm.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight"]
    names += ["model.norm.weight", "lm_head.weight"]
    _emit(w, sd, names, dtype)


def convert_index(w, f, cfg, sd, dtype):
    """Index (reference IndexConverter:8432): llama3 config with rope_ratio
    folded into theta and optional row-normalized lm_head."""
    theta = 10000.0
    if cfg.get("rope_ratio") is not None:
        assert cfg.get("rope_scaling") is None
        theta *= float(cfg["rope_ratio"])
    if cfg.get("norm_head"):
        lm = sd["lm_head.weight"]
        sd = dict(sd)
        sd["lm_head.weight"] = lm / np.maximum(
            np.linalg.norm(lm, axis=1, keepdims=True), 1e-12)
    kv = cfg.get("num_key_value_heads", cfg["num_attention_heads"])
    w.write_config(_base_vals(cfg, dtype) + [kv], fmt="12i")
    f.write(struct.pack("<f", theta))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.INDEX))
    _emit(w, _permuted(cfg, sd),
          _llama_like_names(cfg["num_hidden_layers"], tie=False), dtype)


def convert_zhinao(w, f, cfg, sd, dtype):
    """Zhinao (reference ZhinaoConverter:7601): fused interleaved qkv_proj
    split into q/k/v (+biases), qwen2 weight set, NEOX rope."""
    assert cfg.get("rope_scaling") is None
    heads = cfg["num_attention_heads"]
    kv = cfg["num_key_value_heads"]
    hd = cfg["hidden_size"] // heads
    kvg = heads // kv
    gs = 2 + kvg
    new = {}
    for name, arr in sd.items():
        if name.endswith("qkv_proj.weight"):
            v = arr.reshape(kv, gs * hd, cfg["hidden_size"])
            q, k, vv = (v[:, :kvg * hd], v[:, kvg * hd:(kvg + 1) * hd],
                        v[:, (kvg + 1) * hd:])
            new[name.replace("qkv_proj", "q_proj")] = \
                q.reshape(heads * hd, -1)
            new[name.replace("qkv_proj", "k_proj")] = k.reshape(kv * hd, -1)
            new[name.replace("qkv_proj", "v_proj")] = vv.reshape(kv * hd, -1)
        elif name.endswith("qkv_proj.bias"):
            v = arr.reshape(kv, gs * hd)
            new[name.replace("qkv_proj", "q_proj")] = \
                np.ascontiguousarray(v[:, :kvg * hd]).reshape(-1)
            new[name.replace("qkv_proj", "k_proj")] = \
                np.ascontiguousarray(v[:, kvg * hd:(kvg + 1) * hd]).reshape(-1)
            new[name.replace("qkv_proj", "v_proj")] = \
                np.ascontiguousarray(v[:, (kvg + 1) * hd:]).reshape(-1)
        else:
            new[name] = arr
    w.write_config(_base_vals(cfg, dtype) + [kv], fmt="12i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.ZHINAO))
    _emit(w, new, _llama_like_names(cfg["num_hidden_layers"], tie=False,
                                    bias=True), dtype)


def convert_aquila(w, f, cfg, sd, dtype):
    """Aquila2 (reference AquilaConverter:8788): llama + linear rope factor."""
    kv = cfg.get("num_key_value_heads") or cfg["num_attention_heads"]
    theta = float(cfg.get("rope_theta") or 10000.0)
    factor = -1.0
    if cfg.get("rope_scaling") is not None:
        assert cfg["rope_scaling"]["rope_type"] == "linear"
        factor = float(cfg["rope_scaling"]["factor"])
    w.write_config(_base_vals(cfg, dtype) + [kv], fmt="12i")
    f.write(struct.pack("<ff", theta, factor))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.AQUILA2))
    _emit(w, _permuted(cfg, sd),
          _llama_like_names(cfg["num_hidden_layers"], tie=False), dtype)


def convert_jiutian(w, f, cfg, sd, dtype):
    """JiuTian (reference JiuTianConverter:9039): qwen2 arch (qkv biases)."""
    assert cfg.get("qkv_bias", True)
    tie = bool(cfg.get("tie_word_embeddings", False))
    w.write_config(_base_vals(cfg, dtype) +
                   [cfg["num_key_value_heads"], int(tie)], fmt="13i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.JIUTIAN))
    _emit(w, sd, _llama_like_names(cfg["num_hidden_layers"], tie=tie,
                                   bias=True), dtype)


def convert_bluelm(w, f, cfg, sd, dtype):
    """BlueLM (reference BlueLMConverter:3582): embed LayerNorm folded into
    embeddings, ntk-mixed rope scaling."""
    assert cfg.get("use_stable_embedding")
    scaling = cfg.get("rope_scaling")
    if scaling is not None:
        assert scaling["type"] == "ntkmixed"
        factor, power = float(scaling["factor"]), float(scaling["power"])
    else:
        factor, power = 1.0, 0.0
        if cfg["vocab_size"] == 100096:   # Chat-7B vocab fixup
            cfg = dict(cfg)
            cfg["vocab_size"] = 100008
    sd = dict(sd)
    emb = sd["model.embed_tokens.weight"]
    g = sd.pop("model.embed_layer_norm.weight")
    b = sd.pop("model.embed_layer_norm.bias")
    mu = emb.mean(axis=1, keepdims=True)
    var = emb.var(axis=1, keepdims=True)
    sd["model.embed_tokens.weight"] = \
        (emb - mu) / np.sqrt(var + 1e-5) * g + b
    vals = _base_vals(cfg, dtype)
    vals[6] = int(factor * cfg["max_position_embeddings"])
    w.write_config(vals + [cfg["num_key_value_heads"]], fmt="12i")
    f.write(struct.pack("<fff", float(cfg.get("rope_theta", 10000.0)),
                        factor, power))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.BLUELM))
    _emit(w, _permuted(cfg, sd),
          _llama_like_names(cfg["num_hidden_layers"], tie=False), dtype)


def convert_apriel(w, f, cfg, sd, dtype):
    """Apriel (reference AprielConverter:1769): llama + YaRN."""
    assert not cfg.get("mlp_bias")
    sc = cfg["rope_scaling"]
    assert sc["rope_type"] == "yarn" and sc.get("attention_factor") is None
    w.write_config(_base_vals(cfg, dtype) +
                   [cfg["num_key_value_heads"]], fmt="12i")
    head_dim = cfg.get("head_dim") or (cfg["hidden_size"] //
                                       cfg["num_attention_heads"])
    f.write(struct.pack("<fiifff", float(cfg.get("rope_theta", 10000.0)),
                        head_dim,
                        int(sc["original_max_position_embeddings"]),
                        float(sc["beta_fast"]), float(sc["beta_slow"]),
                        float(sc["factor"])))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.APRIEL))
    tie = bool(cfg.get("tie_word_embeddings", False))
    if tie:
        sd.setdefault("lm_head.weight", sd["model.embed_tokens.weight"])
    _emit(w, _permuted(cfg, sd),
          _llama_like_names(cfg["num_hidden_layers"], tie=False), dtype)


def convert_decilm(w, f, cfg, sd, dtype):
    """DeciLM / Nemotron NAS (reference DeciLMConverter:1928): per-layer
    block_configs — variable kv-group width, no-op attention layers, padded
    100×(n_heads_in_group, intermediate) table."""
    MAX_LAYERS = 100
    n_layers = cfg["num_hidden_layers"]
    assert n_layers <= MAX_LAYERS and not cfg.get("mlp_bias")
    assert cfg.get("num_key_value_heads") is None
    heads = cfg["num_attention_heads"]
    blocks = cfg["block_configs"]
    scaling = cfg.get("rope_scaling") or {}

    def ffn_size(mult):
        s = int(2 * mult * cfg["hidden_size"] / 3)
        return s if s % 256 == 0 else s + 256 - s % 256

    vals = _base_vals(cfg, dtype)
    vals[5] = 0            # intermediate_size forced 0
    w.write_config(vals + [0], fmt="12i")
    f.write(struct.pack(
        "<fifff", float(cfg.get("rope_theta", 10000.0)),
        int(scaling.get("original_max_position_embeddings",
                        cfg["max_position_embeddings"])),
        float(scaling.get("factor", 1.0)),
        float(scaling.get("low_freq_factor", 1.0)),
        float(scaling.get("high_freq_factor", 4.0))))
    table = []
    for i in range(MAX_LAYERS):
        if i < n_layers:
            att, ffn = blocks[i]["attention"], blocks[i]["ffn"]
            table += [0 if att.get("no_op") else att["n_heads_in_group"],
                      ffn_size(ffn["ffn_mult"])]
        else:
            table += [0, 0]
    f.write(struct.pack(f"<{2 * MAX_LAYERS}i", *table))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.DECILM))
    names = ["model.embed_tokens.weight"]
    for i in range(n_layers):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.mlp.down_proj.weight",
                  f"{pfx}.mlp.gate_proj.weight",
                  f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.post_attention_layernorm.weight"]
        if not blocks[i]["attention"].get("no_op"):
            names += [f"{pfx}.input_layernorm.weight",
                      f"{pfx}.self_attn.k_proj.weight",
                      f"{pfx}.self_attn.o_proj.weight",
                      f"{pfx}.self_attn.q_proj.weight",
                      f"{pfx}.self_attn.v_proj.weight"]
    names += ["model.norm.weight", "lm_head.weight"]
    out = dict(sd)
    for i in range(n_layers):
        att = blocks[i]["attention"]
        if att.get("no_op"):
            continue
        qn = f"model.layers.{i}.self_attn.q_proj.weight"
        kn = f"model.layers.{i}.self_attn.k_proj.weight"
        out[qn] = permute_rope(sd[qn], heads)
        out[kn] = permute_rope(sd[kn], heads // att["n_heads_in_group"])
    _emit(w, out, names, dtype)


def convert_minicpm5(w, f, cfg, sd, dtype):
    """MiniCPM5 / -a minicpm5 (reference MiniCPM5Converter:1740)."""
    scaling = cfg.get("rope_scaling")
    scaling = float(scaling) if isinstance(scaling, (int, float)) else 1.0
    tie = bool(cfg.get("tie_word_embeddings", False))
    head_dim = cfg.get("head_dim") or (cfg["hidden_size"] //
                                       cfg["num_attention_heads"])
    w.write_config(_base_vals(cfg, dtype) +
                   [cfg["num_key_value_heads"], head_dim, int(tie)],
                   fmt="14i")
    f.write(struct.pack("<ff", scaling, float(cfg["rope_theta"])))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.MINICPM5))
    if tie:
        sd.setdefault("lm_head.weight", sd["model.embed_tokens.weight"])
    _emit(w, _permuted(cfg, sd),
          _llama_like_names(cfg["num_hidden_layers"], tie=tie), dtype)


def convert_mellum(w, f, cfg, sd, dtype):
    """Mellum (reference MellumConverter:10253): qwen3 weight set with
    per-layer sparse/SWA tables and dual rope_parameters."""
    MAX_LAYERS = 128
    rp = cfg["rope_parameters"]
    full, swa = rp["full_attention"], rp["sliding_attention"]
    assert not cfg.get("attention_bias")
    assert full["rope_type"] == "yarn" and swa["rope_type"] == "default"
    n_layers = cfg["num_hidden_layers"]
    sparse = [1 if (i < n_layers and
                    cfg["mlp_layer_types"][i] == "sparse") else 0
              for i in range(MAX_LAYERS)]
    is_swa = [1 if (i < n_layers and
                    cfg["layer_types"][i] == "sliding_attention") else 0
              for i in range(MAX_LAYERS)]
    tie = bool(cfg.get("tie_word_embeddings", False))
    head_dim = cfg.get("head_dim") or (cfg["hidden_size"] //
                                       cfg["num_attention_heads"])
    w.write_config(_base_vals(cfg, dtype) + [
        cfg["num_key_value_heads"], head_dim,
        cfg.get("sliding_window") if cfg.get("use_sliding_window") else -1,
        cfg.get("moe_intermediate_size") or -1,
        cfg.get("num_experts_per_tok") or -1,
        cfg.get("num_experts") or -1,
        1 if cfg.get("norm_topk_prob") else 0, int(tie)], fmt="19i")
    f.write(struct.pack(
        "<7f", float(full["rope_theta"]), float(full["factor"]),
        float(full["original_max_position_embeddings"]),
        float(full["beta_fast"]), float(full["beta_slow"]),
        float(full["attention_factor"]), float(swa["rope_theta"])))
    f.write(struct.pack(f"<{MAX_LAYERS}i", *is_swa))
    f.write(struct.pack(f"<{MAX_LAYERS}i", *sparse))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.MELLUM))
    names = ["model.embed_tokens.weight"]
    for i in range(n_layers):
        pfx = f"model.layers.{i}"
        names.append(f"{pfx}.input_layernorm.weight")
        if sparse[i]:
            for j in range(cfg["num_experts"]):
                names += [f"{pfx}.mlp.experts.{j}.down_proj.weight",
                          f"{pfx}.mlp.experts.{j}.gate_proj.weight",
                          f"{pfx}.mlp.experts.{j}.up_proj.weight"]
            names.append(f"{pfx}.mlp.gate.weight")
        else:
            names += [f"{pfx}.mlp.down_proj.weight",
                      f"{pfx}.mlp.gate_proj.weight",
                      f"{pfx}.mlp.up_proj.weight"]
        names += [f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.k_norm.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.q_norm.weight",
                  f"{pfx}.self_attn.v_proj.weight"]
        names.append(f"{pfx}.self_attn.o_proj.weight")
    names.append("model.norm.weight")
    if not tie:
        names.append("lm_head.weight")
    _emit(w, sd, names, dtype)


# ---------------------------------------------------------------------------
# ChatGLM line (reference ChatGLMConverter:3948, ChatGLM2Converter:3999,
# ChatGLM4Converter:4054, CharacterGLMConverter:4072; dispatch 10782-10802)
# ---------------------------------------------------------------------------

def _export_tiktoken_vocab(w, model_dir):
    """glm-4-9b-chat-style tokenizer.model: base64-token<space>rank lines →
    gpt2-unicode BPE vocab + reconstructed merges (reference
    load_vocab_from_tiktok_mergeable_ranks:1291 + TikTokenizerVocab:1195)."""
    import base64
    import os

    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    b2u = bytes_to_unicode()

    def to_str(bs: bytes) -> str:
        return "".join(b2u[c] for c in bs)

    ranks = {}
    with open(os.path.join(model_dir, "tokenizer.model"), "rb") as fh:
        for line in fh.read().splitlines():
            if line:
                tok, rank = line.split()
                ranks[base64.b64decode(tok)] = int(rank)

    def bpe(token: bytes, max_rank: int):
        parts = [bytes([b]) for b in token]
        while True:
            mi, mr = None, None
            for i in range(len(parts) - 1):
                r = ranks.get(parts[i] + parts[i + 1])
                if r is not None and (mr is None or r < mr):
                    mi, mr = i, r
            if mr is None or mr >= max_rank:
                break
            parts = parts[:mi] + [parts[mi] + parts[mi + 1]] + parts[mi + 2:]
        return parts

    merges = []
    rev = {}
    for token, rank in ranks.items():
        rev[rank] = to_str(token)
        if len(token) > 1:
            merged = bpe(token, rank)
            if len(merged) == 2:
                merges.append(" ".join(to_str(p) for p in merged))
    toks = [(rev[i].encode("utf-8") if i in rev
             else f"[PAD{i}]".encode(), 1 if i in rev else 4)
            for i in range(max(rev) + 1)]
    w.write_vocab_bpe(toks, merges)


def convert_chatglm(w, f, cfg, sd, dtype, *, force=None):
    """ChatGLMModel: GLM-1 (2D rope) / GLM-2/3 (MQA) / GLM-4 (rope_ratio) by
    config, mirroring the reference dispatch."""
    mqa = cfg.get("multi_query_attention")
    if not mqa:
        assert cfg["position_encoding_2d"]
        assert cfg["inner_hidden_size"] == 4 * cfg["hidden_size"]
        vals = [int(dtype), cfg["vocab_size"], cfg["hidden_size"],
                cfg["num_attention_heads"], cfg["num_layers"],
                cfg["inner_hidden_size"], cfg["max_sequence_length"],
                cfg.get("bos_token_id", -1) or -1,
                cfg.get("eos_token_id", -1) or -1,
                cfg.get("pad_token_id") if cfg.get("pad_token_id")
                is not None else -1, -1]
        w.write_config(vals, fmt="11i")
        w.patch_model_type(int(force if force is not None
                               else ModelType.CHATGLM))
        names = ["transformer.word_embeddings.weight"]
        for i in range(cfg["num_layers"]):
            pfx = f"transformer.layers.{i}"
            names += [f"{pfx}.input_layernorm.weight",
                      f"{pfx}.input_layernorm.bias",
                      f"{pfx}.attention.query_key_value.weight",
                      f"{pfx}.attention.query_key_value.bias",
                      f"{pfx}.attention.dense.weight",
                      f"{pfx}.attention.dense.bias",
                      f"{pfx}.post_attention_layernorm.weight",
                      f"{pfx}.post_attention_layernorm.bias",
                      f"{pfx}.mlp.dense_h_to_4h.weight",
                      f"{pfx}.mlp.dense_h_to_4h.bias",
                      f"{pfx}.mlp.dense_4h_to_h.weight",
                      f"{pfx}.mlp.dense_4h_to_h.bias"]
        names += ["transformer.final_layernorm.weight",
                  "transformer.final_layernorm.bias"]
        _emit(w, sd, names, dtype)
        return
    assert not cfg.get("add_bias_linear") and cfg.get("add_qkv_bias")
    assert cfg.get("rmsnorm") and cfg.get("original_rope")
    eos = cfg.get("eos_token_id", -1)
    if isinstance(eos, list):
        eos = eos[0]
    vals = [int(dtype), cfg["padded_vocab_size"], cfg["hidden_size"],
            cfg["num_attention_heads"], cfg["num_layers"],
            cfg["ffn_hidden_size"], cfg["seq_length"],
            cfg.get("bos_token_id", -1) or -1, eos if eos is not None else -1,
            cfg.get("pad_token_id") if cfg.get("pad_token_id") is not None
            else -1, -1, cfg["multi_query_group_num"]]
    w.write_config(vals, fmt="12i")
    if force is not None:
        mtype = force
    elif cfg.get("rope_ratio") is not None:
        mtype = ModelType.GLM4
        f.write(struct.pack("<f", float(cfg["rope_ratio"])))
        w._vocab_override = _export_tiktoken_vocab
    elif "AutoModelForCausalLM" in (cfg.get("auto_map") or {}):
        name = cfg.get("_name_or_path", "")
        mtype = (ModelType.CODEGEEX2 if "codegeex" in name
                 else ModelType.CHATGLM3)
    else:
        mtype = ModelType.CHATGLM2
    if force is not None and cfg.get("rope_ratio") is not None:
        f.write(struct.pack("<f", float(cfg["rope_ratio"])))
        w._vocab_override = _export_tiktoken_vocab
    w._patch_offset(12)
    w.patch_model_type(int(mtype))
    names = ["transformer.embedding.word_embeddings.weight"]
    for i in range(cfg["num_layers"]):
        pfx = f"transformer.encoder.layers.{i}"
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.self_attention.query_key_value.weight",
                  f"{pfx}.self_attention.query_key_value.bias",
                  f"{pfx}.self_attention.dense.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.mlp.dense_h_to_4h.weight",
                  f"{pfx}.mlp.dense_4h_to_h.weight"]
    names += ["transformer.encoder.final_layernorm.weight",
              "transformer.output_layer.weight"]
    _emit(w, sd, names, dtype)


def convert_characterglm(w, f, cfg, sd, dtype):
    convert_chatglm(w, f, cfg, sd, dtype, force=ModelType.CHARACTERGLM)


def convert_codegeex4(w, f, cfg, sd, dtype):
    convert_chatglm(w, f, cfg, sd, dtype, force=ModelType.CODEGEEX4)


# ---------------------------------------------------------------------------
# MiniCPM line (reference MiniCPMConverter:2495, MiniCPM4Converter:2552,
# MiniCPMMoEConverter:2681, MiniCPM3Converter:2759, Emb:2614, ReRanker:2661;
# dispatch 11028-11047)
# ---------------------------------------------------------------------------

def _pad_to(xs, n):
    return list(xs) + [0.0] * (n - len(xs))


def convert_minicpm(w, f, cfg, sd, dtype):
    import math

    heads = cfg["num_attention_heads"]
    kv = cfg["num_key_value_heads"]
    n_layers = cfg["num_hidden_layers"]
    scale_depth = float(cfg.get("scale_depth", 1.0)) / math.sqrt(n_layers)
    sd = dict(_permuted(cfg, sd))
    sd["model.embed_tokens.weight"] = (sd["model.embed_tokens.weight"]
                                       * np.float32(cfg.get("scale_emb", 1.0)))
    sc = cfg.get("rope_scaling") or {}
    if cfg.get("num_experts"):
        assert not sc
        w.write_config(_base_vals(cfg, dtype) +
                       [kv, cfg["num_experts"], cfg["num_experts_per_tok"]],
                       fmt="14i")
        f.write(struct.pack("<fff", 1.0,
                            float(cfg.get("rope_theta") or 10000.0),
                            scale_depth))
        w._patch_offset(12)
        w.patch_model_type(int(ModelType.MINICPM_MoE))
        names = ["model.embed_tokens.weight"]
        for i in range(n_layers):
            pfx = f"model.layers.{i}"
            names.append(f"{pfx}.input_layernorm.weight")
            for j in range(cfg["num_experts"]):
                names += [f"{pfx}.mlp.experts.{j}.w1.weight",
                          f"{pfx}.mlp.experts.{j}.w2.weight",
                          f"{pfx}.mlp.experts.{j}.w3.weight"]
            names += [f"{pfx}.mlp.gate.weight",
                      f"{pfx}.post_attention_layernorm.weight",
                      f"{pfx}.self_attn.k_proj.weight",
                      f"{pfx}.self_attn.o_proj.weight",
                      f"{pfx}.self_attn.q_proj.weight",
                      f"{pfx}.self_attn.v_proj.weight"]
        names.append("model.norm.weight")
        _emit(w, sd, names, dtype)
        return
    if sc.get("rope_type") == "longrope":
        F = 128
        tie = cfg.get("tie_word_embeddings")
        tie = True if tie is None else bool(tie)
        factors = (_pad_to(sc["short_factor"], F) +
                   _pad_to(sc["long_factor"], F))
        max_pos = cfg["max_position_embeddings"]
        if max_pos == 32768:
            max_pos = 32768 * 4
        eos = cfg["eos_token_id"]
        eos = eos[0] if isinstance(eos, list) else eos
        vals = _base_vals(cfg, dtype)
        vals[6] = max_pos
        vals[8] = eos
        mup = cfg.get("mup_denominator")
        w.write_config(vals + [kv, max_pos,
                               int(sc["original_max_position_embeddings"]),
                               int(tie), len(sc["long_factor"])], fmt="16i")
        f.write(struct.pack(
            "<4f", float(mup or 0.0),
            float(cfg["dim_model_base"]) / cfg["hidden_size"],
            float(cfg["rope_theta"]) if mup is not None else 10000.0,
            scale_depth))
        f.write(struct.pack(f"<{2 * F}f", *factors))
        w._patch_offset(12)
        w.patch_model_type(int(ModelType.MINICPM4))
        if tie:
            sd.setdefault("lm_head.weight", sd["model.embed_tokens.weight"])
        _emit(w, sd, _llama_like_names(n_layers, tie=tie), dtype)
        return
    tie = cfg.get("tie_word_embeddings")
    tie = True if tie is None else bool(tie)
    w.write_config(_base_vals(cfg, dtype) + [kv], fmt="12i")
    f.write(struct.pack("<fff", 1.0,
                        float(cfg.get("rope_theta") or 10000.0), scale_depth))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.MINICPM if tie else ModelType.MINICPM2))
    if tie:
        sd.setdefault("lm_head.weight", sd["model.embed_tokens.weight"])
    _emit(w, sd, _llama_like_names(n_layers, tie=tie), dtype)


def convert_minicpm3(w, f, cfg, sd, dtype):
    """MiniCPM3 (MLA + LongRoPE, reference MiniCPM3Converter:2759)."""
    import math

    sc = cfg["rope_scaling"]
    assert sc["type"] == "longrope" and len(sc["long_factor"]) == 16
    n_layers = cfg["num_hidden_layers"]
    v_head = cfg["hidden_size"] // cfg["num_attention_heads"]
    eos = cfg["eos_token_id"]
    eos = eos[0] if isinstance(eos, list) else eos
    vals = _base_vals(cfg, dtype)
    vals[8] = eos
    w.write_config(vals + [cfg["num_key_value_heads"], cfg["kv_lora_rank"],
                           cfg["q_lora_rank"], cfg["qk_nope_head_dim"],
                           cfg["qk_rope_head_dim"],
                           int(sc["original_max_position_embeddings"]),
                           v_head, cfg["dim_model_base"]], fmt="19i")
    f.write(struct.pack("<f", float(cfg.get("scale_depth", 1.0))
                        / math.sqrt(n_layers)))
    f.write(struct.pack("<32f", *(list(sc["short_factor"]) +
                                  list(sc["long_factor"]))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.MINICPM3))
    new = {}
    for name, arr in sd.items():
        if name == "model.embed_tokens.weight":
            new[name] = arr * np.float32(cfg.get("scale_emb", 1.0))
        elif name.endswith("kv_a_proj_with_mqa.weight"):
            d_kv = arr[:cfg["kv_lora_rank"]]
            k_pe = arr[cfg["kv_lora_rank"]:]
            new[name.replace("kv_a_proj_with_mqa", "d_kv_proj")] = d_kv
            new[name.replace("kv_a_proj_with_mqa", "k_pe_proj")] = k_pe
        elif name.endswith("kv_a_layernorm.weight"):
            new[name.replace("kv_a_layernorm", "kv_norm")] = arr
        elif name.endswith("kv_b_proj.weight"):
            H = cfg["num_attention_heads"]
            v = arr.reshape(H, cfg["qk_nope_head_dim"] + v_head,
                            cfg["kv_lora_rank"])
            new[name.replace("kv_b_proj", "u_k_nope_proj")] = \
                v[:, :cfg["qk_nope_head_dim"]].reshape(
                    H * cfg["qk_nope_head_dim"], -1)
            new[name.replace("kv_b_proj", "u_v_proj")] = \
                v[:, cfg["qk_nope_head_dim"]:].reshape(H * v_head, -1)
        elif name.endswith("q_a_proj.weight"):
            new[name.replace("q_a_proj", "d_q_proj")] = arr
        elif name.endswith("q_a_layernorm.weight"):
            new[name.replace("q_a_layernorm", "q_norm")] = arr
        elif name.endswith("q_b_proj.weight"):
            new[name.replace("q_b_proj", "u_q_proj")] = arr
        else:
            new[name] = arr
    names = ["model.embed_tokens.weight", "model.norm.weight"]
    for i in range(n_layers):
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


def _convert_minicpm_encoder(w, f, cfg, sd, dtype, head_name, mtype):
    import math

    sc = cfg["rope_scaling"]
    assert sc["type"] == "longrope" and len(sc["long_factor"]) == 32
    n_layers = cfg["num_hidden_layers"]
    w.write_config(_base_vals(cfg, dtype) +
                   [cfg["num_key_value_heads"],
                    int(sc["original_max_position_embeddings"])], fmt="13i")
    f.write(struct.pack("<2f", float(cfg["rope_theta"]),
                        float(cfg.get("scale_depth", 1.0))
                        / math.sqrt(n_layers)))
    f.write(struct.pack("<64f", *(list(sc["short_factor"]) +
                                  list(sc["long_factor"]))))
    w._patch_offset(12)
    w.patch_model_type(int(mtype))
    new = {}
    for name, arr in sd.items():
        if not name.startswith(("model.", head_name)):
            name = "model." + name
        if name == "model.embed_tokens.weight":
            arr = arr * np.float32(cfg.get("scale_emb", 1.0))
        new[name] = arr
    new = _permuted(cfg, new)
    _emit(w, new, _llama_like_names(n_layers, tie=True) +
          [head_name + ".weight"], dtype)


def convert_minicpm_emb(w, f, cfg, sd, dtype):
    _convert_minicpm_encoder(w, f, cfg, sd, dtype, "head",
                             ModelType.MiniCPM_Embedding_Light)


def convert_minicpm_reranker(w, f, cfg, sd, dtype):
    _convert_minicpm_encoder(w, f, cfg, sd, dtype, "score",
                             ModelType.MiniCPM_ReRanker_Light)


# ---------------------------------------------------------------------------
# DeepSeek v1 MoE + Solar + Mistral2 (reference DeepSeekV1Converter:7716,
# SolarConverter:8741, Mistral2Converter:2892)
# ---------------------------------------------------------------------------

def convert_deepseek_v1(w, f, cfg, sd, dtype, *, mtype=None):
    assert not cfg.get("attention_bias") and cfg.get("rope_scaling") is None
    assert cfg.get("scoring_func", "softmax") == "softmax"
    n_layers = cfg["num_hidden_layers"]
    w.write_config(_base_vals(cfg, dtype) + [
        cfg["num_key_value_heads"], cfg["first_k_dense_replace"],
        cfg["moe_intermediate_size"], cfg["moe_layer_freq"],
        cfg["n_routed_experts"], cfg["n_shared_experts"],
        1 if cfg.get("norm_topk_prob") else 0,
        cfg["num_experts_per_tok"]], fmt="19i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta") or 10000.0)))
    w._patch_offset(12)
    w.patch_model_type(int(mtype if mtype is not None
                           else ModelType.DEEPSEEK_V1_MoE))
    names = ["model.embed_tokens.weight", "model.norm.weight",
             "lm_head.weight"]
    for i in range(n_layers):
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
    _emit(w, _permuted(cfg, sd), names, dtype)


def convert_gigachat(w, f, cfg, sd, dtype):
    convert_deepseek_v1(w, f, cfg, sd, dtype, mtype=ModelType.GIGACHAT)


def convert_deepseek_llama(w, f, cfg, sd, dtype, *, mtype, with_kv=False):
    """-a deepseek / numinamath / deepseekcoder / codefusedeepseek: llama
    weights, linear rope scaling variants (reference 3727-3812)."""
    sc = cfg.get("rope_scaling") or {}
    if mtype in (ModelType.DEEPSEEK, ModelType.NUMINAMATH):
        kv = cfg.get("num_key_value_heads", cfg["num_attention_heads"])
        w.write_config(_base_vals(cfg, dtype), fmt="11i")
    else:
        assert sc.get("type") == "linear"
        extra = ([cfg["num_key_value_heads"]] if with_kv else [])
        w.write_config(_base_vals(cfg, dtype) + extra,
                       fmt=f"{11 + len(extra)}i")
        f.write(struct.pack("<ff", float(sc["factor"]),
                            float(cfg["rope_theta"])))
        kv = (cfg["num_key_value_heads"] if with_kv
              else cfg["num_attention_heads"])
    w._patch_offset(12)
    w.patch_model_type(int(mtype))
    _emit(w, _permuted(cfg, sd, cfg["num_attention_heads"], kv),
          _llama_like_names(cfg["num_hidden_layers"], tie=False), dtype)


def convert_solar(w, f, cfg, sd, dtype):
    """Solar Pro (reference SolarConverter:8741): bskcn skip-forwarding
    tables, padded to 20 pairs."""
    MAX_LEN = 20
    assert cfg.get("rope_scaling") is None
    fwd = (list(zip(cfg["bskcn_1"], cfg["bskcn_3"])) +
           list(zip(cfg["bskcn_2"], cfg["bskcn_4"])))
    pairs = len(fwd)
    assert pairs <= MAX_LEN and len(cfg["bskcn_tv"]) == 2
    fwd = fwd + [(-1, -1)] * (MAX_LEN - pairs)
    flat = [x for p in fwd for x in p]
    w.write_config(_base_vals(cfg, dtype) +
                   [cfg["num_key_value_heads"], cfg["sliding_window"],
                    pairs] + flat, fmt=f"{14 + 2 * MAX_LEN}i")
    f.write(struct.pack("<2f", float(cfg["rope_theta"]),
                        float(cfg["bskcn_tv"][1])))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.SOLARPRO))
    _emit(w, _permuted(cfg, sd),
          _llama_like_names(cfg["num_hidden_layers"], tie=False), dtype)


def convert_mistral2(w, f, cfg, sd, dtype, *, mtype=None):
    kv = cfg.get("num_key_value_heads", cfg["num_attention_heads"])
    head_dim = cfg.get("head_dim") or (cfg["hidden_size"] //
                                       cfg["num_attention_heads"])
    w.write_config(_base_vals(cfg, dtype) +
                   [kv, head_dim, cfg.get("sliding_window") or -1],
                   fmt="14i")
    f.write(struct.pack("<f", float(cfg["rope_theta"])))
    w._patch_offset(12)
    w.patch_model_type(int(mtype if mtype is not None
                           else ModelType.MISTRAL2))
    _emit(w, _permuted(cfg, sd),
          _llama_like_names(cfg["num_hidden_layers"], tie=False), dtype)


def convert_deephermes_mistral(w, f, cfg, sd, dtype):
    convert_mistral2(w, f, cfg, sd, dtype,
                     mtype=ModelType.DEEPHERMES3_MISTRAL)


_MS31_MAP = {
    "attention.wk.weight": "self_attn.k_proj.weight",
    "attention.wo.weight": "self_attn.o_proj.weight",
    "attention.wq.weight": "self_attn.q_proj.weight",
    "attention.wv.weight": "self_attn.v_proj.weight",
    "attention_norm.weight": "input_layernorm.weight",
    "feed_forward.w1.weight": "mlp.gate_proj.weight",
    "feed_forward.w2.weight": "mlp.down_proj.weight",
    "feed_forward.w3.weight": "mlp.up_proj.weight",
    "ffn_norm.weight": "post_attention_layernorm.weight",
}


def convert_mistral_small31(w, f, cfg, sd, dtype):
    """-a mistral-small-3.1: consolidated-checkpoint names (wq/wk/w1…),
    already rope-interleaved so NO permute (reference
    MistralSmall31Converter:2916 — pp deliberately skipped)."""
    new = {}
    for name, arr in sd.items():
        if name.startswith("vision_encoder."):
            continue
        if name == "norm.weight":
            new["model.norm.weight"] = arr
        elif name == "output.weight":
            new["lm_head.weight"] = arr
        elif name == "tok_embeddings.weight":
            new["model.embed_tokens.weight"] = arr
        elif name.startswith("layers."):
            nn = "model." + name
            for a, b in _MS31_MAP.items():
                if name.endswith(a):
                    nn = nn.replace(a, b)
                    break
            new[nn] = arr
    kv = cfg.get("num_key_value_heads", cfg["num_attention_heads"])
    head_dim = cfg.get("head_dim") or (cfg["hidden_size"] //
                                       cfg["num_attention_heads"])
    w.write_config(_base_vals(cfg, dtype) +
                   [kv, head_dim, cfg.get("sliding_window") or -1],
                   fmt="14i")
    f.write(struct.pack("<f", float(cfg["rope_theta"])))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.MISTRAL2))
    _emit(w, new, _llama_like_names(cfg["num_hidden_layers"], tie=False),
          dtype)


def convert_qwen2_tie_r1(w, f, cfg, sd, dtype):
    """-a deepseek-r1-distill-qwen (reference QWen2TieConverter:5411):
    qwen2 layout + explicit tie int."""
    tie = bool(cfg.get("tie_word_embeddings", False))
    w.write_config(_base_vals(cfg, dtype) +
                   [cfg["num_key_value_heads"],
                    cfg.get("sliding_window") or 0], fmt="13i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta", 10000.0))))
    f.write(struct.pack("<i", int(tie)))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.DEEPSEEK_R1_DISTILL_QWEN))
    _emit(w, sd, _llama_like_names(cfg["num_hidden_layers"], tie=tie,
                                   bias=True), dtype)


# ---------------------------------------------------------------------------
# Grok-1 (-a grok-1-base; reference Grok1Converter:7216 +
# convert_grok_1_base:10512 — raw xai pickle dump, tensorNNNNN_000 files)
# ---------------------------------------------------------------------------

def convert_grok1(w, f, cfg, sd, dtype):
    """Grok-1 base: `sd` is ignored; weights stream from the pickle files in
    the model dir.  Deviation from the reference: the hardcoded 314B config
    can be overridden by a config.json in the model dir (lets tests and
    derived checkpoints convert without editing the tool)."""
    import math
    import os
    import pickle

    base = {
        "vocab_size": 128 * 1024, "pad_token_id": 0, "eos_token_id": 2,
        "bos_token_id": -1, "sep_token_id": -1,
        "max_position_embeddings": 8192,
        "output_multiplier_scale": 0.5773502691896257,
        "embedding_multiplier_scale": 78.38367176906169,
        "hidden_size": 48 * 128, "num_attention_heads": 48,
        "num_key_value_heads": 8, "num_hidden_layers": 64,
        "num_selected_experts": 2, "rope_theta": 10000,
        "experts": list(range(8)),
    }
    base.update({k: v for k, v in cfg.items() if k in base})
    cfg = base

    def ffn_size(emb, widening):
        s = int(widening * emb) * 2 // 3
        return s + (8 - s) % 8

    cfg.setdefault("intermediate_size",
                   ffn_size(cfg["hidden_size"], 8))
    experts = cfg["experts"]
    n_experts = len(experts)
    heads, kv = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    n_layers = cfg["num_hidden_layers"]
    w.write_config(_base_vals(cfg, dtype) +
                   [kv, n_experts, cfg["num_selected_experts"]], fmt="14i")
    f.write(struct.pack("<2f", float(cfg["rope_theta"]),
                        float(cfg["output_multiplier_scale"])))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.GROK_1))

    # file ↔ tensor mapping: alphabetical order of the canonical names
    # (reference Grok1Converter.convert:7363-7374)
    fmap = ["language_model.embed_tokens.weight",
            "language_model.norm.weight"]
    for i in range(n_layers):
        fmap += [f"model.layers.{i}.experts.w1.weight",
                 f"model.layers.{i}.experts.w2.weight",
                 f"model.layers.{i}.experts.w3.weight",
                 f"model.layers.{i}.multi_head_attention.k_proj.weight",
                 f"model.layers.{i}.multi_head_attention.o_proj.weight",
                 f"model.layers.{i}.multi_head_attention.q_proj.weight",
                 f"model.layers.{i}.multi_head_attention.v_proj.weight",
                 f"model.layers.{i}.rms_norm.weight",
                 f"model.layers.{i}.rms_norm_1.weight",
                 f"model.layers.{i}.rms_norm_2.weight",
                 f"model.layers.{i}.rms_norm_3.weight",
                 f"model.layers.{i}.router.weight"]
    order = sorted(range(len(fmap)), key=lambda i: fmap[i])
    model_dir = getattr(w, "_model_dir", None) or cfg.get("_model_dir", "")

    def load(name):
        idx = order.index(fmap.index(name))
        with open(os.path.join(model_dir, f"tensor{idx:05}_000"),
                  "rb") as fh:
            v = pickle.load(fh)
        if hasattr(v, "scales"):
            weight = np.asarray(v.weight, np.float32)
            scale = np.asarray(v.scales, np.float32)
            if scale.ndim >= 2 and scale.shape[-2] != 1:
                scale = scale[..., None, :]
                weight = weight.reshape(*weight.shape[:-2], 8, -1,
                                        weight.shape[-1])
                weight = (weight * scale).reshape(*weight.shape[:-3], -1,
                                                  weight.shape[-1])
            else:
                weight = weight * scale
        else:
            weight = np.asarray(v, np.float32)
        if weight.ndim >= 2 and "embed_tokens" not in name:
            weight = np.swapaxes(weight, -1, -2)
        return np.ascontiguousarray(weight)

    emb = load("language_model.embed_tokens.weight") * np.float32(
        cfg["embedding_multiplier_scale"])
    w.write_tensor("model.embed_tokens.weight", emb, dtype)
    for i in range(n_layers):
        pfx = f"model.layers.{i}"
        e1 = load(f"{pfx}.experts.w1.weight")[experts]
        e2 = load(f"{pfx}.experts.w2.weight")[experts]
        e3 = load(f"{pfx}.experts.w3.weight")[experts]
        for j in range(n_experts):
            w.write_tensor(f"{pfx}.experts.{j}.w1.weight", e1[j], dtype)
            w.write_tensor(f"{pfx}.experts.{j}.w2.weight", e2[j], dtype)
            w.write_tensor(f"{pfx}.experts.{j}.w3.weight", e3[j], dtype)
        w.write_tensor(
            f"{pfx}.self_attn.k_proj.weight",
            permute_rope(load(f"{pfx}.multi_head_attention.k_proj.weight"),
                         kv), dtype)
        w.write_tensor(f"{pfx}.self_attn.o_proj.weight",
                       load(f"{pfx}.multi_head_attention.o_proj.weight"),
                       dtype)
        w.write_tensor(
            f"{pfx}.self_attn.q_proj.weight",
            permute_rope(load(f"{pfx}.multi_head_attention.q_proj.weight"),
                         heads), dtype)
        w.write_tensor(f"{pfx}.self_attn.v_proj.weight",
                       load(f"{pfx}.multi_head_attention.v_proj.weight"),
                       dtype)
        for nrm in ("rms_norm", "rms_norm_1", "rms_norm_2", "rms_norm_3"):
            w.write_tensor(f"{pfx}.{nrm}.weight", load(f"{pfx}.{nrm}.weight"),
                           GGMLType.F32)
        w.write_tensor(f"{pfx}.router.weight",
                       load(f"{pfx}.router.weight")[experts], dtype)
    w.write_tensor("model.norm.weight",
                   load("language_model.norm.weight"), GGMLType.F32)


def convert_llama32_forced(w, f, cfg, sd, dtype, *, mtype):
    """Force the Llama-3.2 config layout (kv + theta + llama3-scaling +
    tie int, written even when untied) — used by type-aliases the reference
    routes through Llama32Converter unconditionally (e.g.
    deepseek-r1-distill-llama, convert.py:10832)."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    sc = cfg.get("rope_scaling") or {}
    assert sc, "llama3-style rope scaling dict required"
    tie = bool(cfg.get("tie_word_embeddings", False))
    eos = cfg.get("eos_token_id", -1)
    vals = _base_vals(cfg, dtype)
    if isinstance(eos, list):
        vals[8] = eos[0]
    w.write_config(vals + [kv], fmt="12i")
    f.write(struct.pack(
        "<fifffi", float(cfg.get("rope_theta", 10000.0)),
        int(sc.get("original_max_position_embeddings",
                   cfg["max_position_embeddings"])),
        float(sc.get("factor", 1.0)), float(sc.get("low_freq_factor", 1.0)),
        float(sc.get("high_freq_factor", 4.0)), int(tie)))
    w._patch_offset(12)
    w.patch_model_type(int(mtype))
    if tie:
        sd.setdefault("lm_head.weight", sd["model.embed_tokens.weight"])
    _emit(w, _permuted(cfg, sd),
          _llama_like_names(cfg["num_hidden_layers"], tie=tie), dtype)


convert_grok1._no_sd = True     # weights stream from the xai pickle files

EXTRA_CONVERTERS = {
    "InternLMForCausalLM": convert_internlm,
    "InternLM3ForCausalLM": convert_internlm3,
    "ExaoneForCausalLM": convert_exaone,
    "OrionForCausalLM": convert_orion,
    "TeleChat2ForCausalLM": convert_telechat2,
    "InstellaForCausalLM": convert_instella,
    "IndexForCausalLM": convert_index,
    "ZhinaoForCausalLM": convert_zhinao,
    "AquilaForCausalLM": convert_aquila,
    "JiutianForCausalLM": convert_jiutian,
    "BlueLMForCausalLM": convert_bluelm,
    "AprielForCausalLM": convert_apriel,
    "DeciLMForCausalLM": convert_decilm,
    "MellumForCausalLM": convert_mellum,
    # wave 5
    "ChatGLMModel": convert_chatglm,
    "MiniCPMForCausalLM": convert_minicpm,
    "MiniCPM3ForCausalLM": convert_minicpm3,
    "MiniCPMModel": convert_minicpm_emb,
    "MiniCPMForSequenceClassification": convert_minicpm_reranker,
    "DeepseekForCausalLM": convert_deepseek_v1,
    "SolarForCausalLM": convert_solar,
    "MiMoForCausalLM": "Qwen2ForCausalLM",   # resolved in convert()
}

from functools import partial as _partial  # noqa: E402

EXTRA_ALIASES = {
    "smollm": (convert_smollm, None),
    "minicpm5": (convert_minicpm5, None),
    "characterglm": (convert_characterglm, None),
    "codegeex4": (convert_codegeex4, None),
    "gigachat": (convert_gigachat, None),
    "deepseek": (_partial(convert_deepseek_llama,
                          mtype=ModelType.DEEPSEEK), None),
    "numinamath": (_partial(convert_deepseek_llama,
                            mtype=ModelType.NUMINAMATH), None),
    "deepseekcoder": (_partial(convert_deepseek_llama,
                               mtype=ModelType.DEEPSEEK_CODER), None),
    "codefusedeepseek": (_partial(convert_deepseek_llama,
                                  mtype=ModelType.CODEFUSE_DEEPSEEK,
                                  with_kv=True), None),
    "grok-1-base": (convert_grok1, None),
    "mistral-small-3.1": (convert_mistral_small31, None),
    "deephermes-3-mistral": (convert_deephermes_mistral, None),
    "mistral2": (convert_mistral2, None),
    "deepseek-r1-distill-qwen": (convert_qwen2_tie_r1, None),
    # pure type-aliases over existing emitters (reference sets MODEL_TYPE
    # then reuses the base converter)
    "marco-o1": ("Qwen2ForCausalLM", ModelType.MARCO_O1),
    "qwq": ("Qwen2ForCausalLM", ModelType.QWQ),
    "readerlm-v2": ("Qwen2ForCausalLM", ModelType.READERLM2),
    "deepseek-r1-distill-qwen3":
        ("Qwen3ForCausalLM", ModelType.DEEPSEEK_R1_DISTILL_QWEN3),
    "reka-flash-3": ("LlamaForCausalLM", ModelType.REKA_FLASH3),
    "llama-3-groq-8b-tool-use":
        ("LlamaForCausalLM", ModelType.LLAMA3_GROQ_TOOL),
    "deepseek-r1-distill-llama":
        (_partial(convert_llama32_forced,
                  mtype=ModelType.DEEPSEEK_R1_DISTILL_LLAMA), None),
    "wizardcoder": ("LlamaForCausalLM", ModelType.WIZARDCODER),
    "solar": ("SolarForCausalLM", None),
}
