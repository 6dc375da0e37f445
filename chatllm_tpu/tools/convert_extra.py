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
}

EXTRA_ALIASES = {
    "smollm": (convert_smollm, None),
    "minicpm5": (convert_minicpm5, None),
}
