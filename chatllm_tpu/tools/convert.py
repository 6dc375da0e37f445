"""HF checkpoint → GGMM converter.

Counterpart of the reference's convert.py (11k LoC, 133 converters): reads a
HuggingFace model directory (config.json + *.safetensors + tokenizer files),
applies the same per-arch weight transforms (q/k rope permutation for the
llama family, convert.py:1360 `permute`), exports the vocab in the reference's
on-disk formats (SentencePiece pairs / BPE pieces+merges, convert.py:894-1121)
and writes a GGMM file loadable by chatllm_tpu (and by the reference).

Supported architectures: see ARCH_CONVERTERS at the bottom (51 entries:
llama 2/3.x/4, qwen2/3 ±MoE ±VL ±audio, mistral/mixtral/mistral3, hunyuan
±MoE, gpt-oss, gemma 1/2/3 ±vision, glm-4-9b-hf/glm4-0414/glm-4v,
olmo2/olmoe, starcoder2, cohere 1/2, granite ±MoE, phi2/phi3 ±LongRoPE/
phimoe, deepseek V2/V3, stablelm2, persimmon/fuyu, smollm3, exaone4,
ernie 4.5 ±MoE, seed-oss, apertus, smolvlm, internvl) — every family
HF-golden roundtrip-tested in tests/test_convert*.py.  Quantization: f32/f16/bf16/q8_0/q4_0/q4_1/q4_k
(same codecs as the reference, ggmm/quants.py is bit-exact vs ggml).

Usage:  python -m chatllm_tpu.tools.convert -i <hf_dir> -o out.bin -t q4_k
"""
from __future__ import annotations

import argparse
import json
import os
import re
import struct

import numpy as np

from ..ggmm.quants import GGMLType
from ..ggmm.writer import GGMMWriter
from ..models.model_types import ModelType

QUANT_MAP = {
    "f32": GGMLType.F32, "f16": GGMLType.F16, "bf16": GGMLType.BF16,
    "q8_0": GGMLType.Q8_0, "q4_0": GGMLType.Q4_0, "q4_1": GGMLType.Q4_1,
    "q4_k": GGMLType.Q4_K,
}


# ---------------------------------------------------------------------------
# tensor loading
# ---------------------------------------------------------------------------

def load_state_dict(model_dir: str, weights_glob: str = "") -> dict:
    """All tensors from *.safetensors (or pytorch_model.bin) as numpy f32."""
    sd = {}
    st_files = sorted(f for f in os.listdir(model_dir)
                      if f.endswith(".safetensors")
                      and (not weights_glob or f.startswith(weights_glob)))
    if st_files:
        from safetensors import safe_open

        for fn in st_files:
            with safe_open(os.path.join(model_dir, fn), framework="np") as f:
                for k in f.keys():
                    t = f.get_tensor(k)
                    if t.dtype not in (np.float32, np.float16):
                        t = t.astype(np.float32)
                    sd[k] = np.asarray(t, dtype=np.float32)
        return sd
    bins = sorted(f for f in os.listdir(model_dir)
                  if f.startswith(weights_glob or "pytorch_model")
                  and f.endswith(".bin"))
    if not bins:   # consolidated.*.pth checkpoints (llama-multi, mistral)
        bins = sorted(f for f in os.listdir(model_dir)
                      if f.endswith(".pth"))
    if bins:
        import torch

        for fn in bins:
            d = torch.load(os.path.join(model_dir, fn), map_location="cpu",
                           weights_only=True)
            if "state_dict" in d and not hasattr(d["state_dict"], "shape"):
                d = d["state_dict"]   # DAC-style packaged checkpoints
            for k, v in d.items():
                if hasattr(v, "float"):
                    sd[k] = v.float().numpy()
        return sd
    raise FileNotFoundError(f"no weights found in {model_dir}")


class LoRAMerge:
    """Merge a PEFT LoRA adapter into the base weights at conversion time
    (reference convert.py:681 `LoRAState`): a tensor stored outright in the
    adapter replaces the base tensor; `<n>.lora_A/.lora_B` pairs fold in as
    W + (alpha/r) · B@A (transposed when fan_in_fan_out)."""

    def __init__(self, path: str):
        cfg = json.load(open(os.path.join(path, "adapter_config.json"),
                             encoding="utf-8"))
        assert cfg.get("peft_type") == "LORA", "adapter is not a LoRA"
        self.scaling = cfg["lora_alpha"] / cfg["r"]
        self.fan_in_fan_out = bool(cfg.get("fan_in_fan_out", False))
        self.tensors = load_state_dict(path, weights_glob="adapter_model")

    def merge(self, name: str, arr: np.ndarray) -> np.ndarray:
        key = "base_model.model." + name
        if key in self.tensors:
            return self.tensors[key]
        ka = key.replace(".weight", ".lora_A.weight")
        if ka in self.tensors:
            kb = key.replace(".weight", ".lora_B.weight")
            delta = self.tensors[kb] @ self.tensors[ka]
            if self.fan_in_fan_out:
                delta = delta.T
            return arr + delta * np.float32(self.scaling)
        return arr


_BLOCK_LEN = {GGMLType.Q8_0: 32, GGMLType.Q4_0: 32, GGMLType.Q4_1: 32,
              GGMLType.Q4_K: 256}


def _type_fallback(shape, dtype: GGMLType) -> GGMLType:
    """Row length must divide the codec's block; degrade q4_k→q8_0→f16 like
    the reference (convert.py:810 tensor_type_fallback)."""
    blk = _BLOCK_LEN.get(dtype)
    if blk is None or shape[-1] % blk == 0:
        return dtype
    if dtype == GGMLType.Q4_K:
        return _type_fallback(shape, GGMLType.Q8_0)
    return GGMLType.F16


def pick_tensor_type(name: str, arr: np.ndarray, dtype: GGMLType,
                     rules=()) -> GGMLType:
    """Resolve the storage type for one tensor: 1d → f32, then the first
    matching `-tt pattern type` rule (later flags take priority), then the
    block-divisibility fallback (reference convert.py:830)."""
    if arr.ndim <= 1:
        return GGMLType.F32
    for pat, t in rules:
        if re.match(pat, name):
            dtype = t
            break
    return _type_fallback(arr.shape, dtype)


def permute_rope(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF half-split → interleaved rope lanes (reference convert.py:1360)."""
    out, cin = w.shape
    return (w.reshape(n_head, 2, out // n_head // 2, cin)
             .swapaxes(1, 2).reshape(out, cin))


# ---------------------------------------------------------------------------
# vocab export
# ---------------------------------------------------------------------------

def export_vocab(w: GGMMWriter, model_dir: str):
    """Dispatch on available tokenizer files (reference vocab classes,
    convert.py:894-1311).  Returns the tokenizer kind written."""
    tok_json = os.path.join(model_dir, "tokenizer.json")
    sp_model = os.path.join(model_dir, "tokenizer.model")
    if os.path.isfile(tok_json):
        model = json.load(open(tok_json, encoding="utf-8"))
        kind = model["model"]["type"]
        if kind == "BPE":
            specials = {t["content"]: t["id"] for t in model.get("added_tokens", [])}
            vocab = dict(model["model"]["vocab"])
            for t, i in specials.items():
                vocab.setdefault(t, i)
            items = sorted(vocab.items(), key=lambda kv: kv[1])
            toks = []
            for tok, _ in items:
                # 1 = USER_DEFINED, 0 = NORMAL (tokenizer.TokenType)
                toks.append((tok.encode("utf-8"), 4 if tok in specials else 1))
            merges = [m if isinstance(m, str) else f"{m[0]} {m[1]}"
                      for m in model["model"]["merges"]]
            w.write_vocab_bpe(toks, merges)
            return "bpe"
        if kind == "Unigram":
            pieces = [(p[0].encode("utf-8"), float(p[1]))
                      for p in model["model"]["vocab"]]
            w.write_vocab_sp(pieces)
            return "unigram"
        raise NotImplementedError(f"tokenizer.json model type {kind}")
    if os.path.isfile(sp_model):
        import sentencepiece as spm

        sp = spm.SentencePieceProcessor(model_file=sp_model)
        pairs = []
        for i in range(sp.vocab_size()):
            if sp.IsUnknown(i):
                text = " ⁇ ".encode("utf-8")
            elif sp.IsControl(i):
                text = b""
            elif sp.IsByte(i):
                text = bytes([int(sp.IdToPiece(i)[3:-1], 16)])
            else:
                text = sp.IdToPiece(i).replace("▁", " ").encode("utf-8")
            pairs.append((text, float(sp.GetScore(i))))
        w.write_vocab_sp(pairs)
        return "sp"
    raise FileNotFoundError("no tokenizer.json / tokenizer.model found")


# ---------------------------------------------------------------------------
# per-arch emitters
# ---------------------------------------------------------------------------

def _base_vals(cfg: dict, dtype: GGMLType) -> list:
    def tid(k):
        v = cfg.get(k)
        if isinstance(v, list):
            v = v[0] if v else None
        return int(v) if v is not None else -1

    return [int(dtype), cfg["vocab_size"], cfg["hidden_size"],
            cfg["num_attention_heads"], cfg["num_hidden_layers"],
            cfg["intermediate_size"], cfg["max_position_embeddings"],
            tid("bos_token_id"), tid("eos_token_id"),
            tid("pad_token_id"), tid("sep_token_id")]


def _llama_like_names(n_layers: int, tie: bool, qk_norm=False, bias=False):
    names = ["model.embed_tokens.weight"]
    for i in range(n_layers):
        pfx = f"model.layers.{i}"
        names.append(f"{pfx}.input_layernorm.weight")
        for n in ("q_proj", "k_proj", "v_proj"):
            names.append(f"{pfx}.self_attn.{n}.weight")
            if bias:
                names.append(f"{pfx}.self_attn.{n}.bias")
        names.append(f"{pfx}.self_attn.o_proj.weight")
        if qk_norm:
            names += [f"{pfx}.self_attn.q_norm.weight",
                      f"{pfx}.self_attn.k_norm.weight"]
        names += [f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.mlp.gate_proj.weight", f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.mlp.down_proj.weight"]
    names.append("model.norm.weight")
    if not tie:
        names.append("lm_head.weight")
    return names


def convert_llama(w, f, cfg, sd, dtype):
    """LlamaForCausalLM → LLAMA2 / LLAMA3 (+3.2-style tie)."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    theta = float(cfg.get("rope_theta", 10000.0))
    tie = bool(cfg.get("tie_word_embeddings", False))
    scaling = cfg.get("rope_scaling") or {}
    if theta == 10000.0 and kv == heads and not tie and not scaling:
        mtype = ModelType.LLAMA2
        w.write_config(_base_vals(cfg, dtype) + [], fmt="11i")
    elif scaling or tie:
        # Llama-3.1/3.2: carry the 'llama3' rope-scaling fields so the
        # loader reconstructs per-dim freq factors (models/llama.h:154-160;
        # dropping them would run converted 3.1/3.2 checkpoints unscaled)
        assert not scaling or scaling.get("rope_type", scaling.get("type")) in (
            None, "llama3"), "only llama3-style rope scaling supported"
        mtype = ModelType.LLAMA3_2 if tie else ModelType.LLAMA3_1
        w.write_config(_base_vals(cfg, dtype) + [kv], fmt="12i")
        f.write(struct.pack(
            "<fifff", theta,
            int(scaling.get("original_max_position_embeddings",
                            cfg["max_position_embeddings"])),
            float(scaling.get("factor", 1.0)),
            float(scaling.get("low_freq_factor", 1.0)),
            float(scaling.get("high_freq_factor", 4.0))))
        if tie:
            f.write(struct.pack("<i", 1))
        w._patch_offset(12)
    else:
        mtype = ModelType.LLAMA3
        w.write_config(_base_vals(cfg, dtype) + [kv], fmt="12i")
        f.write(struct.pack("<f", theta))
        w._patch_offset(12)
    w.patch_model_type(int(mtype))
    if tie:
        sd.setdefault("lm_head.weight", sd["model.embed_tokens.weight"])
    for n in _llama_like_names(cfg["num_hidden_layers"], tie=False):
        arr = sd[n]
        if n.endswith("q_proj.weight"):
            arr = permute_rope(arr, heads)
        elif n.endswith("k_proj.weight"):
            arr = permute_rope(arr, kv)
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_qwen2(w, f, cfg, sd, dtype):
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    tie = bool(cfg.get("tie_word_embeddings", False))
    mtype = ModelType.QWEN2TIE if tie else ModelType.QWEN2
    w.write_config(_base_vals(cfg, dtype) +
                   [kv, cfg.get("sliding_window") or 0], fmt="13i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(mtype))
    for n in _llama_like_names(cfg["num_hidden_layers"], tie=tie, bias=True):
        w.write_tensor(n, sd[n], dtype if sd[n].ndim == 2 else GGMLType.F32)


def convert_qwen3(w, f, cfg, sd, dtype):
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    tie = bool(cfg.get("tie_word_embeddings", False))
    head_dim = cfg.get("head_dim", cfg["hidden_size"] // heads)
    # models/qwen.h:746 layout (see tests/test_model_golden.py make_tiny_qwen3)
    w.write_config(_base_vals(cfg, dtype) + [kv, head_dim], fmt="13i")
    f.write(struct.pack("<ff", float(cfg.get("rope_theta", 10000.0)), -1.0))
    f.write(struct.pack("<6i", -1, 0, -1, -1, -1, 0))
    f.write(struct.pack("<i", int(tie)))
    f.write(struct.pack("<128i", *([0] * 128)))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.QWEN3))
    for n in _llama_like_names(cfg["num_hidden_layers"], tie=tie, qk_norm=True):
        w.write_tensor(n, sd[n], dtype if sd[n].ndim == 2 else GGMLType.F32)


def convert_mistral(w, f, cfg, sd, dtype):
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    w.write_config(_base_vals(cfg, dtype) +
                   [kv, cfg.get("sliding_window") or -1], fmt="13i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.MISTRAL))
    for n in _llama_like_names(cfg["num_hidden_layers"], tie=False):
        arr = sd[n]
        if n.endswith("q_proj.weight"):
            arr = permute_rope(arr, heads)
        elif n.endswith("k_proj.weight"):
            arr = permute_rope(arr, kv)
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_hunyuan(w, f, cfg, sd, dtype):
    kv = cfg.get("num_key_value_heads", cfg["num_attention_heads"])
    theta = float(cfg.get("rope_theta", 10000.0))
    scaling = cfg.get("rope_scaling") or {}
    if scaling.get("type") == "dynamic" and scaling.get("alpha"):
        d = cfg.get("attention_head_dim",
                    cfg["hidden_size"] // cfg["num_attention_heads"])
        theta = theta * scaling["alpha"] ** (d / (d - 2))
    w.write_config(_base_vals(cfg, dtype) + [kv], fmt="12i")
    f.write(struct.pack("<f", theta))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.HUNYUAN_DENSE))
    names = _llama_like_names(cfg["num_hidden_layers"], tie=True)
    for i in range(cfg["num_hidden_layers"]):
        names += [f"model.layers.{i}.self_attn.key_layernorm.weight",
                  f"model.layers.{i}.self_attn.query_layernorm.weight"]
    for n in names:
        w.write_tensor(n, sd[n], dtype if sd[n].ndim == 2 else GGMLType.F32)


def convert_gpt_oss(w, f, cfg, sd, dtype):
    """GptOssForCausalLM → GPT_OSS (reference convert.py GPTOSSConverter).

    HF stores experts fused+interleaved: gate_up_proj [E, H, 2F] with
    gate = [..., 0::2] / up = [..., 1::2]; split into the reference's
    per-expert gate_proj/up_proj/down_proj (+biases) tensors."""
    MAXL = 128
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    n_layers = cfg["num_hidden_layers"]
    n_exp = cfg["num_local_experts"]
    scaling = cfg.get("rope_scaling") or {}
    assert scaling.get("rope_type", scaling.get("type")) == "yarn"
    layer_types = [0] * MAXL
    for i, t in enumerate(cfg["layer_types"]):
        layer_types[i] = 1 if t == "sliding_attention" else 0
    w.write_config(
        _base_vals(cfg, dtype) +
        [kv, cfg.get("head_dim", cfg["hidden_size"] // heads),
         cfg.get("experts_per_token", cfg["num_experts_per_tok"]),
         cfg["num_experts_per_tok"], n_exp,
         cfg["sliding_window"]] + layer_types,
        fmt=f"{11 + 6 + MAXL}i")
    f.write(struct.pack(
        "<7f", float(cfg.get("router_aux_loss_coef", 0.9)),
        float(cfg.get("swiglu_limit", 7.0)),
        float(cfg.get("rope_theta", 150000.0)),
        float(scaling.get("original_max_position_embeddings",
                          cfg["max_position_embeddings"])),
        float(scaling.get("beta_fast", 32.0)),
        float(scaling.get("beta_slow", 1.0)),
        float(scaling.get("factor", 1.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.GPT_OSS))

    def emit(n, arr, force_f32=False):
        w.write_tensor(n, arr,
                       dtype if arr.ndim == 2 and not force_f32 else GGMLType.F32)

    emit("model.embed_tokens.weight", sd["model.embed_tokens.weight"])
    for i in range(n_layers):
        pfx = f"model.layers.{i}"
        emit(f"{pfx}.input_layernorm.weight", sd[f"{pfx}.input_layernorm.weight"])
        gu = sd[f"{pfx}.mlp.experts.gate_up_proj"]        # [E, H, 2F]
        gub = sd[f"{pfx}.mlp.experts.gate_up_proj_bias"]  # [E, 2F]
        dn = sd[f"{pfx}.mlp.experts.down_proj"]           # [E, F, H]
        dnb = sd[f"{pfx}.mlp.experts.down_proj_bias"]     # [E, H]
        for j in range(n_exp):
            e = f"{pfx}.mlp.experts.{j}"
            emit(f"{e}.down_proj.weight", np.ascontiguousarray(dn[j].T))
            emit(f"{e}.down_proj.bias", dnb[j])
            emit(f"{e}.gate_proj.weight", np.ascontiguousarray(gu[j][:, 0::2].T))
            emit(f"{e}.gate_proj.bias", gub[j][0::2])
            emit(f"{e}.up_proj.weight", np.ascontiguousarray(gu[j][:, 1::2].T))
            emit(f"{e}.up_proj.bias", gub[j][1::2])
        emit(f"{pfx}.mlp.router.weight", sd[f"{pfx}.mlp.router.weight"])
        emit(f"{pfx}.mlp.router.bias", sd[f"{pfx}.mlp.router.bias"])
        emit(f"{pfx}.post_attention_layernorm.weight",
             sd[f"{pfx}.post_attention_layernorm.weight"])
        for p in ("k_proj", "q_proj", "v_proj", "o_proj"):
            emit(f"{pfx}.self_attn.{p}.weight", sd[f"{pfx}.self_attn.{p}.weight"])
            emit(f"{pfx}.self_attn.{p}.bias", sd[f"{pfx}.self_attn.{p}.bias"])
        emit(f"{pfx}.self_attn.sinks", sd[f"{pfx}.self_attn.sinks"])
    emit("model.norm.weight", sd["model.norm.weight"])
    emit("lm_head.weight", sd["lm_head.weight"])


def _gemma_fold(sd: dict, hidden: int, fold_qk_norm=False) -> dict:
    """Gemma-family weight folds (reference GemmaConverter.pp,
    convert.py:6501): embeddings ×sqrt(hidden), RMSNorm weights stored 1+w."""
    out = {}
    for n, a in sd.items():
        if n == "model.embed_tokens.weight":
            a = a * np.float32(hidden ** 0.5)
        elif n.endswith("norm.weight") or n.endswith("layernorm.weight"):
            if fold_qk_norm or not n.endswith(("q_norm.weight", "k_norm.weight")):
                a = 1.0 + a
        out[n] = a
    return out


def convert_gemma(w, f, cfg, sd, dtype):
    """GemmaForCausalLM → GEMMA (models/gemma.h:9-14): interleaved rope →
    q/k permuted; tied head."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    hd = cfg.get("head_dim", cfg["hidden_size"] // heads)
    w.write_config(_base_vals(cfg, dtype) + [kv, hd], fmt="13i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.GEMMA))
    sd = _gemma_fold(sd, cfg["hidden_size"])
    for n in _llama_like_names(cfg["num_hidden_layers"], tie=True):
        arr = sd[n]
        if n.endswith("q_proj.weight"):
            arr = permute_rope(arr, heads)
        elif n.endswith("k_proj.weight"):
            arr = permute_rope(arr, kv)
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_gemma2(w, f, cfg, sd, dtype):
    """Gemma2ForCausalLM → GEMMA2 (models/gemma.h:59-69): sandwich norms,
    odd-layer SWA, softcaps; interleaved rope → q/k permuted."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    hd = cfg.get("head_dim", cfg["hidden_size"] // heads)
    w.write_config(
        _base_vals(cfg, dtype)
        + [kv, hd, int(cfg.get("query_pre_attn_scalar", hd)),
           int(cfg.get("sliding_window", 4096))], fmt="15i")
    f.write(struct.pack("<3f", float(cfg.get("rope_theta", 10000.0)),
                        float(cfg.get("final_logit_softcapping", 30.0)),
                        float(cfg.get("attn_logit_softcapping", 50.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.GEMMA2))
    sd = _gemma_fold(sd, cfg["hidden_size"])
    names = _llama_like_names(cfg["num_hidden_layers"], tie=True)
    for i in range(cfg["num_hidden_layers"]):
        names += [f"model.layers.{i}.post_feedforward_layernorm.weight",
                  f"model.layers.{i}.pre_feedforward_layernorm.weight"]
    for n in names:
        arr = sd[n]
        if n.endswith("q_proj.weight"):
            arr = permute_rope(arr, heads)
        elif n.endswith("k_proj.weight"):
            arr = permute_rope(arr, kv)
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_gemma3(w, f, cfg, sd, dtype):
    """Gemma3ForCausalLM (text) → GEMMA3 (models/gemma.h:255-266): 5:1 SWA
    pattern w/ dual rope bases, qk norms (stored 1+w), NEOX rope — no
    permutation."""
    scaling = cfg.get("rope_scaling") or {}
    if scaling.get("rope_type") == "yarn":
        # RNJ-1 publishes under the Gemma3 arch with yarn rope (reference
        # dispatch convert.py:11057)
        from .convert_extra2 import convert_rnj

        return convert_rnj(w, f, cfg, sd, dtype)
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    hd = cfg.get("head_dim", cfg["hidden_size"] // heads)
    w.write_config(
        _base_vals(cfg, dtype)
        + [kv, hd, int(cfg.get("query_pre_attn_scalar", hd)),
           int(cfg.get("sliding_window", 1024)),
           int(cfg.get("sliding_window_pattern", 6))], fmt="16i")
    f.write(struct.pack("<3f",
                        float(cfg.get("rope_local_base_freq", 10000.0)),
                        float(cfg.get("rope_theta", 1000000.0)),
                        float(scaling.get("factor", 1.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.GEMMA3))
    sd = _gemma_fold(sd, cfg["hidden_size"], fold_qk_norm=True)
    names = _llama_like_names(cfg["num_hidden_layers"], tie=True, qk_norm=True)
    for i in range(cfg["num_hidden_layers"]):
        names += [f"model.layers.{i}.post_feedforward_layernorm.weight",
                  f"model.layers.{i}.pre_feedforward_layernorm.weight"]
    for n in names:
        w.write_tensor(n, sd[n], dtype if sd[n].ndim == 2 else GGMLType.F32)


def convert_gemma3_vis(w, f, cfg, sd, dtype):
    """Gemma3ForConditionalGeneration → GEMMA3Vis (reference dispatches
    Gemma3Converter with MODEL_TYPE=Gemma3Vis, convert.py:11061-11064):
    text_config flattened into the top level, SigLIP tower renamed
    (layer_norm1/2 → input/post_attention_layernorm, fc1/fc2 → fc0/fc1,
    out_proj → o_proj), mm_input_projection_weight stored transposed,
    mm_soft_emb_norm stored 1+w."""
    tcfg = dict(cfg)
    for k, v in (cfg.get("text_config") or {}).items():
        tcfg[k] = v
    # gemma3 composite configs omit defaults the text loader needs
    tcfg.setdefault("vocab_size", 262208)
    tcfg.setdefault("max_position_embeddings", 131072)
    if isinstance(tcfg.get("eos_token_id"), list):
        tcfg["eos_token_id"] = tcfg["eos_token_id"][0]
    if tcfg.get("bos_token_id") is None:
        tcfg["bos_token_id"] = 2

    txt = {k: v for k, v in sd.items()
           if k.startswith(("model.layers.", "model.embed_tokens.",
                            "model.norm.", "lm_head."))}
    txt.setdefault("lm_head.weight", txt.get("model.embed_tokens.weight"))
    convert_gemma3(w, f, tcfg, txt, dtype)
    if not cfg.get("vision_config"):
        return
    w.patch_model_type(int(ModelType.GEMMA3Vis))
    for k, arr in sd.items():
        if k.startswith("model.layers.") or k.startswith(("model.embed_tokens.",
                                                          "model.norm.", "lm_head.")):
            continue
        kk = k.removeprefix("model.")
        kk = kk.replace("vision_tower.", "")
        kk = kk.replace("mm_input_projection_weight", "mm_input_projection.weight")
        kk = kk.replace(".fc1.", ".fc0.").replace(".fc2.", ".fc1.")
        kk = kk.replace(".out_proj.", ".o_proj.")
        kk = kk.replace(".layer_norm1.", ".input_layernorm.")
        kk = kk.replace(".layer_norm2.", ".post_attention_layernorm.")
        if "mm_input_projection.weight" in kk:
            arr = np.ascontiguousarray(arr)      # HF stores it [vis, lm]
        elif "mm_soft_emb_norm" in kk:
            arr = 1.0 + arr
        w.write_tensor(kk, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_glm4_0414(w, f, cfg, sd, dtype):
    """Glm4ForCausalLM → GLM4_0414 (reference GLM4Converter,
    convert.py:4083): gate_up split, partial interleaved rotary as-is."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    hd = cfg.get("head_dim", cfg["hidden_size"] // heads)
    rope_dim = int(hd * cfg.get("partial_rotary_factor", 0.5))
    w.write_config(_base_vals(cfg, dtype)
                   + [kv, int(bool(cfg.get("attention_bias", False))), rope_dim],
                   fmt="14i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.GLM4_0414))
    L = cfg["num_hidden_layers"]
    names = ["model.embed_tokens.weight"]
    for i in range(L):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.mlp.down_proj.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.post_mlp_layernorm.weight",
                  f"{pfx}.post_self_attn_layernorm.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight"]
    names += ["model.norm.weight", "lm_head.weight"]
    for n in names:
        w.write_tensor(n, sd[n], dtype if sd[n].ndim == 2 else GGMLType.F32)
    for i in range(L):
        gu = sd[f"model.layers.{i}.mlp.gate_up_proj.weight"]
        F2 = gu.shape[0] // 2
        w.write_tensor(f"model.layers.{i}.mlp.gate_proj.weight", gu[:F2], dtype)
        w.write_tensor(f"model.layers.{i}.mlp.up_proj.weight", gu[F2:], dtype)


def convert_glm(w, f, cfg, sd, dtype):
    """GlmForCausalLM (glm-4-9b-chat-hf) → GLM4 (reference ChatGLM4Converter
    naming, convert.py:3999): q/k/v fused back into
    self_attention.query_key_value (weights + biases), gate_up already
    fused, chatglm transformer.* names; partial interleaved rotary as-is
    (rope_ratio = theta / 10000)."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    assert not cfg.get("tie_word_embeddings", False)
    w.write_config(_base_vals(cfg, dtype), fmt="11i")
    f.write(struct.pack("<if", kv,
                        float(cfg.get("rope_theta", 10000.0)) / 10000.0))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.GLM4))
    names = ["transformer.embedding.word_embeddings.weight"]
    sd[names[0]] = sd.pop("model.embed_tokens.weight")
    for i in range(cfg["num_hidden_layers"]):
        hp = f"model.layers.{i}"
        gp = f"transformer.encoder.layers.{i}"
        for part in ("weight", "bias"):
            qn = f"{hp}.self_attn.q_proj.{part}"
            if qn not in sd:
                continue
            sd[f"{gp}.self_attention.query_key_value.{part}"] = \
                np.concatenate([sd.pop(qn),
                                sd.pop(f"{hp}.self_attn.k_proj.{part}"),
                                sd.pop(f"{hp}.self_attn.v_proj.{part}")],
                               axis=0)
            names.append(f"{gp}.self_attention.query_key_value.{part}")
        sd[f"{gp}.self_attention.dense.weight"] = \
            sd.pop(f"{hp}.self_attn.o_proj.weight")
        sd[f"{gp}.input_layernorm.weight"] = \
            sd.pop(f"{hp}.input_layernorm.weight")
        sd[f"{gp}.post_attention_layernorm.weight"] = \
            sd.pop(f"{hp}.post_attention_layernorm.weight")
        sd[f"{gp}.mlp.dense_h_to_4h.weight"] = \
            sd.pop(f"{hp}.mlp.gate_up_proj.weight")
        sd[f"{gp}.mlp.dense_4h_to_h.weight"] = \
            sd.pop(f"{hp}.mlp.down_proj.weight")
        names += [f"{gp}.self_attention.dense.weight",
                  f"{gp}.input_layernorm.weight",
                  f"{gp}.post_attention_layernorm.weight",
                  f"{gp}.mlp.dense_h_to_4h.weight",
                  f"{gp}.mlp.dense_4h_to_h.weight"]
    sd["transformer.encoder.final_layernorm.weight"] = \
        sd.pop("model.norm.weight")
    sd["transformer.output_layer.weight"] = sd.pop("lm_head.weight")
    names += ["transformer.encoder.final_layernorm.weight",
              "transformer.output_layer.weight"]
    _emit_all(w, sd, names, dtype)


def convert_glm4v(w, f, cfg, sd, dtype):
    """Glm4vForConditionalGeneration → GLM4V (reference GLM4VConverter,
    convert.py:4231-4320): glm4-0414 text config + mrope_section[4];
    vision blocks renamed to layers.*, fused qkv split, .attn.proj →
    .attn.o_proj, conv3d patch embed split into proj.0/proj.1."""
    tcfg = dict(cfg)
    for k, v in (cfg.get("text_config") or {}).items():
        tcfg[k] = v
    vis = cfg["vision_config"]
    heads = tcfg["num_attention_heads"]
    kv = tcfg.get("num_key_value_heads", heads)
    hd = tcfg.get("head_dim") or tcfg["hidden_size"] // heads
    rope_dim = int(hd * tcfg.get("partial_rotary_factor", 0.5))
    qkv_bias = bool(tcfg.get("attention_bias", True))
    scaling = (tcfg.get("rope_scaling") or cfg.get("rope_scaling") or {})
    mrope = list(scaling.get("mrope_section", (8, 12, 12)))
    mrope += [0] * (4 - len(mrope))
    w.write_config(_base_vals(tcfg, dtype) + [kv, int(qkv_bias), rope_dim],
                   fmt="14i")
    f.write(struct.pack("<f", float(tcfg.get("rope_theta", 10000.0))))
    f.write(struct.pack("<4i", *mrope[:4]))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.GLM4V))
    names = ["model.embed_tokens.weight"]
    for i in range(tcfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        gu = sd.pop(f"{pfx}.mlp.gate_up_proj.weight")
        F2 = gu.shape[0] // 2
        sd[f"{pfx}.mlp.gate_proj.weight"] = gu[:F2]
        sd[f"{pfx}.mlp.up_proj.weight"] = gu[F2:]
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.post_mlp_layernorm.weight",
                  f"{pfx}.post_self_attn_layernorm.weight"]
        for nm in ("q_proj", "k_proj", "v_proj"):
            names.append(f"{pfx}.self_attn.{nm}.weight")
            if qkv_bias:
                names.append(f"{pfx}.self_attn.{nm}.bias")
        names += [f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.mlp.gate_proj.weight",
                  f"{pfx}.mlp.up_proj.weight", f"{pfx}.mlp.down_proj.weight"]
    names += ["model.norm.weight", "lm_head.weight"]
    # HF rotates interleaved pairs over the first rope_dim head dims —
    # permute q/k (weights AND biases) into the loader's NEOX layout
    nh = {"q": heads, "k": kv}
    for n in list(names):
        for role, nhh in nh.items():
            if f".self_attn.{role}_proj." in n:
                sd[n] = _permute_pair_rope_head(sd[n], nhh, rope_dim)
    _emit_all(w, sd, names, dtype)

    # vision tower
    sd = {k.replace("model.visual.", "visual."): v for k, v in sd.items()}
    vh = int(vis["hidden_size"])
    for k, arr in sorted(sd.items()):
        if not k.startswith("visual."):
            continue
        k = k.replace("visual.blocks.", "visual.layers.")
        if k == "visual.patch_embed.proj.weight":
            w.write_tensor("visual.patch_embed.proj.0.weight",
                           np.ascontiguousarray(arr[:, :, 0]), GGMLType.F32)
            w.write_tensor("visual.patch_embed.proj.1.weight",
                           np.ascontiguousarray(arr[:, :, 1]), GGMLType.F32)
        elif ".attn.qkv." in k:
            q, kk_, v = arr[:vh], arr[vh:2 * vh], arr[2 * vh:]
            for part, nm in ((q, "q_proj"), (kk_, "k_proj"), (v, "v_proj")):
                w.write_tensor(k.replace(".attn.qkv.", f".attn.{nm}."),
                               np.ascontiguousarray(part),
                               dtype if part.ndim == 2 else GGMLType.F32)
        elif ".attn.proj." in k:
            w.write_tensor(k.replace(".attn.proj.", ".attn.o_proj."), arr,
                           dtype if arr.ndim == 2 else GGMLType.F32)
        else:
            w.write_tensor(k, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_olmo2(w, f, cfg, sd, dtype):
    """Olmo2ForCausalLM → OLMo2 (models/allenai.h): post-norm blocks,
    full-projection qk-norm, NEOX rope — tensors pass through."""
    kv = cfg.get("num_key_value_heads", cfg["num_attention_heads"])
    w.write_config(_base_vals(cfg, dtype) + [kv], fmt="12i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta", 500000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.OLMo2))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.post_feedforward_layernorm.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.self_attn.q_norm.weight",
                  f"{pfx}.self_attn.k_norm.weight",
                  f"{pfx}.mlp.gate_proj.weight",
                  f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.mlp.down_proj.weight"]
    names += ["model.norm.weight", "lm_head.weight"]
    for n in names:
        w.write_tensor(n, sd[n], dtype if sd[n].ndim == 2 else GGMLType.F32)


def convert_starcoder2(w, f, cfg, sd, dtype):
    """Starcoder2ForCausalLM → STARCODER2 (models/starcoder.cpp): LayerNorm
    + biases, c_fc/c_proj GELU MLP, NEOX rope."""
    kv = cfg.get("num_key_value_heads", cfg["num_attention_heads"])
    tie = bool(cfg.get("tie_word_embeddings", True))
    w.write_config(_base_vals(cfg, dtype)
                   + [kv, int(cfg.get("sliding_window") or -1)], fmt="13i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta", 100000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.STARCODER2))
    names = ["model.embed_tokens.weight", "model.norm.weight",
             "model.norm.bias"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.input_layernorm.weight", f"{pfx}.input_layernorm.bias",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.bias"]
        for p in ("q_proj", "k_proj", "v_proj", "o_proj"):
            names += [f"{pfx}.self_attn.{p}.weight", f"{pfx}.self_attn.{p}.bias"]
        names += [f"{pfx}.mlp.c_fc.weight", f"{pfx}.mlp.c_fc.bias",
                  f"{pfx}.mlp.c_proj.weight", f"{pfx}.mlp.c_proj.bias"]
    if not tie:
        names.append("lm_head.weight")
    for n in names:
        w.write_tensor(n, sd[n], dtype if sd[n].ndim == 2 else GGMLType.F32)


def convert_cohere(w, f, cfg, sd, dtype):
    """CohereForCausalLM → COHERE_COMMAND_R (models/cohere.cpp): parallel
    residual, bias-free LayerNorm, interleaved rope → q/k permuted, tied."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    w.write_config(_base_vals(cfg, dtype) + [kv], fmt="12i")
    f.write(struct.pack("<ff", float(cfg.get("rope_theta", 8000000.0)),
                        float(cfg.get("logit_scale", 0.0625))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.COHERE_COMMAND_R))
    names = ["model.embed_tokens.weight", "model.norm.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.mlp.gate_proj.weight", f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.mlp.down_proj.weight"]
    for n in names:
        arr = sd[n]
        if n.endswith("q_proj.weight"):
            arr = permute_rope(arr, heads)
        elif n.endswith("k_proj.weight"):
            arr = permute_rope(arr, kv)
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_granite(w, f, cfg, sd, dtype):
    """GraniteForCausalLM → GRANITE (models/granite.cpp:277-290): attention/
    residual/logit multipliers stored raw, embedding_multiplier folded into
    the embed table (GraniteConverter.pp, convert.py:3127); interleaved
    rope → q/k permuted."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    tie = bool(cfg.get("tie_word_embeddings", False))
    mult = float(cfg.get("embedding_multiplier", 1.0))
    if tie and mult != 1.0:
        # the tied unembedding must stay UNSCALED while the input embedding
        # carries ×multiplier — untie on disk with an explicit lm_head
        sd = dict(sd)
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
        tie = False
    if mult != 1.0:
        sd = dict(sd)
        sd["model.embed_tokens.weight"] = \
            sd["model.embed_tokens.weight"] * np.float32(mult)
    w.write_config(_base_vals(cfg, dtype) + [kv, int(tie)], fmt="13i")
    f.write(struct.pack("<4f",
                        float(cfg.get("attention_multiplier", 1.0)),
                        float(cfg.get("logits_scaling", 1.0)),
                        float(cfg.get("residual_multiplier", 1.0)),
                        float(cfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.GRANITE))
    for n in _llama_like_names(cfg["num_hidden_layers"], tie=tie):
        arr = sd[n]
        if n.endswith("q_proj.weight"):
            arr = permute_rope(arr, heads)
        elif n.endswith("k_proj.weight"):
            arr = permute_rope(arr, kv)
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_phi3(w, f, cfg, sd, dtype):
    """Phi3ForCausalLM → PHI3 / PHI3_SU2 / PHI3_SU3 (reference
    Phi3Converter + Phi3SUConverter + Phi3SU3Converter, convert.py:
    4479-4625): fused qkv_proj / gate_up_proj split, q/k permuted; LongRoPE
    checkpoints carry 128+128 padded short/long factors (models/phi.h:189)
    and, with mscales, the SU3 tail."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    scaling = cfg.get("rope_scaling") or {}
    stype = scaling.get("type", scaling.get("rope_type"))
    if not scaling and cfg.get("sliding_window") is None:
        # Phi-4: plain llama-v3 config (reference Phi4Converter:4537)
        w.write_config(_base_vals(cfg, dtype) + [kv], fmt="12i")
        f.write(struct.pack("<f", float(cfg.get("rope_theta", 10000.0))))
        w._patch_offset(12)
        w.patch_model_type(int(ModelType.PHI4))
    elif not scaling:
        w.write_config(
            _base_vals(cfg, dtype)
            + [kv, int(cfg.get("original_max_position_embeddings",
                               cfg["max_position_embeddings"])),
               int(cfg.get("sliding_window") or -1)], fmt="14i")
        f.write(struct.pack("<f", float(cfg.get("rope_theta", 10000.0))))
        w._patch_offset(12)
        w.patch_model_type(int(ModelType.PHI3))
    else:
        assert stype == "longrope", \
            f"Phi3 rope_scaling type {stype} not supported"
        MAXF = 128
        sf = list(scaling["short_factor"])
        lf = list(scaling["long_factor"])
        sf += [0.0] * (MAXF - len(sf))
        lf += [0.0] * (MAXF - len(lf))
        su3 = "short_mscale" in scaling
        w.write_config(
            _base_vals(cfg, dtype)
            + [cfg["max_position_embeddings"], kv,
               int(cfg.get("original_max_position_embeddings",
                           cfg["max_position_embeddings"])),
               int(cfg.get("sliding_window") or -1), 1], fmt="16i")
        f.write(struct.pack(f"<f{MAXF}f{MAXF}f",
                            float(cfg.get("rope_theta", 10000.0)), *sf, *lf))
        if su3:
            f.write(struct.pack("<2f", float(scaling["short_mscale"]),
                                float(scaling["long_mscale"])))
        w._patch_offset(12)
        w.patch_model_type(int(ModelType.PHI3_SU3 if su3
                               else ModelType.PHI3_SU2))
    H = cfg["hidden_size"]
    kv_size = H // heads * kv
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        qkv = sd.pop(f"{pfx}.self_attn.qkv_proj.weight")
        sd[f"{pfx}.self_attn.q_proj.weight"] = permute_rope(qkv[:H], heads)
        sd[f"{pfx}.self_attn.k_proj.weight"] = permute_rope(
            qkv[H:H + kv_size], kv)
        sd[f"{pfx}.self_attn.v_proj.weight"] = qkv[H + kv_size:]
        gu = sd.pop(f"{pfx}.mlp.gate_up_proj.weight")
        F2 = gu.shape[0] // 2
        sd[f"{pfx}.mlp.gate_proj.weight"] = gu[:F2]
        sd[f"{pfx}.mlp.up_proj.weight"] = gu[F2:]
    for n in _llama_like_names(cfg["num_hidden_layers"], tie=False):
        w.write_tensor(n, sd[n], dtype if sd[n].ndim == 2 else GGMLType.F32)


def convert_olmoe(w, f, cfg, sd, dtype):
    """OlmoeForCausalLM → OLMoE (models/allenai.h:7-14): full-projection
    qk-norm MoE, NEOX rope — tensors pass through."""
    kv = cfg.get("num_key_value_heads", cfg["num_attention_heads"])
    n_exp = cfg["num_experts"]
    w.write_config(_base_vals(cfg, dtype)
                   + [kv, cfg["num_experts_per_tok"], n_exp,
                      int(bool(cfg.get("norm_topk_prob", False)))], fmt="15i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.OLMoE))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.self_attn.q_norm.weight",
                  f"{pfx}.self_attn.k_norm.weight",
                  f"{pfx}.mlp.gate.weight"]
        for j in range(n_exp):
            names += [f"{pfx}.mlp.experts.{j}.gate_proj.weight",
                      f"{pfx}.mlp.experts.{j}.up_proj.weight",
                      f"{pfx}.mlp.experts.{j}.down_proj.weight"]
    names += ["model.norm.weight", "lm_head.weight"]
    for n in names:
        w.write_tensor(n, sd[n], dtype if sd[n].ndim == 2 else GGMLType.F32)


def _permute_pair(w: np.ndarray, n_head: int) -> np.ndarray:
    """Interleaved rope pairs → half-split, per head (convert.py:1365)."""
    out = w.shape[0]
    return (w.reshape(n_head, out // n_head // 2, 2, *w.shape[1:])
             .swapaxes(1, 2).reshape(w.shape))


def _permute_pair_rope_head(w: np.ndarray, n_head: int, rope_dim: int) -> np.ndarray:
    """Interleaved pairs in the FIRST rope_dim dims of each head →
    half-split NEOX (reference permute_pair_rope_nope, convert.py:6247);
    the trailing nope dims pass through.  Works on weights and biases."""
    hidden = w.shape[0]
    head_dim = hidden // n_head
    r = w.reshape(n_head, head_dim, *w.shape[1:])
    rot = r[:, :rope_dim]
    rot = (rot.reshape(n_head, rope_dim // 2, 2, *w.shape[1:])
              .swapaxes(1, 2).reshape(rot.shape))
    return np.concatenate([rot, r[:, rope_dim:]], axis=1).reshape(w.shape)


def _permute_pair_rope_tail(w: np.ndarray, n_head: int, nope: int) -> np.ndarray:
    """Rope TAIL of each head interleaved → half-split (convert.py:6236);
    the nope head dims pass through."""
    hidden = w.shape[0]
    head_dim = hidden // n_head
    r = w.reshape(n_head, head_dim, *w.shape[1:])
    rot = r[:, nope:]
    rope_dim = head_dim - nope
    rot = (rot.reshape(n_head, rope_dim // 2, 2, *w.shape[1:])
              .swapaxes(1, 2).reshape(rot.shape))
    return np.concatenate([r[:, :nope], rot], axis=1).reshape(w.shape)


def convert_deepseek_v2(w, f, cfg, sd, dtype, *, v3=False):
    """DeepseekV2/V3ForCausalLM → DEEPSEEK_V2/V3(±_LIGHT) with the MLA
    projections pre-split (reference DeepSeekV2Converter, convert.py:
    7975-8260: kv_a → d_kv + rope-permuted k_pe; kv_b → u_k_nope + u_v;
    q rope-tail permuted; q-LoRA variants carry d_q/q_norm/u_q)."""
    heads = cfg["num_attention_heads"]
    L = cfg["num_hidden_layers"]
    nope, rope_d = cfg["qk_nope_head_dim"], cfg["qk_rope_head_dim"]
    v_dim = cfg["v_head_dim"]
    kv_rank = cfg["kv_lora_rank"]
    q_lora = cfg.get("q_lora_rank") or 0
    light = q_lora == 0
    scaling = cfg.get("rope_scaling") or {}
    vals = [heads, cfg.get("first_k_dense_replace", 0), kv_rank,
            cfg.get("moe_intermediate_size", cfg["intermediate_size"]),
            max(1, cfg.get("moe_layer_freq", 1)),
            max(1, cfg.get("n_group") or 1),
            cfg.get("n_routed_experts") or 0,
            cfg.get("n_shared_experts") or 0,
            int(bool(cfg.get("norm_topk_prob", False))),
            cfg.get("num_experts_per_tok") or 0,
            nope, rope_d,
            int(scaling.get("original_max_position_embeddings",
                            cfg["max_position_embeddings"])),
            v_dim]
    if light:
        mtype = ModelType.DEEPSEEK_V3_LIGHT if v3 else ModelType.DEEPSEEK_V2_LIGHT
    else:
        mtype = ModelType.DEEPSEEK_V3 if v3 else ModelType.DEEPSEEK_V2
        vals_tail = [q_lora, max(1, cfg.get("topk_group") or 1)]
    w.write_config(_base_vals(cfg, dtype) + vals, fmt=f"{11 + len(vals)}i")
    f.write(struct.pack(
        "<7f", float(scaling.get("beta_fast", 32.0)),
        float(scaling.get("beta_slow", 1.0)),
        float(scaling.get("factor", 1.0)),
        float(scaling.get("mscale", 1.0)),
        float(scaling.get("mscale_all_dim", 1.0)),
        float(cfg.get("rope_theta", 10000.0)),
        float(cfg.get("routed_scaling_factor", 1.0))))
    if not light:
        f.write(struct.pack("<2i", *vals_tail))
    w._patch_offset(12)
    w.patch_model_type(int(mtype))

    first_dense = cfg.get("first_k_dense_replace", 0)
    freq = max(1, cfg.get("moe_layer_freq", 1))
    n_routed = cfg.get("n_routed_experts") or 0

    def is_moe(i):
        return n_routed > 0 and i >= first_dense and i % freq == 0

    out = {"model.embed_tokens.weight": sd["model.embed_tokens.weight"],
           "model.norm.weight": sd["model.norm.weight"],
           "lm_head.weight": sd["lm_head.weight"]}
    for i in range(L):
        pfx = f"model.layers.{i}"
        kv_a = sd[f"{pfx}.self_attn.kv_a_proj_with_mqa.weight"]
        out[f"{pfx}.self_attn.d_kv_proj.weight"] = kv_a[:kv_rank]
        out[f"{pfx}.self_attn.k_pe_proj.weight"] = _permute_pair(kv_a[kv_rank:], 1)
        out[f"{pfx}.self_attn.kv_norm.weight"] = \
            sd[f"{pfx}.self_attn.kv_a_layernorm.weight"]
        kv_b = sd[f"{pfx}.self_attn.kv_b_proj.weight"].reshape(
            heads, nope + v_dim, kv_rank)
        out[f"{pfx}.self_attn.u_k_nope_proj.weight"] = \
            np.ascontiguousarray(kv_b[:, :nope].reshape(heads * nope, kv_rank))
        out[f"{pfx}.self_attn.u_v_proj.weight"] = \
            np.ascontiguousarray(kv_b[:, nope:].reshape(heads * v_dim, kv_rank))
        if light:
            out[f"{pfx}.self_attn.q_proj.weight"] = _permute_pair_rope_tail(
                sd[f"{pfx}.self_attn.q_proj.weight"], heads, nope)
        else:
            out[f"{pfx}.self_attn.d_q_proj.weight"] = \
                sd[f"{pfx}.self_attn.q_a_proj.weight"]
            out[f"{pfx}.self_attn.q_norm.weight"] = \
                sd[f"{pfx}.self_attn.q_a_layernorm.weight"]
            out[f"{pfx}.self_attn.u_q_proj.weight"] = _permute_pair_rope_tail(
                sd[f"{pfx}.self_attn.q_b_proj.weight"], heads, nope)
        out[f"{pfx}.self_attn.o_proj.weight"] = \
            sd[f"{pfx}.self_attn.o_proj.weight"]
        out[f"{pfx}.input_layernorm.weight"] = \
            sd[f"{pfx}.input_layernorm.weight"]
        out[f"{pfx}.post_attention_layernorm.weight"] = \
            sd[f"{pfx}.post_attention_layernorm.weight"]
        if is_moe(i):
            out[f"{pfx}.mlp.gate.weight"] = sd[f"{pfx}.mlp.gate.weight"]
            if v3:
                out[f"{pfx}.mlp.gate.e_score_correction_bias"] = \
                    sd[f"{pfx}.mlp.gate.e_score_correction_bias"]
            for j in range(n_routed):
                for n in ("gate_proj", "up_proj", "down_proj"):
                    out[f"{pfx}.mlp.experts.{j}.{n}.weight"] = \
                        sd[f"{pfx}.mlp.experts.{j}.{n}.weight"]
            for n in ("gate_proj", "up_proj", "down_proj"):
                out[f"{pfx}.mlp.shared_experts.{n}.weight"] = \
                    sd[f"{pfx}.mlp.shared_experts.{n}.weight"]
        else:
            for n in ("gate_proj", "up_proj", "down_proj"):
                out[f"{pfx}.mlp.{n}.weight"] = sd[f"{pfx}.mlp.{n}.weight"]
    for n, arr in out.items():
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_deepseek_v3(w, f, cfg, sd, dtype):
    convert_deepseek_v2(w, f, cfg, sd, dtype, v3=True)


def convert_qwen2_moe(w, f, cfg, sd, dtype):
    """Qwen2MoeForCausalLM → QWEN2MoE (models/qwen.h:121-131): per-expert
    FFNs + sigmoid-gated shared expert, NEOX rope (no permutation)."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    n_exp = cfg["num_experts"]
    w.write_config(
        _base_vals(cfg, dtype)
        + [kv, cfg["moe_intermediate_size"],
           cfg.get("shared_expert_intermediate_size",
                   cfg["intermediate_size"]),
           cfg.get("sliding_window") or 0,
           cfg["num_experts_per_tok"], n_exp,
           int(bool(cfg.get("norm_topk_prob", False)))], fmt="18i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.QWEN2MoE))
    names = ["model.embed_tokens.weight", "model.norm.weight",
             "lm_head.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.weight"]
        for p in ("q_proj", "k_proj", "v_proj"):
            names += [f"{pfx}.self_attn.{p}.weight",
                      f"{pfx}.self_attn.{p}.bias"]
        names += [f"{pfx}.self_attn.o_proj.weight", f"{pfx}.mlp.gate.weight"]
        for j in range(n_exp):
            for n in ("gate_proj", "up_proj", "down_proj"):
                names.append(f"{pfx}.mlp.experts.{j}.{n}.weight")
        for n in ("gate_proj", "up_proj", "down_proj"):
            names.append(f"{pfx}.mlp.shared_expert.{n}.weight")
        names.append(f"{pfx}.mlp.shared_expert_gate.weight")
    for n in names:
        w.write_tensor(n, sd[n], dtype if sd[n].ndim == 2 else GGMLType.F32)


def convert_qwen3_moe(w, f, cfg, sd, dtype):
    """Qwen3MoeForCausalLM → QWEN3 (sparse layers via decoder_sparse_step /
    mlp_only_layers — models/qwen.h:746 layer_is_sparse array)."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    tie = bool(cfg.get("tie_word_embeddings", False))
    head_dim = cfg.get("head_dim", cfg["hidden_size"] // heads)
    n_exp = cfg["num_experts"]
    L = cfg["num_hidden_layers"]
    step = max(1, cfg.get("decoder_sparse_step", 1))
    dense = set(cfg.get("mlp_only_layers") or [])
    sparse = [1 if (n_exp > 0 and i not in dense and (i + 1) % step == 0)
              else 0 for i in range(L)]
    sparse += [0] * (128 - L)
    w.write_config(_base_vals(cfg, dtype) + [kv, head_dim], fmt="13i")
    f.write(struct.pack("<ff", float(cfg.get("rope_theta", 10000.0)), -1.0))
    # {yarn_orig, decoder_sparse_step, moe_intermediate, n_active, n_experts,
    # norm_topk} (models/qwen.h:746 order)
    f.write(struct.pack("<6i", -1, step, cfg["moe_intermediate_size"],
                        cfg["num_experts_per_tok"], n_exp,
                        int(bool(cfg.get("norm_topk_prob", False)))))
    f.write(struct.pack("<i", int(tie)))
    f.write(struct.pack("<128i", *sparse))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.QWEN3))
    names = ["model.embed_tokens.weight", "model.norm.weight"]
    if not tie:
        names.append("lm_head.weight")
    for i in range(L):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.self_attn.q_norm.weight",
                  f"{pfx}.self_attn.k_norm.weight"]
        if sparse[i]:
            names.append(f"{pfx}.mlp.gate.weight")
            for j in range(n_exp):
                for n in ("gate_proj", "up_proj", "down_proj"):
                    names.append(f"{pfx}.mlp.experts.{j}.{n}.weight")
        else:
            names += [f"{pfx}.mlp.gate_proj.weight",
                      f"{pfx}.mlp.up_proj.weight",
                      f"{pfx}.mlp.down_proj.weight"]
    for n in names:
        w.write_tensor(n, sd[n], dtype if sd[n].ndim == 2 else GGMLType.F32)


def _convert_qwen_vl(w, f, cfg, sd, dtype, *, v25: bool):
    """Qwen2-VL / Qwen2.5-VL (reference QWen2_VLConverter /
    QWen2_5VLConverter, convert.py:5002-5131): qwen2 text config + tie +
    mrope_section[4]; visual tower with the temporal conv split into
    proj.0/proj.1 and fused attn.qkv split into q/k/v."""
    sd = {k.replace("model.visual.", "visual."): v for k, v in sd.items()}
    tcfg = dict(cfg)
    for k, v in (cfg.get("text_config") or {}).items():
        tcfg[k] = v
    vis = cfg["vision_config"]
    heads = tcfg["num_attention_heads"]
    kv = tcfg.get("num_key_value_heads", heads)
    tie = bool(tcfg.get("tie_word_embeddings", False))
    scaling = (tcfg.get("rope_scaling") or cfg.get("rope_scaling") or {})
    mrope = list(scaling.get("mrope_section", (16, 24, 24)))
    mrope += [0] * (4 - len(mrope))
    w.write_config(_base_vals(tcfg, dtype)
                   + [kv, tcfg.get("sliding_window") or 0], fmt="13i")
    f.write(struct.pack("<f", float(tcfg.get("rope_theta", 1000000.0))))
    f.write(struct.pack("<5i", int(tie), *mrope[:4]))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.QWEN2_5_VL if v25
                           else ModelType.QWEN2_VL))

    for n in _llama_like_names(tcfg["num_hidden_layers"], tie=tie, bias=True):
        w.write_tensor(n, sd[n], dtype if sd[n].ndim == 2 else GGMLType.F32)

    vh = int(vis.get("hidden_size") if v25 else vis["embed_dim"])
    for k, arr in sd.items():
        if not k.startswith("visual."):
            continue
        if k == "visual.patch_embed.proj.weight":
            # conv3d [out, 3, T=2, p, p] → two 2-D kernels
            w.write_tensor("visual.patch_embed.proj.0.weight",
                           np.ascontiguousarray(arr[:, :, 0]), GGMLType.F32)
            w.write_tensor("visual.patch_embed.proj.1.weight",
                           np.ascontiguousarray(arr[:, :, 1]), GGMLType.F32)
        elif ".attn.qkv." in k:
            q, kk_, v = arr[:vh], arr[vh:2 * vh], arr[2 * vh:]
            for part, nm in ((q, "q_proj"), (kk_, "k_proj"), (v, "v_proj")):
                w.write_tensor(k.replace(".attn.qkv.", f".attn.{nm}."),
                               np.ascontiguousarray(part),
                               dtype if part.ndim == 2 else GGMLType.F32)
        else:
            w.write_tensor(k, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_qwen2_audio(w, f, cfg, sd, dtype):
    """Qwen2AudioForConditionalGeneration → QWEN2_AUDIO (reference
    QWen2AudioConverter, convert.py:4855-4940): qwen2 text config;
    whisper-style tower renamed audio_tower→audio with
    out_proj/fc1/fc2/self_attn_layer_norm/final_layer_norm renames."""
    sd = {k.replace("model.audio_tower.", "audio_tower.")
           .replace("model.multi_modal_projector.", "multi_modal_projector."):
          v for k, v in sd.items()}
    tcfg = dict(cfg)
    for k, v in (cfg.get("text_config") or {}).items():
        tcfg[k] = v
    heads = tcfg["num_attention_heads"]
    kv = tcfg.get("num_key_value_heads", heads)
    w.write_config(_base_vals(tcfg, dtype)
                   + [kv, tcfg.get("sliding_window") or 0], fmt="13i")
    f.write(struct.pack("<f", float(tcfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.QWEN2_AUDIO))
    tie = bool(tcfg.get("tie_word_embeddings", False))
    if tie:
        sd.setdefault("lm_head.weight", sd["model.embed_tokens.weight"])
    for n in _llama_like_names(tcfg["num_hidden_layers"], tie=False,
                               bias=True):
        w.write_tensor(n, sd[n], dtype if sd[n].ndim == 2 else GGMLType.F32)
    for k, arr in sd.items():
        if k.startswith("multi_modal_projector."):
            w.write_tensor(k, arr, dtype if arr.ndim == 2 else GGMLType.F32)
            continue
        if not k.startswith("audio_tower."):
            continue
        kk = k.replace("audio_tower.", "audio.")
        kk = kk.replace(".out_proj.", ".o_proj.")
        if ".fc1." in kk:
            kk = kk.replace(".fc1.", ".mlp.fc1.")
        elif ".fc2." in kk:
            kk = kk.replace(".fc2.", ".mlp.fc2.")
        kk = kk.replace(".self_attn_layer_norm.", ".input_layernorm.")
        kk = kk.replace(".final_layer_norm.", ".post_attention_layernorm.")
        w.write_tensor(kk, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_qwen2_vl(w, f, cfg, sd, dtype):
    _convert_qwen_vl(w, f, cfg, sd, dtype, v25=False)


def convert_qwen25_vl(w, f, cfg, sd, dtype):
    _convert_qwen_vl(w, f, cfg, sd, dtype, v25=True)


def convert_janus(w, f, cfg, sd, dtype):
    """JanusForConditionalGeneration → JANUS_PRO (reference JanusConverter,
    convert.py:9374-9520): llama text (q/k permuted); SigLIP tower renamed
    to timm-style names; aligners' fc1/hidden_layers.0 → fc0/fc1; VQ-GAN
    decoder with mid.block_1/attn_1/block_2 → mid.0/1/2 and up.N →
    conv_blocks.N (encoder half unused and skipped)."""
    tcfg = dict(cfg)
    for k, v in (cfg.get("text_config") or {}).items():
        tcfg[k] = v
    heads = tcfg["num_attention_heads"]
    kv = tcfg.get("num_key_value_heads", heads)
    assert kv == heads and not tcfg.get("tie_word_embeddings", False), \
        "Janus-Pro text model is full-MHA untied llama"
    w.write_config(_base_vals(tcfg, dtype), fmt="11i")
    w.patch_model_type(int(ModelType.JANUS_PRO))

    ren = {}
    for k, arr in sd.items():
        if k.startswith("model.vision_model."):
            k2 = (k.replace("model.vision_model.", "vision_model.")
                   .replace("embeddings.patch_embedding.",
                            "patch_embed.proj.")
                   .replace("encoder.layers.", "layers.")
                   .replace(".layer_norm1.", ".norm1.")
                   .replace(".layer_norm2.", ".norm2.")
                   .replace(".self_attn.projection_layer.", ".attn.o_proj.")
                   .replace(".self_attn.", ".attn.")
                   .replace(".mlp.fc1.", ".mlp.fc0.")
                   .replace(".mlp.fc2.", ".mlp.fc1.")
                   .replace("vision_model.post_layernorm.",
                            "vision_model.norm."))
            if k2 == "vision_model.embeddings.position_embedding.weight":
                k2 = "vision_model.pos_embed"
            ren[k2] = arr
        elif k.startswith("model.aligner."):
            ren[k.replace("model.aligner.fc1.", "aligner.fc0.")
                 .replace("model.aligner.hidden_layers.0.",
                          "aligner.fc1.")] = arr
        elif k == "model.generation_embeddings.weight":
            ren["gen_embed.weight"] = arr
        elif k.startswith("model.generation_aligner."):
            ren[k.replace("model.generation_aligner.fc1.",
                          "gen_aligner.fc0.")
                 .replace("model.generation_aligner.hidden_layers.0.",
                          "gen_aligner.fc1.")] = arr
        elif k.startswith("model.generation_head."):
            ren[k.replace("model.generation_head.proj_out.",
                          "gen_head.output_mlp_projector.")
                 .replace("model.generation_head.vision_head.",
                          "gen_head.vision_head.")] = arr
        elif k.startswith("model.vqmodel."):
            if k.startswith("model.vqmodel.encoder.") or \
                    k.startswith("model.vqmodel.quant_conv."):
                continue                      # decode-only runtime
            k2 = (k.replace("model.vqmodel.", "gen_vision_model.")
                   .replace("decoder.mid.block_1.", "decoder.mid.0.")
                   .replace("decoder.mid.attn_1.", "decoder.mid.1.")
                   .replace("decoder.mid.block_2.", "decoder.mid.2."))
            k2 = re.sub(r"decoder\.up\.(\d+)\.block\.",
                        r"decoder.conv_blocks.\1.res.", k2)
            k2 = re.sub(r"decoder\.up\.(\d+)\.attn\.",
                        r"decoder.conv_blocks.\1.attn.", k2)
            k2 = re.sub(r"decoder\.up\.(\d+)\.upsample\.",
                        r"decoder.conv_blocks.\1.upsample.", k2)
            k2 = (k2.replace(".attn_1.q.", ".attn_1.q_proj.")
                    if ".attn_1." in k2 else k2)
            k2 = re.sub(r"(\.(?:mid\.1|attn\.\d+))\.q\.", r"\1.q_proj.", k2)
            k2 = re.sub(r"(\.(?:mid\.1|attn\.\d+))\.k\.", r"\1.k_proj.", k2)
            k2 = re.sub(r"(\.(?:mid\.1|attn\.\d+))\.v\.", r"\1.v_proj.", k2)
            k2 = re.sub(r"(\.(?:mid\.1|attn\.\d+))\.proj_out\.",
                        r"\1.o_proj.", k2)
            ren[k2] = arr
    for n in _llama_like_names(tcfg["num_hidden_layers"], tie=False):
        arr = sd[n]
        if n.endswith("q_proj.weight"):
            arr = permute_rope(arr, heads)
        elif n.endswith("k_proj.weight"):
            arr = permute_rope(arr, kv)
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)
    for k in sorted(ren):
        arr = ren[k]
        w.write_tensor(k, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_internvl(w, f, cfg, sd, dtype):
    """InternVLForConditionalGeneration → INTERN_VL (reference
    InternVLConverter, convert.py:10173): Qwen3 text + InternViT tower
    (encoder.layer → visual.layers, attention.* → self_attn.*, lambda_N →
    lsN) + LN/MLP projector (vision_projector.0/1/3)."""
    tcfg = dict(cfg)
    for k, v in (cfg.get("text_config") or {}).items():
        tcfg[k] = v
    assert tcfg.get("model_type") in (None, "qwen3"), \
        "InternVL loader expects a Qwen3 text model"
    convert_qwen3(w, f, tcfg, sd, dtype)
    w.patch_model_type(int(ModelType.INTERN_VL))

    ren = {}
    for k, arr in sd.items():
        if k.startswith("model.vision_tower."):
            k2 = (k.replace("model.vision_tower.", "visual.")
                   .replace("encoder.layer.", "layers.")
                   .replace(".attention.q_proj.", ".self_attn.q_proj.")
                   .replace(".attention.k_proj.", ".self_attn.k_proj.")
                   .replace(".attention.v_proj.", ".self_attn.v_proj.")
                   .replace(".attention.projection_layer.",
                            ".self_attn.o_proj.")
                   .replace(".layernorm_before.", ".norm1.")
                   .replace(".layernorm_after.", ".norm2.")
                   .replace(".lambda_1", ".ls1")
                   .replace(".lambda_2", ".ls2")
                   .replace("embeddings.cls_token",
                            "embeddings.class_embedding")
                   .replace("embeddings.position_embeddings",
                            "embeddings.position_embedding")
                   .replace("embeddings.patch_embeddings.projection.",
                            "embeddings.patch_embedding."))
            ren[k2] = arr
        elif k.startswith("model.multi_modal_projector."):
            k2 = (k.replace("model.multi_modal_projector.layer_norm.",
                            "vision_projector.0.")
                   .replace("model.multi_modal_projector.linear_1.",
                            "vision_projector.1.")
                   .replace("model.multi_modal_projector.linear_2.",
                            "vision_projector.3."))
            ren[k2] = arr
    # the loader reads q/k/v biases unconditionally (real InternViT ships
    # them); synthesize zeros when the checkpoint was built without
    for i in range(int(cfg["vision_config"]["num_hidden_layers"])):
        for nm in ("q_proj", "k_proj", "v_proj"):
            bn = f"visual.layers.{i}.self_attn.{nm}.bias"
            if bn not in ren:
                ren[bn] = np.zeros(
                    ren[f"visual.layers.{i}.self_attn.{nm}.weight"].shape[0],
                    np.float32)
    for k in sorted(ren):
        arr = ren[k]
        w.write_tensor(k, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_xlmroberta(w, f, cfg, sd, dtype):
    """XLMRobertaModel / XLMRobertaForSequenceClassification → BCE/BGE
    embedding & reranker (reference XLMRobertaConverter /
    XLMRobertaClassificationConverter, convert.py:6411): token_type row 0
    folded into the position embeddings; classifier head kept for the
    reranker."""
    is_ranker = "XLMRobertaForSequenceClassification" in cfg["architectures"]
    sd = {k.removeprefix("roberta."): v for k, v in sd.items()}
    vals = [int(dtype), cfg["vocab_size"], cfg["hidden_size"],
            cfg["num_attention_heads"], cfg["num_hidden_layers"],
            cfg["intermediate_size"], cfg["max_position_embeddings"] - 2,
            int(cfg.get("bos_token_id", 0)), int(cfg.get("eos_token_id", 2)),
            int(cfg.get("pad_token_id", 1)), -1]
    w.write_config(vals, fmt="11i")
    w.patch_model_type(int(ModelType.BCE_ReRanker if is_ranker
                           else ModelType.BCE_Embedding))
    sd["embeddings.position_embeddings.weight"] = (
        sd["embeddings.position_embeddings.weight"]
        + sd["embeddings.token_type_embeddings.weight"][0])
    names = ["embeddings.word_embeddings.weight",
             "embeddings.position_embeddings.weight",
             "embeddings.LayerNorm.weight", "embeddings.LayerNorm.bias"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"encoder.layer.{i}"
        for nm in ("attention.self.query", "attention.self.key",
                   "attention.self.value", "attention.output.dense",
                   "intermediate.dense", "output.dense"):
            names += [f"{pfx}.{nm}.weight", f"{pfx}.{nm}.bias"]
        names += [f"{pfx}.attention.output.LayerNorm.weight",
                  f"{pfx}.attention.output.LayerNorm.bias",
                  f"{pfx}.output.LayerNorm.weight",
                  f"{pfx}.output.LayerNorm.bias"]
    if is_ranker:
        names += ["classifier.dense.weight", "classifier.dense.bias",
                  "classifier.out_proj.weight", "classifier.out_proj.bias"]
    _emit_all(w, sd, names, dtype)


def convert_baichuan(w, f, cfg, sd, dtype):
    """BaichuanForCausalLM (remote-code) → BAICHUANLLAMA (≤32 layers, rope)
    or BAICHUAN (13B+, ALiBi) — reference BaiChuanConverter
    convert.py:3424-3492: W_pack split in thirds (q/k permuted),
    lm_head rows L2-normalized, user/assistant ids appended."""
    heads = cfg["num_attention_heads"]
    is_7b = cfg["num_hidden_layers"] <= 32
    if not is_7b:
        cfg = dict(cfg)
        cfg["max_position_embeddings"] = cfg.get(
            "model_max_length", cfg["max_position_embeddings"])
    w.write_config(_base_vals(cfg, dtype), fmt="11i")
    f.write(struct.pack("<2i", int(cfg.get("user_token_id", 195)),
                        int(cfg.get("assistant_token_id", 196))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.BAICHUANLLAMA if is_7b
                           else ModelType.BAICHUAN))
    lm = sd["lm_head.weight"]
    sd["lm_head.weight"] = lm / np.maximum(
        np.linalg.norm(lm, axis=-1, keepdims=True), 1e-12)
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        pack = sd.pop(f"{pfx}.self_attn.W_pack.weight")
        third = pack.shape[0] // 3
        q, k, v = pack[:third], pack[third:2 * third], pack[2 * third:]
        # the reference permutes BOTH variants (for ALiBi the common
        # per-head permutation cancels in q·kᵀ, so it is file-format parity)
        q = permute_rope(q, heads)
        k = permute_rope(k, heads)
        sd[f"{pfx}.self_attn.q_proj.weight"] = np.ascontiguousarray(q)
        sd[f"{pfx}.self_attn.k_proj.weight"] = np.ascontiguousarray(k)
        sd[f"{pfx}.self_attn.v_proj.weight"] = np.ascontiguousarray(v)
    _emit_all(w, sd, _llama_like_names(cfg["num_hidden_layers"], tie=False),
              dtype)


def convert_internlm2(w, f, cfg, sd, dtype):
    """InternLM2ForCausalLM (remote-code checkpoint) → INTERNLM2_1
    (reference InternLM2Converter, convert.py:1453-1543): fused
    attention.wqkv is grouped per kv-head as [q×(H/KV), k, v] — split and
    rope-permute; tok_embeddings/wo/w1-w3/output renamed to llama names."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    H = cfg["hidden_size"]
    hd = H // heads
    scaling = cfg.get("rope_scaling") or {}
    assert not scaling or scaling.get("type") == "dynamic"
    w.write_config(_base_vals(cfg, dtype) + [kv], fmt="12i")
    f.write(struct.pack("<ff", float(cfg.get("rope_theta", 1000000.0)),
                        float(scaling.get("factor",
                                          scaling.get("scaling_factor", 1.0)))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.INTERNLM2_1))
    kvg = heads // kv
    ren = {"model.embed_tokens.weight": sd["model.tok_embeddings.weight"],
           "model.norm.weight": sd["model.norm.weight"],
           "lm_head.weight": sd["output.weight"]}
    for i in range(cfg["num_hidden_layers"]):
        src = f"model.layers.{i}"
        dst = f"model.layers.{i}"
        qkv = sd[f"{src}.attention.wqkv.weight"]
        v = qkv.reshape(kv, kvg + 2, hd, H)
        ren[f"{dst}.self_attn.q_proj.weight"] = permute_rope(
            np.ascontiguousarray(v[:, :kvg].reshape(heads * hd, H)), heads)
        ren[f"{dst}.self_attn.k_proj.weight"] = permute_rope(
            np.ascontiguousarray(v[:, -2].reshape(kv * hd, H)), kv)
        ren[f"{dst}.self_attn.v_proj.weight"] = \
            np.ascontiguousarray(v[:, -1].reshape(kv * hd, H))
        ren[f"{dst}.self_attn.o_proj.weight"] = sd[f"{src}.attention.wo.weight"]
        ren[f"{dst}.mlp.gate_proj.weight"] = sd[f"{src}.feed_forward.w1.weight"]
        ren[f"{dst}.mlp.down_proj.weight"] = sd[f"{src}.feed_forward.w2.weight"]
        ren[f"{dst}.mlp.up_proj.weight"] = sd[f"{src}.feed_forward.w3.weight"]
        ren[f"{dst}.input_layernorm.weight"] = sd[f"{src}.attention_norm.weight"]
        ren[f"{dst}.post_attention_layernorm.weight"] = sd[f"{src}.ffn_norm.weight"]
    _emit_all(w, ren, _llama_like_names(cfg["num_hidden_layers"], tie=False),
              dtype)


def convert_smolvlm(w, f, cfg, sd, dtype):
    """SmolVLMForConditionalGeneration → SMOL_VLM (reference
    SmolVLMConverter, convert.py:2222-2310): SmolLM text layout + SigLIP
    tower (out_proj → o_proj, fc1/fc2 → fc0/fc1, post_layernorm →
    final_layernorm) + pixel-shuffle connector projection."""
    tcfg = dict(cfg)
    for k, v in (cfg.get("text_config") or {}).items():
        tcfg[k] = v
    heads = tcfg["num_attention_heads"]
    kv = tcfg.get("num_key_value_heads", heads)
    tie = bool(tcfg.get("tie_word_embeddings", False))
    w.write_config(_base_vals(tcfg, dtype), fmt="11i")
    f.write(struct.pack("<if", kv, float(tcfg.get("rope_theta", 100000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.SMOL_VLM))
    sd = {k.replace("model.text_model.", "model.")
           .replace("model.vision_model.encoder.layers.",
                    "vision_model.encoder.layers.")
           .replace("model.vision_model.", "vision_model.")
           .replace(".self_attn.out_proj.", ".self_attn.o_proj.")
           .replace("vision_model.post_layernorm.",
                    "vision_model.final_layernorm.")
           .replace("model.connector.modality_projection.proj.",
                    "multi_modal_projector.proj."): v
          for k, v in sd.items()}
    for k in list(sd):
        if k.startswith("vision_model.") and ".mlp.fc" in k:
            sd[k.replace(".mlp.fc1.", ".mlp.fc0.")
                .replace(".mlp.fc2.", ".mlp.fc1.")] = sd.pop(k)
    for n in _llama_like_names(tcfg["num_hidden_layers"], tie=tie):
        arr = sd[n]
        if n.endswith("q_proj.weight"):
            arr = permute_rope(arr, heads)
        elif n.endswith("k_proj.weight"):
            arr = permute_rope(arr, kv)
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)
    for k in sorted(sd):
        if k.startswith(("vision_model.", "multi_modal_projector.")):
            w.write_tensor(k, sd[k],
                           dtype if sd[k].ndim == 2 else GGMLType.F32)


def convert_mistral3(w, f, cfg, sd, dtype):
    """Mistral3ForConditionalGeneration → MISTRAL3 (reference
    Mistral3Converter; models/mistral.cpp mistral3:722-1010): text model on
    mistral-style disk names (.attn./.attention_norm./.ffn_norm.), YaRN +
    llama4-style attention scaling carried when configured; q/k permuted.
    The pixtral tower is emitted on the reference's names
    (vision_model.* / multi_modal_projector.*, mistral.cpp:500-540)."""
    tcfg = dict(cfg)
    for k, v in (cfg.get("text_config") or {}).items():
        tcfg[k] = v
    heads = tcfg["num_attention_heads"]
    kv = tcfg.get("num_key_value_heads", heads)
    tie = bool(tcfg.get("tie_word_embeddings", False))
    head_dim = tcfg.get("head_dim") or tcfg["hidden_size"] // heads
    scaling = tcfg.get("rope_scaling") or {}
    assert not scaling or scaling.get("rope_type") in (None, "yarn"), \
        "mistral3 carries yarn-style scaling only"
    w.write_config(_base_vals(tcfg, dtype), fmt="11i")
    f.write(struct.pack(
        "<4i6fif", kv, int(tcfg.get("sliding_window") or 0), int(tie),
        head_dim, float(scaling.get("beta_fast", 32.0)),
        float(scaling.get("beta_slow", 1.0)),
        float(scaling.get("factor", 1.0)),
        float(tcfg.get("llama_4_scaling_beta", 0.0)),
        float(scaling.get("mscale", 1.0)),
        float(scaling.get("mscale_all_dim", 0.0)),
        int(scaling.get("original_max_position_embeddings", 0)
            if scaling else 0),
        float(tcfg.get("rope_theta", 1000000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.MISTRAL3))
    if tie:
        sd.setdefault("lm_head.weight", sd["model.embed_tokens.weight"])
    names = ["model.embed_tokens.weight"]
    for i in range(tcfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        sd[f"{pfx}.attention_norm.weight"] = \
            sd.pop(f"{pfx}.input_layernorm.weight")
        sd[f"{pfx}.ffn_norm.weight"] = \
            sd.pop(f"{pfx}.post_attention_layernorm.weight")
        for nm in ("q_proj", "k_proj", "v_proj", "o_proj"):
            sd[f"{pfx}.attn.{nm}.weight"] = \
                sd.pop(f"{pfx}.self_attn.{nm}.weight")
        names += [f"{pfx}.attention_norm.weight",
                  f"{pfx}.attn.q_proj.weight", f"{pfx}.attn.k_proj.weight",
                  f"{pfx}.attn.v_proj.weight", f"{pfx}.attn.o_proj.weight",
                  f"{pfx}.ffn_norm.weight",
                  f"{pfx}.mlp.gate_proj.weight", f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.mlp.down_proj.weight"]
    names += ["model.norm.weight"] + ([] if tie else ["lm_head.weight"])
    for n in names:
        arr = sd[n]
        if n.endswith("attn.q_proj.weight"):
            arr = permute_rope(arr, heads)
        elif n.endswith("attn.k_proj.weight"):
            arr = permute_rope(arr, kv)
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)
    for k in sorted(sd):
        if k.startswith("model.vision_tower."):
            k2 = (k.replace("model.vision_tower.", "vision_model.")
                   .replace(".transformer.layers.", ".layers."))
            w.write_tensor(k2, sd[k],
                           dtype if sd[k].ndim == 2 else GGMLType.F32)
        elif k.startswith("model.multi_modal_projector."):
            w.write_tensor(k.replace("model.", ""), sd[k],
                           dtype if sd[k].ndim == 2 else GGMLType.F32)


def convert_qwen3_vl(w, f, cfg, sd, dtype, moe=False):
    """Qwen3VLForConditionalGeneration → QWEN3_VL (reference
    Qwen3VLConverter, convert.py:5707-5828): qwen3 text config +
    mrope_section[4]; deepstack ViT with temporal-conv split, fused qkv
    split, and linear_fc1/fc2 → fc0/fc1 renames.  `moe` fills the sparse
    fields and emits per-expert tensors (pre-split by the MoE wrapper)."""
    tcfg = dict(cfg)
    for k, v in (cfg.get("text_config") or {}).items():
        tcfg[k] = v
    vis = cfg["vision_config"]
    heads = tcfg["num_attention_heads"]
    kv = tcfg.get("num_key_value_heads", heads)
    tie = bool(tcfg.get("tie_word_embeddings", False))
    head_dim = tcfg.get("head_dim", tcfg["hidden_size"] // heads)
    scaling = (tcfg.get("rope_scaling") or cfg.get("rope_scaling") or {})
    mrope = list(scaling.get("mrope_section", (24, 20, 20)))
    mrope += [0] * (4 - len(mrope))
    L = tcfg["num_hidden_layers"]
    n_exp = int(tcfg.get("num_experts", 0)) if moe else 0
    step = max(1, tcfg.get("decoder_sparse_step", 1))
    dense = set(tcfg.get("mlp_only_layers") or [])
    sparse = [1 if (n_exp > 0 and i not in dense and (i + 1) % step == 0)
              else 0 for i in range(L)]
    w.write_config(_base_vals(tcfg, dtype) + [kv, head_dim], fmt="13i")
    f.write(struct.pack("<ff", float(tcfg.get("rope_theta", 5000000.0)), -1.0))
    f.write(struct.pack("<6i", -1, step if moe else 0,
                        tcfg.get("moe_intermediate_size", -1) if moe else -1,
                        tcfg.get("num_experts_per_tok", -1) if moe else -1,
                        n_exp if moe else -1,
                        int(bool(tcfg.get("norm_topk_prob", False)))))
    f.write(struct.pack("<i", int(tie)))
    f.write(struct.pack("<128i", *(sparse + [0] * (128 - L))))
    f.write(struct.pack("<4i", *mrope[:4]))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.QWEN3_VL))

    if moe:
        names = ["model.embed_tokens.weight", "model.norm.weight"]
        if not tie:
            names.append("lm_head.weight")
        for i in range(L):
            pfx = f"model.layers.{i}"
            names += [f"{pfx}.input_layernorm.weight",
                      f"{pfx}.post_attention_layernorm.weight",
                      f"{pfx}.self_attn.q_proj.weight",
                      f"{pfx}.self_attn.k_proj.weight",
                      f"{pfx}.self_attn.v_proj.weight",
                      f"{pfx}.self_attn.o_proj.weight",
                      f"{pfx}.self_attn.q_norm.weight",
                      f"{pfx}.self_attn.k_norm.weight"]
            if sparse[i]:
                names.append(f"{pfx}.mlp.gate.weight")
                for j in range(n_exp):
                    for nm in ("gate_proj", "up_proj", "down_proj"):
                        names.append(f"{pfx}.mlp.experts.{j}.{nm}.weight")
            else:
                names += [f"{pfx}.mlp.gate_proj.weight",
                          f"{pfx}.mlp.up_proj.weight",
                          f"{pfx}.mlp.down_proj.weight"]
    else:
        names = _llama_like_names(L, tie=tie, qk_norm=True)
    for n in names:
        w.write_tensor(n, sd[n], dtype if sd[n].ndim == 2 else GGMLType.F32)

    sd = {k.replace("model.visual.", "visual."): v for k, v in sd.items()}
    vh = int(vis["hidden_size"])
    for k, arr in sorted(sd.items()):
        if not k.startswith("visual."):
            continue
        k = (k.replace(".mlp.linear_fc1.", ".mlp.fc0.")
              .replace(".mlp.linear_fc2.", ".mlp.fc1."))
        # merger / deepstack mergers: <prefix>.linear_fcN -> <prefix>.mlp.fcN-1
        k = re.sub(r"(merger(?:_list\.\d+)?)\.linear_fc1\.", r"\1.mlp.fc0.", k)
        k = re.sub(r"(merger(?:_list\.\d+)?)\.linear_fc2\.", r"\1.mlp.fc1.", k)
        if k == "visual.patch_embed.proj.weight":
            # conv3d [out, 3, T=2, p, p] → two 2-D kernels
            w.write_tensor("visual.patch_embed.proj.0.weight",
                           np.ascontiguousarray(arr[:, :, 0]), GGMLType.F32)
            w.write_tensor("visual.patch_embed.proj.1.weight",
                           np.ascontiguousarray(arr[:, :, 1]), GGMLType.F32)
        elif ".attn.qkv." in k:
            q, kk_, v = arr[:vh], arr[vh:2 * vh], arr[2 * vh:]
            for part, nm in ((q, "q_proj"), (kk_, "k_proj"), (v, "v_proj")):
                w.write_tensor(k.replace(".attn.qkv.", f".attn.{nm}."),
                               np.ascontiguousarray(part),
                               dtype if part.ndim == 2 else GGMLType.F32)
        else:
            w.write_tensor(k, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_qwen3_vl_moe(w, f, cfg, sd, dtype):
    """Qwen3VLMoeForConditionalGeneration → QWEN3_VL: the qwen3_vl emitter
    with the text MoE fields filled and HF's FUSED per-expert
    gate_up_proj [E, H, 2F] / down_proj [E, F, H] (chunk order gate‖up)
    split+transposed into experts.{j}.* tensors first."""
    tcfg = dict(cfg.get("text_config") or {})
    n_exp = int(tcfg.get("num_experts", 0))
    for i in range(int(tcfg["num_hidden_layers"])):
        pfx = f"model.layers.{i}"
        gk = f"{pfx}.mlp.experts.gate_up_proj"
        if gk not in sd:
            continue
        gu = sd.pop(gk)                                # [E, H, 2F]
        dn = sd.pop(f"{pfx}.mlp.experts.down_proj")    # [E, F, H]
        F2 = gu.shape[-1] // 2
        for j in range(n_exp):
            sd[f"{pfx}.mlp.experts.{j}.gate_proj.weight"] = \
                np.ascontiguousarray(gu[j, :, :F2].T)
            sd[f"{pfx}.mlp.experts.{j}.up_proj.weight"] = \
                np.ascontiguousarray(gu[j, :, F2:].T)
            sd[f"{pfx}.mlp.experts.{j}.down_proj.weight"] = \
                np.ascontiguousarray(dn[j].T)
    convert_qwen3_vl(w, f, cfg, sd, dtype, moe=True)


def convert_mixtral(w, f, cfg, sd, dtype):
    """MixtralForCausalLM → MIXTRAL (models/mistral.h:45-49): per-expert
    w1/w2/w3, interleaved rope → q/k permuted."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    n_exp = cfg["num_local_experts"]
    w.write_config(
        _base_vals(cfg, dtype)
        + [kv, cfg.get("sliding_window") or -1], fmt="13i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta", 10000.0))))
    f.write(struct.pack("<2i", cfg["num_experts_per_tok"], n_exp))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.MIXTRAL))
    names = ["model.embed_tokens.weight", "model.norm.weight",
             "lm_head.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.block_sparse_moe.gate.weight"]
        for j in range(n_exp):
            for n in ("w1", "w2", "w3"):
                names.append(f"{pfx}.block_sparse_moe.experts.{j}.{n}.weight")
    for n in names:
        arr = sd[n]
        if n.endswith("q_proj.weight"):
            arr = permute_rope(arr, heads)
        elif n.endswith("k_proj.weight"):
            arr = permute_rope(arr, kv)
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def _emit_all(w, sd, names, dtype):
    for n in names:
        arr = sd[n]
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_phi2(w, f, cfg, sd, dtype):
    """PhiForCausalLM → PHI2_V2 (reference Phi2Converter HF branch,
    convert.py:3040-3120): partial NEOX rotary, biased everything; HF names
    pass straight through (models/phi.h v2)."""
    hd = cfg["hidden_size"] // cfg["num_attention_heads"]
    rope_dim = int(cfg.get("partial_rotary_factor", 0.5) * hd)
    w.write_config(_base_vals(cfg, dtype), fmt="11i")
    f.write(struct.pack("<if", rope_dim,
                        float(cfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.PHI2_V2))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        for nm in ("input_layernorm", "self_attn.q_proj", "self_attn.k_proj",
                   "self_attn.v_proj", "self_attn.dense", "mlp.fc1",
                   "mlp.fc2"):
            names += [f"{pfx}.{nm}.weight", f"{pfx}.{nm}.bias"]
    names += ["model.final_layernorm.weight", "model.final_layernorm.bias",
              "lm_head.weight", "lm_head.bias"]
    _emit_all(w, sd, names, dtype)


def convert_stablelm(w, f, cfg, sd, dtype):
    """StableLmForCausalLM → STABLELM (reference models/stablelm.cpp:5-11):
    partial NEOX rotary, LayerNorm blocks (biases auto-loaded), optional
    qkv biases."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    hd = cfg["hidden_size"] // heads
    rope_dim = int(cfg.get("partial_rotary_factor", 0.25) * hd)
    assert not cfg.get("use_parallel_residual", False), \
        "parallel-residual StableLM variant not supported"
    w.write_config(_base_vals(cfg, dtype), fmt="11i")
    f.write(struct.pack("<2i2f", kv, rope_dim,
                        float(cfg.get("rope_theta", 10000.0)), 1.0))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.STABLELM))
    qkv_bias = bool(cfg.get("use_qkv_bias", False))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.input_layernorm.bias"]
        for nm in ("q_proj", "k_proj", "v_proj"):
            names.append(f"{pfx}.self_attn.{nm}.weight")
            if qkv_bias:
                names.append(f"{pfx}.self_attn.{nm}.bias")
        names += [f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.bias",
                  f"{pfx}.mlp.gate_proj.weight", f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.mlp.down_proj.weight"]
    names += ["model.norm.weight", "model.norm.bias", "lm_head.weight"]
    _emit_all(w, sd, names, dtype)


def convert_persimmon(w, f, cfg, sd, dtype):
    """PersimmonForCausalLM → PERSIMMON (reference PersimmonConverter,
    convert.py:6257): fused query_key_value is PER-HEAD interleaved
    [heads, 3, hd] (HF _split_heads) — de-interleave into q/k/v; relu²
    MLP, q/k LayerNorms, partial NEOX rotary."""
    heads = cfg["num_attention_heads"]
    H = cfg["hidden_size"]
    hd = H // heads
    rope_dim = int(cfg.get("partial_rotary_factor", 0.5) * hd)
    w.write_config(_base_vals(cfg, dtype), fmt="11i")
    f.write(struct.pack("<2if", heads, rope_dim,
                        float(cfg.get("rope_theta", 25000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.PERSIMMON))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        qkv = sd.pop(f"{pfx}.self_attn.query_key_value.weight")
        qkv_b = sd.pop(f"{pfx}.self_attn.query_key_value.bias")
        qkv = qkv.reshape(heads, 3, hd, H)
        qkv_b = qkv_b.reshape(heads, 3, hd)
        for j, nm in enumerate(("q_proj", "k_proj", "v_proj")):
            sd[f"{pfx}.self_attn.{nm}.weight"] = \
                np.ascontiguousarray(qkv[:, j].reshape(H, H))
            sd[f"{pfx}.self_attn.{nm}.bias"] = \
                np.ascontiguousarray(qkv_b[:, j].reshape(H))
        for nm in ("input_layernorm", "self_attn.q_proj",
                   "self_attn.k_proj", "self_attn.v_proj",
                   "self_attn.dense", "self_attn.q_layernorm",
                   "self_attn.k_layernorm", "post_attention_layernorm",
                   "mlp.dense_h_to_4h", "mlp.dense_4h_to_h"):
            names += [f"{pfx}.{nm}.weight", f"{pfx}.{nm}.bias"]
    names += ["model.final_layernorm.weight", "model.final_layernorm.bias",
              "lm_head.weight"]
    _emit_all(w, sd, names, dtype)


def convert_fuyu(w, f, cfg, sd, dtype):
    """FuyuForCausalLM → FUYU (reference FuyuConverter): the persimmon LM
    plus the flattened-patch vision_embed_tokens linear; adept.cpp:288."""
    tc = cfg.get("text_config") or cfg
    heads = tc["num_attention_heads"]
    H = tc["hidden_size"]
    hd = H // heads
    rope_dim = int(tc.get("partial_rotary_factor", 0.5) * hd)
    w.write_config(
        [int(dtype), tc["vocab_size"], H, heads, tc["num_hidden_layers"],
         tc["intermediate_size"], tc["max_position_embeddings"],
         int(cfg.get("bos_token_id") or tc.get("bos_token_id") or -1),
         int(cfg.get("eos_token_id") or tc.get("eos_token_id") or -1),
         int(cfg.get("pad_token_id") or -1), -1], fmt="11i")
    f.write(struct.pack("<2ifi", heads, rope_dim,
                        float(tc.get("rope_theta", 25000.0)),
                        int(cfg.get("patch_size", 30))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.FUYU))
    for k in ("weight", "bias"):   # HF nests it under model.
        if f"model.vision_embed_tokens.{k}" in sd:
            sd[f"vision_embed_tokens.{k}"] = \
                sd.pop(f"model.vision_embed_tokens.{k}")
    names = ["model.embed_tokens.weight"]
    for i in range(tc["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        qkv = sd.pop(f"{pfx}.self_attn.query_key_value.weight")
        qkv_b = sd.pop(f"{pfx}.self_attn.query_key_value.bias")
        qkv = qkv.reshape(heads, 3, hd, H)
        qkv_b = qkv_b.reshape(heads, 3, hd)
        for j, nm in enumerate(("q_proj", "k_proj", "v_proj")):
            sd[f"{pfx}.self_attn.{nm}.weight"] = \
                np.ascontiguousarray(qkv[:, j].reshape(H, H))
            sd[f"{pfx}.self_attn.{nm}.bias"] = \
                np.ascontiguousarray(qkv_b[:, j].reshape(H))
        for nm in ("input_layernorm", "self_attn.q_proj",
                   "self_attn.k_proj", "self_attn.v_proj",
                   "self_attn.dense", "self_attn.q_layernorm",
                   "self_attn.k_layernorm", "post_attention_layernorm",
                   "mlp.dense_h_to_4h", "mlp.dense_4h_to_h"):
            names += [f"{pfx}.{nm}.weight", f"{pfx}.{nm}.bias"]
    names += ["model.final_layernorm.weight", "model.final_layernorm.bias",
              "lm_head.weight", "vision_embed_tokens.weight",
              "vision_embed_tokens.bias"]
    _emit_all(w, sd, names, dtype)


def convert_cohere2(w, f, cfg, sd, dtype):
    """Cohere2ForCausalLM (Command-R7B) → COHERE_COMMAND_R7B (reference
    convert.py:11071): parallel-residual LayerNorm blocks, SWA layers with
    rope + periodic global NoPE layers, tied logit scale; q/k permuted
    (interleaved rope)."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    w.write_config(_base_vals(cfg, dtype), fmt="11i")
    f.write(struct.pack("<3iff", kv, int(cfg["sliding_window"]),
                        int(cfg.get("sliding_window_pattern", 4)),
                        float(cfg.get("rope_theta", 10000.0)),
                        float(cfg.get("logit_scale", 1.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.COHERE_COMMAND_R7B))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.mlp.gate_proj.weight", f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.mlp.down_proj.weight"]
    names.append("model.norm.weight")
    for n in names:
        arr = sd[n]
        if n.endswith("q_proj.weight"):
            arr = permute_rope(arr, heads)
        elif n.endswith("k_proj.weight"):
            arr = permute_rope(arr, kv)
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_granite_moe(w, f, cfg, sd, dtype):
    """GraniteMoeForCausalLM → GRANITE_MoE (reference convert.py:11100):
    granite multipliers + fused per-expert input_linear [E, 2F, H]
    (gate‖up, HF GraniteMoeMoE chunk order) split into gate/up; q/k
    permuted."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    tie = bool(cfg.get("tie_word_embeddings", False))
    n_exp = cfg["num_local_experts"]
    w.write_config(_base_vals(cfg, dtype), fmt="11i")
    f.write(struct.pack("<4i4f", kv, int(tie),
                        cfg["num_experts_per_tok"], n_exp,
                        float(cfg["attention_multiplier"]),
                        float(cfg["logits_scaling"]),
                        float(cfg["residual_multiplier"]),
                        float(cfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.GRANITE_MoE))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"{'model.layers'}.{i}"
        moe = f"{pfx}.block_sparse_moe"
        gu = sd.pop(f"{moe}.input_linear.weight")      # [E, 2F, H]
        dn = sd.pop(f"{moe}.output_linear.weight")     # [E, H, F]
        F2 = gu.shape[1] // 2
        for j in range(n_exp):
            sd[f"{moe}.experts.{j}.gate_proj.weight"] = gu[j, :F2]
            sd[f"{moe}.experts.{j}.up_proj.weight"] = gu[j, F2:]
            sd[f"{moe}.experts.{j}.down_proj.weight"] = dn[j]
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{moe}.router.layer.weight"]
        for j in range(n_exp):
            for nm in ("gate_proj", "up_proj", "down_proj"):
                names.append(f"{moe}.experts.{j}.{nm}.weight")
    names.append("model.norm.weight")
    if not tie:
        names.append("lm_head.weight")
    for n in names:
        arr = sd[n]
        if n.endswith("q_proj.weight") and ".experts." not in n:
            arr = permute_rope(arr, heads)
        elif n.endswith("k_proj.weight"):
            arr = permute_rope(arr, kv)
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_phimoe(w, f, cfg, sd, dtype):
    """PhimoeForCausalLM → PHI3_MOE (reference convert.py:10914): LongRoPE
    factors + mscales, biased attention + lm_head, sparsemixer w1/w3/w2
    experts (HF names pass through)."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    n_exp = cfg["num_local_experts"]
    scaling = cfg.get("rope_scaling") or {}
    MAXF = 128
    sf = list(scaling.get("short_factor", []))
    lf = list(scaling.get("long_factor", []))
    sf += [0.0] * (MAXF - len(sf))
    lf += [0.0] * (MAXF - len(lf))
    w.write_config(
        _base_vals(cfg, dtype)
        + [cfg["max_position_embeddings"], kv,
           int(cfg.get("original_max_position_embeddings",
                       cfg["max_position_embeddings"])),
           int(cfg.get("sliding_window") or -1),
           1 if scaling else 0], fmt="16i")
    f.write(struct.pack(
        f"<f{MAXF}f{MAXF}f2f2i", float(cfg.get("rope_theta", 10000.0)),
        *sf, *lf, float(scaling.get("short_mscale", 0.0)),
        float(scaling.get("long_mscale", 0.0)),
        cfg["num_experts_per_tok"], n_exp))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.PHI3_MOE))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.input_layernorm.bias"]
        for nm in ("q_proj", "k_proj", "v_proj", "o_proj"):
            names += [f"{pfx}.self_attn.{nm}.weight",
                      f"{pfx}.self_attn.{nm}.bias"]
        names += [f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.bias",
                  f"{pfx}.block_sparse_moe.gate.weight"]
        for j in range(n_exp):
            for nm in ("w1", "w2", "w3"):
                names.append(f"{pfx}.block_sparse_moe.experts.{j}.{nm}.weight")
    names += ["model.norm.weight", "model.norm.bias",
              "lm_head.weight", "lm_head.bias"]
    _emit_all(w, sd, names, dtype)


def convert_smollm3(w, f, cfg, sd, dtype):
    """SmolLM3ForCausalLM → SMOLLM3 (reference convert.py:10853): llama arch
    + periodic NoPE layers (`no_rope_layer_interval`); q/k permuted."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    tie = bool(cfg.get("tie_word_embeddings", False))
    interval = int(cfg.get("no_rope_layer_interval", 4))
    nrl = cfg.get("no_rope_layers")
    if nrl is not None:
        # HF stores the explicit per-layer list (1 = rope); verify it matches
        # the interval encoding the GGMM config carries
        derived = [1 if (i + 1) % interval else 0 for i in range(len(nrl))]
        assert list(nrl) == derived, "irregular no_rope_layers unsupported"
    w.write_config(_base_vals(cfg, dtype), fmt="11i")
    f.write(struct.pack("<3if", kv, interval, int(tie),
                        float(cfg.get("rope_theta", 5000000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.SMOLLM3))
    if tie:
        sd.setdefault("lm_head.weight", sd["model.embed_tokens.weight"])
    for n in _llama_like_names(cfg["num_hidden_layers"], tie=False):
        arr = sd[n]
        if n.endswith("q_proj.weight"):
            arr = permute_rope(arr, heads)
        elif n.endswith("k_proj.weight"):
            arr = permute_rope(arr, kv)
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_exaone4(w, f, cfg, sd, dtype):
    """Exaone4ForCausalLM → EXAONE4 (reference convert.py:11104): post-norm
    blocks, per-head qk RMSNorm, hybrid SWA(+llama3-rope)/global-NoPE
    layers; NEOX rope (no permute)."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    tie = bool(cfg.get("tie_word_embeddings", False))
    n_layers = cfg["num_hidden_layers"]
    sw = int(cfg.get("sliding_window") or 0)
    lt = cfg.get("layer_types")
    if lt is not None:
        sliding = [1 if t == "sliding_attention" else 0 for t in lt]
    else:
        sliding = [0] * n_layers
        sw = 0
    scaling = cfg.get("rope_scaling") or {}
    assert not scaling or scaling.get("rope_type") in (None, "llama3"), \
        "only llama3-style rope scaling supported"
    w.write_config(_base_vals(cfg, dtype), fmt="11i")
    f.write(struct.pack(
        f"<3ifi3f128i", kv, sw, int(tie),
        float(cfg.get("rope_theta", 1000000.0)),
        int(scaling.get("original_max_position_embeddings",
                        cfg["max_position_embeddings"])),
        float(scaling.get("factor", 1.0)),
        float(scaling.get("low_freq_factor", 1.0)),
        float(scaling.get("high_freq_factor", 4.0)),
        *(sliding + [0] * (128 - n_layers))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.EXAONE4))
    if tie:
        sd.setdefault("lm_head.weight", sd["model.embed_tokens.weight"])
    names = ["model.embed_tokens.weight"]
    for i in range(n_layers):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.self_attn.q_norm.weight",
                  f"{pfx}.self_attn.k_norm.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.post_feedforward_layernorm.weight",
                  f"{pfx}.mlp.gate_proj.weight", f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.mlp.down_proj.weight"]
    names += ["model.norm.weight"] + ([] if tie else ["lm_head.weight"])
    _emit_all(w, sd, names, dtype)


def convert_ernie_dense(w, f, cfg, sd, dtype):
    """Ernie4_5ForCausalLM → ERNIE_DENSE (reference convert.py:11140):
    llama arch, q/k permuted to interleaved rope."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    tie = bool(cfg.get("tie_word_embeddings", False))
    hd = cfg.get("head_dim") or cfg["hidden_size"] // heads
    w.write_config(_base_vals(cfg, dtype), fmt="11i")
    f.write(struct.pack("<3if", kv, hd, int(tie),
                        float(cfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.ERNIE_DENSE))
    if tie:
        sd.setdefault("lm_head.weight", sd["model.embed_tokens.weight"])
    for n in _llama_like_names(cfg["num_hidden_layers"], tie=False):
        arr = sd[n]
        if n.endswith("q_proj.weight"):
            arr = permute_rope(arr, heads)
        elif n.endswith("k_proj.weight"):
            arr = permute_rope(arr, kv)
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_ernie_moe(w, f, cfg, sd, dtype):
    """Ernie4_5_MoeForCausalLM → ERNIE_MOE (reference convert.py:11142):
    softmax norm-topk routing with shared experts; moe layers from
    moe_layer_start_index at moe_layer_interval; q/k permuted."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    tie = bool(cfg.get("tie_word_embeddings", False))
    n_exp = cfg["moe_num_experts"]
    start = int(cfg.get("moe_layer_start_index", 0))
    interval = int(cfg.get("moe_layer_interval", 1))
    n_shared = int(cfg.get("moe_num_shared_experts", 0))
    cap = list(cfg.get("moe_capacity", [64, 64, 64]))[:3]
    w.write_config(_base_vals(cfg, dtype), fmt="11i")
    f.write(struct.pack(
        "<12if", kv, int(tie), n_exp, n_shared, start,
        int(cfg["moe_intermediate_size"]), *[int(c) for c in cap],
        int(cfg["moe_k"]), interval,
        int(bool(cfg.get("moe_use_aux_free", False))),
        float(cfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.ERNIE_MOE))
    if tie:
        sd.setdefault("lm_head.weight", sd["model.embed_tokens.weight"])

    def is_moe(i):
        return i >= start and i % max(interval, 1) == 0

    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight"]
        if is_moe(i):
            names.append(f"{pfx}.mlp.gate.weight")
            for j in range(n_exp):
                for nm in ("gate_proj", "up_proj", "down_proj"):
                    names.append(f"{pfx}.mlp.experts.{j}.{nm}.weight")
            for nm in ("gate_proj", "up_proj", "down_proj"):
                names.append(f"{pfx}.mlp.shared_experts.{nm}.weight")
        else:
            names += [f"{pfx}.mlp.gate_proj.weight",
                      f"{pfx}.mlp.up_proj.weight",
                      f"{pfx}.mlp.down_proj.weight"]
    names += ["model.norm.weight"] + ([] if tie else ["lm_head.weight"])
    for n in names:
        arr = sd[n]
        if n.endswith("q_proj.weight") and ".experts." not in n:
            arr = permute_rope(arr, heads)
        elif n.endswith("k_proj.weight"):
            arr = permute_rope(arr, kv)
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def convert_seed_oss(w, f, cfg, sd, dtype):
    """SeedOssForCausalLM → SEED (reference convert.py:11152): qwen2-like
    with explicit head_dim, biased qkv, NEOX rope (no permute)."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    hd = cfg.get("head_dim") or cfg["hidden_size"] // heads
    w.write_config(_base_vals(cfg, dtype), fmt="11i")
    f.write(struct.pack("<2if", kv, hd,
                        float(cfg.get("rope_theta", 10000000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.SEED))
    bias = bool(cfg.get("attention_bias", True))
    names = _llama_like_names(cfg["num_hidden_layers"], tie=False, bias=bias)
    if cfg.get("attention_out_bias"):
        names += [f"model.layers.{i}.self_attn.o_proj.bias"
                  for i in range(cfg["num_hidden_layers"])]
    _emit_all(w, sd, names, dtype)


def convert_hunyuan_moe(w, f, cfg, sd, dtype):
    """HunYuanMoEV1ForCausalLM → HUNYUAN_MOE_V1 (reference
    HunYuanMoEV1Converter; models/hunyuan.h:69-78): post-rope qk RMSNorm,
    softmax norm-topk MoE + shared expert, tied head, NEOX rope.  HF's
    mlp.gate.wg / mlp.shared_mlp names map to gate / shared_expert."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    n_exp = cfg["num_experts"]
    lv = lambda v: v[0] if isinstance(v, list) else v
    assert cfg.get("tie_word_embeddings", False), \
        "HunYuanMoE loader ties the lm_head (hunyuan.h)"
    w.write_config(_base_vals(cfg, dtype), fmt="11i")
    f.write(struct.pack("<5if", kv, n_exp,
                        int(lv(cfg.get("moe_intermediate_size",
                                       cfg["intermediate_size"]))),
                        int(lv(cfg["moe_topk"])),
                        int(lv(cfg.get("num_shared_expert", 1))),
                        float(cfg.get("rope_theta", 10000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.HUNYUAN_MOE_V1))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        sd[f"{pfx}.mlp.gate.weight"] = sd.pop(f"{pfx}.mlp.gate.wg.weight")
        for nm in ("gate_proj", "up_proj", "down_proj"):
            sd[f"{pfx}.mlp.shared_expert.{nm}.weight"] = \
                sd.pop(f"{pfx}.mlp.shared_mlp.{nm}.weight")
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.self_attn.query_layernorm.weight",
                  f"{pfx}.self_attn.key_layernorm.weight",
                  f"{pfx}.mlp.gate.weight"]
        for j in range(n_exp):
            for nm in ("gate_proj", "up_proj", "down_proj"):
                names.append(f"{pfx}.mlp.experts.{j}.{nm}.weight")
        for nm in ("gate_proj", "up_proj", "down_proj"):
            names.append(f"{pfx}.mlp.shared_expert.{nm}.weight")
    names.append("model.norm.weight")
    _emit_all(w, sd, names, dtype)


def convert_apertus(w, f, cfg, sd, dtype):
    """ApertusForCausalLM → APERTUS (reference ApertusConverter;
    models/apertus.cpp): per-head qk-norm, llama3 rope factors, xIELU MLP
    with learned alpha_p/alpha_n + beta/eps buffers (the loader applies the
    softplus transforms).  HF attention_layernorm / feedforward_layernorm
    map to the llama norm names."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    scaling = cfg.get("rope_scaling") or {}
    assert not scaling or scaling.get("rope_type") in (None, "llama3"), \
        "only llama3-style rope scaling supported"
    w.write_config(_base_vals(cfg, dtype), fmt="11i")
    f.write(struct.pack(
        "<ifi3f", kv, float(cfg.get("rope_theta", 12000000.0)),
        int(scaling.get("original_max_position_embeddings",
                        0 if not scaling else cfg["max_position_embeddings"])),
        float(scaling.get("factor", 1.0)),
        float(scaling.get("low_freq_factor", 1.0)),
        float(scaling.get("high_freq_factor", 4.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.APERTUS))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        sd[f"{pfx}.input_layernorm.weight"] = \
            sd.pop(f"{pfx}.attention_layernorm.weight")
        sd[f"{pfx}.post_attention_layernorm.weight"] = \
            sd.pop(f"{pfx}.feedforward_layernorm.weight")
        for k in ("alpha_p", "alpha_n", "beta", "eps"):
            sd[f"{pfx}.mlp.act_fn.{k}"] = \
                sd[f"{pfx}.mlp.act_fn.{k}"].reshape(1).astype(np.float32)
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.self_attn.q_norm.weight",
                  f"{pfx}.self_attn.k_norm.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.mlp.up_proj.weight", f"{pfx}.mlp.down_proj.weight",
                  f"{pfx}.mlp.act_fn.alpha_p", f"{pfx}.mlp.act_fn.alpha_n",
                  f"{pfx}.mlp.act_fn.beta", f"{pfx}.mlp.act_fn.eps"]
    names += ["model.norm.weight", "lm_head.weight"]
    _emit_all(w, sd, names, dtype)


def convert_llama4(w, f, cfg, sd, dtype):
    """Llama4ForCausalLM (text) → LLAMA4 (reference Llama4Converter,
    convert.py:1802): fused per-expert gate_up_proj [E, H, 2F] /
    down_proj [E, F, H] split+transposed into expert tensors, router →
    mlp.gate, NoPE every 4th layer; adjacent-pair rope → NO q/k permute."""
    if "text_config" in cfg:
        cfg = {**cfg["text_config"], "architectures": cfg["architectures"]}
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    n_exp = cfg["num_local_experts"]
    interleave = int(cfg.get("interleave_moe_layer_step", 1))
    scaling = cfg.get("rope_scaling") or {}
    assert not cfg.get("attn_temperature_tuning"), \
        "llama4 attn temperature tuning not supported (reference parity)"
    w.write_config(_base_vals(cfg, dtype), fmt="11i")
    f.write(struct.pack(
        "<8i2fi3f", kv, int(cfg.get("attention_chunk_size") or -1),
        int(cfg.get("head_dim") or cfg["hidden_size"] // heads),
        interleave, int(cfg.get("intermediate_size_mlp",
                                cfg["intermediate_size"])),
        cfg["num_experts_per_tok"], n_exp,
        int(bool(cfg.get("use_qk_norm", False))),
        float(cfg.get("router_aux_loss_coef", 0.0)),
        float(cfg.get("rope_theta", 500000.0)),
        int(scaling.get("original_max_position_embeddings", 0)
            if scaling else 0),
        float(scaling.get("factor", 1.0)),
        float(scaling.get("low_freq_factor", 1.0)),
        float(scaling.get("high_freq_factor", 4.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.LLAMA4))
    names = ["model.embed_tokens.weight"]
    for i in range(cfg["num_hidden_layers"]):
        pfx = f"model.layers.{i}"
        ff = f"{pfx}.feed_forward"
        moe = (i + 1) % max(interleave, 1) == 0
        if moe:
            gu = sd.pop(f"{ff}.experts.gate_up_proj")      # [E, H, 2F]
            dn = sd.pop(f"{ff}.experts.down_proj")         # [E, F, H]
            F2 = gu.shape[-1] // 2
            for j in range(n_exp):
                sd[f"{pfx}.mlp.experts.{j}.gate_proj.weight"] = \
                    np.ascontiguousarray(gu[j, :, :F2].T)
                sd[f"{pfx}.mlp.experts.{j}.up_proj.weight"] = \
                    np.ascontiguousarray(gu[j, :, F2:].T)
                sd[f"{pfx}.mlp.experts.{j}.down_proj.weight"] = \
                    np.ascontiguousarray(dn[j].T)
            sd[f"{pfx}.mlp.gate.weight"] = sd.pop(f"{ff}.router.weight")
            for nm in ("gate_proj", "up_proj", "down_proj"):
                sd[f"{pfx}.mlp.shared_expert.{nm}.weight"] = \
                    sd.pop(f"{ff}.shared_expert.{nm}.weight")
        else:
            for nm in ("gate_proj", "up_proj", "down_proj"):
                sd[f"{pfx}.mlp.{nm}.weight"] = sd.pop(f"{ff}.{nm}.weight")
        names += [f"{pfx}.input_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight"]
        if moe:
            names.append(f"{pfx}.mlp.gate.weight")
            for j in range(n_exp):
                for nm in ("gate_proj", "up_proj", "down_proj"):
                    names.append(f"{pfx}.mlp.experts.{j}.{nm}.weight")
            for nm in ("gate_proj", "up_proj", "down_proj"):
                names.append(f"{pfx}.mlp.shared_expert.{nm}.weight")
        else:
            names += [f"{pfx}.mlp.gate_proj.weight",
                      f"{pfx}.mlp.up_proj.weight",
                      f"{pfx}.mlp.down_proj.weight"]
    names += ["model.norm.weight", "lm_head.weight"]
    _emit_all(w, sd, names, dtype)


ARCH_CONVERTERS = {
    "GptOssForCausalLM": convert_gpt_oss,
    "LlamaForCausalLM": convert_llama,
    "Qwen2ForCausalLM": convert_qwen2,
    "Qwen3ForCausalLM": convert_qwen3,
    "MistralForCausalLM": convert_mistral,
    "HunYuanDenseV1ForCausalLM": convert_hunyuan,
    "GemmaForCausalLM": convert_gemma,
    "Gemma2ForCausalLM": convert_gemma2,
    "Gemma3ForCausalLM": convert_gemma3,
    "Gemma3ForConditionalGeneration": convert_gemma3_vis,
    "Glm4ForCausalLM": convert_glm4_0414,
    "Olmo2ForCausalLM": convert_olmo2,
    "Starcoder2ForCausalLM": convert_starcoder2,
    "CohereForCausalLM": convert_cohere,
    "GraniteForCausalLM": convert_granite,
    "Phi3ForCausalLM": convert_phi3,
    "OlmoeForCausalLM": convert_olmoe,
    "DeepseekV2ForCausalLM": convert_deepseek_v2,
    "DeepseekV3ForCausalLM": convert_deepseek_v3,
    "Qwen2MoeForCausalLM": convert_qwen2_moe,
    "Qwen3MoeForCausalLM": convert_qwen3_moe,
    "MixtralForCausalLM": convert_mixtral,
    "Qwen2VLForConditionalGeneration": convert_qwen2_vl,
    "Qwen2_5_VLForConditionalGeneration": convert_qwen25_vl,
    "Qwen2AudioForConditionalGeneration": convert_qwen2_audio,
    "PhiForCausalLM": convert_phi2,
    "StableLmForCausalLM": convert_stablelm,
    "PersimmonForCausalLM": convert_persimmon,
    "FuyuForCausalLM": convert_fuyu,
    "Cohere2ForCausalLM": convert_cohere2,
    "GraniteMoeForCausalLM": convert_granite_moe,
    "PhimoeForCausalLM": convert_phimoe,
    "PhiMoEForCausalLM": convert_phimoe,
    "SmolLM3ForCausalLM": convert_smollm3,
    "Exaone4ForCausalLM": convert_exaone4,
    "Ernie4_5ForCausalLM": convert_ernie_dense,
    "Ernie4_5_ForCausalLM": convert_ernie_dense,
    "Ernie4_5_MoeForCausalLM": convert_ernie_moe,
    "SeedOssForCausalLM": convert_seed_oss,
    "HunYuanMoEV1ForCausalLM": convert_hunyuan_moe,
    "ApertusForCausalLM": convert_apertus,
    "Llama4ForCausalLM": convert_llama4,
    "Llama4ForConditionalGeneration": convert_llama4,
    "Qwen3VLForConditionalGeneration": convert_qwen3_vl,
    "Mistral3ForConditionalGeneration": convert_mistral3,
    "Glm4vForConditionalGeneration": convert_glm4v,
    "SmolVLMForConditionalGeneration": convert_smolvlm,
    "InternVLForConditionalGeneration": convert_internvl,
    "GlmForCausalLM": convert_glm,
    "Qwen3VLMoeForConditionalGeneration": convert_qwen3_vl_moe,
    "JanusForConditionalGeneration": convert_janus,
    "InternLM2ForCausalLM": convert_internlm2,
    "BaichuanForCausalLM": convert_baichuan,
    "XLMRobertaModel": convert_xlmroberta,
    "XLMRobertaForSequenceClassification": convert_xlmroberta,
}


def _strip_prefixes(sd: dict) -> dict:
    return {k.replace("model.language_model.", "model.")
             .replace("language_model.model.", "model.")
             .replace("language_model.lm_head.", "lm_head."): v
            for k, v in sd.items()}


def convert_yi(w, f, cfg, sd, dtype):
    """yi / map-neo (-a aliases; reference YiConverter): llama weights with
    the yi.h "iff" extra (n_kv, rope_scaling factor, rope_theta)."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    scaling = (cfg.get("rope_scaling") or {}).get("factor", 1.0)
    w.write_config(_base_vals(cfg, dtype), fmt="11i")
    f.write(struct.pack("<iff", kv, float(scaling),
                        float(cfg.get("rope_theta", 5000000.0))))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.YI))
    for n in _llama_like_names(cfg["num_hidden_layers"], tie=False):
        arr = sd[n]
        if n.endswith("q_proj.weight"):
            arr = permute_rope(arr, heads)
        elif n.endswith("k_proj.weight"):
            arr = permute_rope(arr, kv)
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)


# `-a NAME` template aliases (reference convert.py:10750-11180 dispatch):
# same weights/layout as a base family, different model type → different
# chat template / tokenizer behavior at load.
ARCH_ALIASES = {
    "yi": (convert_yi, ModelType.YI),
    "map-neo": (convert_yi, ModelType.MAP_NEO),
    "tigerbot": ("LlamaForCausalLM", ModelType.TIGERBOT),
    "codellama": ("LlamaForCausalLM", ModelType.CODELLAMA),
    "wizardlm": ("LlamaForCausalLM", ModelType.WIZARDLM),
    "wizardmath": ("LlamaForCausalLM", ModelType.WIZARDMATH),
    "megrez": ("LlamaForCausalLM", ModelType.MEGREZ),
    "falcon3": ("LlamaForCausalLM", ModelType.FALCON3),
    "openchat": ("MistralForCausalLM", ModelType.OPENCHAT),
    "starling": ("MistralForCausalLM", ModelType.STARLING),
    "neuralbeagle": ("MistralForCausalLM", ModelType.NEURALBEAGLE),
    "wizardlm-2-moe": ("MixtralForCausalLM", ModelType.WIZARDLM2_MOE),
}


def _load_extra_converters():
    """Round-3 wave converters live in convert_extra*.py (same emitter
    contract); merge their registries on first use."""
    from . import convert_extra, convert_extra2

    ARCH_CONVERTERS.update(convert_extra.EXTRA_CONVERTERS)
    ARCH_ALIASES.update(convert_extra.EXTRA_ALIASES)
    ARCH_CONVERTERS.update(convert_extra2.EXTRA_CONVERTERS2)
    ARCH_ALIASES.update(convert_extra2.EXTRA_ALIASES2)
    from . import convert_extra3
    ARCH_CONVERTERS.update(convert_extra3.EXTRA_CONVERTERS3)
    ARCH_ALIASES.update(convert_extra3.EXTRA_ALIASES3)
    from . import convert_extra4
    ARCH_CONVERTERS.update(convert_extra4.EXTRA_CONVERTERS4)
    from . import convert_extra5
    ARCH_CONVERTERS.update(convert_extra5.EXTRA_CONVERTERS5)
    ARCH_ALIASES.update(convert_extra5.EXTRA_ALIASES5)


def convert(model_dir: str, out_path: str, quant: str = "q8_0",
            name: str = "", lora_dir: str = "", tensor_types=(),
            arch: str = "", snac_dir: str = "", dac_dir: str = "") -> str:
    _load_extra_converters()
    cfg_fn = "config.json"
    if arch == "llama-multi-token-prediction-ckpt":
        cfg_fn = "params.json"   # reference convert.py:10710
    cfg = json.load(open(os.path.join(model_dir, cfg_fn), encoding="utf-8"))
    force_type = None
    alias_fn = None
    if arch:
        if arch in ARCH_ALIASES:
            base, force_type = ARCH_ALIASES[arch]
            if callable(base):
                alias_fn = base
            else:
                cfg["architectures"] = [base]
        else:
            cfg["architectures"] = [arch]
    arch = (cfg.get("architectures") or ["?"])[0]
    if alias_fn is None and arch not in ARCH_CONVERTERS:
        raise NotImplementedError(
            f"architecture {arch} not supported (have: "
            f"{', '.join(sorted(ARCH_CONVERTERS))} "
            f"+ -a aliases {', '.join(sorted(ARCH_ALIASES))})")
    conv = alias_fn
    if conv is None:
        conv = ARCH_CONVERTERS[arch]
        while isinstance(conv, str):   # arch-name alias (e.g. MiMo → Qwen2)
            conv = ARCH_CONVERTERS[conv]
    dtype = QUANT_MAP[quant]
    sd = ({} if getattr(conv, "_no_sd", False)
          else load_state_dict(model_dir))
    if lora_dir:
        lora = LoRAMerge(lora_dir)
        sd = {k: lora.merge(k, v) for k, v in sd.items()}
    sd = _strip_prefixes(sd)
    # later -tt flags take priority (reference convert.py:10692 reversed())
    rules = [(pat, QUANT_MAP[t.lower()]) for pat, t in reversed(tensor_types)]
    meta = {"model_name": name or os.path.basename(os.path.abspath(model_dir)),
            "config.json": cfg}
    # TTS neural-codec side models (--snac_model / --dac_model; reference
    # convert.py:10749-10760): their config rides GGMM meta and their
    # weights merge into the state dict under decoder./quantizer. names
    if snac_dir:
        scfg = json.load(open(os.path.join(snac_dir, "config.json"),
                              encoding="utf-8"))
        cfg["snac_model"] = meta["snac_config.json"] = scfg
        sd.update(_strip_prefixes(load_state_dict(snac_dir)))
    if dac_dir:
        dcfg_p = os.path.join(dac_dir, "config.json")
        dcfg = (json.load(open(dcfg_p, encoding="utf-8"))
                if os.path.isfile(dcfg_p) else {})
        dcfg["n_codebooks"] = 2        # reference convert.py:10759
        cfg["dac_model"] = meta["dac_config.json"] = dcfg
        dsd = load_state_dict(dac_dir)
        if "state_dict" in dsd and not hasattr(dsd["state_dict"], "shape"):
            dsd = dsd["state_dict"]
        sd.update(_strip_prefixes(dsd))
    # side configs some loaders need (vision preprocessing, added tokens,
    # speech-tokenizer configs…) — like the reference, bundle every
    # top-level *.json into the GGMM meta (load_some_info, convert.py:10745)
    for side in sorted(os.listdir(model_dir)):
        if (not side.endswith(".json") or side == "config.json"
                or side.endswith(".index.json")
                or side.startswith("tokenizer.")):
            continue
        sp = os.path.join(model_dir, side)
        if os.path.isfile(sp) and os.path.getsize(sp) < 32 * 2 ** 20:
            try:
                meta[side] = json.load(open(sp, encoding="utf-8"))
            except (json.JSONDecodeError, UnicodeDecodeError):
                pass
    with open(out_path, "wb") as f:
        w = GGMMWriter(f, 0, 1, meta=meta)   # model type patched per arch
        w._model_dir = model_dir
        # container order is config → vocab → tensors (GGMMHeader offsets);
        # the emitter writes config immediately, so buffer its tensor writes
        # until the vocab section is out
        pending = []
        orig_write_tensor = w.write_tensor
        w.write_tensor = lambda nm, arr, dt: pending.append((nm, arr, dt))
        conv(w, f, cfg, sd, dtype)
        if force_type is not None:
            w.patch_model_type(int(force_type))
        w.write_tensor = orig_write_tensor
        # converters with non-standard vocab formats (tiktoken mergeable
        # ranks, SNAC-paired TTS vocabs…) install an override
        vocab_fn = getattr(w, "_vocab_override", None)
        if vocab_fn is not None:
            vocab_fn(w, model_dir)
        else:
            export_vocab(w, model_dir)
        for nm, arr, dt in pending:
            # -tt rules only override the run's default quant choice — a
            # tensor the emitter forces to another type stays forced
            if rules and dt == dtype:
                dt = pick_tensor_type(nm, arr, dtype, rules)
            else:
                dt = _type_fallback(arr.shape, dt) if arr.ndim >= 2 else dt
            w.write_tensor(nm, arr, dt)
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser(description="HF → GGMM converter")
    ap.add_argument("-i", "--model", required=True, help="HF model directory")
    ap.add_argument("-o", "--out", required=True, help="output GGMM file")
    ap.add_argument("-t", "--type", default="q8_0", choices=sorted(QUANT_MAP))
    ap.add_argument("-l", "--lora", default="",
                    help="LoRA adapter directory to merge into the weights")
    ap.add_argument("-tt", "--tensor_type", nargs=2, action="append",
                    default=[], metavar=("PATTERN", "TYPE"),
                    help="per-tensor storage type override (regex, repeatable;"
                         " later flags win): -tt 'lm_head.*' q8_0")
    ap.add_argument("--name", default="")
    ap.add_argument("-a", "--arch", default="",
                    help="architecture override / template alias "
                         "(reference convert.py -a): e.g. yi, openchat, "
                         "tigerbot, falcon3, wizardlm")
    ap.add_argument("--snac_model", default="",
                    help="SNAC codec model dir (orpheus-tts / maya1)")
    ap.add_argument("--dac_model", default="",
                    help="DAC codec model dir (outetts)")
    a = ap.parse_args(argv)
    out = convert(a.model, a.out, a.type, a.name, lora_dir=a.lora,
                  tensor_types=a.tensor_type, arch=a.arch,
                  snac_dir=a.snac_model, dac_dir=a.dac_model)
    print(f"wrote {out} ({os.path.getsize(out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
