"""Converter wave 7a: Qwen3.5 GDN hybrid, Qwen3-TTS, Qwen3-ASR, GLM-ASR,
Orpheus/Maya1 (SNAC), OuteTTS (DAC), + remote-code alias keys."""
import json
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.reader import GGMMFile
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model
from chatllm_tpu.tools.convert import convert

torch = pytest.importorskip("torch")

RT32 = dict(weight_dtype="float32", compute_dtype="float32",
            cache_dtype="float32")
RNG = np.random.default_rng(77)
IDS = (5, 9, 23, 71, 112, 7)


def _t(*shape, scale=0.1):
    return (RNG.standard_normal(shape) * scale).astype(np.float32)


def _ones(n):
    return np.ones(n, np.float32)


def _save_hf(tmp_path, sd, cfg, name="hf", extra_json=None):
    from safetensors.numpy import save_file

    from test_convert import _byte_vocab_json

    d = tmp_path / name
    d.mkdir(parents=True, exist_ok=True)
    save_file({k: np.asarray(v, np.float32) for k, v in sd.items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(cfg))
    (d / "tokenizer.json").write_text(json.dumps(
        _byte_vocab_json(["<|endoftext|>", "<|im_start|>", "<|im_end|>"]),
        ensure_ascii=False))
    for fn, blob in (extra_json or {}).items():
        (d / fn).write_text(json.dumps(blob))
    return str(d)


def _logits(m, ids=IDS):
    a = np.array([list(ids)], dtype=np.int32)
    l, _ = m.forward_logits(a)
    return np.asarray(l)[0]


# ---------------------------------------------------------------------------
# Qwen3.5: fused q|gate + fused experts split == directly-written layout
# ---------------------------------------------------------------------------

V35 = 262   # 256 bytes + 3 specials + filler handled by byte vocab json
H35, HEADS, KV, INTER, HD = 64, 4, 2, 96, 16
CONV_K, NK, NV, DK, DV = 4, 2, 4, 8, 8
NEXP, TOPK, MOE_I, SHARED_I = 4, 2, 32, 48


def _q35_weights():
    conv_dim = 2 * NK * DK + NV * DV
    w = {
        "embed": _t(V35, H35), "norm": _ones(H35), "head": _t(V35, H35),
        # layer 0: DeltaNet + MoE
        "l0": {
            "in_norm": _ones(H35), "post_norm": _ones(H35),
            "qkv": _t(conv_dim, H35), "z": _t(NV * DV, H35),
            "b": _t(NV, H35), "a": _t(NV, H35),
            "conv": _t(conv_dim, 1, CONV_K), "dt": _t(NV), "alog": _t(NV),
            "lnorm": _ones(DV), "out": _t(H35, NV * DV),
            "gate_w": _t(NEXP, H35),
            "experts": [{"g": _t(MOE_I, H35), "u": _t(MOE_I, H35),
                         "d": _t(H35, MOE_I)} for _ in range(NEXP)],
            "sh_g": _t(SHARED_I, H35), "sh_u": _t(SHARED_I, H35),
            "sh_d": _t(H35, SHARED_I), "sh_gate": _t(1, H35),
        },
        # layer 1: gated attention + MoE
        "l1": {
            "in_norm": _ones(H35), "post_norm": _ones(H35),
            "q": _t(HEADS * HD, H35), "gate": _t(HEADS * HD, H35),
            "k": _t(KV * HD, H35), "v": _t(KV * HD, H35),
            "o": _t(H35, HEADS * HD),
            "qn": _ones(HD), "kn": _ones(HD),
            "gate_w": _t(NEXP, H35),
            "experts": [{"g": _t(MOE_I, H35), "u": _t(MOE_I, H35),
                         "d": _t(H35, MOE_I)} for _ in range(NEXP)],
            "sh_g": _t(SHARED_I, H35), "sh_u": _t(SHARED_I, H35),
            "sh_d": _t(H35, SHARED_I), "sh_gate": _t(1, H35),
        },
    }
    return w


def _q35_direct(path, w):
    """Write the already-split layout our loader reads (the oracle)."""
    with open(path, "wb") as f:
        g = GGMMWriter(f, int(ModelType.QWEN3_5), 1, meta={})
        g.write_config([int(GGMLType.F32), V35, H35, HEADS, 2, INTER, 256,
                        -1, 0, -1, -1], fmt="11i")
        f.write(struct.pack("<8i", KV, 1, CONV_K, DK, NK, NV, DV, HD))
        f.write(struct.pack("<f", 10000.0))
        f.write(struct.pack("<11i", HD, 2, 1, 1, 0, MOE_I, SHARED_I, TOPK,
                            NEXP, 0, 0))
        f.write(struct.pack("<f", -1.0))
        f.write(struct.pack("<128i", *([1, 0] + [0] * 126)))
        g._patch_offset(12)
        from chatllm_tpu.tokenizer.processor import byte_level_encode

        pieces = [byte_level_encode(bytes([b])) for b in range(256)]
        pieces += [b"<|endoftext|>", b"<|im_start|>", b"<|im_end|>"]
        pieces += [f"<x{j}>".encode() for j in range(V35 - len(pieces))]
        g.write_vocab_bpe([(pp, 1) for pp in pieces], [])

        def t(name, arr):
            g.write_tensor(name, arr, GGMLType.F32)

        t("model.embed_tokens.weight", w["embed"])
        t("model.norm.weight", w["norm"])
        t("lm_head.weight", w["head"])
        for i, lk in enumerate(("l0", "l1")):
            L = w[lk]
            pfx = f"model.layers.{i}"
            t(f"{pfx}.input_layernorm.weight", L["in_norm"])
            t(f"{pfx}.post_attention_layernorm.weight", L["post_norm"])
            if lk == "l0":
                t(f"{pfx}.linear_attn.in_proj_qkv.weight", L["qkv"])
                t(f"{pfx}.linear_attn.in_proj_z.weight", L["z"])
                t(f"{pfx}.linear_attn.in_proj_b.weight", L["b"])
                t(f"{pfx}.linear_attn.in_proj_a.weight", L["a"])
                t(f"{pfx}.linear_attn.conv1d.weight", L["conv"])
                t(f"{pfx}.linear_attn.dt_bias", L["dt"])
                t(f"{pfx}.linear_attn.A_log", L["alog"])
                t(f"{pfx}.linear_attn.norm.weight", L["lnorm"])
                t(f"{pfx}.linear_attn.out_proj.weight", L["out"])
            else:
                t(f"{pfx}.self_attn.q_proj.weight", L["q"])
                t(f"{pfx}.self_attn.gate_proj.weight", L["gate"])
                t(f"{pfx}.self_attn.k_proj.weight", L["k"])
                t(f"{pfx}.self_attn.v_proj.weight", L["v"])
                t(f"{pfx}.self_attn.o_proj.weight", L["o"])
                t(f"{pfx}.self_attn.q_norm.weight", L["qn"])
                t(f"{pfx}.self_attn.k_norm.weight", L["kn"])
            t(f"{pfx}.mlp.gate.weight", L["gate_w"])
            for j, e in enumerate(L["experts"]):
                t(f"{pfx}.mlp.experts.{j}.gate_proj.weight", e["g"])
                t(f"{pfx}.mlp.experts.{j}.up_proj.weight", e["u"])
                t(f"{pfx}.mlp.experts.{j}.down_proj.weight", e["d"])
            t(f"{pfx}.mlp.shared_expert.gate_proj.weight", L["sh_g"])
            t(f"{pfx}.mlp.shared_expert.up_proj.weight", L["sh_u"])
            t(f"{pfx}.mlp.shared_expert.down_proj.weight", L["sh_d"])
            t(f"{pfx}.mlp.shared_expert_gate.weight", L["sh_gate"])


def test_convert_qwen35_pack_oracle(tmp_path):
    w = _q35_weights()
    direct = str(tmp_path / "direct.bin")
    _q35_direct(direct, w)
    m_ref = load_model(direct, RuntimeConfig(**RT32))

    # HF form: fused per-head q|gate, stacked gate_up/down expert tensors,
    # language_model prefix (convert must split them identically)
    def fuse_qgate(q, gate):
        qh = q.reshape(HEADS, HD, H35)
        gh = gate.reshape(HEADS, HD, H35)
        return np.concatenate([qh, gh], axis=1).reshape(HEADS * HD * 2, H35)

    sd = {"model.language_model.embed_tokens.weight": w["embed"],
          "model.language_model.norm.weight": w["norm"],
          "lm_head.weight": w["head"]}
    for i, lk in enumerate(("l0", "l1")):
        L = w[lk]
        pfx = f"model.language_model.layers.{i}"
        sd[f"{pfx}.input_layernorm.weight"] = L["in_norm"]
        sd[f"{pfx}.post_attention_layernorm.weight"] = L["post_norm"]
        if lk == "l0":
            for nm, kk in (("in_proj_qkv.weight", "qkv"),
                           ("in_proj_z.weight", "z"), ("in_proj_b.weight", "b"),
                           ("in_proj_a.weight", "a"), ("conv1d.weight", "conv"),
                           ("dt_bias", "dt"), ("A_log", "alog"),
                           ("norm.weight", "lnorm"), ("out_proj.weight", "out")):
                sd[f"{pfx}.linear_attn.{nm}"] = L[kk]
        else:
            sd[f"{pfx}.self_attn.q_proj.weight"] = fuse_qgate(L["q"], L["gate"])
            sd[f"{pfx}.self_attn.k_proj.weight"] = L["k"]
            sd[f"{pfx}.self_attn.v_proj.weight"] = L["v"]
            sd[f"{pfx}.self_attn.o_proj.weight"] = L["o"]
            sd[f"{pfx}.self_attn.q_norm.weight"] = L["qn"]
            sd[f"{pfx}.self_attn.k_norm.weight"] = L["kn"]
        sd[f"{pfx}.mlp.gate.weight"] = L["gate_w"]
        sd[f"{pfx}.mlp.experts.gate_up_proj"] = np.stack(
            [np.concatenate([e["g"], e["u"]], axis=0) for e in L["experts"]])
        sd[f"{pfx}.mlp.experts.down_proj"] = np.stack(
            [e["d"] for e in L["experts"]])
        sd[f"{pfx}.mlp.shared_expert.gate_proj.weight"] = L["sh_g"]
        sd[f"{pfx}.mlp.shared_expert.up_proj.weight"] = L["sh_u"]
        sd[f"{pfx}.mlp.shared_expert.down_proj.weight"] = L["sh_d"]
        sd[f"{pfx}.mlp.shared_expert_gate.weight"] = L["sh_gate"]

    cfg = {"architectures": ["Qwen3_5ForConditionalGeneration"],
           "text_config": {
               "vocab_size": V35, "hidden_size": H35,
               "num_attention_heads": HEADS, "num_key_value_heads": KV,
               "num_hidden_layers": 2, "intermediate_size": INTER,
               "max_position_embeddings": 256, "head_dim": HD,
               "attn_output_gate": True, "linear_conv_kernel_dim": CONV_K,
               "linear_key_head_dim": DK, "linear_num_key_heads": NK,
               "linear_num_value_heads": NV, "linear_value_head_dim": DV,
               "layer_types": ["linear_attention", "full_attention"],
               "num_experts": NEXP, "num_experts_per_tok": TOPK,
               "moe_intermediate_size": MOE_I,
               "shared_expert_intermediate_size": SHARED_I,
               "mtp_num_hidden_layers": 0, "tie_word_embeddings": False,
               "rope_parameters": {"rope_type": "default",
                                   "rope_theta": 10000.0,
                                   "mrope_interleaved": True,
                                   "mrope_section": [2, 1, 1]},
               "bos_token_id": -1, "eos_token_id": 0},
           "vision_config": {}}
    d = _save_hf(tmp_path, sd, cfg)
    out = str(tmp_path / "conv.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert m.cfg.gdn is not None and m.cfg.layer_specs[0].linear_attn
    np.testing.assert_allclose(_logits(m), _logits(m_ref),
                               atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# Qwen3-ASR (audio tower renames) and GLM-ASR (rope permute + tower)
# ---------------------------------------------------------------------------

def _asr_audio_sd_hf():
    """HF-name audio tower for Qwen3-ASR (thinker.audio_tower.*), from the
    real HF encoder class so shapes match the AuT loader."""
    import test_qwen3_asr as T

    enc = T.make_hf_tower()
    return ({f"thinker.audio_tower.{k}": v.detach().float().numpy()
             for k, v in enc.state_dict().items()},
            {"num_mel_bins": T.N_MELS, "d_model": T.A_HID,
             "encoder_layers": T.A_LAYERS,
             "encoder_attention_heads": T.A_HEADS,
             "encoder_ffn_dim": T.A_FFN,
             "downsample_hidden_size": T.DSH, "n_window": T.N_WINDOW,
             "n_window_infer": T.N_WINDOW_INFER,
             "output_dim": H35, "num_hidden_layers": T.A_LAYERS})


def _qwen3_llm_sd(prefix="thinker.", V=V35, H=H35, L=1):
    sd = {f"{prefix}model.embed_tokens.weight": _t(V, H),
          f"{prefix}model.norm.weight": _ones(H),
          f"{prefix}lm_head.weight": _t(V, H)}
    for i in range(L):
        p = f"{prefix}model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = _ones(H)
        sd[f"{p}.post_attention_layernorm.weight"] = _ones(H)
        sd[f"{p}.self_attn.q_proj.weight"] = _t(HEADS * HD, H)
        sd[f"{p}.self_attn.k_proj.weight"] = _t(KV * HD, H)
        sd[f"{p}.self_attn.v_proj.weight"] = _t(KV * HD, H)
        sd[f"{p}.self_attn.o_proj.weight"] = _t(H, HEADS * HD)
        sd[f"{p}.self_attn.q_norm.weight"] = _ones(HD)
        sd[f"{p}.self_attn.k_norm.weight"] = _ones(HD)
        sd[f"{p}.mlp.gate_proj.weight"] = _t(INTER, H)
        sd[f"{p}.mlp.up_proj.weight"] = _t(INTER, H)
        sd[f"{p}.mlp.down_proj.weight"] = _t(H, INTER)
    return sd


def test_convert_qwen3_asr(tmp_path):
    sd = _qwen3_llm_sd()
    tower_sd, aud_cfg = _asr_audio_sd_hf()
    sd.update(tower_sd)
    cfg = {"architectures": ["Qwen3ASRForConditionalGeneration"],
           "thinker_config": {
               "model_type": "qwen3_asr",
               "text_config": {
                   "vocab_size": V35, "hidden_size": H35,
                   "num_attention_heads": HEADS, "num_key_value_heads": KV,
                   "num_hidden_layers": 1, "intermediate_size": INTER,
                   "max_position_embeddings": 256, "head_dim": HD,
                   "rope_theta": 10000.0,
                   "rope_scaling": {"mrope_section": [24, 20, 20],
                                    "mrope_interleaved": True},
                   "bos_token_id": -1, "eos_token_id": 0},
               "audio_config": aud_cfg},
           }
    d = _save_hf(tmp_path, sd, cfg)
    out = str(tmp_path / "asr.bin")
    convert(d, out, "f32")
    gf = GGMMFile.open(out)
    assert gf.model_type == int(ModelType.QWEN3_ASR)
    # tower renames landed (fc1→mlp.fc0, out_proj→o_proj, layer norms)
    for n in ("audio.layers.0.mlp.fc0.weight",
              "audio.layers.0.self_attn.o_proj.weight",
              "audio.layers.0.input_layernorm.weight",
              "audio.conv2d1.weight", "audio.conv_out.weight",
              "multi_modal_projector.proj2.weight"):
        assert gf.has_tensor(n), n
    m = load_model(out, RuntimeConfig(**RT32))
    assert m.aud_params is not None
    assert _logits(m).shape == (len(IDS), V35)


def test_convert_glm_asr(tmp_path):
    # LLM permute oracle: identical weights through the plain-llama
    # converter must give identical logits
    base = {}
    for k, v in _qwen3_llm_sd(prefix="").items():
        if "q_norm" in k or "k_norm" in k:
            continue
        base[k] = v
    llama_cfg = {"architectures": ["LlamaForCausalLM"], "vocab_size": V35,
                 "hidden_size": H35, "num_attention_heads": HEADS,
                 "num_key_value_heads": KV, "num_hidden_layers": 1,
                 "intermediate_size": INTER,
                 "max_position_embeddings": 256, "rope_theta": 500000.0,
                 "bos_token_id": -1, "eos_token_id": 0}
    d1 = _save_hf(tmp_path, base, llama_cfg, name="hf_llama")
    out1 = str(tmp_path / "llama.bin")
    convert(d1, out1, "f32")
    m_ref = load_model(out1, RuntimeConfig(**RT32))

    sd = {f"language_model.{k}": v for k, v in base.items()}
    for i in range(1):
        p = f"audio_tower.layers.{i}"
        sd[f"{p}.self_attn.q_proj.weight"] = _t(32, 32)
        sd[f"{p}.self_attn.q_proj.bias"] = _t(32)
        sd[f"{p}.self_attn.k_proj.weight"] = _t(32, 32)
        sd[f"{p}.self_attn.v_proj.weight"] = _t(32, 32)
        sd[f"{p}.self_attn.v_proj.bias"] = _t(32)
        sd[f"{p}.self_attn.o_proj.weight"] = _t(32, 32)
        sd[f"{p}.self_attn.o_proj.bias"] = _t(32)
        sd[f"{p}.input_layernorm.weight"] = _ones(32)
        sd[f"{p}.input_layernorm.bias"] = _t(32)
        sd[f"{p}.post_attention_layernorm.weight"] = _ones(32)
        sd[f"{p}.post_attention_layernorm.bias"] = _t(32)
        sd[f"{p}.mlp.fc1.weight"] = _t(64, 32)
        sd[f"{p}.mlp.fc1.bias"] = _t(64)
        sd[f"{p}.mlp.fc2.weight"] = _t(32, 64)
        sd[f"{p}.mlp.fc2.bias"] = _t(32)
    sd["audio_tower.conv1.weight"] = _t(32, 12, 3)
    sd["audio_tower.conv1.bias"] = _t(32)
    sd["audio_tower.conv2.weight"] = _t(32, 32, 3)
    sd["audio_tower.conv2.bias"] = _t(32)
    sd["audio_tower.norm.weight"] = _ones(32)
    sd["audio_tower.norm.bias"] = _t(32)
    sd["multi_modal_projector.linear_1.weight"] = _t(H35, 64)
    sd["multi_modal_projector.linear_1.bias"] = _t(H35)
    sd["multi_modal_projector.linear_2.weight"] = _t(H35, H35)
    sd["multi_modal_projector.linear_2.bias"] = _t(H35)
    cfg = {"architectures": ["GlmAsrForConditionalGeneration"],
           "text_config": {
               "vocab_size": V35, "hidden_size": H35,
               "num_attention_heads": HEADS, "num_key_value_heads": KV,
               "num_hidden_layers": 1, "intermediate_size": INTER,
               "max_position_embeddings": 256,
               "rope_parameters": {"rope_theta": 500000.0},
               "bos_token_id": -1, "eos_token_id": 0},
           "audio_config": {"num_hidden_layers": 1, "hidden_size": 32,
                            "num_attention_heads": 2,
                            "num_key_value_heads": 2,
                            "intermediate_size": 64, "num_mel_bins": 12,
                            "rope_parameters": {"rope_theta": 10000.0}}}
    d2 = _save_hf(tmp_path, sd, cfg, name="hf_glm")
    out2 = str(tmp_path / "glm_asr.bin")
    convert(d2, out2, "f32")
    gf = GGMMFile.open(out2)
    assert gf.model_type == int(ModelType.GLM_ASR)
    assert gf.has_tensor("audio.conv1.weight")
    m = load_model(out2, RuntimeConfig(**RT32))
    np.testing.assert_allclose(_logits(m), _logits(m_ref),
                               atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# Orpheus / OuteTTS weight-norm folding
# ---------------------------------------------------------------------------

def _wn_pair(out_c, in_c, k):
    v = _t(out_c, in_c, k, scale=0.4)
    g = np.abs(_t(out_c, 1, 1, scale=1.0)) + 0.5
    return v, g


def _snac_hf_sd(rates=(2, 2), strides=(2, 1), dim=16, depthwise=True):
    """HF SNAC checkpoint names: decoder.model.N... with weight_v/_g."""
    sd = {}

    def conv(prefix, out_c, in_c, k, groups=1):
        v, g = _wn_pair(out_c, in_c // groups, k)
        sd[f"{prefix}.weight_v"] = v
        sd[f"{prefix}.weight_g"] = g
        sd[f"{prefix}.bias"] = _t(out_c)

    def snake(prefix, ch):
        sd[f"{prefix}.alpha"] = np.abs(_t(1, ch, 1)) + 0.5

    conv("decoder.model.layers.0", dim, 8, 7)
    li = 1
    if depthwise:
        conv("decoder.model.layers.1", dim, dim, 7)
        li = 2
    ch = dim
    for r in rates:
        p = f"decoder.model.layers.{li}.block.layers"
        snake(f"{p}.0", ch)
        conv(f"{p}.1", ch // 2, ch, 2 * r)
        v, g = _wn_pair(ch // 2, ch // 2, 1)
        sd[f"{p}.2.linear.weight_v"] = v
        sd[f"{p}.2.linear.weight_g"] = g
        ch //= 2
        for rr in range(3):
            rp = f"{p}.{3 + rr}.block.layers"
            snake(f"{rp}.0", ch)
            conv(f"{rp}.1", ch, ch, 7)
            snake(f"{rp}.2", ch)
            conv(f"{rp}.3", ch, ch, 1)
        li += 1
    snake(f"decoder.model.layers.{li}", ch)
    conv(f"decoder.model.layers.{li + 1}", 1, ch, 7)
    for i, _s in enumerate(strides):
        p = f"quantizer.quantizers.{i}"
        conv(f"{p}.in_proj", 4, 8, 1)
        conv(f"{p}.out_proj", 8, 4, 1)
        sd[f"{p}.codebook.weight"] = _t(16, 4)
    return sd


def test_convert_orpheus_snac(tmp_path):
    # llama-3.2-style LLM (rope_scaling + tie)
    lm = {}
    for k, v in _qwen3_llm_sd(prefix="").items():
        if "q_norm" in k or "k_norm" in k or k == "lm_head.weight":
            continue
        lm[k] = v
    cfg = {"architectures": ["LlamaForCausalLM"], "vocab_size": V35,
           "hidden_size": H35, "num_attention_heads": HEADS,
           "num_key_value_heads": KV, "num_hidden_layers": 1,
           "intermediate_size": INTER, "max_position_embeddings": 256,
           "rope_theta": 500000.0, "tie_word_embeddings": True,
           "rope_scaling": {"rope_type": "llama3", "factor": 8.0,
                            "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                            "original_max_position_embeddings": 256},
           "bos_token_id": -1, "eos_token_id": 0}
    d = _save_hf(tmp_path, lm, cfg)
    snac_sd = _snac_hf_sd()
    snac_dir = tmp_path / "snac"
    snac_dir.mkdir()
    from safetensors.numpy import save_file

    save_file({k: np.asarray(v, np.float32) for k, v in snac_sd.items()},
              str(snac_dir / "model.safetensors"))
    (snac_dir / "config.json").write_text(json.dumps(
        {"sampling_rate": 24000, "decoder_dim": 16, "decoder_rates": [2, 2],
         "codebook_size": 16, "codebook_dim": 4, "vq_strides": [2, 1],
         "noise": True, "depthwise": True, "attn_window_size": None}))
    out = str(tmp_path / "orpheus.bin")
    convert(d, out, "f32", arch="orpheus-tts", snac_dir=str(snac_dir))
    gf = GGMMFile.open(out)
    assert gf.model_type == int(ModelType.ORPHEUS_TTS)
    assert (gf.meta or {}).get("snac_config.json", {}).get("decoder_dim") == 16

    # weight-norm folding oracle (+ the SNAC [out, in, k]→[out, k, in] swap)
    v = snac_sd["decoder.model.layers.0.weight_v"]
    g = snac_sd["decoder.model.layers.0.weight_g"]
    want = torch._weight_norm(torch.tensor(v), torch.tensor(g), 0).numpy()
    got = gf.tensor_f32("snac.decoder.model.layers.0.weight")
    np.testing.assert_allclose(got, want.transpose(0, 2, 1), atol=1e-5)

    # maya1 alias retypes
    out2 = str(tmp_path / "maya.bin")
    convert(d, out2, "f32", arch="maya1", snac_dir=str(snac_dir))
    assert GGMMFile.open(out2).model_type == int(ModelType.MAYA1)


def test_convert_oute_dac(tmp_path):
    sd = _qwen3_llm_sd(prefix="")
    cfg = {"architectures": ["Qwen3ForCausalLM"], "vocab_size": V35,
           "hidden_size": H35, "num_attention_heads": HEADS,
           "num_key_value_heads": KV, "num_hidden_layers": 1,
           "intermediate_size": INTER, "max_position_embeddings": 256,
           "head_dim": HD, "rope_theta": 10000.0,
           "bos_token_id": -1, "eos_token_id": 0}
    d = _save_hf(tmp_path, sd, cfg)

    # HF DAC names use .model.N / .block.N (no "layers."); packaged pth
    dac = {}

    def conv(prefix, out_c, in_c, k):
        v, g = _wn_pair(out_c, in_c, k)
        dac[f"{prefix}.weight_v"] = v
        dac[f"{prefix}.weight_g"] = g
        dac[f"{prefix}.bias"] = _t(out_c)

    conv("decoder.model.0", 16, 8, 7)
    li = 1
    ch = 16
    for r in (2,):
        p = f"decoder.model.{li}.block"
        dac[f"{p}.0.alpha"] = np.abs(_t(1, ch, 1)) + 0.5
        conv(f"{p}.1", ch // 2, ch, 2 * r)
        ch //= 2
        for rr in range(3):
            rp = f"{p}.{2 + rr}.block"
            dac[f"{rp}.0.alpha"] = np.abs(_t(1, ch, 1)) + 0.5
            conv(f"{rp}.1", ch, ch, 7)
            dac[f"{rp}.2.alpha"] = np.abs(_t(1, ch, 1)) + 0.5
            conv(f"{rp}.3", ch, ch, 1)
        li += 1
    dac[f"decoder.model.{li}.alpha"] = np.abs(_t(1, ch, 1)) + 0.5
    conv(f"decoder.model.{li + 1}", 1, ch, 7)
    for i in range(2):
        p = f"quantizer.quantizers.{i}"
        conv(f"{p}.in_proj", 4, 8, 1)
        conv(f"{p}.out_proj", 8, 4, 1)
        dac[f"{p}.codebook.weight"] = _t(16, 4)

    dac_dir = tmp_path / "dac"
    dac_dir.mkdir()
    torch.save({"state_dict": {k: torch.tensor(v) for k, v in dac.items()},
                "metadata": {}},
               str(dac_dir / "weights_24khz_1.5kbps_v1.0.pth"))
    (dac_dir / "config.json").write_text(json.dumps(
        {"sampling_rate": 24000, "decoder_hidden_size": 16,
         "upsampling_ratios": [2], "codebook_size": 16, "codebook_dim": 4}))
    out = str(tmp_path / "oute.bin")
    convert(d, out, "f32", arch="outetts", dac_dir=str(dac_dir))
    gf = GGMMFile.open(out)
    assert gf.model_type == int(ModelType.OUTE_TTS_QWEN3)
    assert (gf.meta or {}).get("dac_config.json", {}).get("n_codebooks") == 2
    # layerized rename + weight-norm fold (no transpose on the DAC path)
    v, g = dac["decoder.model.0.weight_v"], dac["decoder.model.0.weight_g"]
    want = torch._weight_norm(torch.tensor(v), torch.tensor(g), 0).numpy()
    got = gf.tensor_f32("dac.decoder.model.layers.0.weight")
    np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------------------
# remote-code alias keys
# ---------------------------------------------------------------------------

def test_alias_keys_registered():
    from chatllm_tpu.tools.convert import (ARCH_ALIASES, ARCH_CONVERTERS,
                                           _load_extra_converters)

    _load_extra_converters()
    for k in ("BaichuanM1ForCausalLM", "StableLMEpochForCausalLM",
              "MultiModalityCausalLM", "Qwen3_5MoeForConditionalGeneration"):
        assert k in ARCH_CONVERTERS, k
        c = ARCH_CONVERTERS[k]
        while isinstance(c, str):
            c = ARCH_CONVERTERS[c]
        assert callable(c)
    for a in ("orpheus-tts", "maya1", "outetts", "moonlight",
              "dolphinphi2", "qwenqanything"):
        assert a in ARCH_ALIASES, a
