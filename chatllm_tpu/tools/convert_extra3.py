"""HF checkpoint → GGMM converters, wave 7a: the TTS/ASR capability
classes + the Qwen3.5 GDN hybrid.

Same emitter contract as convert.py / convert_extra.py; reference class
cited per-function (/root/reference/convert.py)."""
from __future__ import annotations

import struct

import numpy as np

from ..ggmm.quants import GGMLType
from ..models.model_types import ModelType
from .convert import (_base_vals, _llama_like_names, convert_llama,
                      convert_qwen3 as _convert_qwen3_plain)


def _emit(w, sd, names, dtype):
    for n in names:
        arr = sd[n]
        w.write_tensor(n, arr, dtype if arr.ndim == 2 else GGMLType.F32)


def _txt_cfg(cfg: dict, key: str = "text_config") -> dict:
    """Flatten cfg[key] over cfg (HF composite-config pattern)."""
    t = dict(cfg)
    for k, v in (cfg.get(key) or {}).items():
        t[k] = v
    return t


# ---------------------------------------------------------------------------
# Qwen3.5 (GDN hybrid) — reference QWen3_5Converter, convert.py:5839
# ---------------------------------------------------------------------------

def _qwen35_vis_pp(sd: dict, vis_hidden: int) -> dict:
    """Qwen3VLConverter.vis_state_dict_pp (convert.py:5711): visual tower
    renames + temporal-conv and fused-qkv splits."""
    r = {}
    for name, t in sd.items():
        name = name.replace("model.visual.", "visual.")
        if name.startswith("model") or name.startswith("mtp."):
            r[name] = t
            continue
        if name == "visual.patch_embed.proj.weight" and t.ndim == 5:
            r[name.replace("proj.weight", "proj.0.weight")] = \
                np.ascontiguousarray(t[:, :, 0])
            r[name.replace("proj.weight", "proj.1.weight")] = \
                np.ascontiguousarray(t[:, :, 1])
        elif name.endswith(".attn.qkv.bias") or name.endswith(".attn.qkv.weight"):
            q, k, v = (t[:vis_hidden], t[vis_hidden:2 * vis_hidden],
                       t[2 * vis_hidden:])
            r[name.replace(".attn.qkv.", ".attn.q_proj.")] = q
            r[name.replace(".attn.qkv.", ".attn.k_proj.")] = k
            r[name.replace(".attn.qkv.", ".attn.v_proj.")] = v
        else:
            name = (name.replace(".mlp.linear_fc1.", ".mlp.fc0.")
                        .replace(".mlp.linear_fc2.", ".mlp.fc1.")
                        .replace(".linear_fc1.", ".mlp.fc0.")
                        .replace(".linear_fc2.", ".mlp.fc1."))
            r[name] = t
    return r


def _qwen35_layer_names(pfx: str, num_experts: int, is_la: bool):
    """QWen3_5Converter.get_one_layer_weight_names (convert.py:5955)."""
    names = [f"{pfx}.input_layernorm.weight",
             f"{pfx}.post_attention_layernorm.weight"]
    if num_experts > 0:
        for i in range(num_experts):
            names += [f"{pfx}.mlp.experts.{i}.gate_proj.weight",
                      f"{pfx}.mlp.experts.{i}.up_proj.weight",
                      f"{pfx}.mlp.experts.{i}.down_proj.weight"]
        names += [f"{pfx}.mlp.gate.weight",
                  f"{pfx}.mlp.shared_expert.gate_proj.weight",
                  f"{pfx}.mlp.shared_expert.up_proj.weight",
                  f"{pfx}.mlp.shared_expert.down_proj.weight",
                  f"{pfx}.mlp.shared_expert_gate.weight"]
    else:
        names += [f"{pfx}.mlp.down_proj.weight",
                  f"{pfx}.mlp.gate_proj.weight",
                  f"{pfx}.mlp.up_proj.weight"]
    if is_la:
        names += [f"{pfx}.linear_attn.A_log",
                  f"{pfx}.linear_attn.conv1d.weight",
                  f"{pfx}.linear_attn.dt_bias",
                  f"{pfx}.linear_attn.in_proj_a.weight",
                  f"{pfx}.linear_attn.in_proj_b.weight",
                  f"{pfx}.linear_attn.in_proj_qkv.weight",
                  f"{pfx}.linear_attn.in_proj_z.weight",
                  f"{pfx}.linear_attn.norm.weight",
                  f"{pfx}.linear_attn.out_proj.weight"]
    else:
        names += [f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.k_norm.weight",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.q_norm.weight",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.self_attn.gate_proj.weight"]
    return names


def convert_qwen3_5(w, f, cfg, sd, dtype):
    """Qwen3_5(Moe)ForConditionalGeneration → QWEN3_5 (reference
    QWen3_5Converter.dump_config convert.py:5886-5953 + state_dict_pp).
    Fused q|gate and gate_up/down expert stacks are split; visual tower
    per Qwen3VL pp."""
    txt = _txt_cfg(cfg)
    vis = cfg.get("vision_config") or {}
    head_dim = txt.get("head_dim") or (txt["hidden_size"]
                                       // txt["num_attention_heads"])
    rope = dict(txt.get("rope_parameters") or txt.get("rope_scaling") or {})
    theta = float(rope.get("rope_theta", txt.get("rope_theta", 10000.0)))
    if rope.get("rope_type") == "yarn":
        txt["max_position_embeddings"] = \
            int(rope["original_max_position_embeddings"])
    partial = float(rope.get("partial_rotary_factor", 1.0))
    mrope = list(rope.get("mrope_section") or (16, 24, 24))
    layer_types = txt.get("layer_types") or []
    L = txt["num_hidden_layers"]
    la = [1 if (i < len(layer_types)
                and layer_types[i] == "linear_attention") else 0
          for i in range(128)]
    n_experts = int(txt.get("num_experts") or -1)
    mtp = int(txt.get("mtp_num_hidden_layers") or 0)
    tie = bool(txt.get("tie_word_embeddings", False))

    w.write_config(_base_vals(txt, dtype), fmt="11i")
    vals = [txt.get("num_key_value_heads", txt["num_attention_heads"]),
            1 if txt.get("attn_output_gate") else 0,
            int(txt.get("linear_conv_kernel_dim") or 0),
            int(txt.get("linear_key_head_dim") or 0),
            int(txt.get("linear_num_key_heads") or 0),
            int(txt.get("linear_num_value_heads") or 0),
            int(txt.get("linear_value_head_dim") or 0),
            head_dim]
    f.write(struct.pack("<8if", *vals, theta))
    f.write(struct.pack("<11i",
                        int(partial * head_dim), mrope[0], mrope[1], mrope[2],
                        0,
                        int(txt.get("moe_intermediate_size") or -1),
                        int(txt.get("shared_expert_intermediate_size") or -1),
                        int(txt.get("num_experts_per_tok") or -1),
                        n_experts, int(tie), mtp))
    f.write(struct.pack("<f", float(txt.get("router_aux_loss_coef") or -1.0)))
    f.write(struct.pack("<128i", *la))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.QWEN3_5))

    # --- state-dict pp (QWen3_5Converter.state_dict_pp:5846-5883)
    r = {}
    for name, t in sd.items():
        if name.startswith("model.language_model."):
            name = name.replace("model.language_model.", "model.")
        if name.endswith("experts.down_proj") and t.ndim == 3:
            for j in range(t.shape[0]):
                r[name.replace("mlp.experts.down_proj",
                               f"mlp.experts.{j}.down_proj.weight")] = \
                    np.ascontiguousarray(t[j])
        elif name.endswith("experts.gate_up_proj") and t.ndim == 3:
            half = t.shape[1] // 2
            for j in range(t.shape[0]):
                r[name.replace("experts.gate_up_proj",
                               f"experts.{j}.gate_proj.weight")] = \
                    np.ascontiguousarray(t[j, :half])
                r[name.replace("experts.gate_up_proj",
                               f"experts.{j}.up_proj.weight")] = \
                    np.ascontiguousarray(t[j, half:])
        elif ((name.startswith("model.") or name.startswith("mtp."))
              and name.endswith(".self_attn.q_proj.weight")):
            qg = t.reshape(-1, head_dim * 2, t.shape[1])
            h = qg.shape[1] // 2
            r[name] = np.ascontiguousarray(
                qg[:, :h].reshape(-1, t.shape[1]))
            r[name.replace(".q_proj.", ".gate_proj.")] = np.ascontiguousarray(
                qg[:, h:].reshape(-1, t.shape[1]))
        else:
            r[name] = t
    sd = _qwen35_vis_pp(r, int(vis.get("hidden_size") or 0))

    names = ["model.embed_tokens.weight"]
    for i in range(L):
        names += _qwen35_layer_names(f"model.layers.{i}", n_experts, la[i])
    names += ["model.norm.weight"]
    if mtp > 0:
        names += ["mtp.fc.weight", "mtp.norm.weight",
                  "mtp.pre_fc_norm_embedding.weight",
                  "mtp.pre_fc_norm_hidden.weight"]
        for i in range(mtp):
            names += _qwen35_layer_names(f"mtp.layers.{i}", n_experts, False)
    if not tie:
        names += ["lm_head.weight"]
    if "visual.patch_embed.proj.bias" in sd:
        for i in range(int(vis.get("depth") or 0)):
            p = f"visual.blocks.{i}"
            names += [f"{p}.attn.proj.bias", f"{p}.attn.proj.weight",
                      f"{p}.attn.q_proj.bias", f"{p}.attn.q_proj.weight",
                      f"{p}.attn.k_proj.bias", f"{p}.attn.k_proj.weight",
                      f"{p}.attn.v_proj.bias", f"{p}.attn.v_proj.weight",
                      f"{p}.mlp.fc0.bias", f"{p}.mlp.fc0.weight",
                      f"{p}.mlp.fc1.bias", f"{p}.mlp.fc1.weight",
                      f"{p}.norm1.bias", f"{p}.norm1.weight",
                      f"{p}.norm2.bias", f"{p}.norm2.weight"]
        names += ["visual.merger.mlp.fc0.bias", "visual.merger.mlp.fc0.weight",
                  "visual.merger.mlp.fc1.bias", "visual.merger.mlp.fc1.weight",
                  "visual.merger.norm.bias", "visual.merger.norm.weight",
                  "visual.patch_embed.proj.0.weight",
                  "visual.patch_embed.proj.1.weight",
                  "visual.patch_embed.proj.bias",
                  "visual.pos_embed.weight"]
    _emit(w, sd, names, dtype)


# ---------------------------------------------------------------------------
# Qwen3-TTS — reference Qwen3TTSConverter, convert.py:6076
# ---------------------------------------------------------------------------

def _qwen3_cfg_write(w, f, cfg, dtype, mtype, *, tie=None):
    """QWen3Converter.dump_config layout (convert.py:5600-5659) for a plain
    (non-MoE) qwen3 text config dict."""
    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    head_dim = cfg.get("head_dim") or cfg["hidden_size"] // heads
    tie = bool(cfg.get("tie_word_embeddings", False)) if tie is None else tie
    scaling = cfg.get("rope_scaling") or {"factor": -1.0,
                                          "original_max_position_embeddings": -1}
    w.write_config(_base_vals(cfg, dtype) + [kv, head_dim], fmt="13i")
    f.write(struct.pack("<ff", float(cfg.get("rope_theta", 10000.0)),
                        float(scaling.get("factor", -1.0))))
    f.write(struct.pack("<6i",
                        int(scaling.get("original_max_position_embeddings",
                                        -1)),
                        int(cfg.get("decoder_sparse_step") or 1),
                        int(cfg.get("moe_intermediate_size") or -1),
                        int(cfg.get("num_experts_per_tok") or -1),
                        int(cfg.get("num_experts") or -1),
                        1 if cfg.get("norm_topk_prob") else 0))
    f.write(struct.pack("<i", int(tie)))
    f.write(struct.pack("<128i", *([0] * 128)))
    w._patch_offset(12)
    w.patch_model_type(int(mtype))


def convert_qwen3_tts(w, f, cfg, sd, dtype):
    """Qwen3TTSForConditionalGeneration → QWEN3_TTS (reference
    Qwen3TTSConverter, convert.py:6076): qwen3 config over the talker with
    vocab_size=text_vocab_size, + mrope[4] + text_hidden + codec vocab;
    tensors pass through in file order with RVQ `embedding_sum /
    clamp(cluster_usage)` folding."""
    talker = dict(cfg["talker_config"])
    rope_scaling = dict(talker.get("rope_scaling") or {})
    codec_vocab = talker["vocab_size"]
    talker["vocab_size"] = talker["text_vocab_size"]
    talker["rope_scaling"] = None
    for k in ("bos_token_id", "eos_token_id", "pad_token_id",
              "sep_token_id"):
        talker.setdefault(k, cfg.get(k))
    _qwen3_cfg_write(w, f, talker, dtype, ModelType.QWEN3_TTS, tie=False)
    mrope = list(rope_scaling.get("mrope_section") or (16, 24, 24))
    mrope += [0] * (4 - len(mrope))
    f.write(struct.pack("<6i", *mrope[:4],
                        int(talker.get("text_hidden_size")
                            or talker["hidden_size"]), codec_vocab))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.QWEN3_TTS))

    names = []
    for n, t in sd.items():
        if n.endswith(".cluster_usage"):
            continue
        if n.endswith(".embedding_sum"):
            usage = np.maximum(sd[n.replace(".embedding_sum",
                                            ".cluster_usage")], 1e-5)
            sd = dict(sd)
            sd[n] = t / usage[:, None]
        names.append(n)
    _emit(w, sd, names, dtype)


# ---------------------------------------------------------------------------
# Qwen3-ASR / ForcedAligner — reference Qwen3ASRConverter, convert.py:6119
# ---------------------------------------------------------------------------

def _qwen3_asr_audio_names(n_layers: int):
    names = []
    for i in range(n_layers):
        p = f"audio.layers.{i}"
        names += [f"{p}.mlp.fc1.bias", f"{p}.mlp.fc1.weight",
                  f"{p}.mlp.fc0.bias", f"{p}.mlp.fc0.weight",
                  f"{p}.post_attention_layernorm.bias",
                  f"{p}.post_attention_layernorm.weight",
                  f"{p}.self_attn.k_proj.weight", f"{p}.self_attn.k_proj.bias",
                  f"{p}.self_attn.o_proj.bias", f"{p}.self_attn.o_proj.weight",
                  f"{p}.self_attn.q_proj.bias", f"{p}.self_attn.q_proj.weight",
                  f"{p}.self_attn.v_proj.bias", f"{p}.self_attn.v_proj.weight",
                  f"{p}.input_layernorm.bias", f"{p}.input_layernorm.weight"]
    names += ["audio.conv2d1.bias", "audio.conv2d1.weight",
              "audio.conv2d2.bias", "audio.conv2d2.weight",
              "audio.conv2d3.bias", "audio.conv2d3.weight",
              "audio.conv_out.weight", "audio.ln_post.bias",
              "audio.ln_post.weight",
              "multi_modal_projector.proj1.bias",
              "multi_modal_projector.proj1.weight",
              "multi_modal_projector.proj2.bias",
              "multi_modal_projector.proj2.weight"]
    return names


def convert_qwen3_asr(w, f, cfg, sd, dtype):
    """Qwen3ASRForConditionalGeneration → QWEN3_ASR / forced-aligner
    (reference Qwen3ASRConverter, convert.py:6119)."""
    thinker = cfg["thinker_config"]
    txt = dict(thinker["text_config"])
    for k in ("bos_token_id", "eos_token_id", "pad_token_id",
              "sep_token_id"):
        txt.setdefault(k, cfg.get(k))
    aligner = thinker.get("model_type") == "qwen3_forced_aligner"
    rope_scaling = dict(txt.get("rope_scaling") or {})
    txt["rope_scaling"] = None
    mtype = (ModelType.QWEN3_ForcedAligner if aligner
             else ModelType.QWEN3_ASR)
    _qwen3_cfg_write(w, f, txt, dtype, mtype, tie=False)
    mrope = list(rope_scaling.get("mrope_section") or (24, 20, 20))
    mrope += [0] * (4 - len(mrope))
    vals = mrope[:4] + ([int(thinker["classify_num"])] if aligner else [])
    f.write(struct.pack("<%di" % len(vals), *vals))
    w._patch_offset(12)
    w.patch_model_type(int(mtype))

    r = {}
    for name, t in sd.items():
        name = name.replace("thinker.", "")
        if name.startswith("audio_tower."):
            if ".proj1." in name or ".proj2." in name:
                name = name.replace("audio_tower.", "multi_modal_projector.")
            else:
                name = (name.replace("audio_tower.", "audio.")
                            .replace(".fc1.", ".mlp.fc0.")
                            .replace(".fc2.", ".mlp.fc1.")
                            .replace(".final_layer_norm.",
                                     ".post_attention_layernorm.")
                            .replace(".self_attn_layer_norm.",
                                     ".input_layernorm.")
                            .replace(".out_proj.", ".o_proj."))
        r[name] = t
    sd = r
    names = _llama_like_names(txt["num_hidden_layers"], tie=False,
                              qk_norm=True)
    names += _qwen3_asr_audio_names(
        thinker["audio_config"]["num_hidden_layers"])
    _emit(w, sd, names, dtype)


# ---------------------------------------------------------------------------
# GLM-ASR — reference GLMASRConverter, convert.py:4938
# ---------------------------------------------------------------------------

def convert_glm_asr(w, f, cfg, sd, dtype):
    """GlmAsrForConditionalGeneration → GLM_ASR (reference GLMASRConverter,
    convert.py:4938): llama3 text config (rope_theta from rope_parameters)
    + whisper-style tower under `audio.` keeping mlp.fc1/fc2 names."""
    from .convert import permute_rope

    txt = dict(cfg["text_config"])
    rp = txt.get("rope_parameters") or {}
    txt.setdefault("rope_theta", rp.get("rope_theta", 10000.0))
    for k in ("bos_token_id", "eos_token_id", "pad_token_id",
              "sep_token_id"):
        txt.setdefault(k, cfg.get(k))
    heads = txt["num_attention_heads"]
    kv = txt.get("num_key_value_heads", heads)
    w.write_config(_base_vals(txt, dtype) + [kv], fmt="12i")
    f.write(struct.pack("<f", float(txt["rope_theta"])))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.GLM_ASR))

    r = {}
    for name, t in sd.items():
        # the language_model. prefix is already stripped by convert()'s
        # _strip_prefixes; permute LLM q/k by final name
        name = name.replace("audio_tower.", "audio.")
        name = name.replace("language_model.", "")
        if name.startswith("model.layers."):
            if name.endswith("q_proj.weight"):
                t = permute_rope(t, heads)
            elif name.endswith("k_proj.weight"):
                t = permute_rope(t, kv)
        r[name] = t
    sd = r
    names = _llama_like_names(txt["num_hidden_layers"], tie=False)
    for i in range(cfg["audio_config"]["num_hidden_layers"]):
        p = f"audio.layers.{i}"
        names += [f"{p}.mlp.fc1.bias", f"{p}.mlp.fc1.weight",
                  f"{p}.mlp.fc2.bias", f"{p}.mlp.fc2.weight",
                  f"{p}.post_attention_layernorm.bias",
                  f"{p}.post_attention_layernorm.weight",
                  f"{p}.self_attn.k_proj.weight",
                  f"{p}.self_attn.o_proj.bias", f"{p}.self_attn.o_proj.weight",
                  f"{p}.self_attn.q_proj.bias", f"{p}.self_attn.q_proj.weight",
                  f"{p}.self_attn.v_proj.bias", f"{p}.self_attn.v_proj.weight",
                  f"{p}.input_layernorm.bias", f"{p}.input_layernorm.weight"]
    names += ["audio.conv1.bias", "audio.conv1.weight",
              "audio.conv2.bias", "audio.conv2.weight",
              "audio.norm.bias", "audio.norm.weight",
              "multi_modal_projector.linear_1.bias",
              "multi_modal_projector.linear_1.weight",
              "multi_modal_projector.linear_2.bias",
              "multi_modal_projector.linear_2.weight"]
    _emit(w, sd, names, dtype)


# ---------------------------------------------------------------------------
# Orpheus-TTS / Maya1 (llama-3.2 + SNAC) and OuteTTS (llama/qwen3 + DAC) —
# reference OrpheusTTSConverter convert.py:8819, OuteTTSConverter :8946
# ---------------------------------------------------------------------------

def _weight_norm_fold(v: np.ndarray, g: np.ndarray) -> np.ndarray:
    """torch._weight_norm(v, g, dim=0): w = g * v / ||v||_(dims>0)."""
    axes = tuple(range(1, v.ndim))
    n = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (g.astype(np.float64) * v.astype(np.float64)
            / np.maximum(n, 1e-30)).astype(np.float32)


def _codec_pp(sd: dict, prefix_out: str, *, transpose: bool,
              layerize: bool) -> dict:
    """SNAC/DAC decoder+quantizer pp shared by Orpheus/Oute: weight-norm
    folding, .alpha squeeze, quantizer.quantizers → quantizer.strides.
    `transpose` swaps conv [out, in/g, k] dims 1,2 (SNAC path);
    `layerize` rewrites .model./.block. to .model.layers./.block.layers.
    (DAC path — SNAC checkpoints already carry the layers. form)."""
    r = {}
    for name, t in sd.items():
        if name.startswith("encoder"):
            continue
        if name.endswith(".weight_g"):
            continue
        if name.startswith("decoder"):
            nn = prefix_out + name
            if layerize:
                nn = nn.replace(".model.", ".model.layers.")
                nn = nn.replace(".block.", ".block.layers.")
            if name.endswith(".alpha"):
                r[nn] = t.reshape(t.shape[1])
            elif name.endswith(".bias"):
                r[nn] = t
            elif name.endswith(".weight_v"):
                g = sd[name.replace(".weight_v", ".weight_g")]
                wv = _weight_norm_fold(t, g)
                if transpose:
                    wv = np.ascontiguousarray(wv.transpose(0, 2, 1))
                r[nn.replace(".weight_v", ".weight")] = wv
            else:
                r[nn] = t
        elif name.startswith("quantizer"):
            nn = name.replace("quantizer.quantizers.",
                              prefix_out + "quantizer.strides.")
            if name.endswith(".weight_v"):
                g = sd[name.replace(".weight_v", ".weight_g")]
                wv = _weight_norm_fold(t, g)
                if transpose:
                    wv = np.ascontiguousarray(wv.transpose(0, 2, 1))
                r[nn.replace(".weight_v", ".weight")] = wv
            else:
                r[nn] = t
    return r


def _conv1d(p, bias=True):
    return ([f"{p}.bias"] if bias else []) + [f"{p}.weight"]


def _snac_residual(p):
    return ([f"{p}.block.layers.0.alpha"] + _conv1d(f"{p}.block.layers.1")
            + [f"{p}.block.layers.2.alpha"] + _conv1d(f"{p}.block.layers.3"))


def _snac_block(p, *, noise: bool):
    names = [f"{p}.block.layers.0.alpha"] + _conv1d(f"{p}.block.layers.1")
    nxt = 2
    if noise:
        names += _conv1d(f"{p}.block.layers.2.linear", False)
        nxt = 3
    for i in range(3):
        names += _snac_residual(f"{p}.block.layers.{nxt + i}")
    return names


def _vq_names(p):
    return _conv1d(f"{p}.in_proj") + _conv1d(f"{p}.out_proj") \
        + [f"{p}.codebook.weight"]


def _codec_decoder_names(prefix: str, n_blocks: int, n_vq: int, *,
                         depthwise: bool, noise: bool):
    names = _conv1d(f"{prefix}decoder.model.layers.0")
    li = 1
    if depthwise:
        names += _conv1d(f"{prefix}decoder.model.layers.1")
        li = 2
    for _ in range(n_blocks):
        names += _snac_block(f"{prefix}decoder.model.layers.{li}",
                             noise=noise)
        li += 1
    names += [f"{prefix}decoder.model.layers.{li}.alpha"]
    li += 1
    names += _conv1d(f"{prefix}decoder.model.layers.{li}")
    for i in range(n_vq):
        names += _vq_names(f"{prefix}quantizer.strides.{i}")
    return names


def convert_orpheus(w, f, cfg, sd, dtype):
    """orpheus-tts / maya1 -a aliases → ORPHEUS_TTS / MAYA1 (reference
    OrpheusTTSConverter, convert.py:8819): llama-3.2 LLM + SNAC decoder with
    weight-norm folded and convs stored [out, k, in/g].  The SNAC model dir
    comes via --snac_model; its config rides GGMM meta snac_config.json."""
    snac = cfg.get("snac_model") or {}
    assert snac, "--snac_model is required for orpheus-tts/maya1"
    assert int(snac.get("sampling_rate", 24000)) == 24000
    convert_llama(w, f, cfg, {k: v for k, v in sd.items()
                              if k.startswith(("model.", "lm_head."))}, dtype)
    # maya1's alias entry force-patches MAYA1 after this returns
    w.patch_model_type(int(ModelType.ORPHEUS_TTS))
    codec = _codec_pp(sd, "snac.", transpose=True, layerize=False)
    names = _codec_decoder_names(
        "snac.", len(snac.get("decoder_rates", (8, 8, 4, 2))),
        len(snac.get("vq_strides", (4, 2, 1))),
        depthwise=bool(snac.get("depthwise", True)),
        noise=bool(snac.get("noise", True)))
    _emit(w, codec, names, dtype)


def convert_oute(w, f, cfg, sd, dtype):
    """outetts -a alias → OUTE_TTS_LLAMA / OUTE_TTS_QWEN3 (reference
    OuteTTSConverter, convert.py:8946): llama-3.2 or qwen3 LLM + DAC decoder
    (no noise/depthwise, VQ strides = n_codebooks x 1), weight-norm folded
    without the SNAC transpose; .model./.block. names gain .layers."""
    dac = cfg.get("dac_model") or {}
    assert dac, "--dac_model is required for outetts"
    is_qwen3 = (cfg.get("architectures") or [""])[0] == "Qwen3ForCausalLM"
    lm_sd = {k: v for k, v in sd.items()
             if k.startswith(("model.", "lm_head."))}
    if is_qwen3:
        _convert_qwen3_plain(w, f, cfg, lm_sd, dtype)
        w.patch_model_type(int(ModelType.OUTE_TTS_QWEN3))
    else:
        convert_llama(w, f, cfg, lm_sd, dtype)
        w.patch_model_type(int(ModelType.OUTE_TTS_LLAMA))
    codec = _codec_pp(sd, "dac.", transpose=False, layerize=True)
    names = _conv1d("dac.decoder.model.layers.0")
    li = 1
    for _ in dac.get("upsampling_ratios", (8, 8, 4, 2)):
        p = f"dac.decoder.model.layers.{li}"
        blk = [f"{p}.block.layers.0.alpha"] + _conv1d(f"{p}.block.layers.1")
        for i in range(3):
            blk += _snac_residual(f"{p}.block.layers.{i + 2}")
        names += blk
        li += 1
    names += [f"dac.decoder.model.layers.{li}.alpha"]
    li += 1
    names += _conv1d(f"dac.decoder.model.layers.{li}")
    for i in range(int(dac.get("n_codebooks", 2))):
        names += _vq_names(f"dac.quantizer.strides.{i}")
    _emit(w, codec, names, dtype)


EXTRA_CONVERTERS3 = {
    "Qwen3_5ForConditionalGeneration": convert_qwen3_5,
    "Qwen3_5MoeForConditionalGeneration": "Qwen3_5ForConditionalGeneration",
    "Qwen3TTSForConditionalGeneration": convert_qwen3_tts,
    "Qwen3ASRForConditionalGeneration": convert_qwen3_asr,
    "GlmAsrForConditionalGeneration": convert_glm_asr,
    # remote-code / published-name aliases of already-shipped converters
    "BaichuanM1ForCausalLM": "BaiChuanM1ForCausalLM",
    "StableLMEpochForCausalLM": "StableLmForCausalLM",
    "MultiModalityCausalLM": "JanusForConditionalGeneration",
}

def convert_dolphinphi2(w, f, cfg, sd, dtype):
    """dolphinphi2 -a alias (reference convert.py:10916): phi2 layout,
    retyped to DOLPHINPHI2(_V2) on hidden_act presence."""
    from .convert import ARCH_CONVERTERS

    conv = ARCH_CONVERTERS["PhiForCausalLM"]
    while isinstance(conv, str):
        conv = ARCH_CONVERTERS[conv]
    conv(w, f, cfg, sd, dtype)
    w.patch_model_type(int(ModelType.DOLPHINPHI2_V2
                           if cfg.get("hidden_act") is not None
                           else ModelType.DOLPHINPHI2))


EXTRA_ALIASES3 = {
    # -a NAME → (converter-or-arch, forced ModelType or None)
    "orpheus-tts": (convert_orpheus, None),
    "maya1": (convert_orpheus, ModelType.MAYA1),
    "outetts": (convert_oute, None),
    "moonlight": ("DeepseekV3ForCausalLM", ModelType.MOONLIGHT),
    "dolphinphi2": (convert_dolphinphi2, None),
    "qwenqanything": ("QWenLMHeadModel", None),
}
