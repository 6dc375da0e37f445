"""Converter wave 8 — the final reference dispatch-name tail
(VERDICT r3 item #9): MiniCPM-O plus the four template aliases
bge-m3 / bge-reranker-m3 / aya-23 / qwen3-vl-embedding / qwen3-vl-reranker.

Reference cites:
  MiniCPMOConverter            /root/reference/convert.py:5133 (dispatch :11040)
  bge-m3 / bge-reranker-m3     /root/reference/convert.py:11015 / :11020
  aya-23                       /root/reference/convert.py:11073
  qwen3-vl-embedding/-reranker /root/reference/convert.py:11212 / :11216

NOTE: MiniCPM-O has NO runtime loader in the reference either (ModelType
MiniCPM_O exists only in its convert.py) — converter parity is the whole
surface.  Our runtime additionally loads the llm.* (Qwen2) tower for text
chat (models/minicpm_o.py), which is strictly more than the reference can do.
"""
from __future__ import annotations

import struct

import numpy as np

from ..models import ModelType
from .convert import _base_vals, pick_tensor_type


# --------------------------------------------------------------------------
# MiniCPM-O (openbmb/MiniCPM-o-2_6): Qwen2 LLM + SigLIP vision (vpm) +
# Whisper-style audio encoder (apm) + resampler + ChatTTS-style TTS tower
# --------------------------------------------------------------------------

# defaults merged under config.tts_config (reference convert.py:5198-5213)
_TTS_DEFAULTS = {
    "llm_dim": 2560, "hidden_size": 768, "intermediate_size": 3072,
    "num_attention_heads": 12, "num_hidden_layers": 20,
    "max_position_embeddings": 4096, "num_audio_tokens": 626,
    "num_text_tokens": 21178, "num_mel_bins": 100, "num_vq": 4,
    "spk_emb_token_id": 21143, "num_spk_embs": 1,
    "audio_bos_token_id": 21132, "text_eos_token_id": 21133,
    "streaming_text_chunk_size": 10, "streaming_text_reserved_len": 300,
    "streaming_audio_chunk_size": 50,
}


def _qwen2_names(n_layers: int, tie: bool):
    """QWen2Converter.get_weight_names order (reference convert.py:4804)."""
    names = ["model.embed_tokens.weight"]
    for i in range(n_layers):
        pfx = f"model.layers.{i}"
        names += [f"{pfx}.self_attn.k_proj.weight",
                  f"{pfx}.self_attn.k_proj.bias",
                  f"{pfx}.self_attn.q_proj.weight",
                  f"{pfx}.self_attn.q_proj.bias",
                  f"{pfx}.self_attn.v_proj.weight",
                  f"{pfx}.self_attn.v_proj.bias",
                  f"{pfx}.self_attn.o_proj.weight",
                  f"{pfx}.input_layernorm.weight",
                  f"{pfx}.post_attention_layernorm.weight",
                  f"{pfx}.mlp.down_proj.weight",
                  f"{pfx}.mlp.up_proj.weight",
                  f"{pfx}.mlp.gate_proj.weight"]
    names.append("model.norm.weight")
    if not tie:
        names.append("lm_head.weight")
    return names


def _minicpmo_names(cfg: dict):
    """MiniCPMOConverter.get_weight_names (reference convert.py:5238-5410)."""
    names = ["llm." + n for n in _qwen2_names(
        cfg["num_hidden_layers"], bool(cfg.get("tie_word_embeddings", False)))]

    names += ["apm.conv1.bias", "apm.conv1.weight",
              "apm.conv2.bias", "apm.conv2.weight",
              "apm.embed_positions.weight",
              "apm.layer_norm.bias", "apm.layer_norm.weight",
              "audio_projection_layer.linear1.bias",
              "audio_projection_layer.linear1.weight",
              "audio_projection_layer.linear2.bias",
              "audio_projection_layer.linear2.weight"]
    for i in range(cfg["audio_config"]["encoder_layers"]):
        p = f"apm.layers.{i}"
        names += [f"{p}.fc1.bias", f"{p}.fc1.weight",
                  f"{p}.fc2.bias", f"{p}.fc2.weight",
                  f"{p}.final_layer_norm.bias", f"{p}.final_layer_norm.weight",
                  f"{p}.self_attn.k_proj.weight",
                  f"{p}.self_attn.out_proj.bias",
                  f"{p}.self_attn.out_proj.weight",
                  f"{p}.self_attn.q_proj.bias", f"{p}.self_attn.q_proj.weight",
                  f"{p}.self_attn.v_proj.bias", f"{p}.self_attn.v_proj.weight",
                  f"{p}.self_attn_layer_norm.bias",
                  f"{p}.self_attn_layer_norm.weight"]

    names += ["resampler.attn.in_proj_bias", "resampler.attn.in_proj_weight",
              "resampler.attn.out_proj.bias", "resampler.attn.out_proj.weight",
              "resampler.kv_proj.weight",
              "resampler.ln_kv.bias", "resampler.ln_kv.weight",
              "resampler.ln_post.bias", "resampler.ln_post.weight",
              "resampler.ln_q.bias", "resampler.ln_q.weight",
              "resampler.proj", "resampler.query",
              "tts.dvae.coef",
              "tts.dvae.decoder.conv_in.0.bias",
              "tts.dvae.decoder.conv_in.0.weight",
              "tts.dvae.decoder.conv_in.2.bias",
              "tts.dvae.decoder.conv_in.2.weight",
              "tts.dvae.decoder.conv_out.weight"]
    for i in range(12):
        p = f"tts.dvae.decoder.decoder_block.{i}"
        names += [f"{p}.coef", f"{p}.dwconv.bias", f"{p}.dwconv.weight",
                  f"{p}.norm.bias", f"{p}.norm.weight",
                  f"{p}.pwconv1.bias", f"{p}.pwconv1.weight",
                  f"{p}.pwconv2.bias", f"{p}.pwconv2.weight"]
    names += ["tts.dvae.downsample_conv.0.bias",
              "tts.dvae.downsample_conv.0.weight",
              "tts.dvae.downsample_conv.2.bias",
              "tts.dvae.downsample_conv.2.weight",
              "tts.dvae.encoder.conv_in.0.bias",
              "tts.dvae.encoder.conv_in.0.weight",
              "tts.dvae.encoder.conv_in.2.bias",
              "tts.dvae.encoder.conv_in.2.weight",
              "tts.dvae.encoder.conv_out.weight"]
    for i in range(12):
        p = f"tts.dvae.encoder.decoder_block.{i}"
        names += [f"{p}.coef", f"{p}.dwconv.bias", f"{p}.dwconv.weight",
                  f"{p}.norm.bias", f"{p}.norm.weight",
                  f"{p}.pwconv1.bias", f"{p}.pwconv1.weight",
                  f"{p}.pwconv2.bias", f"{p}.pwconv2.weight"]
    names += ["tts.dvae.out_conv.weight"]
    for r in range(2):
        for io in ("in", "out"):
            names += [f"tts.dvae.vq_layer.quantizer.rvqs.{r}.project_{io}.bias",
                      f"tts.dvae.vq_layer.quantizer.rvqs.{r}.project_{io}.weight"]
    names += [f"tts.emb_code.{i}.weight" for i in range(4)]
    names += ["tts.emb_text.weight"]
    for i in range(4):
        names += [f"tts.head_code.{i}.parametrizations.weight.original0",
                  f"tts.head_code.{i}.parametrizations.weight.original1"]
    names += ["tts.model.embed_tokens.weight"]
    for i in range(cfg.get("tts_config", {}).get("num_hidden_layers", 20)):
        p = f"tts.model.layers.{i}"
        names += [f"{p}.input_layernorm.weight",
                  f"{p}.mlp.down_proj.weight", f"{p}.mlp.gate_proj.weight",
                  f"{p}.mlp.up_proj.weight",
                  f"{p}.post_attention_layernorm.weight",
                  f"{p}.self_attn.k_proj.weight", f"{p}.self_attn.o_proj.weight",
                  f"{p}.self_attn.q_proj.weight", f"{p}.self_attn.v_proj.weight"]
    names += ["tts.model.norm.weight",
              "tts.projector.linear1.bias", "tts.projector.linear1.weight",
              "tts.projector.linear2.bias", "tts.projector.linear2.weight",
              "vpm.embeddings.patch_embedding.bias",
              "vpm.embeddings.patch_embedding.weight",
              "vpm.embeddings.position_embedding.weight"]
    for i in range(cfg["vision_config"]["num_hidden_layers"]):
        p = f"vpm.encoder.layers.{i}"
        names += [f"{p}.layer_norm1.bias", f"{p}.layer_norm1.weight",
                  f"{p}.layer_norm2.bias", f"{p}.layer_norm2.weight",
                  f"{p}.mlp.fc1.bias", f"{p}.mlp.fc1.weight",
                  f"{p}.mlp.fc2.bias", f"{p}.mlp.fc2.weight",
                  f"{p}.self_attn.k_proj.bias", f"{p}.self_attn.k_proj.weight",
                  f"{p}.self_attn.out_proj.bias",
                  f"{p}.self_attn.out_proj.weight",
                  f"{p}.self_attn.q_proj.bias", f"{p}.self_attn.q_proj.weight",
                  f"{p}.self_attn.v_proj.bias", f"{p}.self_attn.v_proj.weight"]
    names += ["vpm.post_layernorm.bias", "vpm.post_layernorm.weight"]
    return names


def convert_minicpmo(w, f, cfg, sd, dtype):
    """MiniCPMO → MINICPM_O (reference MiniCPMOConverter,
    convert.py:5133-5410): Qwen2 text config + vision/audio/TTS blocks."""
    assert not cfg.get("tie_word_embeddings"), "tie_word_embeddings must be False"
    assert not cfg.get("drop_vision_last_layer"), \
        "drop_vision_last_layer must be False"
    assert cfg["slice_config"]["model_type"] == "minicpmv"
    assert cfg.get("slice_mode"), "slice_mode must be True"
    assert cfg.get("use_image_id"), "use_image_id must be True"
    assert (cfg["audio_config"]["architectures"][0]
            == "MiniCPMWhisperEncoder"), "audio tower must be whisper"
    assert not cfg.get("use_sliding_window"), "use_sliding_window must be False"

    heads = cfg["num_attention_heads"]
    kv = cfg.get("num_key_value_heads", heads)
    sw = cfg.get("sliding_window")
    # QWen2Converter.dump_config (reference convert.py:4792)
    w.write_config(_base_vals(cfg, dtype) +
                   [kv, sw if sw is not None else
                    cfg["max_position_embeddings"]], fmt="13i")
    f.write(struct.pack("<f", float(cfg.get("rope_theta", 10000.0))))

    vis, aud = cfg["vision_config"], cfg["audio_config"]
    f.write(struct.pack("<11i",
                        cfg["image_size"], cfg["patch_size"],
                        cfg["query_num"],
                        cfg["slice_config"]["max_slice_nums"],
                        cfg["vision_batch_size"],
                        vis["hidden_size"], vis["image_size"],
                        vis["intermediate_size"], vis["num_attention_heads"],
                        vis["num_hidden_layers"], vis["patch_size"]))
    # first audio value (audio_chunk_length) is a FLOAT in the reference's
    # "<f" + "i"*14 pack (convert.py:5188)
    f.write(struct.pack("<f14i",
                        float(cfg["audio_chunk_length"]),
                        aud["d_model"], aud["num_hidden_layers"],
                        aud["decoder_attention_heads"], aud["decoder_ffn_dim"],
                        aud["decoder_layers"], aud["encoder_attention_heads"],
                        aud["encoder_ffn_dim"], aud["encoder_layers"],
                        aud["decoder_start_token_id"], aud["bos_token_id"],
                        aud["eos_token_id"], aud["pad_token_id"],
                        aud["max_length"], cfg["audio_pool_step"]))
    tts = dict(_TTS_DEFAULTS)
    tts.update(cfg.get("tts_config") or {})
    # llm_dim likewise rides the "<f" slot (convert.py:5235)
    f.write(struct.pack("<f16i",
                        float(tts["llm_dim"]), tts["hidden_size"],
                        tts["intermediate_size"], tts["num_attention_heads"],
                        tts["num_hidden_layers"],
                        tts["max_position_embeddings"],
                        tts["num_audio_tokens"], tts["num_text_tokens"],
                        tts["num_mel_bins"], tts["num_vq"],
                        tts["spk_emb_token_id"], tts["num_spk_embs"],
                        tts["audio_bos_token_id"], tts["text_eos_token_id"],
                        tts["streaming_text_chunk_size"],
                        tts["streaming_text_reserved_len"],
                        tts["streaming_audio_chunk_size"]))
    w._patch_offset(12)
    w.patch_model_type(int(ModelType.MINICPM_O))

    for n in _minicpmo_names(cfg):
        arr = np.asarray(sd[n])
        # full reference tensor-type parity incl. 3D/4D conv quantization
        # and block-divisibility fallbacks (convert.py:830)
        w.write_tensor(n, arr, pick_tensor_type(n, arr, dtype))


# --------------------------------------------------------------------------
# qwen3-vl embedding / reranker (-a aliases over the Qwen3-VL emitter)
# --------------------------------------------------------------------------

def convert_qwen3_vl_embedding(w, f, cfg, sd, dtype):
    """qwen3-vl-embedding (reference convert.py:11212: Qwen3VLConverter with
    QWen3Converter.has_lm_head=False): the checkpoint carries no lm_head —
    emit the tied layout; the embedding head is L2-pooled, never unembedded."""
    from .convert import convert_qwen3_vl

    if "lm_head.weight" not in sd:
        cfg = dict(cfg)
        tc = dict(cfg.get("text_config") or {})
        tc["tie_word_embeddings"] = True
        if cfg.get("text_config") is not None:
            cfg["text_config"] = tc
        else:
            cfg["tie_word_embeddings"] = True
    convert_qwen3_vl(w, f, cfg, sd, dtype)


EXTRA_CONVERTERS5 = {
    "MiniCPMO": convert_minicpmo,
}

EXTRA_ALIASES5 = {
    # reference convert.py:11015/11020: XLMRoberta layouts, new model type
    "bge-m3": ("XLMRobertaModel", ModelType.BGE_M3),
    "bge-reranker-m3": ("XLMRobertaForSequenceClassification",
                        ModelType.BGE_ReRanker_M3),
    # reference convert.py:11073: Cohere layout, aya-23 template
    "aya-23": ("CohereForCausalLM", ModelType.COHERE_AYA_23),
    # reference convert.py:11212/11216
    "qwen3-vl-embedding": (convert_qwen3_vl_embedding,
                           ModelType.QWEN3_VL_Embedding),
    "qwen3-vl-reranker": ("Qwen3VLForConditionalGeneration",
                          ModelType.QWEN3_VL_ReRanker),
}
