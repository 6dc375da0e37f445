"""Converter wave 2 (VERDICT item 8): 10 more HF families end-to-end —
random-init HF checkpoint → tools/convert.py → load_model → logits match the
HF model exactly."""
import json

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.models import RuntimeConfig, load_model
from chatllm_tpu.tools.convert import convert
from test_convert import _save_hf_dir

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

RT32 = dict(weight_dtype="float32", compute_dtype="float32",
            cache_dtype="float32")
V = 260


def _unigram_json(specials=()):
    pieces = [[f"<s{i}>", -float(i)] for i in range(V - len(specials))]
    pieces += [[s, -1000.0] for s in specials]
    return {"model": {"type": "Unigram", "vocab": pieces}}


def _save_dir(tmp_path, hf, cfg, arch, specials, unigram=False):
    d = _save_hf_dir(tmp_path, hf, {**cfg.to_dict(), "architectures": [arch]},
                     [] if unigram else specials)
    if unigram:
        (tmp_path / "hf" / "tokenizer.json").write_text(
            json.dumps(_unigram_json(specials)))
    return d


def _check(tmp_path, hf, cfg, arch, specials=(), unigram=False, atol=3e-3,
           ids=(7, 30, 102, 89, 5, 41, 77, 150)):
    d = _save_dir(tmp_path, hf, cfg, arch, list(specials), unigram)
    out = str(tmp_path / "m.bin")
    convert(d, out, "f32")
    model = load_model(out, RuntimeConfig(**RT32))
    a = np.array([list(ids)], dtype=np.int32)
    logits, _ = model.forward_logits(a)
    with torch.no_grad():
        ref = hf(torch.from_numpy(a.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=atol,
                               rtol=3e-3)
    return model


def test_convert_gemma(tmp_path):
    torch.manual_seed(20)
    cfg = transformers.GemmaConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-6, hidden_activation="gelu_pytorch_tanh",
        pad_token_id=0, eos_token_id=1, bos_token_id=2)
    hf = transformers.GemmaForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "GemmaForCausalLM",
           ["<pad>", "<start_of_turn>", "<end_of_turn>"], unigram=True)


def test_convert_gemma2(tmp_path):
    torch.manual_seed(21)
    cfg = transformers.Gemma2Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=4, intermediate_size=96,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        query_pre_attn_scalar=16, sliding_window=4,
        final_logit_softcapping=30.0, attn_logit_softcapping=50.0,
        rms_norm_eps=1e-6, pad_token_id=0, eos_token_id=1, bos_token_id=2)
    hf = transformers.Gemma2ForCausalLM(cfg).eval()
    # seq len (8) > sliding_window (4) so the even-layer SWA pattern is live
    _check(tmp_path, hf, cfg, "Gemma2ForCausalLM",
           ["<pad>", "<start_of_turn>", "<end_of_turn>"], unigram=True)


def test_convert_gemma3(tmp_path):
    if not hasattr(transformers, "Gemma3ForCausalLM"):
        pytest.skip("no Gemma3")
    torch.manual_seed(22)
    cfg = transformers.Gemma3TextConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=6, intermediate_size=96,
        head_dim=16, max_position_embeddings=128, rope_theta=1000000.0,
        rope_local_base_freq=10000.0, sliding_window=4,
        sliding_window_pattern=3, query_pre_attn_scalar=16,
        rms_norm_eps=1e-6, tie_word_embeddings=True, attention_bias=False,
        rope_scaling=None, pad_token_id=0, eos_token_id=1, bos_token_id=2)
    hf = transformers.Gemma3ForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "Gemma3ForCausalLM",
           ["<pad>", "<start_of_turn>", "<end_of_turn>"], unigram=True,
           atol=4e-3)


def test_convert_glm4_0414(tmp_path):
    torch.manual_seed(23)
    cfg = transformers.Glm4Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        partial_rotary_factor=0.5, head_dim=16, attention_bias=False,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, pad_token_id=0, eos_token_id=1,
        bos_token_id=None)
    hf = transformers.Glm4ForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "Glm4ForCausalLM",
           ["<|user|>", "<|assistant|>", "<|system|>", "<|observation|>"])


def test_convert_olmo2(tmp_path):
    torch.manual_seed(24)
    cfg = transformers.Olmo2Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=500000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, pad_token_id=0, eos_token_id=1)
    hf = transformers.Olmo2ForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "Olmo2ForCausalLM",
           ["<|endoftext|>", "<|user|>", "<|assistant|>"])


def test_convert_starcoder2(tmp_path):
    torch.manual_seed(25)
    cfg = transformers.Starcoder2Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=100000.0,
        norm_epsilon=1e-5, sliding_window=4, use_bias=True,
        tie_word_embeddings=True, pad_token_id=0, eos_token_id=1,
        bos_token_id=2)
    hf = transformers.Starcoder2ForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "Starcoder2ForCausalLM", ["<|endoftext|>"])


def test_convert_cohere(tmp_path):
    torch.manual_seed(26)
    cfg = transformers.CohereConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=8000000.0,
        layer_norm_eps=1e-5, logit_scale=0.0625, use_qk_norm=False,
        tie_word_embeddings=True, pad_token_id=0, eos_token_id=1,
        bos_token_id=2)
    hf = transformers.CohereForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "CohereForCausalLM",
           ["<|START_OF_TURN_TOKEN|>", "<|END_OF_TURN_TOKEN|>",
            "<|USER_TOKEN|>", "<|CHATBOT_TOKEN|>", "<|SYSTEM_TOKEN|>"])


def test_convert_granite(tmp_path):
    torch.manual_seed(27)
    cfg = transformers.GraniteConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        attention_multiplier=0.015625, logits_scaling=8.0,
        residual_multiplier=0.22, embedding_multiplier=2.0,
        tie_word_embeddings=True, pad_token_id=0, eos_token_id=1,
        bos_token_id=2)
    hf = transformers.GraniteForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "GraniteForCausalLM", ["<|endoftext|>"])


def test_convert_phi3(tmp_path):
    torch.manual_seed(28)
    cfg = transformers.Phi3Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128,
        original_max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, sliding_window=256, rope_scaling=None,
        tie_word_embeddings=False, pad_token_id=0, eos_token_id=1,
        bos_token_id=2)
    # sliding_window set: rope_scaling=None + sliding_window=None is the
    # Phi-4 shape (reference dispatch convert.py:10897) — covered by
    # test_convert_wave5.test_convert_phi4
    hf = transformers.Phi3ForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "Phi3ForCausalLM",
           ["<|system|>", "<|user|>", "<|assistant|>", "<|end|>"],
           unigram=True)


def test_convert_olmoe(tmp_path):
    torch.manual_seed(29)
    cfg = transformers.OlmoeConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=48,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, pad_token_id=0, eos_token_id=1)
    hf = transformers.OlmoeForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "OlmoeForCausalLM",
           ["<|endoftext|>", "<|im_start|>", "<|im_end|>"])


def test_convert_deepseek_v2_light(tmp_path):
    """MLA pre-splitting through the converter (kv_a → d_kv + permuted k_pe,
    kv_b → u_k_nope/u_v; reference convert.py:7975-8260)."""
    torch.manual_seed(30)
    cfg = transformers.DeepseekV2Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=4, num_hidden_layers=3, intermediate_size=96,
        moe_intermediate_size=32, kv_lora_rank=32, q_lora_rank=None,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        first_k_dense_replace=1, moe_layer_freq=1, n_group=1, topk_group=1,
        routed_scaling_factor=1.0, norm_topk_prob=False,
        scoring_func="softmax", topk_method="greedy",
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attention_bias=False, rope_scaling=None,
        aux_loss_alpha=0.0, seq_aux=False, attention_dropout=0.0)
    hf = transformers.DeepseekV2ForCausalLM(cfg).eval()
    d = _save_dir(tmp_path, hf, cfg, "DeepseekV2ForCausalLM", [])
    out = str(tmp_path / "ds2.bin")
    convert(d, out, "f32")
    model = load_model(out, RuntimeConfig(**RT32))
    assert model.cfg.mla is not None
    ids = np.array([[7, 30, 102, 89, 5, 41]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3,
                               rtol=3e-3)


def test_convert_gemma3_multimodal(tmp_path):
    """Gemma3ForConditionalGeneration → GEMMA3Vis: text logits match HF AND
    the SigLIP tower + projector load and reproduce HF get_image_features."""
    if not hasattr(transformers, "Gemma3ForConditionalGeneration"):
        pytest.skip("no Gemma3")
    torch.manual_seed(31)
    VH, VL, VHEADS, VINTER, PATCH, IMG, MM = 32, 2, 4, 64, 8, 32, 4
    cfg = transformers.Gemma3Config(
        text_config=dict(
            vocab_size=V, hidden_size=64, num_attention_heads=4,
            num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
            head_dim=16, max_position_embeddings=128, rope_theta=1000000.0,
            rope_local_base_freq=10000.0, sliding_window=4,
            sliding_window_pattern=3, query_pre_attn_scalar=16,
            rms_norm_eps=1e-6, tie_word_embeddings=True,
            attention_bias=False, rope_scaling=None),
        vision_config=dict(
            hidden_size=VH, num_hidden_layers=VL, num_attention_heads=VHEADS,
            intermediate_size=VINTER, patch_size=PATCH, image_size=IMG,
            num_channels=3, layer_norm_eps=1e-6),
        mm_tokens_per_image=MM, image_token_index=V - 1,
        boi_token_index=V - 3, eoi_token_index=V - 2,
        pad_token_id=0, eos_token_id=1, bos_token_id=2)
    hf = transformers.Gemma3ForConditionalGeneration(cfg).eval()
    d = _save_dir(tmp_path, hf, cfg, "Gemma3ForConditionalGeneration",
                  ["<pad>", "<start_of_turn>", "<end_of_turn>",
                   "<start_of_image>", "<end_of_image>"], unigram=True)
    (tmp_path / "hf" / "preprocessor_config.json").write_text(json.dumps(
        {"image_mean": [0.5] * 3, "image_std": [0.5] * 3}))
    out = str(tmp_path / "g3v.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert m.vis_params is not None and m.vis_cfg is not None
    ids = np.array([[7, 30, 102, 89, 5]], dtype=np.int32)
    logits, _ = m.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=4e-3,
                               rtol=4e-3)
    # vision tower + projector vs HF
    px = np.random.RandomState(0).rand(1, IMG, IMG, 3).astype(np.float32)
    px = (px - 0.5) / 0.5
    ours = np.asarray(m.encode_images(px))
    with torch.no_grad():
        want = hf.get_image_features(
            torch.from_numpy(px.transpose(0, 3, 1, 2)))[0].numpy()
    np.testing.assert_allclose(ours, want.reshape(ours.shape), atol=4e-3,
                               rtol=4e-3)


def test_convert_phi3_longrope(tmp_path):
    """Phi3 LongRoPE (SU) checkpoint → PHI3_SU2 with 128-padded factor
    arrays (models/phi.h:189 — the loader previously read 64, a silent
    config-offset bug this roundtrip now guards)."""
    torch.manual_seed(32)
    half = 8      # head_dim 16 → rot/2 = 8 factors
    cfg = transformers.Phi3Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=256,
        original_max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, sliding_window=None,
        rope_scaling={"type": "longrope",
                      "short_factor": [1.0] * half,
                      "long_factor": [float(1 + i / 8) for i in range(half)]},
        tie_word_embeddings=False, pad_token_id=0, eos_token_id=1,
        bos_token_id=2)
    hf = transformers.Phi3ForCausalLM(cfg).eval()
    m = _check(tmp_path, hf, cfg, "Phi3ForCausalLM",
               ["<|system|>", "<|user|>", "<|assistant|>", "<|end|>"],
               unigram=True, atol=4e-3)
    assert m.cfg.rope.freq_factors is not None


def test_convert_qwen2_moe(tmp_path):
    torch.manual_seed(33)
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=V, hidden_size=48, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=64,
        moe_intermediate_size=24, shared_expert_intermediate_size=48,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        sliding_window=None, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=1)
    hf = transformers.Qwen2MoeForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "Qwen2MoeForCausalLM",
           ["<|endoftext|>", "<|im_start|>", "<|im_end|>"])


def test_convert_qwen3_moe(tmp_path):
    torch.manual_seed(34)
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=V, hidden_size=48, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=3, intermediate_size=64,
        moe_intermediate_size=24, num_experts=4, num_experts_per_tok=2,
        norm_topk_prob=True, decoder_sparse_step=1, mlp_only_layers=[1],
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=1)
    hf = transformers.Qwen3MoeForCausalLM(cfg).eval()
    m = _check(tmp_path, hf, cfg, "Qwen3MoeForCausalLM",
               ["<|endoftext|>", "<|im_start|>", "<|im_end|>"])
    # mlp_only_layers honored: layer 1 dense, 0/2 sparse
    assert [s.is_moe for s in m.cfg.layer_specs] == [True, False, True]


def test_convert_mixtral(tmp_path):
    torch.manual_seed(35)
    cfg = transformers.MixtralConfig(
        vocab_size=V, hidden_size=48, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=64,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        sliding_window=None, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=1, bos_token_id=2)
    hf = transformers.MixtralForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "MixtralForCausalLM",
           ["<s>", "</s>", "[INST]", "[/INST]"], unigram=True)


def test_convert_qwen25_vl(tmp_path):
    """Qwen2.5-VL through the converter: text logits match HF; the windowed
    ViT tower + merger reproduce HF `model.visual`."""
    torch.manual_seed(36)
    PATCH, MERGE, WINDOW = 4, 2, 8
    VH, VD, VHEADS, VINTER = 32, 2, 4, 48
    cfg = transformers.Qwen2_5_VLConfig(
        vocab_size=V, hidden_size=48, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=64,
        max_position_embeddings=256, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, sliding_window=None,
        rope_scaling={"type": "mrope", "mrope_section": [1, 2, 3]},
        vision_config=dict(
            depth=VD, hidden_size=VH, intermediate_size=VINTER,
            num_heads=VHEADS, patch_size=PATCH, spatial_merge_size=MERGE,
            spatial_patch_size=PATCH, temporal_patch_size=2,
            window_size=WINDOW, fullatt_block_indexes=[1],
            out_hidden_size=48, tokens_per_second=2, hidden_act="silu"),
        image_token_id=V - 1, video_token_id=V - 2,
        vision_start_token_id=V - 4, vision_end_token_id=V - 3,
        pad_token_id=0, eos_token_id=1)
    hf = transformers.Qwen2_5_VLForConditionalGeneration(cfg).eval()
    d = _save_dir(tmp_path, hf, cfg, "Qwen2_5_VLForConditionalGeneration",
                  ["<|endoftext|>", "<|im_start|>", "<|im_end|>",
                   "<|vision_start|>", "<|vision_end|>", "<|image_pad|>",
                   "<|video_pad|>"])
    out = str(tmp_path / "qvl.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert m.vis_params is not None
    ids = np.array([[7, 30, 102, 89, 5]], dtype=np.int32)
    logits, _ = m.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3,
                               rtol=3e-3)
    # vision tower golden (pattern from tests/test_qwen_vl.py)
    import jax.numpy as jnp
    from chatllm_tpu.nn.qwen_vit import grid_layout, qwen_vit_forward
    from test_qwen_vl import _hf_pixel_values

    gh, gw = 4, 4
    rng = np.random.default_rng(3)
    frames = rng.standard_normal((2, gh * PATCH, gw * PATCH, 3)).astype(np.float32)
    layout = grid_layout(m.vis_cfg, gh, gw)
    mine = np.asarray(qwen_vit_forward(m.vis_cfg, m.vis_params,
                                       jnp.asarray(frames), layout, gh, gw))
    pv = torch.from_numpy(_hf_pixel_values(frames, gh, gw))
    grid = torch.tensor([[1, gh, gw]])
    with torch.no_grad():
        ref = hf.model.visual(pv, grid_thw=grid).numpy()
    err = np.linalg.norm(mine - ref) / max(np.linalg.norm(ref), 1e-9)
    assert err < 2e-3, err


def test_convert_qwen2_audio(tmp_path):
    """Qwen2AudioForConditionalGeneration → QWEN2_AUDIO: text logits match
    HF; the whisper-style tower + projector reproduce HF audio_tower."""
    torch.manual_seed(37)
    A_MELS, A_D, A_LAYERS, A_HEADS, A_FFN, A_POS = 16, 32, 2, 4, 48, 24
    cfg = transformers.Qwen2AudioConfig(
        audio_config=dict(num_mel_bins=A_MELS, d_model=A_D,
                          encoder_layers=A_LAYERS,
                          encoder_attention_heads=A_HEADS,
                          encoder_ffn_dim=A_FFN,
                          max_source_positions=A_POS, scale_embedding=0),
        text_config=dict(
            vocab_size=V, hidden_size=48, num_attention_heads=4,
            num_key_value_heads=2, num_hidden_layers=2,
            intermediate_size=64, max_position_embeddings=256,
            rope_theta=10000.0, rms_norm_eps=1e-6,
            tie_word_embeddings=False))
    hf = transformers.Qwen2AudioForConditionalGeneration(cfg).eval()
    d = _save_dir(tmp_path, hf, cfg, "Qwen2AudioForConditionalGeneration",
                  ["<|endoftext|>", "<|im_start|>", "<|im_end|>",
                   "<|audio_bos|>", "<|audio_eos|>", "<|AUDIO|>"])
    (tmp_path / "hf" / "preprocessor_config.json").write_text(json.dumps(
        {"sampling_rate": 16000, "feature_size": A_MELS}))
    out = str(tmp_path / "q2a.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert m.aud_cfg is not None
    ids = np.array([[7, 30, 102, 89, 5]], dtype=np.int32)
    logits, _ = m.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3,
                               rtol=3e-3)
    rng = np.random.default_rng(7)
    mel = rng.standard_normal((A_MELS, 2 * A_POS)).astype(np.float32)
    mine = np.asarray(m.encode_audio(mel))
    with torch.no_grad():
        t = torch.from_numpy(mel)[None]
        want = hf.audio_tower(t).last_hidden_state
        want = hf.multi_modal_projector(want)[0].numpy()
    err = np.linalg.norm(mine - want) / max(np.linalg.norm(want), 1e-9)
    assert err < 2e-3, err
