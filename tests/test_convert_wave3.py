"""Converter wave 3: 11 more HF families end-to-end — random-init HF
checkpoint → tools/convert.py → load_model → logits match the HF model
(reference convert.py arch dispatch lines cited per emitter)."""
import numpy as np
import pytest

import conftest  # noqa: F401

from test_convert_wave2 import V, _check

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_convert_phi2(tmp_path):
    torch.manual_seed(30)
    cfg = transformers.PhiConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, partial_rotary_factor=0.5,
        rope_theta=10000.0, hidden_act="gelu_new",
        bos_token_id=1, eos_token_id=2)
    hf = transformers.PhiForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "PhiForCausalLM", ["<|endoftext|>"])


def test_convert_stablelm(tmp_path):
    torch.manual_seed(31)
    cfg = transformers.StableLmConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, partial_rotary_factor=0.25,
        rope_theta=10000.0, use_qkv_bias=True, use_parallel_residual=False,
        layer_norm_eps=1e-5, bos_token_id=1, eos_token_id=2)
    hf = transformers.StableLmForCausalLM(cfg).eval()
    # randomize the LayerNorm biases so dropping them would be caught
    with torch.no_grad():
        for n, p in hf.named_parameters():
            if "norm" in n and n.endswith("bias"):
                p.copy_(torch.randn_like(p) * 0.1)
    _check(tmp_path, hf, cfg, "StableLmForCausalLM", ["<|endoftext|>"])


def test_convert_persimmon(tmp_path):
    torch.manual_seed(32)
    cfg = transformers.PersimmonConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, partial_rotary_factor=0.5,
        rope_theta=25000.0, qk_layernorm=True, hidden_act="relu2",
        bos_token_id=1, eos_token_id=2)
    hf = transformers.PersimmonForCausalLM(cfg).eval()
    with torch.no_grad():
        for n, p in hf.named_parameters():
            if "norm" in n and n.endswith("bias"):
                p.copy_(torch.randn_like(p) * 0.1)
    _check(tmp_path, hf, cfg, "PersimmonForCausalLM",
           ["|ENDOFTEXT|"], unigram=True)


def test_convert_cohere2(tmp_path):
    torch.manual_seed(33)
    cfg = transformers.Cohere2Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=4, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0, logit_scale=0.25,
        sliding_window=4, sliding_window_pattern=4, layer_norm_eps=1e-5,
        tie_word_embeddings=True, order_of_interleaved_layers=None,
        bos_token_id=1, eos_token_id=2)
    hf = transformers.Cohere2ForCausalLM(cfg).eval()
    # seq (8) > window (4) so both the SWA and global-NoPE layers are live
    _check(tmp_path, hf, cfg, "Cohere2ForCausalLM",
           ["<PAD>", "<|START_OF_TURN_TOKEN|>", "<|END_OF_TURN_TOKEN|>",
            "<|USER_TOKEN|>", "<|CHATBOT_TOKEN|>", "<|SYSTEM_TOKEN|>"])


def test_convert_granite_moe(tmp_path):
    torch.manual_seed(34)
    cfg = transformers.GraniteMoeConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rope_theta=10000.0,
        attention_multiplier=0.15, logits_scaling=3.0,
        residual_multiplier=0.22, embedding_multiplier=1.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2)
    hf = transformers.GraniteMoeForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "GraniteMoeForCausalLM", ["<|end_of_text|>"])


def test_convert_phimoe(tmp_path):
    torch.manual_seed(35)
    half = 8   # head_dim 16
    cfg = transformers.PhimoeConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=256, original_max_position_embeddings=128,
        rope_theta=10000.0, sliding_window=None, attention_bias=True,
        lm_head_bias=True, router_jitter_noise=0.01, input_jitter_noise=0.0,
        rope_scaling={"rope_type": "longrope",
                      # chatllm serves the LONG branch; make both
                      # identical so the HF short-branch oracle agrees
                      "short_factor": [1.25] * half,
                      "long_factor": [1.25] * half,
                      "short_mscale": 1.2, "long_mscale": 1.2,
                      "original_max_position_embeddings": 128},
        bos_token_id=1, eos_token_id=2)
    hf = transformers.PhimoeForCausalLM(cfg).eval()
    with torch.no_grad():
        for n, p in hf.named_parameters():
            if "norm" in n and n.endswith("bias"):
                p.copy_(torch.randn_like(p) * 0.1)
    _check(tmp_path, hf, cfg, "PhimoeForCausalLM", ["<|endoftext|>"],
           unigram=True)


def test_convert_smollm3(tmp_path):
    torch.manual_seed(36)
    cfg = transformers.SmolLM3Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=4, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0,
        no_rope_layer_interval=2, use_sliding_window=False,
        rms_norm_eps=1e-6, tie_word_embeddings=True,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    hf = transformers.SmolLM3ForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "SmolLM3ForCausalLM",
           ["<|im_start|>", "<|im_end|>"])


def test_convert_exaone4(tmp_path):
    torch.manual_seed(37)
    cfg = transformers.Exaone4Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=4, intermediate_size=96,
        head_dim=16, max_position_embeddings=128, rope_theta=1000000.0,
        sliding_window=4, sliding_window_pattern=4,
        rms_norm_eps=1e-5, tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2)
    hf = transformers.Exaone4ForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "Exaone4ForCausalLM", ["[|endofturn|]"])


def test_convert_ernie_dense(tmp_path):
    torch.manual_seed(38)
    cfg = transformers.Ernie4_5Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False, use_bias=False,
        bos_token_id=1, eos_token_id=2)
    hf = transformers.Ernie4_5ForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "Ernie4_5ForCausalLM",
           ["<|im_start|>", "<|im_end|>"], unigram=True, atol=6e-3)


def test_convert_ernie_moe(tmp_path):
    torch.manual_seed(39)
    cfg = transformers.Ernie4_5_MoeConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=3, intermediate_size=96,
        moe_intermediate_size=48, moe_num_experts=4, moe_k=2,
        moe_num_shared_experts=1, moe_layer_start_index=1,
        moe_layer_interval=1, max_position_embeddings=128,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        use_bias=False, moe_use_aux_free=False,
        bos_token_id=1, eos_token_id=2)
    hf = transformers.Ernie4_5_MoeForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "Ernie4_5_MoeForCausalLM",
           ["<|im_start|>", "<|im_end|>"], unigram=True, atol=6e-3)


def test_convert_seed_oss(tmp_path):
    torch.manual_seed(40)
    cfg = transformers.SeedOssConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        head_dim=16, max_position_embeddings=128, rope_theta=10000000.0,
        attention_bias=True, attention_out_bias=False,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2)
    hf = transformers.SeedOssForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "SeedOssForCausalLM",
           ["<seed:bos>", "<seed:eos>"])


def test_convert_hunyuan_moe(tmp_path):
    torch.manual_seed(41)
    cfg = transformers.HunYuanMoEV1Config(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        moe_intermediate_size=[48, 48], num_experts=4, moe_topk=[2, 2],
        num_shared_expert=[1, 1], use_mixed_mlp_moe=True, use_qk_norm=True,
        head_dim=16, attention_bias=False, max_position_embeddings=128,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2)
    hf = transformers.HunYuanMoEV1ForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "HunYuanMoEV1ForCausalLM",
           ["<|startoftext|>", "<|extra_4|>", "<|extra_0|>", "<|eos|>",
            "<|bos|>", "<|pad|>"])


def test_convert_apertus(tmp_path):
    torch.manual_seed(42)
    cfg = transformers.ApertusConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=12000000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2)
    hf = transformers.ApertusForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "ApertusForCausalLM",
           ["<|system_start|>", "<|system_end|>", "<|user_start|>",
            "<|user_end|>", "<|assistant_start|>", "<|assistant_end|>",
            "<|developer_start|>", "<|developer_end|>"])


def test_convert_llama4(tmp_path):
    torch.manual_seed(43)
    cfg = transformers.Llama4TextConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=4, intermediate_size=48,
        intermediate_size_mlp=96, num_local_experts=4,
        num_experts_per_tok=1, interleave_moe_layer_step=2,
        head_dim=16, max_position_embeddings=128, rope_theta=500000.0,
        attention_chunk_size=8192, use_qk_norm=True,
        attn_temperature_tuning=False, no_rope_layers=None,
        rms_norm_eps=1e-5, attention_bias=False,
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2)
    hf = transformers.Llama4ForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "Llama4ForCausalLM",
           ["<|header_start|>", "<|header_end|>", "<|eot|>"])


def test_convert_fuyu(tmp_path):
    torch.manual_seed(44)
    cfg = transformers.FuyuConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_hidden_layers=2, intermediate_size=96, patch_size=4,
        num_channels=3, max_position_embeddings=128,
        partial_rotary_factor=0.5, rope_theta=25000.0, qk_layernorm=True,
        hidden_act="relu2", bos_token_id=1, eos_token_id=2)
    hf = transformers.FuyuForCausalLM(cfg).eval()
    m = _check(tmp_path, hf, cfg, "FuyuForCausalLM",
               ["|ENDOFTEXT|", "|NEWLINE|", "|SPEAKER|"], unigram=True)
    # vision patch embedding matches HF's patchify + linear
    img = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
    emb = np.asarray(m.encode_image(img))           # [2, 2, H]
    pv = torch.from_numpy(img).permute(2, 0, 1)[None]
    patches = torch.nn.functional.unfold(pv, 4, stride=4)  # [1, 48, 4]
    patches = patches.view(1, 3, 16, 4).permute(0, 3, 2, 1).reshape(1, 4, 48)
    with torch.no_grad():
        ref = hf.model.vision_embed_tokens(patches)[0].numpy()
    np.testing.assert_allclose(emb.reshape(4, -1), ref, atol=2e-4, rtol=2e-4)


def test_convert_qwen3_vl(tmp_path):
    """Qwen3-VL: text logits match HF; the deepstack ViT tower reproduces
    HF model.visual (main embeddings + per-index deepstack features)."""
    import json as _json

    torch.manual_seed(45)
    PATCH, MERGE = 4, 2
    vis = dict(depth=2, hidden_size=32, intermediate_size=48, num_heads=2,
               patch_size=PATCH, spatial_merge_size=MERGE,
               temporal_patch_size=2, out_hidden_size=64,
               num_position_embeddings=16, deepstack_visual_indexes=[0, 1],
               in_channels=3, hidden_act="gelu_pytorch_tanh")
    tc = dict(vocab_size=V, hidden_size=64, num_attention_heads=4,
              num_key_value_heads=2, num_hidden_layers=2,
              intermediate_size=96, head_dim=16,
              max_position_embeddings=128, rope_theta=10000.0,
              rms_norm_eps=1e-6, tie_word_embeddings=False,
              rope_scaling={"rope_type": "default",
                            "mrope_section": [2, 1, 1],
                            "mrope_interleaved": True})
    cfg = transformers.Qwen3VLConfig(
        text_config=tc, vision_config=vis, image_token_id=V - 1,
        video_token_id=V - 2, vision_start_token_id=V - 4,
        vision_end_token_id=V - 3)
    hf = transformers.Qwen3VLForConditionalGeneration(cfg).eval()
    from test_convert_wave2 import RT32, _save_dir
    from chatllm_tpu.models import RuntimeConfig, load_model
    from chatllm_tpu.tools.convert import convert

    d = _save_dir(tmp_path, hf, cfg, "Qwen3VLForConditionalGeneration",
                  ["<|endoftext|>", "<|im_start|>", "<|im_end|>",
                   "<|vision_start|>", "<|vision_end|>", "<|image_pad|>",
                   "<|video_pad|>"])
    out = str(tmp_path / "q3vl.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert m.vis_params is not None and len(m.vis_params["ds_mergers"]) == 2
    ids = np.array([[7, 30, 102, 89, 5]], dtype=np.int32)
    logits, _ = m.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3,
                               rtol=3e-3)
    # vision tower golden
    import jax.numpy as jnp
    from chatllm_tpu.nn.qwen_vit import grid_layout, qwen3_vit_forward

    gh, gw = 4, 4
    rng = np.random.default_rng(5)
    frames = rng.standard_normal((2, gh * PATCH, gw * PATCH, 3)).astype(np.float32)
    layout = grid_layout(m.vis_cfg, gh, gw)
    mine, deepstack = qwen3_vit_forward(m.vis_cfg, m.vis_params,
                                        jnp.asarray(frames), layout, gh, gw)
    x = frames.transpose(0, 3, 1, 2).reshape(
        1, 2, 3, gh // MERGE, MERGE, PATCH, gw // MERGE, MERGE, PATCH)
    pv = torch.from_numpy(np.ascontiguousarray(
        x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)).reshape(gh * gw, 3 * 2 * PATCH * PATCH))
    grid = torch.tensor([[1, gh, gw]])
    with torch.no_grad():
        vout = hf.model.visual(pv, grid_thw=grid)
    ref_main, ref_ds = (vout if isinstance(vout, tuple) else
                        (vout.last_hidden_state, vout.deepstack_feature_lists))
    err = (np.linalg.norm(np.asarray(mine) - ref_main.numpy())
           / np.linalg.norm(ref_main.numpy()))
    assert err < 2e-3, err
    for got, want in zip(deepstack, ref_ds):
        e = (np.linalg.norm(np.asarray(got) - want.numpy())
             / np.linalg.norm(want.numpy()))
        assert e < 2e-3, e


def test_convert_mistral3(tmp_path):
    torch.manual_seed(46)
    tc = dict(vocab_size=V, hidden_size=64, num_attention_heads=4,
              num_key_value_heads=2, num_hidden_layers=2,
              intermediate_size=96, head_dim=16,
              max_position_embeddings=128, rope_theta=1000000.0,
              rms_norm_eps=1e-6, tie_word_embeddings=False,
              sliding_window=None)
    cfg = transformers.Mistral3Config(
        text_config=tc,
        vision_config=dict(hidden_size=32, intermediate_size=48,
                           num_hidden_layers=2, num_attention_heads=2,
                           head_dim=16, patch_size=4, image_size=32,
                           rope_theta=10000.0, hidden_act="silu"),
        image_token_index=V - 1, spatial_merge_size=2,
        multimodal_projector_bias=False)
    hf = transformers.Mistral3ForConditionalGeneration(cfg).eval()
    from test_convert_wave2 import RT32, _save_dir
    from chatllm_tpu.models import RuntimeConfig, load_model
    from chatllm_tpu.tools.convert import convert

    d = _save_dir(tmp_path, hf, cfg, "Mistral3ForConditionalGeneration",
                  ["<unk>", "<s>", "</s>", "[INST]", "[/INST]", "[IMG]",
                   "[IMG_BREAK]", "[IMG_END]"])
    out = str(tmp_path / "m3.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    ids = np.array([[7, 30, 102, 89, 5, 41]], dtype=np.int32)
    logits, _ = m.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3,
                               rtol=3e-3)
    # pixtral tower + merger + projector golden vs HF get_image_features
    import jax.numpy as jnp
    from chatllm_tpu.nn.pixtral_vit import pixtral_vit_forward

    assert m.vis_params is not None
    rng = np.random.default_rng(10)
    px = rng.standard_normal((16, 24, 3)).astype(np.float32)   # 4x6 grid
    mine = np.asarray(pixtral_vit_forward(m.vis_cfg, m.vis_params,
                                          jnp.asarray(px)))
    pv = torch.from_numpy(px.transpose(2, 0, 1))[None]
    with torch.no_grad():
        ref_v = hf.model.get_image_features(
            pixel_values=pv, image_sizes=torch.tensor([[16, 24]]))
    ref_v = (ref_v[0] if isinstance(ref_v, (tuple, list)) else ref_v)
    ref_v = ref_v.reshape(-1, 64).numpy()
    err = np.linalg.norm(mine - ref_v) / np.linalg.norm(ref_v)
    assert err < 2e-3, err


def test_convert_glm4v(tmp_path):
    """GLM-4V: sandwich-norm text logits match HF; the ViT tower (conv3d
    embed + bicubic pos interp + downsample + merger) reproduces
    HF model.visual."""
    torch.manual_seed(47)
    PATCH, MERGE = 4, 2
    vis = dict(depth=2, hidden_size=32, intermediate_size=48, num_heads=2,
               patch_size=PATCH, spatial_merge_size=MERGE,
               temporal_patch_size=2, out_hidden_size=64, image_size=32,
               in_channels=3)
    tc = dict(vocab_size=V, hidden_size=64, num_attention_heads=4,
              num_key_value_heads=2, num_hidden_layers=2,
              intermediate_size=96, max_position_embeddings=128,
              rope_theta=10000.0, rms_norm_eps=1e-5, attention_bias=True,
              partial_rotary_factor=0.5, tie_word_embeddings=False,
              rope_scaling={"rope_type": "default",
                            "mrope_section": [2, 1, 1]})
    cfg = transformers.Glm4vConfig(
        text_config=tc, vision_config=vis, image_token_id=V - 1,
        video_token_id=V - 2, image_start_token_id=V - 4,
        image_end_token_id=V - 3)
    hf = transformers.Glm4vForConditionalGeneration(cfg).eval()
    from test_convert_wave2 import RT32, _save_dir
    from chatllm_tpu.models import RuntimeConfig, load_model
    from chatllm_tpu.tools.convert import convert

    d = _save_dir(tmp_path, hf, cfg, "Glm4vForConditionalGeneration",
                  ["<|endoftext|>", "[gMASK]", "<sop>", "<|user|>",
                   "<|assistant|>", "<|begin_of_image|>", "<|end_of_image|>"])
    out = str(tmp_path / "g4v.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert m.vis_params is not None
    ids = np.array([[7, 30, 102, 89, 5]], dtype=np.int32)
    logits, _ = m.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3,
                               rtol=3e-3)
    # vision tower golden
    import jax.numpy as jnp
    from chatllm_tpu.nn.glm_vit import glm_vit_forward

    gh, gw = 4, 4
    rng = np.random.default_rng(6)
    frames = rng.standard_normal((2, gh * PATCH, gw * PATCH, 3)).astype(np.float32)
    mine = np.asarray(glm_vit_forward(m.vis_cfg, m.vis_params,
                                      jnp.asarray(frames), gh, gw))
    x = frames.transpose(0, 3, 1, 2).reshape(
        1, 2, 3, gh // MERGE, MERGE, PATCH, gw // MERGE, MERGE, PATCH)
    pv = torch.from_numpy(np.ascontiguousarray(
        x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)).reshape(
            gh * gw, 3 * 2 * PATCH * PATCH))
    grid = torch.tensor([[1, gh, gw]])
    with torch.no_grad():
        ref_v = hf.model.visual(pv, grid_thw=grid).numpy()
    err = np.linalg.norm(mine - ref_v) / np.linalg.norm(ref_v)
    assert err < 2e-3, err


def test_convert_smolvlm(tmp_path):
    """SmolVLM: text logits match HF; the SigLIP tower + pixel shuffle +
    connector reproduce HF get_image_features."""
    torch.manual_seed(48)
    S, PATCH = 16, 4
    vc = dict(hidden_size=32, intermediate_size=48, num_hidden_layers=2,
              num_attention_heads=2, patch_size=PATCH, image_size=S,
              num_channels=3, max_image_size={"longest_edge": S},
              layer_norm_eps=1e-6)
    tc = dict(vocab_size=V, hidden_size=64, num_attention_heads=4,
              num_key_value_heads=2, num_hidden_layers=2,
              intermediate_size=96, max_position_embeddings=128,
              rope_theta=100000.0, rms_norm_eps=1e-6,
              tie_word_embeddings=False)
    cfg = transformers.SmolVLMConfig(vision_config=vc, text_config=tc,
                                     scale_factor=2, image_token_id=V - 1)
    hf = transformers.SmolVLMForConditionalGeneration(cfg).eval()
    from test_convert_wave2 import RT32, _save_dir
    from chatllm_tpu.models import RuntimeConfig, load_model
    from chatllm_tpu.tools.convert import convert

    d = _save_dir(tmp_path, hf, cfg, "SmolVLMForConditionalGeneration",
                  ["<|im_start|>", "<|im_end|>", "<|endoftext|>",
                   "<end_of_utterance>", "<fake_token_around_image>",
                   "<global-img>", "<image>"])
    out = str(tmp_path / "svlm.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert m.vis_params is not None
    ids = np.array([[7, 30, 102, 89, 5]], dtype=np.int32)
    logits, _ = m.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3,
                               rtol=3e-3)
    # vision golden: tower + pixel shuffle + projection
    rng = np.random.default_rng(7)
    px = rng.standard_normal((1, S, S, 3)).astype(np.float32)
    mine = np.asarray(m.encode_images(px))           # [n_tok, H]
    pv = torch.from_numpy(px.transpose(0, 3, 1, 2))[:, None]
    with torch.no_grad():
        ref_v = hf.model.get_image_features(
            pv, pixel_attention_mask=None).reshape(-1, 64).numpy()
    err = np.linalg.norm(mine - ref_v) / np.linalg.norm(ref_v)
    assert err < 2e-3, err


def test_convert_internvl(tmp_path):
    """InternVL: qwen3 text logits match HF; the InternViT tower +
    pixel-shuffle + LN/MLP projector reproduce HF get_image_features."""
    torch.manual_seed(49)
    S, PATCH = 16, 4
    vc = dict(hidden_size=32, intermediate_size=48, num_hidden_layers=2,
              num_attention_heads=2, patch_size=[PATCH, PATCH],
              image_size=[S, S], use_absolute_position_embeddings=True,
              layer_scale_init_value=0.1, use_qk_norm=False,
              attention_bias=False, hidden_act="gelu", num_channels=3,
              layer_norm_eps=1e-6)
    tc = dict(model_type="qwen3", vocab_size=V, hidden_size=64,
              num_attention_heads=4, num_key_value_heads=2,
              num_hidden_layers=2, intermediate_size=96, head_dim=16,
              max_position_embeddings=128, rope_theta=10000.0,
              rms_norm_eps=1e-6, tie_word_embeddings=False)
    cfg = transformers.InternVLConfig(
        vision_config=vc, text_config=tc, image_token_id=V - 1,
        downsample_ratio=0.5)
    hf = transformers.InternVLForConditionalGeneration(cfg).eval()
    from test_convert_wave2 import RT32, _save_dir
    from chatllm_tpu.models import RuntimeConfig, load_model
    from chatllm_tpu.tools.convert import convert

    d = _save_dir(tmp_path, hf, cfg, "InternVLForConditionalGeneration",
                  ["<|im_start|>", "<|im_end|>", "<|endoftext|>",
                   "<img>", "</img>", "<IMG_CONTEXT>"])
    out = str(tmp_path / "ivl.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert m.vis_params is not None
    ids = np.array([[7, 30, 102, 89, 5]], dtype=np.int32)
    logits, _ = m.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3,
                               rtol=3e-3)
    rng = np.random.default_rng(8)
    px = rng.standard_normal((1, S, S, 3)).astype(np.float32)
    mine = np.asarray(m.encode_images(px))
    pv = torch.from_numpy(px.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref_v = hf.model.get_image_features(
            pv, vision_feature_layer=-1,
            vision_feature_select_strategy="default").reshape(-1, 64).numpy()
    err = np.linalg.norm(mine - ref_v) / np.linalg.norm(ref_v)
    assert err < 2e-3, err


def test_convert_glm(tmp_path):
    torch.manual_seed(50)
    cfg = transformers.GlmConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        head_dim=16, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=1, bos_token_id=2)
    hf = transformers.GlmForCausalLM(cfg).eval()
    _check(tmp_path, hf, cfg, "GlmForCausalLM",
           ["<|endoftext|>", "[MASK]", "[gMASK]", "[sMASK]", "<sop>",
            "<eop>", "<|user|>", "<|assistant|>"])


def test_convert_qwen3_vl_moe(tmp_path):
    """Qwen3-VL-MoE: fused per-expert gate_up/down split; text logits
    match HF (vision path shared with the dense qwen3-vl test)."""
    torch.manual_seed(51)
    vis = dict(depth=1, hidden_size=32, intermediate_size=48, num_heads=2,
               patch_size=4, spatial_merge_size=2, temporal_patch_size=2,
               out_hidden_size=64, num_position_embeddings=16,
               deepstack_visual_indexes=[0], in_channels=3)
    tc = dict(vocab_size=V, hidden_size=64, num_attention_heads=4,
              num_key_value_heads=2, num_hidden_layers=2,
              intermediate_size=96, head_dim=16, moe_intermediate_size=32,
              num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
              mlp_only_layers=[], norm_topk_prob=True,
              max_position_embeddings=128, rope_theta=10000.0,
              rms_norm_eps=1e-6, tie_word_embeddings=False,
              rope_scaling={"rope_type": "default",
                            "mrope_section": [2, 1, 1],
                            "mrope_interleaved": True})
    cfg = transformers.Qwen3VLMoeConfig(
        text_config=tc, vision_config=vis, image_token_id=V - 1,
        video_token_id=V - 2, vision_start_token_id=V - 4,
        vision_end_token_id=V - 3)
    hf = transformers.Qwen3VLMoeForConditionalGeneration(cfg).eval()
    from test_convert_wave2 import RT32, _save_dir
    from chatllm_tpu.models import RuntimeConfig, load_model
    from chatllm_tpu.tools.convert import convert

    d = _save_dir(tmp_path, hf, cfg, "Qwen3VLMoeForConditionalGeneration",
                  ["<|endoftext|>", "<|im_start|>", "<|im_end|>",
                   "<|vision_start|>", "<|vision_end|>", "<|image_pad|>",
                   "<|video_pad|>"])
    out = str(tmp_path / "q3vlm.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert m.vis_params is not None
    ids = np.array([[7, 30, 102, 89, 5]], dtype=np.int32)
    logits, _ = m.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3,
                               rtol=3e-3)


def test_convert_janus(tmp_path):
    """Janus-Pro: llama text logits match HF; the SigLIP tower + aligner
    reproduce HF get_image_features; the VQ-GAN decoder reproduces HF
    vqmodel.decode on arbitrary codes."""
    torch.manual_seed(52)
    S, PATCH = 16, 4
    vc = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
              image_size=S, patch_size=PATCH, mlp_ratio=1.5,
              attention_bias=True, hidden_act="gelu", projection_dim=64,
              layer_norm_eps=1e-6, num_channels=3)
    tc = dict(vocab_size=V, hidden_size=64, num_attention_heads=4,
              num_key_value_heads=4, num_hidden_layers=2,
              intermediate_size=96, max_position_embeddings=128,
              rope_theta=10000.0, rms_norm_eps=1e-6,
              tie_word_embeddings=False)
    gc = dict(embed_dim=8, num_embeddings=32, base_channels=32,
              channel_multipliers=[1, 2], num_res_blocks=2,
              hidden_size=32, num_hidden_layers=2, num_patches=4,
              projector_hidden_act="gelu", image_token_embed_dim=64)
    cfg = transformers.JanusConfig(vision_config=vc, text_config=tc,
                                   vq_config=gc, image_token_id=V - 1)
    hf = transformers.JanusForConditionalGeneration(cfg).eval()
    from test_convert_wave2 import RT32, _save_dir
    from chatllm_tpu.models import RuntimeConfig, load_model
    from chatllm_tpu.tools.convert import convert

    # janus inherits the deepseek v1 tokenizer = byte-BPE (janus.cpp:64)
    d = _save_dir(tmp_path, hf, cfg, "JanusForConditionalGeneration",
                  ["<begin_of_image>", "<end_of_image>", "<｜▁pad▁｜>"])
    out = str(tmp_path / "janus.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    assert m.vis_params is not None and m.gen_params is not None
    ids = np.array([[7, 30, 102, 89, 5]], dtype=np.int32)
    logits, _ = m.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3,
                               rtol=3e-3)
    # understanding tower + aligner
    rng = np.random.default_rng(9)
    px = rng.standard_normal((1, S, S, 3)).astype(np.float32)
    mine = np.asarray(m.encode_images(px))
    pv = torch.from_numpy(px.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref_v = hf.model.get_image_features(pv).reshape(-1, 64).numpy()
    err = np.linalg.norm(mine - ref_v) / np.linalg.norm(ref_v)
    assert err < 2e-3, err
    # VQ decoder golden on arbitrary codes
    from chatllm_tpu.nn.vqgan import vq_decode

    import jax.numpy as jnp
    codes = rng.integers(0, 32, size=(1, 16), dtype=np.int64)  # 4x4 latent
    mine_img = np.asarray(vq_decode(m.gen_params["vq"],
                                    jnp.asarray(codes), (4, 4)))
    with torch.no_grad():
        ref_img = hf.model.vqmodel.decode(
            torch.from_numpy(codes)).numpy().transpose(0, 2, 3, 1)
    # the runtime applies the reference's (x+1)/2 + clip (janus.cpp:893)
    ref_img = np.clip((ref_img + 1.0) * 0.5, 0.0, 1.0)
    err = (np.linalg.norm(mine_img - ref_img)
           / max(np.linalg.norm(ref_img), 1e-9))
    assert err < 2e-3, err


def test_convert_internlm2(tmp_path):
    """InternLM2 (remote-code names): oracle built by PACKING a tiny HF
    Llama's q/k/v into the fused wqkv layout — the converted model must
    reproduce the Llama logits exactly (reference InternLM2Converter
    split + permute, convert.py:1453-1543)."""
    import json as _json

    from safetensors.numpy import save_file

    from test_convert import _byte_vocab_json
    from test_convert_wave2 import RT32
    from chatllm_tpu.models import RuntimeConfig, load_model
    from chatllm_tpu.tools.convert import convert

    torch.manual_seed(53)
    heads, kv, hd, H = 4, 2, 16, 64
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=H, num_attention_heads=heads,
        num_key_value_heads=kv, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=1000000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False, attention_bias=False)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    out_sd = {"model.tok_embeddings.weight": sd["model.embed_tokens.weight"],
              "model.norm.weight": sd["model.norm.weight"],
              "output.weight": sd["lm_head.weight"]}
    kvg = heads // kv
    for i in range(2):
        pfx = f"model.layers.{i}"
        q = sd[f"{pfx}.self_attn.q_proj.weight"].reshape(kv, kvg, hd, H)
        k = sd[f"{pfx}.self_attn.k_proj.weight"].reshape(kv, 1, hd, H)
        v = sd[f"{pfx}.self_attn.v_proj.weight"].reshape(kv, 1, hd, H)
        out_sd[f"{pfx}.attention.wqkv.weight"] = np.ascontiguousarray(
            np.concatenate([q, k, v], axis=1).reshape((kvg + 2) * kv * hd, H))
        out_sd[f"{pfx}.attention.wo.weight"] = \
            sd[f"{pfx}.self_attn.o_proj.weight"]
        out_sd[f"{pfx}.feed_forward.w1.weight"] = \
            sd[f"{pfx}.mlp.gate_proj.weight"]
        out_sd[f"{pfx}.feed_forward.w2.weight"] = \
            sd[f"{pfx}.mlp.down_proj.weight"]
        out_sd[f"{pfx}.feed_forward.w3.weight"] = sd[f"{pfx}.mlp.up_proj.weight"]
        out_sd[f"{pfx}.attention_norm.weight"] = \
            sd[f"{pfx}.input_layernorm.weight"]
        out_sd[f"{pfx}.ffn_norm.weight"] = \
            sd[f"{pfx}.post_attention_layernorm.weight"]

    d = tmp_path / "hf"
    d.mkdir()
    save_file(out_sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(_json.dumps(
        {**cfg.to_dict(), "architectures": ["InternLM2ForCausalLM"],
         "bias": False}))
    import json
    (d / "tokenizer.json").write_text(json.dumps(
        {"model": {"type": "Unigram",
                   "vocab": [[f"<s{i}>", -float(i)] for i in range(V)]}}))
    out = str(tmp_path / "ilm2.bin")
    convert(str(d), out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    ids = np.array([[7, 30, 102, 89, 5]], dtype=np.int32)
    logits, _ = m.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3,
                               rtol=3e-3)


def test_convert_baichuan(tmp_path):
    """Baichuan-7B (remote-code W_pack): oracle by packing a tiny full-MHA
    HF Llama's q/k/v into W_pack; logits must match (+ the normalized
    lm_head transform applied to the oracle too)."""
    import json as _json

    from safetensors.numpy import save_file

    from test_convert_wave2 import RT32
    from chatllm_tpu.models import RuntimeConfig, load_model
    from chatllm_tpu.tools.convert import convert

    torch.manual_seed(54)
    H = 64
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=H, num_attention_heads=4,
        num_key_value_heads=4, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False, attention_bias=False)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    with torch.no_grad():   # bake the reference's row-normalized lm_head
        w_lm = hf.lm_head.weight
        hf.lm_head.weight.copy_(torch.nn.functional.normalize(w_lm))
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    out_sd = dict(sd)
    for i in range(2):
        pfx = f"model.layers.{i}"
        out_sd[f"{pfx}.self_attn.W_pack.weight"] = np.concatenate(
            [out_sd.pop(f"{pfx}.self_attn.{n}.weight")
             for n in ("q_proj", "k_proj", "v_proj")], axis=0)
    d = tmp_path / "hf"
    d.mkdir()
    save_file(out_sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(_json.dumps(
        {**cfg.to_dict(), "architectures": ["BaichuanForCausalLM"],
         "user_token_id": 195, "assistant_token_id": 196}))
    (d / "tokenizer.json").write_text(_json.dumps(
        {"model": {"type": "Unigram",
                   "vocab": [[f"<s{i}>", -float(i)] for i in range(V)]}}))
    out = str(tmp_path / "bc.bin")
    convert(str(d), out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))
    ids = np.array([[7, 30, 102, 89, 5]], dtype=np.int32)
    logits, _ = m.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3,
                               rtol=3e-3)


def test_convert_xlmroberta_embedding_and_reranker(tmp_path):
    """bge/bce embedding + reranker through the converter: our
    bert_forward must match HF XLMRoberta hidden states, and the
    reranker's qa_rank must match the HF classifier logit."""
    import json as _json

    import jax.numpy as jnp

    from test_convert_wave2 import RT32
    from chatllm_tpu.models import RuntimeConfig, load_model
    from chatllm_tpu.tools.convert import convert

    torch.manual_seed(55)
    cfg = transformers.XLMRobertaConfig(
        vocab_size=V, hidden_size=32, num_attention_heads=2,
        num_hidden_layers=2, intermediate_size=64,
        max_position_embeddings=66, layer_norm_eps=1e-12, num_labels=1,
        pad_token_id=1, bos_token_id=0, eos_token_id=2)
    for arch, cls in [("XLMRobertaModel",
                       lambda c: transformers.XLMRobertaModel(
                           c, add_pooling_layer=False)),
                      ("XLMRobertaForSequenceClassification",
                       transformers.XLMRobertaForSequenceClassification)]:
        hf = cls(cfg).eval()
        d = tmp_path / arch
        d.mkdir()
        from safetensors.numpy import save_file

        save_file({k: v.detach().float().numpy()
                   for k, v in hf.state_dict().items()},
                  str(d / "model.safetensors"))
        (d / "config.json").write_text(_json.dumps(
            {**cfg.to_dict(), "architectures": [arch]}))
        (d / "tokenizer.json").write_text(_json.dumps(
            {"model": {"type": "Unigram",
                       "vocab": [[f"<s{i}>", -float(i)]
                                 for i in range(V)]}}))
        out = str(tmp_path / f"{arch}.bin")
        convert(str(d), out, "f32")
        m = load_model(out, RuntimeConfig(**RT32))
        ids = np.array([[0, 5, 17, 42, 99, 2]], np.int32)
        from chatllm_tpu.nn.bert import bert_forward

        ours = np.asarray(bert_forward(m.cfg, m.params, jnp.asarray(ids)))
        with torch.no_grad():
            t = torch.from_numpy(ids.astype(np.int64))
            if arch == "XLMRobertaModel":
                ref = hf(t).last_hidden_state.numpy()
                np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)
            else:
                ref = hf.roberta(t).last_hidden_state.numpy()
                np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)
                assert hasattr(m, "qa_rank")


def test_convert_arch_alias(tmp_path):
    """-a template aliases (reference convert.py -a dispatch): same llama
    weights, different model type → different template at load."""
    import json as _json

    from test_convert import _save_hf_dir
    from test_convert_wave2 import RT32
    from chatllm_tpu.models import ModelType, RuntimeConfig, load_model
    from chatllm_tpu.tools.convert import convert

    torch.manual_seed(56)
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=5000000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    import json as _json2

    d = _save_hf_dir(tmp_path, hf,
                     {**cfg.to_dict(), "architectures": ["LlamaForCausalLM"]},
                     [])
    # yi loads an SP-score vocab (BPEProcessor1)
    (tmp_path / "hf" / "tokenizer.json").write_text(_json2.dumps(
        {"model": {"type": "Unigram",
                   "vocab": [[f"<s{i}>", -float(i)] for i in range(V)]}}))
    out = str(tmp_path / "yi.bin")
    convert(d, out, "f32", arch="yi")
    m = load_model(out, RuntimeConfig(**RT32))
    assert m.model_type == int(ModelType.YI)
    ids = np.array([[7, 30, 102, 89, 5]], dtype=np.int32)
    logits, _ = m.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3,
                               rtol=3e-3)
