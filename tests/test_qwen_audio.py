"""Qwen2-Audio: HF-golden audio tower (avg-pool + projector) and chat flow."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")

VOCAB, HIDDEN, HEADS, KV, LAYERS, INTER = 300, 64, 4, 2, 2, 96
A_MELS, A_D, A_LAYERS, A_HEADS, A_FFN, A_POS = 32, 48, 2, 2, 64, 64


def _pieces():
    from chatllm_tpu.tokenizer.processor import byte_level_encode

    pieces = [byte_level_encode(bytes([b])) for b in range(256)]
    specials = [b"<|endoftext|>", b"<|im_start|>", b"<|im_end|>",
                b"<|audio_bos|>", b"<|audio_eos|>", b"<|AUDIO|>"]
    pieces += specials
    pieces += [f"<x{i}>".encode() for i in range(VOCAB - len(pieces))]
    return pieces


def make_tiny_qwen2audio(path):
    torch.manual_seed(21)
    acfg = dict(num_mel_bins=A_MELS, d_model=A_D, encoder_layers=A_LAYERS,
                encoder_attention_heads=A_HEADS, encoder_ffn_dim=A_FFN,
                max_source_positions=A_POS, scale_embedding=0)
    cfg = transformers.Qwen2AudioConfig(
        audio_config=acfg,
        text_config=dict(
            vocab_size=VOCAB, hidden_size=HIDDEN, num_attention_heads=HEADS,
            num_key_value_heads=KV, num_hidden_layers=LAYERS,
            intermediate_size=INTER, max_position_embeddings=256,
            rope_theta=10000.0, rms_norm_eps=1e-6,
            tie_word_embeddings=False))
    hf = transformers.Qwen2AudioForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    # HF names → converter names (QWen2AudioConverter.state_dict_pp)
    ren = {}
    for k, v in sd.items():
        k2 = (k.replace("language_model.model.", "model.")
               .replace("language_model.lm_head", "lm_head")
               .replace("model.language_model.", "model.")
               .replace("model.audio_tower.", "audio.")
               .replace("audio_tower.", "audio.")
               .replace("model.multi_modal_projector.", "multi_modal_projector.")
               .replace(".self_attn.out_proj.", ".self_attn.o_proj.")
               .replace(".self_attn_layer_norm.", ".input_layernorm.")
               .replace(".final_layer_norm.", ".post_attention_layernorm.")
               .replace(".fc1.", ".mlp.fc1.").replace(".fc2.", ".mlp.fc2."))
        if k2 == "lm_head.weight" and "language_model" not in k and "lm_head" != k.split(".")[0]:
            pass
        ren[k2] = v
    sd = ren

    meta = {
        "model_name": "tiny-q2audio",
        "config.json": {"audio_config": acfg, "audio_token_index": 261},
        "preprocessor_config.json": {
            "sampling_rate": 16000, "feature_size": A_MELS,
            "hop_length": 160, "n_fft": 400, "chunk_length": 30,
            "n_samples": 480000, "nb_max_frames": 3000,
        },
    }
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.QWEN2_AUDIO), 1, meta=meta)
        # Qwen2 config layout ("2if")
        w.write_config([int(GGMLType.F32), VOCAB, HIDDEN, HEADS, LAYERS, INTER,
                        256, -1, 0, -1, -1, KV, 0], fmt="13i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        w.write_vocab_bpe([(p, 1) for p in _pieces()], [])

        names = ["model.embed_tokens.weight"]
        for i in range(LAYERS):
            names += [f"model.layers.{i}.{n}" for n in [
                "input_layernorm.weight",
                "self_attn.q_proj.weight", "self_attn.q_proj.bias",
                "self_attn.k_proj.weight", "self_attn.k_proj.bias",
                "self_attn.v_proj.weight", "self_attn.v_proj.bias",
                "self_attn.o_proj.weight",
                "post_attention_layernorm.weight",
                "mlp.gate_proj.weight", "mlp.up_proj.weight",
                "mlp.down_proj.weight"]]
        names += ["model.norm.weight", "lm_head.weight"]
        for i in range(A_LAYERS):
            names += [f"audio.layers.{i}.{n}" for n in [
                "input_layernorm.weight", "input_layernorm.bias",
                "self_attn.q_proj.weight", "self_attn.q_proj.bias",
                "self_attn.k_proj.weight",
                "self_attn.v_proj.weight", "self_attn.v_proj.bias",
                "self_attn.o_proj.weight", "self_attn.o_proj.bias",
                "post_attention_layernorm.weight",
                "post_attention_layernorm.bias",
                "mlp.fc1.weight", "mlp.fc1.bias",
                "mlp.fc2.weight", "mlp.fc2.bias"]]
        names += ["audio.conv1.weight", "audio.conv1.bias",
                  "audio.conv2.weight", "audio.conv2.bias",
                  "audio.embed_positions.weight",
                  "audio.layer_norm.weight", "audio.layer_norm.bias",
                  "multi_modal_projector.linear.weight",
                  "multi_modal_projector.linear.bias"]
        for n in names:
            w.write_tensor(n, sd[n], GGMLType.F32)
    return hf


@pytest.fixture(scope="module")
def qa(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("qa") / "tiny_q2a.bin")
    hf = make_tiny_qwen2audio(path)
    model = load_model(path, RuntimeConfig(**RT32))
    return hf, model


def test_audio_tower_golden(qa):
    hf, model = qa
    assert model.aud_cfg is not None
    rng = np.random.default_rng(7)
    frames = 2 * A_POS   # HF requires exactly max_source_positions*2 frames
    mel = rng.standard_normal((A_MELS, frames)).astype(np.float32)
    mine = np.asarray(model.encode_audio(mel))
    with torch.no_grad():
        t = torch.from_numpy(mel)[None]
        ref = hf.audio_tower(t).last_hidden_state
        ref = hf.multi_modal_projector(ref)[0].numpy()
    assert mine.shape == ref.shape
    err = np.linalg.norm(mine - ref) / max(np.linalg.norm(ref), 1e-9)
    assert err < 2e-4, err


def test_chat_audio_smoke(qa):
    from chatllm_tpu.runtime.generate import GenerationConfig

    _, model = qa
    pcm = np.sin(np.linspace(0, 440 * 2 * np.pi, 4000)).astype(np.float32)
    reply = model.chat_audio(pcm, "what?",
                             GenerationConfig(do_sample=False, max_new_tokens=4))
    assert isinstance(reply, str)


def test_glm_asr_smoke(tmp_path):
    """GLM-ASR: rope audio tower + frame-stack projector + chat flow."""
    from chatllm_tpu.ggmm.writer import GGMMWriter
    from chatllm_tpu.models import ModelType as MT

    vocab, hidden, heads, kv, layers, inter = 300, 64, 4, 2, 2, 96
    A = dict(num_mel_bins=32, hidden_size=32, num_hidden_layers=2,
             num_attention_heads=2, num_key_value_heads=1,
             intermediate_size=64, max_position_embeddings=64,
             head_dim=16, partial_rotary_factor=0.5,
             rope_parameters={"rope_theta": 10000.0})
    rng = np.random.default_rng(41)
    path = str(tmp_path / "glmasr.bin")
    from chatllm_tpu.tokenizer.processor import byte_level_encode
    pieces = [byte_level_encode(bytes([b])) for b in range(256)]
    pieces += [b"<|endoftext|>", b"<|user|>", b"<|assistant|>",
               b"<|begin_of_audio|>", b"<|end_of_audio|>"]
    pieces += [f"<x{i}>".encode() for i in range(vocab - len(pieces))]
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(MT.GLM_ASR), 1, meta={
            "model_name": "t", "config.json": {"audio_config": A},
            "preprocessor_config.json": {"feature_size": 32}})
        w.write_config([int(GGMLType.F32), vocab, hidden, heads, layers, inter,
                        128, -1, 1, 0, -1, kv], fmt="12i")
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        w.write_vocab_bpe([(p, 1) for p in pieces], [])

        def wt(name, shape):
            w.write_tensor(name, rng.standard_normal(shape).astype(np.float32) * 0.05,
                           GGMLType.F32)

        wt("model.embed_tokens.weight", (vocab, hidden))
        for i in range(layers):
            pfx = f"model.layers.{i}"
            wt(f"{pfx}.input_layernorm.weight", (hidden,))
            for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
                wt(f"{pfx}.self_attn.{n}.weight",
                   (hidden if n in ("q_proj", "o_proj") else hidden // 2, hidden))
            wt(f"{pfx}.post_attention_layernorm.weight", (hidden,))
            wt(f"{pfx}.mlp.gate_proj.weight", (inter, hidden))
            wt(f"{pfx}.mlp.up_proj.weight", (inter, hidden))
            wt(f"{pfx}.mlp.down_proj.weight", (hidden, inter))
        wt("model.norm.weight", (hidden,))
        wt("lm_head.weight", (vocab, hidden))
        # audio tower
        ah, ai = A["hidden_size"], A["intermediate_size"]
        wt("audio.conv1.weight", (ah, 32, 3))
        wt("audio.conv1.bias", (ah,))
        wt("audio.conv2.weight", (ah, ah, 3))
        wt("audio.conv2.bias", (ah,))
        for i in range(A["num_hidden_layers"]):
            pfx = f"audio.layers.{i}"
            for n in ("input_layernorm", "post_attention_layernorm"):
                wt(f"{pfx}.{n}.weight", (ah,))
                wt(f"{pfx}.{n}.bias", (ah,))
            for n, shp in (("q_proj", (ah, ah)), ("k_proj", (ah // 2, ah)),
                           ("v_proj", (ah // 2, ah)), ("o_proj", (ah, ah))):
                wt(f"{pfx}.self_attn.{n}.weight", shp)
                wt(f"{pfx}.self_attn.{n}.bias", (shp[0],))
            wt(f"{pfx}.mlp.fc1.weight", (ai, ah))
            wt(f"{pfx}.mlp.fc1.bias", (ai,))
            wt(f"{pfx}.mlp.fc2.weight", (ah, ai))
            wt(f"{pfx}.mlp.fc2.bias", (ah,))
        wt("audio.norm.weight", (ah,))
        wt("audio.norm.bias", (ah,))
        wt("multi_modal_projector.linear_1.weight", (hidden * 2, ai))
        wt("multi_modal_projector.linear_1.bias", (hidden * 2,))
        wt("multi_modal_projector.linear_2.weight", (hidden, hidden * 2))
        wt("multi_modal_projector.linear_2.bias", (hidden,))
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.aud_cfg is not None and model.aud_cfg.rope_dim == 8
    pcm = np.sin(np.linspace(0, 440 * 2 * np.pi, 4000)).astype(np.float32)
    from chatllm_tpu.runtime.generate import GenerationConfig
    reply = model.chat_audio(pcm, "transcribe",
                             GenerationConfig(do_sample=False, max_new_tokens=4))
    assert isinstance(reply, str)
