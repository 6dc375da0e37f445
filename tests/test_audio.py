"""Audio frontend + whisper-encoder golden tests vs HF."""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_log_mel_matches_whisper_feature_extractor():
    from chatllm_tpu.runtime.audio import log_mel_spectrogram

    fe = transformers.WhisperFeatureExtractor(feature_size=80, n_fft=400,
                                              hop_length=160,
                                              sampling_rate=16000)
    rng = np.random.default_rng(0)
    samples = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    ref = fe(samples, sampling_rate=16000,
             return_tensors="np").input_features[0]   # [80, 3000]
    ours = log_mel_spectrogram(samples, n_mels=80,
                               pad_to_samples=16000 * 30)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_whisper_encoder_matches_hf():
    from chatllm_tpu.nn.audio import (AudioEncoderConfig,
                                      audio_encoder_forward, sinusoids)

    torch.manual_seed(41)
    n_mels, hidden, layers, heads, inter = 80, 64, 2, 4, 128
    cfg_hf = transformers.WhisperConfig(
        num_mel_bins=n_mels, d_model=hidden, encoder_layers=layers,
        encoder_attention_heads=heads, encoder_ffn_dim=inter,
        max_source_positions=100, decoder_layers=1,
        decoder_attention_heads=heads, decoder_ffn_dim=inter)
    hf = transformers.WhisperModel(cfg_hf).eval().encoder
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    from chatllm_tpu.ops.qtensor import DenseLinear

    def lin(name, has_bias=True):
        b = jnp.asarray(sd[name + ".bias"]) if has_bias else None
        return DenseLinear(w=jnp.asarray(sd[name + ".weight"].T), bias=b)

    params = {
        # HF conv1d weight [out, in, k] -> [k, in, out]
        "conv1_w": jnp.asarray(np.transpose(sd["conv1.weight"], (2, 1, 0))),
        "conv1_b": jnp.asarray(sd["conv1.bias"]),
        "conv2_w": jnp.asarray(np.transpose(sd["conv2.weight"], (2, 1, 0))),
        "conv2_b": jnp.asarray(sd["conv2.bias"]),
        "pos": jnp.asarray(sd["embed_positions.weight"]),
        "post_norm": {"w": jnp.asarray(sd["layer_norm.weight"]),
                      "b": jnp.asarray(sd["layer_norm.bias"])},
        "layers": [],
    }
    for i in range(layers):
        p = f"layers.{i}."
        params["layers"].append({
            "norm1": {"w": jnp.asarray(sd[p + "self_attn_layer_norm.weight"]),
                      "b": jnp.asarray(sd[p + "self_attn_layer_norm.bias"])},
            "attn": {
                "q": lin(p + "self_attn.q_proj"),
                "k": lin(p + "self_attn.k_proj", has_bias=False),
                "v": lin(p + "self_attn.v_proj"),
                "o": lin(p + "self_attn.out_proj"),
            },
            "norm2": {"w": jnp.asarray(sd[p + "final_layer_norm.weight"]),
                      "b": jnp.asarray(sd[p + "final_layer_norm.bias"])},
            "mlp": {"fc0": lin(p + "fc1"), "fc1": lin(p + "fc2")},
        })

    cfg = AudioEncoderConfig(n_mels=n_mels, hidden_size=hidden,
                             num_hidden_layers=layers,
                             num_attention_heads=heads,
                             intermediate_size=inter,
                             max_source_positions=100)
    mel = np.random.default_rng(2).standard_normal((1, n_mels, 200)).astype(np.float32)
    ours = np.asarray(audio_encoder_forward(cfg, params, jnp.asarray(mel)))
    with torch.no_grad():
        ref = hf(torch.from_numpy(mel)).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=3e-4)

    # sinusoid table matches HF init
    si = sinusoids(100, hidden)
    np.testing.assert_allclose(si, sd["embed_positions.weight"], atol=1e-5)
