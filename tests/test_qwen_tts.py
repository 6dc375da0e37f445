"""Qwen3-TTS (reference models/qwen_tts.cpp): codec decoder component
oracles (causal conv vs torch, snake formula, chunked-vs-full decode) and an
end-to-end tiny talker → code predictor → codec synthesis run."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model
from chatllm_tpu.nn.qwen_tts_codec import (QwenTTSDecoderConfig,
                                           _causal_conv, _snake_beta,
                                           qwen_tts_chunked_decode,
                                           qwen_tts_decode)
from test_model_golden import _bpe_pieces

torch = pytest.importorskip("torch")

RT32 = dict(weight_dtype="float32", compute_dtype="float32",
            cache_dtype="float32")


def _rng(s=0):
    return np.random.RandomState(s)


# ---------------------------------------------------------------------------
# component oracles
# ---------------------------------------------------------------------------

def test_causal_conv_vs_torch():
    """Qwen3TTSTokenizerV2CausalConvNet padding (qwen_tts.cpp:191-213):
    left-pad (k_eff - stride) + right-pad to the ideal frame length, then a
    plain conv — checked against torch.nn.functional.conv1d."""
    rng = _rng(1)
    for (cin, cout, k, dil, stride, T) in ((4, 6, 7, 1, 1, 20),
                                           (4, 6, 7, 3, 1, 20),
                                           (8, 3, 3, 1, 1, 17),
                                           (4, 4, 7, 9, 1, 33)):
        x = rng.randn(T, cin).astype(np.float32)
        w = rng.randn(cout, cin, k).astype(np.float32) * 0.2
        b = rng.randn(cout).astype(np.float32)
        got = np.asarray(_causal_conv({"w": w, "b": jnp.asarray(b)},
                                      jnp.asarray(x), dilation=dil,
                                      stride=stride))
        keff = (k - 1) * dil + 1
        pad = keff - stride
        xt = torch.from_numpy(x.T[None])
        xt = torch.nn.functional.pad(xt, (pad, 0))
        want = torch.nn.functional.conv1d(
            xt, torch.from_numpy(w), torch.from_numpy(b),
            stride=stride, dilation=dil)[0].T.numpy()
        # stride-1 causal conv has zero extra right padding → same length
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_snake_beta_formula():
    """SnakeBeta with folded params (qwen_tts.cpp:316-360):
    y = x + sin²(exp(a_raw)·x) / (exp(b_raw) + 1e-9)."""
    rng = _rng(2)
    x = rng.randn(9, 5).astype(np.float32)
    a_raw = rng.randn(5).astype(np.float32)
    b_raw = rng.randn(5).astype(np.float32)
    p = {"alpha": jnp.asarray(np.exp(a_raw)),
         "beta": jnp.asarray(1.0 / (np.exp(b_raw) + 1e-9))}
    got = np.asarray(_snake_beta(p, jnp.asarray(x)))
    want = x + np.sin(np.exp(a_raw) * x) ** 2 / (np.exp(b_raw) + 1e-9)
    np.testing.assert_allclose(got, want, atol=1e-5)


def _tiny_codec_cfg():
    return QwenTTSDecoderConfig(
        codebook_size=32, hidden_size=16, latent_dim=12, codebook_dim=8,
        rope_theta=1e4, num_attention_heads=2, num_key_value_heads=2,
        sliding_window=4, intermediate_size=24, num_hidden_layers=1,
        num_quantizers=16, upsample_rates=(2, 2), upsampling_ratios=(2,),
        decoder_dim=8, head_dim=8)


def _gen_codec_sd(rng, cfg: QwenTTSDecoderConfig):
    """Random state dict in reference on-disk names (decoder.*)."""
    r = lambda *s: (rng.randn(*s) * 0.2).astype(np.float32)
    sd = {}
    half = cfg.codebook_dim // 2
    for name, nq in (("rvq_first", 1), ("rvq_rest", cfg.num_quantizers - 1)):
        for i in range(nq):
            sd[f"decoder.quantizer.{name}.vq.layers.{i}._codebook."
               f"embedding_sum"] = r(cfg.codebook_size, half)
        sd[f"decoder.quantizer.{name}.output_proj.conv.weight"] = \
            r(cfg.codebook_dim, half, 1)
    sd["decoder.pre_conv.conv.weight"] = r(cfg.latent_dim, cfg.codebook_dim, 3)
    sd["decoder.pre_conv.conv.bias"] = r(cfg.latent_dim)
    pre = "decoder.pre_transformer."
    H, L, I = cfg.hidden_size, cfg.latent_dim, cfg.intermediate_size
    sd[pre + "input_proj.weight"] = r(H, L)
    sd[pre + "input_proj.bias"] = r(H)
    sd[pre + "output_proj.weight"] = r(L, H)
    sd[pre + "output_proj.bias"] = r(L)
    sd[pre + "norm.weight"] = np.ones(H, np.float32)
    for i in range(cfg.num_hidden_layers):
        pfx = f"{pre}layers.{i}"
        d = cfg.head_dim
        sd[f"{pfx}.input_layernorm.weight"] = np.ones(H, np.float32)
        sd[f"{pfx}.post_attention_layernorm.weight"] = np.ones(H, np.float32)
        sd[f"{pfx}.self_attn.q_proj.weight"] = r(cfg.num_attention_heads * d, H)
        sd[f"{pfx}.self_attn.k_proj.weight"] = r(cfg.num_key_value_heads * d, H)
        sd[f"{pfx}.self_attn.v_proj.weight"] = r(cfg.num_key_value_heads * d, H)
        sd[f"{pfx}.self_attn.o_proj.weight"] = r(H, cfg.num_attention_heads * d)
        sd[f"{pfx}.self_attn_layer_scale.scale"] = np.full(H, 0.1, np.float32)
        sd[f"{pfx}.mlp_layer_scale.scale"] = np.full(H, 0.1, np.float32)
        sd[f"{pfx}.mlp.gate_proj.weight"] = r(I, H)
        sd[f"{pfx}.mlp.up_proj.weight"] = r(I, H)
        sd[f"{pfx}.mlp.down_proj.weight"] = r(H, I)
    for i, ratio in enumerate(cfg.upsampling_ratios):
        base = f"decoder.upsample.{i}"
        sd[f"{base}.0.conv.weight"] = r(L, L, ratio)
        sd[f"{base}.0.conv.bias"] = r(L)
        sd[f"{base}.1.dwconv.conv.weight"] = r(L, 1, 7)
        sd[f"{base}.1.norm.weight"] = np.ones(L, np.float32)
        sd[f"{base}.1.norm.bias"] = np.zeros(L, np.float32)
        sd[f"{base}.1.pwconv1.weight"] = r(4 * L, L)
        sd[f"{base}.1.pwconv1.bias"] = r(4 * L)
        sd[f"{base}.1.pwconv2.weight"] = r(L, 4 * L)
        sd[f"{base}.1.pwconv2.bias"] = r(L)
        sd[f"{base}.1.gamma"] = np.full(L, 0.01, np.float32)
    D = cfg.decoder_dim
    sd["decoder.decoder.0.conv.weight"] = r(D, L, 7)
    sd["decoder.decoder.0.conv.bias"] = r(D)
    for i, rate in enumerate(cfg.upsample_rates):
        ind, outd = D >> i, D >> (i + 1)
        base = f"decoder.decoder.{1 + i}.block"
        sd[f"{base}.0.alpha"] = r(ind)
        sd[f"{base}.0.beta"] = r(ind)
        sd[f"{base}.1.conv.weight"] = r(ind, outd, 2 * rate)
        sd[f"{base}.1.conv.bias"] = r(outd)
        for j in range(3):
            sd[f"{base}.{2 + j}.act1.alpha"] = r(outd)
            sd[f"{base}.{2 + j}.act1.beta"] = r(outd)
            sd[f"{base}.{2 + j}.conv1.conv.weight"] = r(outd, outd, 7)
            sd[f"{base}.{2 + j}.conv1.conv.bias"] = r(outd)
            sd[f"{base}.{2 + j}.act2.alpha"] = r(outd)
            sd[f"{base}.{2 + j}.act2.beta"] = r(outd)
            sd[f"{base}.{2 + j}.conv2.conv.weight"] = r(outd, outd, 1)
            sd[f"{base}.{2 + j}.conv2.conv.bias"] = r(outd)
    nb = len(cfg.upsample_rates)
    od = D >> nb
    sd[f"decoder.decoder.{1 + nb}.alpha"] = r(od)
    sd[f"decoder.decoder.{1 + nb}.beta"] = r(od)
    sd[f"decoder.decoder.{2 + nb}.conv.weight"] = r(1, od, 7)
    sd[f"decoder.decoder.{2 + nb}.conv.bias"] = r(1)
    return sd


class _PB:
    """Minimal ParamBuilder over a plain dict (for tower-only tests)."""

    def __init__(self, sd):
        self.sd = sd

    def has(self, n):
        return n in self.sd

    def raw_f32(self, n):
        return self.sd[n]

    def array(self, n, dtype=None):
        return jnp.asarray(self.sd[n])

    def linear(self, prefix, *, bias="auto", transpose_ok=True):
        from chatllm_tpu.ops.qtensor import DenseLinear
        w = jnp.asarray(self.sd[prefix + ".weight"].T)
        b = self.sd.get(prefix + ".bias")
        return DenseLinear(w=w, bias=None if b is None else jnp.asarray(b))

    def norm(self, prefix, *, bias="auto"):
        p = {"w": jnp.asarray(self.sd[prefix + ".weight"])}
        if prefix + ".bias" in self.sd:
            p["b"] = jnp.asarray(self.sd[prefix + ".bias"])
        return p


def test_codec_decode_chunked_matches_full():
    from chatllm_tpu.nn.qwen_tts_codec import load_qwen_tts_decoder

    cfg = _tiny_codec_cfg()
    sd = _gen_codec_sd(_rng(3), cfg)
    params = load_qwen_tts_decoder(_PB(sd), cfg)
    codes = jnp.asarray(_rng(4).randint(0, cfg.codebook_size,
                                        (12, cfg.num_quantizers)), jnp.int32)
    full = np.asarray(qwen_tts_decode(cfg, params, codes))
    assert full.ndim == 1 and full.shape[0] > 0
    assert np.all(np.isfinite(full)) and np.max(np.abs(full)) <= 1.0
    chunk_all = qwen_tts_chunked_decode(cfg, params, codes, chunk_size=64)
    np.testing.assert_allclose(chunk_all, full, atol=1e-5)
    # the whole decoder stack is causal: a longer code sequence must keep
    # the earlier waveform prefix unchanged (up to right-edge trim effects)
    full2 = np.asarray(qwen_tts_decode(cfg, params, codes[:8]))
    n = full2.shape[0] - 16
    assert n > 0
    np.testing.assert_allclose(full[:n], full2[:n], atol=1e-4)


def test_speaker_encoder_shapes():
    from chatllm_tpu.nn.qwen_tts_codec import (SpeakerEncoderConfig,
                                               load_speaker_encoder,
                                               speaker_encoder_forward)

    rng = _rng(5)
    cfg = SpeakerEncoderConfig(mel_dim=8, enc_dim=12,
                               enc_channels=(16, 16, 16, 16, 48),
                               enc_kernel_sizes=(5, 3, 3, 3, 1),
                               enc_dilations=(1, 2, 3, 4, 1),
                               enc_attention_channels=6,
                               enc_res2net_scale=4, enc_se_channels=6)
    r = lambda *s: (rng.randn(*s) * 0.2).astype(np.float32)
    sd = {}
    sd["speaker_encoder.blocks.0.conv.weight"] = r(16, 8, 5)
    sd["speaker_encoder.blocks.0.conv.bias"] = r(16)
    for i in range(1, 4):
        base = f"speaker_encoder.blocks.{i}"
        sd[f"{base}.tdnn1.conv.weight"] = r(16, 16, 1)
        sd[f"{base}.tdnn1.conv.bias"] = r(16)
        sd[f"{base}.tdnn2.conv.weight"] = r(16, 16, 1)
        sd[f"{base}.tdnn2.conv.bias"] = r(16)
        for j in range(3):
            sd[f"{base}.res2net_block.blocks.{j}.conv.weight"] = r(4, 4, 3)
            sd[f"{base}.res2net_block.blocks.{j}.conv.bias"] = r(4)
        sd[f"{base}.se_block.conv1.weight"] = r(6, 16, 1)
        sd[f"{base}.se_block.conv1.bias"] = r(6)
        sd[f"{base}.se_block.conv2.weight"] = r(16, 6, 1)
        sd[f"{base}.se_block.conv2.bias"] = r(16)
    sd["speaker_encoder.mfa.conv.weight"] = r(48, 48, 1)
    sd["speaker_encoder.mfa.conv.bias"] = r(48)
    sd["speaker_encoder.asp.tdnn.conv.weight"] = r(6, 144, 1)
    sd["speaker_encoder.asp.tdnn.conv.bias"] = r(6)
    sd["speaker_encoder.asp.conv.weight"] = r(48, 6, 1)
    sd["speaker_encoder.asp.conv.bias"] = r(48)
    sd["speaker_encoder.fc.weight"] = r(12, 96, 1)
    sd["speaker_encoder.fc.bias"] = r(12)
    params = load_speaker_encoder(_PB(sd), cfg)
    mel = rng.randn(25, 8).astype(np.float32)
    out = np.asarray(speaker_encoder_forward(cfg, params, jnp.asarray(mel)))
    assert out.shape == (12,)
    assert np.all(np.isfinite(out))


# ---------------------------------------------------------------------------
# end-to-end tiny model
# ---------------------------------------------------------------------------

TV = 260           # text vocab
TALKER_V = 32      # codec vocab (== codebook_size)
HID, HEADS, KV, HD = 32, 4, 2, 8
TEXT_H = 20
CP_H, CP_HEADS, CP_KV = 24, 2, 1


def _write_tts(path):
    rng = _rng(7)
    r = lambda *s: (rng.randn(*s) * 0.1).astype(np.float32)
    cfg = _tiny_codec_cfg()
    meta = {
        "config.json": {
            "tts_bos_token_id": 10, "tts_eos_token_id": 11,
            "tts_pad_token_id": 12,
            "talker_config": {
                "hidden_size": HID, "text_hidden_size": TEXT_H,
                "vocab_size": TALKER_V, "text_vocab_size": TV,
                "codec_bos_id": 1, "codec_eos_token_id": 31,
                "codec_think_id": 2, "codec_nothink_id": 3,
                "codec_pad_id": 4, "codec_think_bos_id": 5,
                "codec_think_eos_id": 30,
                "codec_language_id": {"english": 6},
                "spk_id": {"vivian": 7}, "spk_is_dialect": {},
                "code_predictor_config": {
                    "hidden_size": CP_H, "num_attention_heads": CP_HEADS,
                    "num_key_value_heads": CP_KV, "intermediate_size": 32,
                    "num_hidden_layers": 1, "head_dim": 12,
                    "num_code_groups": 16, "vocab_size": TALKER_V,
                    "max_position_embeddings": 64, "rope_theta": 10000.0,
                    "sliding_window": None},
            },
        },
        "speech_tokenizer-config.json": {"decoder_config": {
            "codebook_size": cfg.codebook_size, "hidden_size": cfg.hidden_size,
            "latent_dim": cfg.latent_dim, "codebook_dim": cfg.codebook_dim,
            "max_position_embeddings": 8000, "rope_theta": 10000.0,
            "num_attention_heads": cfg.num_attention_heads,
            "num_key_value_heads": cfg.num_key_value_heads,
            "attention_bias": 0, "sliding_window": cfg.sliding_window,
            "intermediate_size": cfg.intermediate_size,
            "layer_scale_initial_scale": 0.01, "rms_norm_eps": 1e-5,
            "num_hidden_layers": cfg.num_hidden_layers,
            "num_quantizers": cfg.num_quantizers,
            "upsample_rates": list(cfg.upsample_rates),
            "upsampling_ratios": list(cfg.upsampling_ratios),
            "decoder_dim": cfg.decoder_dim, "head_dim": cfg.head_dim}},
        "tokenizer_config.json": {"added_tokens_decoder": {}},
    }
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.QWEN3_TTS), 1, meta=meta)
        vals = [int(GGMLType.F32), TV, HID, HEADS, 2, 48, 256,
                -1, 0, -1, -1, KV, HD]
        w.write_config(vals, fmt="13i")
        f.write(struct.pack("<ff", 10000.0, -1.0))
        f.write(struct.pack("<6i", -1, 0, -1, -1, -1, 0))
        f.write(struct.pack("<i", 0))
        f.write(struct.pack("<128i", *([0] * 128)))
        f.write(struct.pack("<6i", 2, 1, 1, 0, TEXT_H, TALKER_V))
        w._patch_offset(12)
        pieces = [(p, 1) for p in _bpe_pieces(TV)]
        for j, s in enumerate(["<|endoftext|>", "<|im_start|>", "<|im_end|>"]):
            pieces[TV - 3 + j] = (s.encode(), 4)
        w.write_vocab_bpe(pieces, [])

        sd = {}
        sd["talker.model.codec_embedding.weight"] = r(TALKER_V, HID)
        sd["talker.model.norm.weight"] = np.ones(HID, np.float32)
        # bias the head so greedy decoding always picks codec id 9 (< vocab,
        # not a terminator) — keeps the loop running to max_new_tokens
        head = r(TALKER_V, HID)
        head[9] += 0.0
        head[9, :] = 3.0
        sd["talker.codec_head.weight"] = head
        for i in range(2):
            pfx = f"talker.model.layers.{i}"
            sd[f"{pfx}.input_layernorm.weight"] = np.ones(HID, np.float32)
            sd[f"{pfx}.self_attn.q_proj.weight"] = r(HEADS * HD, HID)
            sd[f"{pfx}.self_attn.k_proj.weight"] = r(KV * HD, HID)
            sd[f"{pfx}.self_attn.v_proj.weight"] = r(KV * HD, HID)
            sd[f"{pfx}.self_attn.o_proj.weight"] = r(HID, HEADS * HD)
            sd[f"{pfx}.self_attn.q_norm.weight"] = np.ones(HD, np.float32)
            sd[f"{pfx}.self_attn.k_norm.weight"] = np.ones(HD, np.float32)
            sd[f"{pfx}.post_attention_layernorm.weight"] = np.ones(HID, np.float32)
            sd[f"{pfx}.mlp.gate_proj.weight"] = r(48, HID)
            sd[f"{pfx}.mlp.up_proj.weight"] = r(48, HID)
            sd[f"{pfx}.mlp.down_proj.weight"] = r(HID, 48)
        sd["talker.model.text_embedding.weight"] = r(TV, TEXT_H)
        sd["talker.text_projection.linear_fc1.weight"] = r(TEXT_H, TEXT_H)
        sd["talker.text_projection.linear_fc1.bias"] = r(TEXT_H)
        sd["talker.text_projection.linear_fc2.weight"] = r(HID, TEXT_H)
        sd["talker.text_projection.linear_fc2.bias"] = r(HID)
        cpb = "talker.code_predictor"
        sd[f"{cpb}.model.norm.weight"] = np.ones(CP_H, np.float32)
        pfx = f"{cpb}.model.layers.0"
        sd[f"{pfx}.input_layernorm.weight"] = np.ones(CP_H, np.float32)
        sd[f"{pfx}.self_attn.q_proj.weight"] = r(CP_HEADS * 12, CP_H)
        sd[f"{pfx}.self_attn.k_proj.weight"] = r(CP_KV * 12, CP_H)
        sd[f"{pfx}.self_attn.v_proj.weight"] = r(CP_KV * 12, CP_H)
        sd[f"{pfx}.self_attn.o_proj.weight"] = r(CP_H, CP_HEADS * 12)
        sd[f"{pfx}.self_attn.q_norm.weight"] = np.ones(12, np.float32)
        sd[f"{pfx}.self_attn.k_norm.weight"] = np.ones(12, np.float32)
        sd[f"{pfx}.post_attention_layernorm.weight"] = np.ones(CP_H, np.float32)
        sd[f"{pfx}.mlp.gate_proj.weight"] = r(32, CP_H)
        sd[f"{pfx}.mlp.up_proj.weight"] = r(32, CP_H)
        sd[f"{pfx}.mlp.down_proj.weight"] = r(CP_H, 32)
        for i in range(15):
            sd[f"{cpb}.model.codec_embedding.{i}.weight"] = r(TALKER_V, HID)
            sd[f"{cpb}.lm_head.{i}.weight"] = r(TALKER_V, CP_H)
        sd[f"{cpb}.small_to_mtp_projection.weight"] = r(CP_H, HID)
        sd[f"{cpb}.small_to_mtp_projection.bias"] = r(CP_H)
        sd.update(_gen_codec_sd(rng, cfg))
        for name, arr in sd.items():
            w.write_tensor(name, arr, GGMLType.F32)


def test_qwen3_tts_synthesis(tmp_path):
    from chatllm_tpu.runtime.generate import GenerationConfig

    p = tmp_path / "tts.bin"
    _write_tts(p)
    m = load_model(str(p), RuntimeConfig(**RT32))
    assert m.talker_vocab == TALKER_V
    assert m.cp_cfg is not None and m.codec_params is not None
    m.set_additional_args({"language": "english", "speaker": "vivian"})
    pcm, sr, ch = m.speech_synthesis(
        "hi", GenerationConfig(do_sample=False, max_new_tokens=48))
    assert sr == 24000 and ch == 1
    assert pcm.dtype == np.int16
    assert pcm.shape[0] > 0          # 3 frames of 16 codes → waveform
    # greedy rerun must be identical
    pcm2, _, _ = m.speech_synthesis(
        "hi", GenerationConfig(do_sample=False, max_new_tokens=48))
    np.testing.assert_array_equal(pcm, pcm2)
