"""Qwen3-ASR AuT tower (HF-golden vs Qwen3OmniMoeAudioEncoder) + ASR/
ForcedAligner flows (reference models/qwen_asr.{h,cpp}, qwen.cpp v3_asr /
v3_forcedaligner)."""
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

N_MELS, A_HID, A_LAYERS, A_HEADS, A_FFN, DSH = 32, 32, 2, 2, 48, 16
N_WINDOW, N_WINDOW_INFER = 50, 200
VOCAB, HIDDEN, HEADS, KV, LAYERS, INTER, HEAD_DIM = 330, 64, 4, 2, 2, 96, 16
CLASSIFY_NUM = 24

SPECIALS = ["<|endoftext|>", "<|im_start|>", "<|im_end|>", "<|audio_start|>",
            "<|audio_end|>", "<asr_text>", "<timestamp>"]


def make_hf_tower():
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import \
        Qwen3OmniMoeAudioEncoderConfig
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import \
        Qwen3OmniMoeAudioEncoder

    torch.manual_seed(21)
    cfg = Qwen3OmniMoeAudioEncoderConfig(
        num_mel_bins=N_MELS, encoder_layers=A_LAYERS,
        encoder_attention_heads=A_HEADS, encoder_ffn_dim=A_FFN,
        d_model=A_HID, output_dim=HIDDEN, n_window=N_WINDOW,
        n_window_infer=N_WINDOW_INFER, conv_chunksize=500,
        downsample_hidden_size=DSH, max_source_positions=1500)
    enc = Qwen3OmniMoeAudioEncoder(cfg).eval()
    enc.config._attn_implementation = "eager"
    return enc


def write_tower(w, enc):
    """Qwen3ASRConverter audio tower names (convert.py:6168-6204)."""
    sd = {k: v.detach().float().numpy() for k, v in enc.state_dict().items()}
    for j in (1, 2, 3):
        w.write_tensor(f"audio.conv2d{j}.weight", sd[f"conv2d{j}.weight"],
                       GGMLType.F32)
        w.write_tensor(f"audio.conv2d{j}.bias", sd[f"conv2d{j}.bias"],
                       GGMLType.F32)
    w.write_tensor("audio.conv_out.weight", sd["conv_out.weight"], GGMLType.F32)
    w.write_tensor("audio.ln_post.weight", sd["ln_post.weight"], GGMLType.F32)
    w.write_tensor("audio.ln_post.bias", sd["ln_post.bias"], GGMLType.F32)
    for p, hf in (("proj1", "proj1"), ("proj2", "proj2")):
        w.write_tensor(f"multi_modal_projector.{p}.weight", sd[f"{hf}.weight"],
                       GGMLType.F32)
        w.write_tensor(f"multi_modal_projector.{p}.bias", sd[f"{hf}.bias"],
                       GGMLType.F32)
    for i in range(A_LAYERS):
        pfx = f"layers.{i}"
        m = {"input_layernorm": "self_attn_layer_norm",
             "post_attention_layernorm": "final_layer_norm"}
        for ours, theirs in m.items():
            for part in ("weight", "bias"):
                w.write_tensor(f"audio.{pfx}.{ours}.{part}",
                               sd[f"{pfx}.{theirs}.{part}"], GGMLType.F32)
        for ours, theirs in (("q_proj", "self_attn.q_proj"),
                             ("k_proj", "self_attn.k_proj"),
                             ("v_proj", "self_attn.v_proj"),
                             ("o_proj", "self_attn.out_proj")):
            for part in ("weight", "bias"):
                w.write_tensor(f"audio.{pfx}.self_attn.{ours}.{part}",
                               sd[f"{pfx}.{theirs}.{part}"], GGMLType.F32)
        for ours, theirs in (("fc0", "fc1"), ("fc1", "fc2")):
            for part in ("weight", "bias"):
                w.write_tensor(f"audio.{pfx}.mlp.{ours}.{part}",
                               sd[f"{pfx}.{theirs}.{part}"], GGMLType.F32)


def make_tiny_asr(path, enc, model_type=ModelType.QWEN3_ASR):
    from test_model_golden import make_tiny_qwen3  # reuse LLM weights pattern
    from chatllm_tpu.tokenizer.processor import byte_level_encode

    torch.manual_seed(22)
    cfg = transformers.Qwen3Config(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_attention_heads=HEADS,
        num_key_value_heads=KV, num_hidden_layers=LAYERS,
        intermediate_size=INTER, head_dim=HEAD_DIM,
        max_position_embeddings=512, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False)
    hf = transformers.Qwen3ForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    aligner = model_type == ModelType.QWEN3_ForcedAligner
    meta = {
        "model_name": "tiny-q3asr",
        "config.json": {
            "support_languages": ["Chinese", "English"],
            "timestamp_segment_time": 0.08,
            "thinker_config": {
                "audio_config": {
                    "num_mel_bins": N_MELS, "d_model": A_HID,
                    "encoder_layers": A_LAYERS,
                    "encoder_attention_heads": A_HEADS,
                    "encoder_ffn_dim": A_FFN,
                    "downsample_hidden_size": DSH, "n_window": N_WINDOW,
                    "n_window_infer": N_WINDOW_INFER, "conv_chunksize": 500,
                    "max_source_positions": 1500,
                },
            },
        },
        "preprocessor_config.json": {"sampling_rate": 16000,
                                     "feature_size": N_MELS},
        "tokenizer_config.json": {"added_tokens_decoder": {
            str(256 + i): {"content": s} for i, s in enumerate(SPECIALS)}},
    }
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(model_type), 1, meta=meta)
        w.write_config([int(GGMLType.F32), VOCAB, HIDDEN, HEADS, LAYERS,
                        INTER, 512, -1, 256, -1, -1, KV, HEAD_DIM], fmt="13i")
        f.write(struct.pack("<ff", 10000.0, -1.0))
        f.write(struct.pack("<6i", -1, 0, -1, -1, -1, 0))
        f.write(struct.pack("<i", 0))
        f.write(struct.pack("<128i", *([0] * 128)))
        f.write(struct.pack("<4i", 8, 0, 0, 0))          # mrope_section pad
        if aligner:
            f.write(struct.pack("<i", CLASSIFY_NUM))
        w._patch_offset(12)
        pieces = [byte_level_encode(bytes([b])) for b in range(256)]
        pieces += [s.encode() for s in SPECIALS]
        pieces += [f"<x{i}>".encode() for i in range(VOCAB - len(pieces))]
        w.write_vocab_bpe([(p, 1) for p in pieces], [])

        names = ["model.embed_tokens.weight"]
        for i in range(LAYERS):
            names += [f"model.layers.{i}.{n}" for n in [
                "input_layernorm.weight",
                "self_attn.q_proj.weight", "self_attn.k_proj.weight",
                "self_attn.v_proj.weight", "self_attn.o_proj.weight",
                "self_attn.q_norm.weight", "self_attn.k_norm.weight",
                "post_attention_layernorm.weight",
                "mlp.gate_proj.weight", "mlp.up_proj.weight",
                "mlp.down_proj.weight"]]
        names += ["model.norm.weight"]
        for n in names:
            w.write_tensor(n, sd[n], GGMLType.F32)
        if aligner:
            rng = np.random.default_rng(5)
            w.write_tensor("lm_head.weight",
                           rng.standard_normal((CLASSIFY_NUM, HIDDEN))
                           .astype(np.float32) * 0.1, GGMLType.F32)
        else:
            w.write_tensor("lm_head.weight", sd["lm_head.weight"], GGMLType.F32)
        write_tower(w, enc)
    return hf


@pytest.fixture(scope="module")
def tower():
    return make_hf_tower()


@pytest.mark.parametrize("T", [240, 100, 137])
def test_aut_tower_golden(tower, T, tmp_path):
    """Chunked conv subsampling + per-chunk positions + windowed attention
    vs HF Qwen3OmniMoeAudioEncoder (tail chunk exercises ragged select)."""
    import jax.numpy as jnp

    from chatllm_tpu.nn.audio import AuTConfig, aut_feat_out_len, aut_forward
    from chatllm_tpu.models.base import ParamBuilder

    path = str(tmp_path / "t.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.QWEN3_ASR), 1, meta={})
        w.write_config([int(GGMLType.F32)] + [1] * 12, fmt="13i")
        w._patch_offset(12)
        w.write_vocab_bpe([(b"a", 1)], [])
        write_tower(w, tower)

    from chatllm_tpu.ggmm.reader import GGMMFile
    gf = GGMMFile.open(path)
    cfg = AuTConfig(n_mels=N_MELS, hidden_size=A_HID,
                    num_hidden_layers=A_LAYERS, num_attention_heads=A_HEADS,
                    intermediate_size=A_FFN, output_dim=HIDDEN,
                    downsample_hidden_size=DSH, n_window=N_WINDOW,
                    n_window_infer=N_WINDOW_INFER)

    class RT:
        weight_dtype = "float32"
        compute_dtype = "float32"
        re_quantize = None

    from chatllm_tpu.nn.audio import load_aut_params
    params = load_aut_params(ParamBuilder(gf, RT()), cfg)

    # mel padded the way the runtime does (tail to a multiple of 8)
    T8 = (T // 100) * 100 + -(-(T % 100) // 8) * 8
    rng = np.random.default_rng(T)
    mel = rng.standard_normal((T8, N_MELS)).astype(np.float32)

    mine = np.asarray(aut_forward(cfg, params, jnp.asarray(mel)))
    assert mine.shape[0] == aut_feat_out_len(T8)

    ref = _hf_tower_ref(tower, mel, T8)
    assert mine.shape == ref.shape
    err = np.linalg.norm(mine - ref) / max(np.linalg.norm(ref), 1e-9)
    assert err < 2e-3, err


def _hf_tower_ref(tower, mel, T8):
    """HF Qwen3OmniMoeAudioEncoder.forward replicated with the windowed
    block mask applied (the FA2 cu_seqlens semantics; HF's eager path drops
    the mask — transformers 4.57 modeling_qwen3_omni_moe.py:760 calls the
    layer without attention_mask)."""
    import torch.nn.functional as F
    from torch.nn.utils.rnn import pad_sequence

    w2 = 2 * N_WINDOW
    with torch.no_grad():
        feats = torch.from_numpy(mel.T)
        lens = [w2] * (T8 // w2) + ([T8 % w2] if T8 % w2 else [])
        chunks = feats.T.split(lens, dim=0)
        padded = pad_sequence(chunks, batch_first=True).transpose(1, 2).unsqueeze(1)
        h = F.gelu(tower.conv2d1(padded))
        h = F.gelu(tower.conv2d2(h))
        h = F.gelu(tower.conv2d3(h))
        b, c, f, t = h.size()
        h = tower.conv_out(h.permute(0, 3, 1, 2).contiguous().view(b, t, c * f))
        h = h + tower.positional_embedding.positional_embedding[:t].unsqueeze(0)
        mask_rows = pad_sequence(
            [torch.ones(-(-L // 8), dtype=torch.bool) for L in lens],
            batch_first=True)
        h = h[mask_rows]
        S = h.shape[0]
        win = t * (N_WINDOW_INFER // w2)
        seg = torch.arange(S) // win
        block = seg[:, None] == seg[None, :]
        attn_mask = torch.where(block, 0.0, torch.finfo(torch.float32).min)
        attn_mask = attn_mask[None, None]
        cu = torch.tensor([0, S], dtype=torch.int32)
        for layer in tower.layers:
            h = layer(h, cu, attention_mask=attn_mask)[0]
        h = tower.ln_post(h)
        h = tower.proj2(tower.act(tower.proj1(h)))
    return h.numpy()


@pytest.fixture(scope="module")
def asr(tower, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("asr") / "tiny_asr.bin")
    make_tiny_asr(path, tower)
    return load_model(path, RuntimeConfig(**RT32))


def test_transcribe_smoke(asr):
    from chatllm_tpu.runtime.generate import GenerationConfig

    pcm = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(np.float32)
    out = asr.chat_audio(pcm, language="english",
                         gen_config=GenerationConfig(do_sample=False,
                                                     max_new_tokens=4))
    assert isinstance(out, str)
    assert asr.normalize_lang("chinese") == "Chinese"
    assert asr.normalize_lang("klingon") == ""


def test_forced_aligner(tower, tmp_path):
    path = str(tmp_path / "tiny_aligner.bin")
    make_tiny_asr(path, tower, model_type=ModelType.QWEN3_ForcedAligner)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.classify_num == CLASSIFY_NUM

    pcm = np.sin(np.linspace(0, 220 * 2 * np.pi, 16000)).astype(np.float32)
    spans = model.align(pcm, "hello world", language="English")
    assert len(spans) == 2
    for sent, start, end in spans:
        assert isinstance(sent, str)
        assert 0.0 <= start <= model.timestamp_segment_time * CLASSIFY_NUM
        assert 0.0 <= end <= model.timestamp_segment_time * CLASSIFY_NUM


def test_fix_timestamp():
    from chatllm_tpu.models.qwen3_asr import fix_timestamp

    # monotone passes through
    assert fix_timestamp([0.0, 1.0, 2.0]) == [0.0, 1.0, 2.0]
    # short anomaly snaps to nearest normal neighbour
    out = fix_timestamp([0.0, 1.0, 0.5, 2.0, 3.0])
    assert out[2] in (1.0, 2.0)
    # long anomaly run is linearly interpolated
    out = fix_timestamp([0.0, 10.0, 9.0, 8.0, 7.0, 20.0])
    assert out == sorted(out)
    assert fix_timestamp([]) == []
