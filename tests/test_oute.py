"""OuteTTS: DAC codec decode (HF-golden vs transformers DacModel) + prompt
processor + end-to-end speech_synthesis smoke (reference models/oute.cpp)."""
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

ENC_DIM, DEC_DIM, CB_SIZE, CB_DIM, N_CB = 8, 32, 16, 4, 2
DOWN = [2, 2, 4, 4]
UP = [4, 4, 2, 2]                       # HF decoder upsamples in reverse

VOCAB, HIDDEN, HEADS, KV, LAYERS, INTER, HEAD_DIM = 340, 64, 4, 2, 2, 96, 16


def make_hf_dac():
    from transformers.models.dac.modeling_dac import DacModel
    from transformers.models.dac.configuration_dac import DacConfig

    torch.manual_seed(31)
    cfg = DacConfig(encoder_hidden_size=ENC_DIM, downsampling_ratios=DOWN,
                    decoder_hidden_size=DEC_DIM, n_codebooks=N_CB,
                    codebook_size=CB_SIZE, codebook_dim=CB_DIM,
                    sampling_rate=24000)
    return DacModel(cfg).eval()


def write_dac(w, dac):
    """OuteTTSConverter dac tensor names (convert.py:8952-8995): original
    descript layout decoder.model.N(.block.M) with `.layers.` inserted.
    HF DacModel's module names are mapped onto that layout."""
    sd = {k: v.detach().float().numpy() for k, v in dac.state_dict().items()}

    def t(name, arr, alpha=False):
        if alpha:
            arr = arr.reshape(arr.shape[1])
        w.write_tensor(name, arr, GGMLType.F32)

    t("dac.decoder.model.layers.0.weight", sd["decoder.conv1.weight"])
    t("dac.decoder.model.layers.0.bias", sd["decoder.conv1.bias"])
    for i in range(len(UP)):
        base = f"dac.decoder.model.layers.{i + 1}.block.layers"
        hb = f"decoder.block.{i}"
        t(f"{base}.0.alpha", sd[f"{hb}.snake1.alpha"], alpha=True)
        t(f"{base}.1.weight", sd[f"{hb}.conv_t1.weight"])
        t(f"{base}.1.bias", sd[f"{hb}.conv_t1.bias"])
        for r in range(3):
            rb = f"{base}.{2 + r}.block.layers"
            hr = f"{hb}.res_unit{r + 1}"
            t(f"{rb}.0.alpha", sd[f"{hr}.snake1.alpha"], alpha=True)
            t(f"{rb}.1.weight", sd[f"{hr}.conv1.weight"])
            t(f"{rb}.1.bias", sd[f"{hr}.conv1.bias"])
            t(f"{rb}.2.alpha", sd[f"{hr}.snake2.alpha"], alpha=True)
            t(f"{rb}.3.weight", sd[f"{hr}.conv2.weight"])
            t(f"{rb}.3.bias", sd[f"{hr}.conv2.bias"])
    n = len(UP)
    t(f"dac.decoder.model.layers.{n + 1}.alpha", sd["decoder.snake1.alpha"],
      alpha=True)
    t(f"dac.decoder.model.layers.{n + 2}.weight", sd["decoder.conv2.weight"])
    t(f"dac.decoder.model.layers.{n + 2}.bias", sd["decoder.conv2.bias"])
    for i in range(N_CB):
        qb = f"dac.quantizer.strides.{i}"
        hq = f"quantizer.quantizers.{i}"
        for p in ("in_proj", "out_proj"):
            t(f"{qb}.{p}.weight", sd[f"{hq}.{p}.weight"])
            t(f"{qb}.{p}.bias", sd[f"{hq}.{p}.bias"])
        t(f"{qb}.codebook.weight", sd[f"{hq}.codebook.weight"])


def _dac_meta():
    return {"dac_config.json": {
        "sampling_rate": 24000, "encoder_hidden_size": ENC_DIM,
        "decoder_hidden_size": DEC_DIM, "codebook_size": CB_SIZE,
        "codebook_dim": CB_DIM, "n_codebooks": N_CB,
        "downsampling_ratios": DOWN, "upsampling_ratios": UP}}


def test_dac_decode_golden(tmp_path):
    import jax.numpy as jnp

    from chatllm_tpu.ggmm.reader import GGMMFile
    from chatllm_tpu.models.base import ParamBuilder
    from chatllm_tpu.nn.snac import SnacConfig, load_snac_params, snac_decode

    dac = make_hf_dac()
    path = str(tmp_path / "dac.bin")
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.OUTE_TTS_QWEN3), 1, meta={})
        w.write_config([int(GGMLType.F32)] + [1] * 12, fmt="13i")
        w.write_vocab_bpe([(b"a", 1)], [])
        write_dac(w, dac)
    gf = GGMMFile.open(path)

    class RT:
        weight_dtype = "float32"
        compute_dtype = "float32"
        re_quantize = None

    cfg = SnacConfig(sampling_rate=24000, decoder_dim=DEC_DIM,
                     decoder_rates=tuple(UP), codebook_size=CB_SIZE,
                     codebook_dim=CB_DIM, vq_strides=(1,) * N_CB,
                     noise=False, depthwise=False, auto_output_padding=False)
    params = load_snac_params(ParamBuilder(gf, RT()), cfg, prefix="dac.")

    rng = np.random.default_rng(9)
    T = 12
    codes = rng.integers(0, CB_SIZE, size=(N_CB, T))
    mine = np.asarray(snac_decode(cfg, params, [codes[0], codes[1]]))

    with torch.no_grad():
        ref = dac.decode(audio_codes=torch.from_numpy(codes[None]))
        ref = ref.audio_values[0].numpy()
    if ref.ndim == 2:
        ref = ref[0]
    assert mine.shape == ref.shape
    err = np.linalg.norm(mine - ref) / max(np.linalg.norm(ref), 1e-9)
    assert err < 2e-3, err


def test_prompt_processor():
    from chatllm_tpu.models.oute import get_completion_prompt

    p = get_completion_prompt("Hello   world…", None)
    assert p == ("<|im_start|><|text_start|>Hello world...<|text_end|>\n"
                 "<|audio_start|>\n")

    speaker = {
        "text": "hi there",
        "words": [{"word": "hi", "duration": 0.25,
                   "features": {"energy": 3, "pitch": 2},
                   "c1": [1, 2], "c2": [3, 4]},
                  {"word": "there", "duration": 0.5, "features": {},
                   "c1": [5], "c2": [6]}],
    }
    p = get_completion_prompt("ok", speaker)
    assert "hi there. ok" in p
    assert "<|word_start|>hi<|features|><|t_0.25|><|energy_3|>" in p
    assert "<|c1_1|><|c2_3|><|c1_2|><|c2_4|>" in p
    assert "there.<|features|>" in p            # separator appended
    assert p.endswith("\n<|word_start|>")


def make_tiny_oute_qwen3(path, dac):
    from chatllm_tpu.tokenizer.processor import byte_level_encode

    torch.manual_seed(32)
    cfg = transformers.Qwen3Config(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_attention_heads=HEADS,
        num_key_value_heads=KV, num_hidden_layers=LAYERS,
        intermediate_size=INTER, head_dim=HEAD_DIM,
        max_position_embeddings=512, tie_word_embeddings=False)
    hf = transformers.Qwen3ForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    specials = ["<|endoftext|>", "<|im_start|>", "<|im_end|>",
                "<|text_start|>", "<|text_end|>", "<|audio_start|>",
                "<|audio_end|>", "<|word_start|>", "<|word_end|>",
                "<|features|>", "<|code|>"]
    specials += [f"<|c1_{i}|>" for i in range(CB_SIZE)]
    specials += [f"<|c2_{i}|>" for i in range(CB_SIZE)]
    meta = {"model_name": "tiny-oute", **_dac_meta()}
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.OUTE_TTS_QWEN3), 1, meta=meta)
        w.write_config([int(GGMLType.F32), VOCAB, HIDDEN, HEADS, LAYERS,
                        INTER, 512, -1, 256, -1, -1, KV, HEAD_DIM], fmt="13i")
        f.write(struct.pack("<ff", 10000.0, -1.0))
        f.write(struct.pack("<6i", -1, 0, -1, -1, -1, 0))
        f.write(struct.pack("<i", 0))
        f.write(struct.pack("<128i", *([0] * 128)))
        w._patch_offset(12)
        pieces = [byte_level_encode(bytes([b])) for b in range(256)]
        pieces += [s.encode() for s in specials]
        pieces += [f"<x{i}>".encode() for i in range(VOCAB - len(pieces))]
        assert len(pieces) == VOCAB
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
        names += ["model.norm.weight", "lm_head.weight"]
        for n in names:
            w.write_tensor(n, sd[n], GGMLType.F32)
        write_dac(w, dac)


def test_speech_synthesis_smoke(tmp_path):
    from chatllm_tpu.runtime.generate import GenerationConfig

    dac = make_hf_dac()
    path = str(tmp_path / "oute.bin")
    make_tiny_oute_qwen3(path, dac)
    model = load_model(path, RuntimeConfig(**RT32))
    tok = model.tokenizer
    assert tok.c1_0_token_id >= 0 and tok.c2_0_token_id >= 0

    pcm, rate, ch = model.speech_synthesis(
        "hello", GenerationConfig(do_sample=False, max_new_tokens=12))
    assert rate == 24000 and ch == 1
    assert pcm.dtype == np.int16

    # direct codec path: feed known c1/c2 tokens
    toks = [tok.c1_0_token_id + 1, tok.c2_0_token_id + 2,
            tok.c1_0_token_id + 3, tok.c2_0_token_id + 4]
    wave = model.decode_codec_tokens(toks)
    assert wave.shape[0] == 2 * np.prod(UP)
