"""Block-diffusion LMs: WEDLM (packed-mask denoising, qwen3 arch) and
LLaDA2 (block-bidirectional attention, bailing-moe2 arch)."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model
from chatllm_tpu.runtime.generate import GenerationConfig
from test_model_golden import _bpe_pieces, make_tiny_qwen3

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")


def test_wedlm_accept_all_fills_block_per_forward(tmp_path):
    """With threshold below every confidence the whole block is accepted in
    one denoise round: one forward per block (plus prefill/settle runs),
    deterministic greedy output."""
    path = str(tmp_path / "wedlm.bin")
    make_tiny_qwen3(path, model_type=ModelType.WEDLM)
    m = load_model(path, RuntimeConfig(
        additional={"block_size": "8", "threshold": "-1.0"}, **RT32))
    m.mask_tok_id = 255          # inside the tiny vocab
    assert m.block_size == 8 and m.accept_algo == "custom"

    calls = []
    orig = m._fwd

    def spy(seq, cache, n_past, positions=None, mask_extra=None):
        calls.append((list(np.ravel(seq)), list(np.ravel(positions))))
        return orig(seq, cache, n_past, positions=positions,
                    mask_extra=mask_extra)

    m._fwd = spy
    prompt = [5, 77, 101, 32]
    out, _, _ = m.generate(prompt, GenerationConfig(max_new_tokens=6,
                                                    do_sample=False))
    assert len(out) == 6
    # call 0: prefill; call 1: 8-mask block with positions 4..11; the
    # masked rows carry their ORIGINAL positions (TensorPosHelper)
    assert calls[0][0] == prompt and calls[0][1] == [0, 1, 2, 3]
    assert calls[1][0] == [255] * 8
    assert calls[1][1] == list(range(4, 12))

    # deterministic across runs
    m._fwd = orig
    out2, _, _ = m.generate(prompt, GenerationConfig(max_new_tokens=6,
                                                     do_sample=False))
    assert out == out2


def test_wedlm_reject_all_transfers_one(tmp_path):
    """threshold above 1: every position is rejected, so exactly one
    (best-prob) position transfers per forward — generation still makes
    progress (hunyuan.cpp wedlm: transferred<1 fallback)."""
    path = str(tmp_path / "wedlm2.bin")
    make_tiny_qwen3(path, model_type=ModelType.WEDLM)
    m = load_model(path, RuntimeConfig(
        additional={"block_size": "4", "threshold": "2.0"}, **RT32))
    m.mask_tok_id = 255
    out, _, _ = m.generate([5, 9], GenerationConfig(max_new_tokens=4,
                                                    do_sample=False))
    assert len(out) == 4


V = 260


def _write_llada(path, rng, layers=2, hidden=64, heads=4, n_kv=2, inter=96):
    head_dim = hidden // heads
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.LLADA2), 1,
                       meta={"config.json": {"mask_token_id": V - 1}})
        # BailingMoE2 EXTRA_FMT "8ifi3if"; first_k_dense = layers (all dense)
        vals = [int(GGMLType.F32), V, hidden, heads, layers, inter, 128,
                -1, 0, -1, -1,
                n_kv, layers, 32, 1, 4, 1, 1, 2]
        w.write_config(vals, fmt=f"{len(vals)}i")
        f.write(struct.pack("<fi3if", 10000.0, head_dim, head_dim, 1, 1, 1.0))
        w._patch_offset(12)
        w.write_vocab_bpe([(p, 1) for p in _bpe_pieces(V)], [])

        def t(name, arr):
            w.write_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

        t("model.embed_tokens.weight", rng.standard_normal((V, hidden)) * 0.1)
        t("model.norm.weight", np.ones(hidden))
        t("lm_head.weight", rng.standard_normal((V, hidden)) * 0.1)
        for i in range(layers):
            pfx = f"model.layers.{i}"
            t(f"{pfx}.input_layernorm.weight", np.ones(hidden))
            t(f"{pfx}.post_attention_layernorm.weight", np.ones(hidden))
            t(f"{pfx}.self_attn.q_proj.weight",
              rng.standard_normal((heads * head_dim, hidden)) * 0.1)
            t(f"{pfx}.self_attn.k_proj.weight",
              rng.standard_normal((n_kv * head_dim, hidden)) * 0.1)
            t(f"{pfx}.self_attn.v_proj.weight",
              rng.standard_normal((n_kv * head_dim, hidden)) * 0.1)
            t(f"{pfx}.self_attn.o_proj.weight",
              rng.standard_normal((hidden, heads * head_dim)) * 0.1)
            t(f"{pfx}.self_attn.q_norm.weight", np.ones(head_dim))
            t(f"{pfx}.self_attn.k_norm.weight", np.ones(head_dim))
            for mj, shp in (("gate_proj", (inter, hidden)),
                            ("up_proj", (inter, hidden)),
                            ("down_proj", (hidden, inter))):
                t(f"{pfx}.mlp.{mj}.weight", rng.standard_normal(shp) * 0.1)


def test_llada2_block_bidirectional_mask(tmp_path):
    rng = np.random.default_rng(51)
    path = str(tmp_path / "llada.bin")
    _write_llada(path, rng, layers=1)
    m = load_model(path, RuntimeConfig(additional={"block_length": "4"}, **RT32))
    assert m.block_length == 4 and not m.cfg.causal

    # within a block, attention is bidirectional: changing the LAST token
    # of block 0 changes the FIRST position's logits
    a = [3, 9, 50, 7]
    b = [3, 9, 50, 99]
    la, _ = m.forward_logits(np.array([a], np.int32))
    lb, _ = m.forward_logits(np.array([b], np.int32))
    assert not np.allclose(np.asarray(la)[0, 0], np.asarray(lb)[0, 0],
                           atol=1e-4)

    # across blocks it stays causal: changing block 2 leaves block 1 alone
    c = a + [11, 12, 13, 14]
    d = a + [11, 12, 13, 90]
    lc, _ = m.forward_logits(np.array([c], np.int32))
    ld, _ = m.forward_logits(np.array([d], np.int32))
    np.testing.assert_allclose(np.asarray(lc)[0, :4], np.asarray(ld)[0, :4],
                               atol=1e-5)
    assert not np.allclose(np.asarray(lc)[0, 4], np.asarray(ld)[0, 4],
                           atol=1e-4)


def test_llada2_generate(tmp_path):
    rng = np.random.default_rng(52)
    path = str(tmp_path / "llada2.bin")
    _write_llada(path, rng)
    m = load_model(path, RuntimeConfig(
        additional={"block_length": "4", "steps": "4",
                    "threshold": "0.99"}, **RT32))
    out, _, n_past = m.generate([3, 9, 50, 7, 12],
                                GenerationConfig(max_new_tokens=8, seed=1,
                                                 temperature=0.8,
                                                 do_sample=True))
    assert 1 <= len(out) <= 8
    out2, _, _ = m.generate([3, 9, 50, 7, 12],
                            GenerationConfig(max_new_tokens=8, seed=1,
                                             temperature=0.8, do_sample=True))
    assert out == out2
