"""AlphaGeometry LM (models/alphageo.cpp): Meliad attention semantics —
past-only keys, window limit, safe softmax (first token gets zero
context), " ;" terminator."""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")

V = 64
H, HEADS, INTER, LAYERS = 32, 4, 48, 2
NB, MAXD, WIN = 8, 16, 4


def _vocab():
    toks = [(b"<unk>", -10.0)]
    toks += [(bytes([97 + i % 26]) * (1 + i // 26), -1.0 - i)
             for i in range(V - 2)]
    toks += [(b" ;", -0.5)]
    return toks


def _write(path, rng, zero_attn=False, layers=LAYERS):
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.ALPHAGEO_LM), 1, meta={})
        vals = [int(GGMLType.F32), V, H, HEADS, layers, INTER, 64,
                -1, -1, -1, -1, WIN, MAXD, NB]
        w.write_config(vals, fmt=f"{len(vals)}i")
        w._patch_offset(12)
        w.write_vocab_sp(_vocab())

        def t(name, arr):
            w.write_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

        t("model.embed_tokens.weight", rng.standard_normal((V, H)) * 0.3)
        t("model.norm.weight", np.ones(H))
        for i in range(layers):
            pfx = f"model.layers.{i}"
            t(f"{pfx}.input_layernorm.weight", np.ones(H))
            t(f"{pfx}.post_attention_layernorm.weight", np.ones(H))
            t(f"{pfx}.rel_embedding.weight",
              rng.standard_normal((NB, HEADS)) * 0.2)
            t(f"{pfx}.self_attn.attention_scale.weight", np.full(HEADS, 2.0))
            for pj in ("q_proj", "k_proj", "v_proj", "o_proj"):
                arr = rng.standard_normal((H, H)) * 0.2
                if zero_attn:
                    arr = np.zeros_like(arr)
                t(f"{pfx}.self_attn.{pj}.weight", arr)
            t(f"{pfx}.mlp.hidden0.weight", rng.standard_normal((INTER, H)) * 0.2)
            t(f"{pfx}.mlp.output_layer.weight", rng.standard_normal((H, INTER)) * 0.2)


def test_alphageo_first_token_zero_context(tmp_path):
    """n_past=0: every key is masked and the safe softmax yields all-zero
    probs — the attention output is exactly zero, so first-token logits
    must not depend on the attention weights at all."""
    rng1 = np.random.default_rng(31)
    p1 = str(tmp_path / "a.bin")
    _write(p1, rng1)
    rng2 = np.random.default_rng(31)
    p2 = str(tmp_path / "b.bin")
    _write(p2, rng2, zero_attn=True)   # same stream order -> same non-attn weights

    m1 = load_model(p1, RuntimeConfig(**RT32))
    m2 = load_model(p2, RuntimeConfig(**RT32))
    ids = np.array([[5]], dtype=np.int32)
    l1, _ = m1.forward_logits(ids)
    l2, _ = m2.forward_logits(ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)

    # ...but with history the attention weights DO matter
    ids2 = np.array([[5, 9, 11]], dtype=np.int32)
    l1b, _ = m1.forward_logits(ids2)
    l2b, _ = m2.forward_logits(ids2)
    assert not np.allclose(np.asarray(l1b)[0, -1], np.asarray(l2b)[0, -1],
                           atol=1e-3)


def test_alphageo_window_and_past_only(tmp_path):
    rng = np.random.default_rng(32)
    path = str(tmp_path / "w.bin")
    # single layer: layer-0 keys depend only on their own embedding, so an
    # out-of-window token change cannot leak through intermediate keys
    _write(path, rng, layers=1)
    m = load_model(path, RuntimeConfig(**RT32))

    # window: position p attends to keys in [p-WIN, p-1] only; changing a
    # token older than that leaves the last logits unchanged.
    base = [3, 7, 9, 12, 15, 20, 22]          # len 7, last pos p=6
    far = list(base)
    far[0] = 40                                # pos 0 < 6-WIN=2 -> invisible
    near = list(base)
    near[4] = 40                               # pos 4 in [2, 5] -> visible
    lb, _ = m.forward_logits(np.array([base], np.int32))
    lf, _ = m.forward_logits(np.array([far], np.int32))
    ln, _ = m.forward_logits(np.array([near], np.int32))
    np.testing.assert_allclose(np.asarray(lb)[0, -1], np.asarray(lf)[0, -1],
                               atol=1e-5)
    assert not np.allclose(np.asarray(lb)[0, -1], np.asarray(ln)[0, -1],
                           atol=1e-4)


def test_alphageo_generate_terminates_on_semicolon(tmp_path):
    from chatllm_tpu.runtime.generate import GenerationConfig

    rng = np.random.default_rng(33)
    path = str(tmp_path / "g.bin")
    _write(path, rng)
    m = load_model(path, RuntimeConfig(**RT32))
    assert m.tokenizer.comma_tok_id == V - 1
    assert m.tokenizer.comma_tok_id in m.tokenizer.terminate_ids
    out, _, _ = m.generate([3, 7], GenerationConfig(max_new_tokens=8,
                                                    do_sample=False),
                           is_terminator=m.tokenizer.is_terminate_token)
    assert len(out) <= 8
    assert all(t != m.tokenizer.comma_tok_id for t in out)
