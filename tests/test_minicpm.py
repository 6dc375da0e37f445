"""MiniCPM family: tiny random GGMM fixtures through the full loader →
forward → greedy-generation path for every arch in the family.

No HF class exists in transformers for MiniCPM (remote-code only), so these
are structural tests; the underlying math is golden-tested elsewhere
(residual_scale via Granite, MLA via DeepSeek, LongRoPE via Phi3-SU).
"""
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")

V, H, A, KV, L, F, MAXLEN = 300, 64, 4, 2, 2, 96, 256


def _sp_vocab():
    toks = [(chr(b).encode(), -float(b)) for b in range(256)]
    toks += [(s.encode(), -300.0 - i) for i, s in enumerate(
        ["<|im_start|>", "<|im_end|>", "<s>", "</s>"])]
    toks += [(f"<extra{i}>".encode(), -400.0 - i) for i in range(V - len(toks))]
    return toks


def _bpe_vocab():
    from chatllm_tpu.tokenizer.processor import byte_level_encode

    pieces = [byte_level_encode(bytes([b])).decode("utf-8").encode() for b in range(256)]
    pieces += [s.encode() for s in ["<|im_start|>", "<|im_end|>", "<s>", "</s>"]]
    pieces += [f"<extra{i}>".encode() for i in range(V - len(pieces))]
    return [(p, 1) for p in pieces]


def _rng_w(rng, *shape):
    return (rng.standard_normal(shape).astype(np.float32) * 0.05)


def _llama_tensors(w, rng, *, tie=True):
    w.write_tensor("model.embed_tokens.weight", _rng_w(rng, V, H), GGMLType.F32)
    for i in range(L):
        p = f"model.layers.{i}"
        w.write_tensor(f"{p}.input_layernorm.weight", np.ones(H, np.float32), GGMLType.F32)
        w.write_tensor(f"{p}.self_attn.q_proj.weight", _rng_w(rng, H, H), GGMLType.F32)
        w.write_tensor(f"{p}.self_attn.k_proj.weight", _rng_w(rng, KV * (H // A), H), GGMLType.F32)
        w.write_tensor(f"{p}.self_attn.v_proj.weight", _rng_w(rng, KV * (H // A), H), GGMLType.F32)
        w.write_tensor(f"{p}.self_attn.o_proj.weight", _rng_w(rng, H, H), GGMLType.F32)
        w.write_tensor(f"{p}.post_attention_layernorm.weight", np.ones(H, np.float32), GGMLType.F32)
        w.write_tensor(f"{p}.mlp.gate_proj.weight", _rng_w(rng, F, H), GGMLType.F32)
        w.write_tensor(f"{p}.mlp.up_proj.weight", _rng_w(rng, F, H), GGMLType.F32)
        w.write_tensor(f"{p}.mlp.down_proj.weight", _rng_w(rng, H, F), GGMLType.F32)
    w.write_tensor("model.norm.weight", np.ones(H, np.float32), GGMLType.F32)
    if not tie:
        w.write_tensor("lm_head.weight", _rng_w(rng, V, H), GGMLType.F32)


def _base_vals():
    return [int(GGMLType.F32), V, H, A, L, F, MAXLEN, 2, 3, -1, -1]


def _write(path, mtype, extra_vals, fill, *, bpe=False, seed=0):
    rng = np.random.default_rng(seed)
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(mtype), 1, meta={"model_name": "tiny"})
        w.write_config(_base_vals() + extra_vals)
        if bpe:
            w.write_vocab_bpe(_bpe_vocab(), [])
        else:
            w.write_vocab_sp(_sp_vocab())
        fill(w, rng)
    return str(path)


def _check_chat(path, expect_type, *, gen=True):
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.model_type == expect_type
    ids = np.array([[65, 66, 67, 68, 69]], np.int32)
    logits, _ = model.forward_logits(ids)
    lf = np.asarray(logits)
    assert lf.shape == (1, 5, V) and np.isfinite(lf).all()
    if gen:
        from chatllm_tpu.runtime.generate import GenerationConfig

        out, _, _ = model.engine.generate(
            [65, 66, 67], GenerationConfig(do_sample=False, sampling="greedy",
                                           max_new_tokens=4, temperature=0.0))
        out2, _, _ = model.engine.generate(
            [65, 66, 67], GenerationConfig(do_sample=False, sampling="greedy",
                                           max_new_tokens=4, temperature=0.0))
        assert out == out2 and len(out) > 0
    return model


def test_minicpm_v1(tmp_path):
    p = _write(tmp_path / "m1.bin", ModelType.MINICPM,
               [KV, 1.0, 10000.0, 1.2], lambda w, r: _llama_tensors(w, r, tie=True))
    m = _check_chat(p, ModelType.MINICPM)
    assert m.cfg.residual_scale == pytest.approx(1.2)
    assert m.cfg.tie_lm_head
    from chatllm_tpu.runtime.chat import Messages, MsgRole
    msgs = Messages()
    msgs.push_back(MsgRole.USER, "hi")
    enc = m.tokenizer.encode_history(msgs, 128, ai_opening=True)
    assert enc[0] == m.tokenizer.bos_token_id


def test_minicpm_v2_chatml_ids(tmp_path):
    p = _write(tmp_path / "m2.bin", ModelType.MINICPM2,
               [KV, 1.0, 10000.0, 1.0], lambda w, r: _llama_tensors(w, r, tie=False))
    m = _check_chat(p, ModelType.MINICPM2)
    assert m.tokenizer.im_end_token_id == 257
    assert 257 in m.tokenizer.terminate_ids


def test_minicpm_moe(tmp_path):
    E = 4

    def fill(w, rng):
        w.write_tensor("model.embed_tokens.weight", _rng_w(rng, V, H), GGMLType.F32)
        for i in range(L):
            p = f"model.layers.{i}"
            w.write_tensor(f"{p}.input_layernorm.weight", np.ones(H, np.float32), GGMLType.F32)
            w.write_tensor(f"{p}.self_attn.q_proj.weight", _rng_w(rng, H, H), GGMLType.F32)
            w.write_tensor(f"{p}.self_attn.k_proj.weight", _rng_w(rng, KV * (H // A), H), GGMLType.F32)
            w.write_tensor(f"{p}.self_attn.v_proj.weight", _rng_w(rng, KV * (H // A), H), GGMLType.F32)
            w.write_tensor(f"{p}.self_attn.o_proj.weight", _rng_w(rng, H, H), GGMLType.F32)
            w.write_tensor(f"{p}.post_attention_layernorm.weight", np.ones(H, np.float32), GGMLType.F32)
            w.write_tensor(f"{p}.mlp.gate.weight", _rng_w(rng, E, H), GGMLType.F32)
            for j in range(E):
                w.write_tensor(f"{p}.mlp.experts.{j}.w1.weight", _rng_w(rng, F, H), GGMLType.F32)
                w.write_tensor(f"{p}.mlp.experts.{j}.w2.weight", _rng_w(rng, H, F), GGMLType.F32)
                w.write_tensor(f"{p}.mlp.experts.{j}.w3.weight", _rng_w(rng, F, H), GGMLType.F32)
        w.write_tensor("model.norm.weight", np.ones(H, np.float32), GGMLType.F32)

    p = _write(tmp_path / "moe.bin", ModelType.MINICPM_MoE,
               [KV, E, 2, 1.0, 10000.0, 1.0], fill)
    m = _check_chat(p, ModelType.MINICPM_MoE)
    assert m.cfg.moe_num_experts == E and m.cfg.moe_top_k == 2


def test_minicpm3_mla_longrope(tmp_path):
    kv_lora, q_lora, dn, dr, dv = 32, 48, 16, 8, 16
    orig_max = 64                 # < MAXLEN => long factors active

    def fill(w, rng):
        w.write_tensor("model.embed_tokens.weight", _rng_w(rng, V, H), GGMLType.F32)
        for i in range(L):
            p = f"model.layers.{i}"
            w.write_tensor(f"{p}.input_layernorm.weight", np.ones(H, np.float32), GGMLType.F32)
            w.write_tensor(f"{p}.self_attn.d_q_proj.weight", _rng_w(rng, q_lora, H), GGMLType.F32)
            w.write_tensor(f"{p}.self_attn.q_norm.weight", np.ones(q_lora, np.float32), GGMLType.F32)
            w.write_tensor(f"{p}.self_attn.u_q_proj.weight", _rng_w(rng, A * (dn + dr), q_lora), GGMLType.F32)
            w.write_tensor(f"{p}.self_attn.d_kv_proj.weight", _rng_w(rng, kv_lora, H), GGMLType.F32)
            w.write_tensor(f"{p}.self_attn.k_pe_proj.weight", _rng_w(rng, dr, H), GGMLType.F32)
            w.write_tensor(f"{p}.self_attn.kv_norm.weight", np.ones(kv_lora, np.float32), GGMLType.F32)
            w.write_tensor(f"{p}.self_attn.u_k_nope_proj.weight", _rng_w(rng, A * dn, kv_lora), GGMLType.F32)
            w.write_tensor(f"{p}.self_attn.u_v_proj.weight", _rng_w(rng, A * dv, kv_lora), GGMLType.F32)
            w.write_tensor(f"{p}.self_attn.o_proj.weight", _rng_w(rng, H, A * dv), GGMLType.F32)
            w.write_tensor(f"{p}.post_attention_layernorm.weight", np.ones(H, np.float32), GGMLType.F32)
            w.write_tensor(f"{p}.mlp.gate_proj.weight", _rng_w(rng, F, H), GGMLType.F32)
            w.write_tensor(f"{p}.mlp.up_proj.weight", _rng_w(rng, F, H), GGMLType.F32)
            w.write_tensor(f"{p}.mlp.down_proj.weight", _rng_w(rng, H, F), GGMLType.F32)
        w.write_tensor("model.norm.weight", np.ones(H, np.float32), GGMLType.F32)

    extra = [KV, kv_lora, q_lora, dn, dr, orig_max, dv, 32,
             1.0] + [1.0] * 16 + [2.0] * 16
    p = _write(tmp_path / "m3.bin", ModelType.MINICPM3, extra, fill)
    m = _check_chat(p, ModelType.MINICPM3)
    assert m.cfg.mla is not None and m.cfg.mla.q_lora_rank == q_lora
    # long factors selected (max_len 256 > orig 64) with mscale > 1
    assert m.cfg.rope.freq_factors == tuple([2.0] * (dr // 2))
    assert m.cfg.rope.mscale_all > 1.0


def test_minicpm4_longrope(tmp_path):
    orig_max = 64
    extra = ([KV, MAXLEN, orig_max, 1, 32] +
             [0.0, 0.25, 10000.0, 1.1] + [1.0] * 128 + [3.0] * 128)
    p = _write(tmp_path / "m4.bin", ModelType.MINICPM4, extra,
               lambda w, r: _llama_tensors(w, r, tie=True))
    m = _check_chat(p, ModelType.MINICPM4)
    half = H // A // 2
    assert m.cfg.rope.freq_factors == tuple([3.0] * half)
    assert m.cfg.residual_scale == pytest.approx(1.1)


def test_minicpm5(tmp_path):
    p = _write(tmp_path / "m5.bin", ModelType.MINICPM5,
               [KV, H // A, 0, 1.0, 100000.0],
               lambda w, r: _llama_tensors(w, r, tie=False), bpe=True)
    m = _check_chat(p, ModelType.MINICPM5)
    assert m.cfg.rope.freq_base == 100000.0


def test_minicpm_embedding_light(tmp_path):
    extra = [KV, 64, 10000.0, 1.0] + [1.0] * 32 + [2.0] * 32
    p = _write(tmp_path / "emb.bin", ModelType.MiniCPM_Embedding_Light,
               extra, lambda w, r: _llama_tensors(w, r, tie=True))
    m = load_model(p, RuntimeConfig(**RT32))
    assert not m.cfg.causal
    e = m.embed("hello world")
    assert e.shape == (H,)
    assert np.isclose(np.linalg.norm(e), 1.0, atol=1e-5)
    # embedding is deterministic and text-sensitive
    assert np.allclose(e, m.embed("hello world"))
    assert not np.allclose(e, m.embed("a different text entirely"))


def test_minicpm_reranker_light(tmp_path):
    def fill(w, rng):
        _llama_tensors(w, rng, tie=True)
        w.write_tensor("score.weight", _rng_w(rng, 1, H), GGMLType.F32)

    extra = [KV, 64, 10000.0, 1.0] + [1.0] * 32 + [2.0] * 32
    p = _write(tmp_path / "rr.bin", ModelType.MiniCPM_ReRanker_Light,
               extra, fill)
    m = load_model(p, RuntimeConfig(**RT32))
    s = m.qa_rank("what is the capital?", "the capital city is large")
    assert 0.0 < s < 1.0
    assert s == pytest.approx(m.qa_rank("what is the capital?",
                                        "the capital city is large"))
