"""Golden logit tests: tiny random-weight models written as GGMM files,
loaded through the full framework path (loader → repack → forward), compared
against HuggingFace transformers (torch CPU) as the oracle.

This is the test layer the reference lacks (SURVEY.md §4): the reference
"tests" by manual dump comparison (convert.py DumpModule); here it's
automated per architecture.
"""
import os

import numpy as np
import pytest

import conftest  # noqa: F401  (sets JAX_PLATFORMS=cpu + 8 virtual devices)

import jax.numpy as jnp

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _sp_vocab(n):
    """Minimal SP-style vocab for the tokenizer span (unused in logit tests)."""
    toks = [(f"<tok{i}>".encode(), -float(i)) for i in range(n)]
    return toks


def make_tiny_qwen2(path, *, vocab=256, hidden=64, heads=4, kv_heads=2,
                    layers=2, inter=128, max_len=128, dtype=GGMLType.F32,
                    seed=0, extra_pieces=None):
    """Write a tiny Qwen2 GGMM file + return the HF model with same weights."""
    torch.manual_seed(seed)
    cfg = transformers.Qwen2Config(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_key_value_heads=kv_heads, num_hidden_layers=layers,
        intermediate_size=inter, max_position_embeddings=max_len,
        rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
        attention_dropout=0.0,
    )
    hf = transformers.Qwen2ForCausalLM(cfg).eval()

    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.QWEN2), 1, meta={"model_name": "tiny-qwen2"})
        # Config: BaseConfig 11i + n_kv, sliding_window + rope_theta
        w.write_config(
            [int(GGMLType.F32), vocab, hidden, heads, layers, inter, max_len,
             -1, 0, -1, -1, kv_heads, max_len], fmt="13i")
        import struct
        f.write(struct.pack("<f", 10000.0))
        w._patch_offset(12)
        # vocab = the 256-char byte-level alphabet (so any text encodes)
        from chatllm_tpu.tokenizer.processor import byte_level_encode
        pieces = [byte_level_encode(bytes([b])).decode("utf-8").encode("utf-8")
                  for b in range(256)]
        extras = list(extra_pieces or [])
        pieces += [(extras[i].encode() if i < len(extras)
                    else f"<extra{i}>".encode())
                   for i in range(vocab - 256)]
        w.write_vocab_bpe([(p, 1) for p in pieces], [])
        names = ["model.embed_tokens.weight"]
        for i in range(layers):
            names += [
                f"model.layers.{i}.self_attn.k_proj.weight",
                f"model.layers.{i}.self_attn.k_proj.bias",
                f"model.layers.{i}.self_attn.q_proj.weight",
                f"model.layers.{i}.self_attn.q_proj.bias",
                f"model.layers.{i}.self_attn.v_proj.weight",
                f"model.layers.{i}.self_attn.v_proj.bias",
                f"model.layers.{i}.self_attn.o_proj.weight",
                f"model.layers.{i}.input_layernorm.weight",
                f"model.layers.{i}.post_attention_layernorm.weight",
                f"model.layers.{i}.mlp.down_proj.weight",
                f"model.layers.{i}.mlp.up_proj.weight",
                f"model.layers.{i}.mlp.gate_proj.weight",
            ]
        names += ["model.norm.weight", "lm_head.weight"]
        for n in names:
            arr = sd[n]
            # norm weights / biases stay f32 in the file like the converter
            t = dtype if arr.ndim == 2 else GGMLType.F32
            w.write_tensor(n, arr, t)
    return hf


@pytest.mark.parametrize("dtype", [GGMLType.F32, GGMLType.Q8_0, GGMLType.Q4_K])
def test_qwen2_logits_match_hf(tmp_path, dtype):
    path = str(tmp_path / "tiny_qwen2.bin")
    hf = make_tiny_qwen2(path, dtype=dtype)

    rt = RuntimeConfig(weight_dtype="float32", compute_dtype="float32",
                       cache_dtype="float32")
    model = load_model(path, rt)

    ids = np.array([[3, 17, 42, 99, 7, 250, 11, 0]], dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    ours = np.asarray(logits)[0]

    with torch.no_grad():
        if dtype == GGMLType.F32:
            ref_model = hf
        else:
            # quantize→dequantize HF weights with the same codec so the
            # oracle sees the same numbers our loader reconstructs
            from chatllm_tpu.ggmm.quants import dequantize, quantize
            sd = hf.state_dict()
            new_sd = {}
            for k, v in sd.items():
                if v.ndim == 2:
                    raw = quantize(v.float().numpy(), dtype)
                    new_sd[k] = torch.from_numpy(
                        dequantize(raw, dtype, v.shape).copy())
                else:
                    new_sd[k] = v
            ref_model = transformers.Qwen2ForCausalLM(hf.config).eval()
            ref_model.load_state_dict(new_sd)
        ref = ref_model(torch.from_numpy(ids.astype(np.int64))).logits[0].float().numpy()

    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)


def test_qwen2_incremental_decode_matches_full(tmp_path):
    """prefill+decode_step KV-cache path == full-sequence forward."""
    path = str(tmp_path / "tiny_qwen2.bin")
    make_tiny_qwen2(path)
    rt = RuntimeConfig(weight_dtype="float32", compute_dtype="float32",
                       cache_dtype="float32")
    model = load_model(path, rt)

    ids = [3, 17, 42, 99, 7, 250]
    full_logits, _ = model.forward_logits(np.array([ids], np.int32))
    full_last = np.asarray(full_logits)[0, -1]

    eng = model.engine
    cache = eng.new_cache(1, 64)
    # feed one token at a time through the cached path
    logits = None
    n_past = 0
    for t in ids:
        logits, cache, n_past = eng.prefill([t], cache, n_past)
    inc_last = np.asarray(logits)[0]
    np.testing.assert_allclose(inc_last, full_last, atol=1e-4, rtol=1e-4)


def test_generate_greedy_deterministic(tmp_path):
    path = str(tmp_path / "tiny_qwen2.bin")
    make_tiny_qwen2(path)
    rt = RuntimeConfig(weight_dtype="float32", compute_dtype="float32",
                       cache_dtype="float32")
    model = load_model(path, rt)
    from chatllm_tpu.runtime.generate import GenerationConfig

    gen = GenerationConfig(do_sample=False, max_new_tokens=8)
    out1, _, _ = model.generate([3, 17, 42], gen)
    out2, _, _ = model.generate([3, 17, 42], gen)
    assert out1 == out2
    assert len(out1) == 8


def test_quantized_kv_cache_close_to_fp(tmp_path):
    """int8 KV cache (--cache_dtype q8_0 analog) stays close to the fp cache
    and generates the same greedy tokens on the tiny model."""
    path = str(tmp_path / "tiny_qkv.bin")
    make_tiny_qwen2(path)
    rt_fp = RuntimeConfig(weight_dtype="float32", compute_dtype="float32",
                          cache_dtype="float32")
    rt_q8 = RuntimeConfig(weight_dtype="float32", compute_dtype="float32",
                          cache_dtype="q8_0")
    m_fp = load_model(path, rt_fp)
    m_q8 = load_model(path, rt_q8)
    ids = [3, 17, 42, 99, 7, 250]

    lo_fp, _ = m_fp.forward_logits(np.array([ids], np.int32))
    lo_q8, _ = m_q8.forward_logits(np.array([ids], np.int32))
    a, b = np.asarray(lo_fp), np.asarray(lo_q8)
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 2e-2, rel

    from chatllm_tpu.runtime.generate import GenerationConfig

    gen = GenerationConfig(do_sample=False, max_new_tokens=8)
    out_fp, _, _ = m_fp.generate(ids, gen)
    out_q8, _, _ = m_q8.generate(ids, gen)
    # random-weight logit gaps are tiny, so int8 cache noise may flip late
    # tokens; the leading tokens must agree
    assert out_fp[:3] == out_q8[:3]


def test_chunked_attention_matches_dense():
    """Long-context online-softmax path == dense attention path."""
    import jax.numpy as jnp

    from chatllm_tpu.ops import attention as A

    rng = np.random.default_rng(5)
    B, T, Hq, Hkv, D, S = 1, 8, 4, 2, 16, 4096
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32) * 0.3)
    n_past = 3000

    old = A.CHUNKED_ATTN_THRESHOLD
    try:
        A.CHUNKED_ATTN_THRESHOLD = 1 << 30       # force dense
        dense = np.asarray(A.attention_with_cache(
            q, k, v, n_past, T, scale=D ** -0.5))
        A.CHUNKED_ATTN_THRESHOLD = 1             # force chunked
        chunked = np.asarray(A.attention_with_cache(
            q, k, v, n_past, T, scale=D ** -0.5))
    finally:
        A.CHUNKED_ATTN_THRESHOLD = old
    np.testing.assert_allclose(chunked, dense, atol=2e-5, rtol=2e-5)

    # with sliding window + softcap
    try:
        A.CHUNKED_ATTN_THRESHOLD = 1 << 30
        dense = np.asarray(A.attention_with_cache(
            q, k, v, n_past, T, scale=D ** -0.5, sliding_window=512,
            logit_softcap=30.0))
        A.CHUNKED_ATTN_THRESHOLD = 1
        chunked = np.asarray(A.attention_with_cache(
            q, k, v, n_past, T, scale=D ** -0.5, sliding_window=512,
            logit_softcap=30.0))
    finally:
        A.CHUNKED_ATTN_THRESHOLD = old
    np.testing.assert_allclose(chunked, dense, atol=2e-5, rtol=2e-5)
