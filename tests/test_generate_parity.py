"""End-to-end generation parity vs HF `generate` (ground truth).

Greedy decoding through the FULL stack — converter → loader → Pipeline
(prefill buckets, on-device lax.scan decode blocks, on-device sampling) —
must reproduce `hf.generate(do_sample=False)` token-for-token at f32.

This is the framework-level analog of the driver's "PPL within 0.05 of the
reference" metric (BASELINE.json): with no pretrained checkpoints or
network in this environment, token-exact greedy agreement with HF on a
random-init model is the strictest available numerics check (every logits
argmax must agree at every step).  The round-2 `--temp 0` CLI bug (temp 0
didn't force greedy, reference src/main.cpp does) was caught by exactly
this comparison.

Also measures PPL drift across quantizations (f32 -> q8_0 -> q4_k must be
monotone and small on the same corpus) via tools/ppl.py.
"""
import json

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.models import RuntimeConfig, load_model
from chatllm_tpu.runtime.generate import GenerationConfig
from chatllm_tpu.tools.convert import convert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")


@pytest.fixture(scope="module")
def qwen2_pair(tmp_path_factory):
    from test_convert import _byte_vocab_json, _save_hf_dir

    tmp = tmp_path_factory.mktemp("genpar")
    torch.manual_seed(21)
    cfg = transformers.Qwen2Config(
        vocab_size=260, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=96,
        max_position_embeddings=512, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False)
    hf = transformers.Qwen2ForCausalLM(cfg).eval()
    with torch.no_grad():
        hf.lm_head.weight.mul_(8.0)     # decisive argmax gaps
    d = _save_hf_dir(tmp, hf, {**cfg.to_dict(), "architectures": ["Qwen2ForCausalLM"]},
                     ["<|endoftext|>", "<|im_start|>", "<|im_end|>", "<pad3>"])
    out = str(tmp / "q2.bin")
    convert(d, out, "f32")
    return hf, out


def test_greedy_matches_hf_token_for_token(qwen2_pair):
    hf, path = qwen2_pair
    model = load_model(path, RuntimeConfig(**RT32))

    prompt = "tell me a story"
    ids = [b for b in prompt.encode()]          # byte vocab: id == byte
    with torch.no_grad():
        ref = hf.generate(torch.tensor([ids]), max_new_tokens=24,
                          do_sample=False)[0, len(ids):].tolist()

    gcfg = GenerationConfig(do_sample=False, sampling="greedy",
                            max_new_tokens=24, temperature=0.0)
    out, _, _ = model.engine.generate(ids, gcfg)
    assert out == ref, f"ours {out} != HF {ref}"


def test_greedy_matches_hf_through_pipeline(qwen2_pair):
    """Same but through Pipeline.text_completion (streamer, CLI path)."""
    from chatllm_tpu.runtime.pipeline import Pipeline

    hf, path = qwen2_pair
    model = load_model(path, RuntimeConfig(**RT32))
    pipe = Pipeline(model)
    pipe.gen_config = GenerationConfig(do_sample=False, sampling="greedy",
                                       max_new_tokens=16, temperature=0.0)
    prompt = "the quick brown fox"
    text = pipe.text_completion(prompt)
    ids = [b for b in prompt.encode()]
    with torch.no_grad():
        ref = hf.generate(torch.tensor([ids]), max_new_tokens=16,
                          do_sample=False)[0, len(ids):].tolist()
    ref_text = model.tokenizer.decode(ref)
    assert text == ref_text


def test_cli_temp0_forces_greedy():
    """`-t 0` must select greedy sampling (reference src/main.cpp)."""
    from chatllm_tpu.main import Args, build_gen_config

    a = Args()
    a.temp = 0.0
    g = build_gen_config(a)
    assert g.do_sample is False and g.sampling == "greedy"
    a.temp = 0.7
    g = build_gen_config(a)
    assert g.do_sample is True


def test_ppl_quantization_drift(qwen2_pair, tmp_path):
    """PPL on the same corpus must degrade gracefully with quantization:
    |ppl(q8_0) - ppl(f32)| small, |ppl(q4_k)| bounded (analog of the
    reference's stated q4_k/q8_0 PPL deltas)."""
    from test_convert import _byte_vocab_json, _save_hf_dir
    from chatllm_tpu.tools.ppl import perplexity

    hf, _ = qwen2_pair
    tmp = tmp_path
    d = _save_hf_dir(tmp, hf, {**hf.config.to_dict(),
                               "architectures": ["Qwen2ForCausalLM"]},
                     ["<|endoftext|>", "<|im_start|>", "<|im_end|>", "<pad3>"])
    corpus = ("the quick brown fox jumps over the lazy dog. " * 30)
    ppls = {}
    for quant in ("f32", "q8_0", "q4_k"):
        out = str(tmp / f"m_{quant}.bin")
        convert(d, out, quant)
        m = load_model(out, RuntimeConfig(**RT32))
        ppls[quant] = perplexity(m, corpus, ctx=128)["ppl"]
    # random model => ppl ~ vocab_size; quantization must not blow it up
    assert abs(ppls["q8_0"] - ppls["f32"]) / ppls["f32"] < 0.02, ppls
    assert abs(ppls["q4_k"] - ppls["f32"]) / ppls["f32"] < 0.20, ppls
