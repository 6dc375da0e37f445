"""GPT-OSS HF-golden tests: converter -> loader -> forward logits vs
transformers GptOssForCausalLM (ground truth), covering sinks, the
alternating SWA/full layer pattern, YaRN rope, and the biased
softmax-topk swiglu_oai MoE (reference /root/reference/models/gpt.cpp)."""
import json

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.models import ModelType, RuntimeConfig, load_model
from chatllm_tpu.tools.convert import convert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")


@pytest.fixture(scope="module")
def gpt_oss_pair(tmp_path_factory):
    from test_convert import _save_hf_dir

    tmp = tmp_path_factory.mktemp("gptoss")
    torch.manual_seed(11)
    cfg = transformers.GptOssConfig(
        vocab_size=264, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, num_hidden_layers=2,
        intermediate_size=48, num_local_experts=4, num_experts_per_tok=2,
        experts_per_token=2, sliding_window=8,
        layer_types=["sliding_attention", "full_attention"],
        max_position_embeddings=256, rope_theta=150000.0,
        rope_scaling={"rope_type": "yarn", "factor": 2.0,
                      "original_max_position_embeddings": 128,
                      "beta_fast": 32.0, "beta_slow": 1.0},
        tie_word_embeddings=False, swiglu_limit=7.0)
    hf = transformers.GptOssForCausalLM(cfg).eval()
    d = _save_hf_dir(
        tmp, hf, {**cfg.to_dict(), "architectures": ["GptOssForCausalLM"]},
        ["<|start|>", "<|message|>", "<|end|>", "<|channel|>", "<|return|>",
         "<|startoftext|>", "<|endoftext|>", "<pad7>"])
    out = str(tmp / "oss.bin")
    convert(d, out, "f32")
    return hf, out


def test_gpt_oss_logits_match_hf(gpt_oss_pair):
    hf, path = gpt_oss_pair
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.model_type == int(ModelType.GPT_OSS)
    assert model.cfg.moe_score_func == "softmax_topk"
    assert model.cfg.layer_specs[0].sliding_window == 8
    assert model.cfg.layer_specs[1].sliding_window == 0

    ids = np.array([[7, 30, 102, 89, 5, 200, 41, 77, 3, 9, 150, 66]],
                   dtype=np.int32)
    logits, _ = model.forward_logits(ids)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3, rtol=3e-3)


def test_gpt_oss_long_prompt_swa(gpt_oss_pair):
    """Prompt longer than the sliding window exercises the ring mask."""
    hf, path = gpt_oss_pair
    model = load_model(path, RuntimeConfig(**RT32))
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, size=(1, 24), dtype=np.int64)
    logits, _ = model.forward_logits(ids.astype(np.int32))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, atol=3e-3, rtol=3e-3)


def test_gpt_oss_template(gpt_oss_pair):
    _, path = gpt_oss_pair
    model = load_model(path, RuntimeConfig(**RT32))
    tok = model.tokenizer
    ids = []
    tok.chat_encoder.append_sys_prompt(ids)
    tok.chat_encoder.append_user(0, "hi", ids)
    tok.chat_encoder.append_ai_opening(0, ids)
    # <|start|>system<|message|>...<|end|> <|start|>user<|message|>hi<|end|>
    # <|start|>assistant<|message|>
    assert ids.count(tok.start_token_id) == 3
    assert ids.count(tok.message_token_id) == 3
    assert ids.count(tok.end_token_id) == 2
    assert ids[-1] == tok.message_token_id
    assert tok.end_token_id in tok.terminate_ids
