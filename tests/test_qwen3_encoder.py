"""Qwen3-Embedding / Qwen3-ReRanker (reference models/qwen.cpp v3_emb /
v3_ranker): last-token embedding + L2 norm, yes/no-softmax reranking —
HF-golden against Qwen3ForCausalLM hidden states / logits."""
import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.models import ModelType, RuntimeConfig, load_model
from test_model_golden import make_tiny_qwen3

torch = pytest.importorskip("torch")

RT32 = dict(weight_dtype="float32", compute_dtype="float32", cache_dtype="float32")

EXTRA = [(b"<|endoftext|>", 4), (b"<|im_start|>", 4), (b"<|im_end|>", 4),
         (b"yes", 1), (b"no", 1)]


def test_qwen3_embedding_golden(tmp_path):
    path = str(tmp_path / "q3e.bin")
    hf = make_tiny_qwen3(path, model_type=ModelType.QWEN3_Embedding,
                         extra_pieces=EXTRA)
    model = load_model(path, RuntimeConfig(**RT32))
    assert model.embedding_dim == 64
    text = "hello world"
    v = model.embed(text)
    assert v.shape == (64,)
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-5)

    ids = list(text.encode()) + [model.tokenizer.eos_token_id]
    with torch.no_grad():
        h = hf.model(torch.tensor([ids])).last_hidden_state[0, -1].numpy()
    ref = h / np.linalg.norm(h)
    np.testing.assert_allclose(v, ref, atol=2e-4)

    # query purpose uses the instruct prompt -> different vector
    vq = model.embed(text, purpose="query")
    assert abs(float(v @ vq)) < 0.999

    with pytest.raises(TypeError):
        model.engine


def test_qwen3_reranker_golden(tmp_path):
    path = str(tmp_path / "q3r.bin")
    hf = make_tiny_qwen3(path, model_type=ModelType.QWEN3_ReRanker,
                         extra_pieces=EXTRA, max_len=1024)
    model = load_model(path, RuntimeConfig(**RT32))
    tok = model.tokenizer
    yes_id, no_id = tok.tp.piece_to_id("yes"), tok.tp.piece_to_id("no")
    assert yes_id >= 0 and no_id >= 0

    score = model.qa_rank("what is rust", "rust is a language")
    assert 0.0 <= score <= 1.0

    # reproduce with HF on the identical id sequence
    text = (
        '<|im_start|>system\nJudge whether the Document meets the '
        'requirements based on the Query and the Instruct provided. '
        'Note that the answer can only be "yes" or "no".<|im_end|>\n'
        "<|im_start|>user\n"
        f"<Instruct>: {model.task}\n<Query>: what is rust\n"
        f"<Document>: rust is a language"
        "<|im_end|>\n<|im_start|>assistant\n<think>\n\n</think>\n\n")
    ids = tok.encode(text)
    with torch.no_grad():
        logits = hf(torch.tensor([ids])).logits[0, -1]
        two = torch.stack([logits[yes_id], logits[no_id]])
        ref = torch.softmax(two, dim=0)[0].item()
    np.testing.assert_allclose(score, ref, atol=1e-4)
