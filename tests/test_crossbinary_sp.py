"""Cross-binary SP-score tokenizer fuzz: a converted mistral GGMM with a
synthesized score vocab (+byte-fallback span) must tokenize byte-identically
in the reference binary's `--tokenize` and our BPEProcessor1 (which runs the
native spm engine when built).  Full 123-case run recorded in BASELINE.md §5;
this regression keeps a fast subset."""
import json
import os
import random
import subprocess

import pytest

import conftest  # noqa: F401

REF_BIN = os.environ.get("CHATLLM_REF_BIN", "/tmp/refbuild/bin/main")

pytestmark = pytest.mark.skipif(
    not (os.path.isfile(REF_BIN) and os.access(REF_BIN, os.X_OK)),
    reason="reference binary not available")


def test_sp_tokenizer_matches_reference_binary(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from test_convert import _save_hf_dir

    from chatllm_tpu.models import RuntimeConfig, load_model
    from chatllm_tpu.tools.convert import convert

    pieces = [["<unk>", 0.0], ["<s>", 0.0], ["</s>", 0.0]]
    pieces += [[bytes([b]).decode("latin1"), -100.0] for b in range(256)]
    words = [" hello", "hel", "lo", " wor", "ld", " the", "the", " a",
             "ing", "tion", " of", "er", "an", " test", "te", "st",
             " you", "你", "好", "你好", " 你好", "ello", "wo", "rld",
             "llo", " he", "h", "e", "l", "o", " ", "  ", "\n"]
    for i, wd in enumerate(words):
        pieces.append([wd, -1.0 - 0.37 * i])
    V = len(pieces)

    torch.manual_seed(60)
    cfg = transformers.MistralConfig(
        vocab_size=V, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=1, intermediate_size=96,
        max_position_embeddings=128, sliding_window=None,
        bos_token_id=1, eos_token_id=2)
    hf = transformers.MistralForCausalLM(cfg).eval()
    d = _save_hf_dir(tmp_path, hf,
                     {**cfg.to_dict(),
                      "architectures": ["MistralForCausalLM"]}, [])
    (tmp_path / "hf" / "tokenizer.json").write_text(json.dumps(
        {"model": {"type": "Unigram", "vocab": pieces}}, ensure_ascii=False))
    out = str(tmp_path / "m.bin")
    convert(d, out, "f32")
    m = load_model(out, RuntimeConfig(weight_dtype="float32",
                                      compute_dtype="float32",
                                      cache_dtype="float32"))

    alph = ["hello", "world", " ", "the", "a", "testing", "tion", "你好",
            "你", "\n", "of", "an", "err", "st", "  ", "~", "\x01", "é"]
    random.seed(5)
    cases = ["hello world", "the testing of an apple", "你好 world\nhello"]
    for _ in range(22):
        cases.append("".join(random.choice(alph)
                             for _ in range(random.randint(0, 30))))
    for s in cases:
        r = subprocess.run([REF_BIN, "-m", out, "--tokenize", "-p", s],
                           capture_output=True, text=True, timeout=300)
        ref = None
        for line in r.stdout.splitlines():
            if line.startswith("ID: "):
                ref = [int(x) for x in
                       line[4:].strip().strip(",").split(",") if x.strip()]
        assert ref == m.tokenizer.encode(s), repr(s)
