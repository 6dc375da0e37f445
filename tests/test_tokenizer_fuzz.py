"""Tokenizer fuzz: byte-level BPE with REAL merges (trained in-test via the
`tokenizers` library) → converted through tools/convert.py → our
BPEProcessor2 must agree with the `tokenizers` oracle on a mixed-script fuzz
corpus.  (The same corpus was verified byte-exact against the reference C++
binary's `--tokenize` mode — recorded in BASELINE.md.)"""
import json
import random

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.models import RuntimeConfig, load_model
from chatllm_tpu.tools.convert import convert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
tokenizers = pytest.importorskip("tokenizers")

RT32 = dict(weight_dtype="float32", compute_dtype="float32",
            cache_dtype="float32")


def _fuzz_cases(n=120):
    rng = random.Random(42)
    pools = [
        " abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
        " \t!@#$%^&*()_+-=[]{}|;':\",./<>?`~",
        "你好世界程序设计语言模型中文分词测试",
        "こんにちはカタカナひらがな日本語",
        "안녕하세요한국어토크나이저",
        "ПриветмирРусскийязык",
        "🌍🚀😀🎉🤖❤️👍🔥",
        "αβγδεζηθικλμνξ",
        "çàéèêëïîôùûü",
        "  \n\n\t\t   ",
    ]
    cases = []
    for _ in range(n):
        s = ""
        for _ in range(rng.randint(1, 6)):
            pool = rng.choice(pools)
            s += "".join(rng.choice(pool) for _ in range(rng.randint(1, 12)))
        cases.append(s)
    cases += ["", " ", "   leading spaces", "trailing   ", "a\nb\nc",
              "123456789012345", "don't can't won't", "x" * 200,
              "mixed中文English日本語한국어", "🚀" * 30,
              "def foo(x):\n    return x + 1\n"]
    return cases


def test_bpe2_fuzz_vs_tokenizers_oracle(tmp_path):
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    corpus = [open(__file__, encoding="utf-8").read(),
              "你好世界 こんにちは 안녕하세요 Привет мир 🌍🚀 café naïve résumé " * 80,
              " ".join(_fuzz_cases(60))]
    tk = Tokenizer(models.BPE())
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tk.decoder = decoders.ByteLevel()
    tk.train_from_iterator(corpus, trainers.BpeTrainer(
        vocab_size=1200,
        special_tokens=["<|endoftext|>", "<|im_start|>", "<|im_end|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet()))
    V = tk.get_vocab_size()
    # real Qwen tokenizer.json pre-tokenizer: regex Split then ByteLevel —
    # the same regex our QWEN2 loader applies (models/qwen.py QWEN_REGEX),
    # so the oracle and our processor see identical word boundaries
    from tokenizers import Regex
    qwen_pat = (r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|"
                r"\p{N}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+")
    tk.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(Regex(qwen_pat), behavior="isolated"),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False)])

    d = tmp_path / "hf"
    d.mkdir()
    tk.save(str(d / "tokenizer.json"))
    cfg = transformers.Qwen2Config(
        vocab_size=V, hidden_size=32, num_attention_heads=2,
        num_key_value_heads=1, num_hidden_layers=1, intermediate_size=48,
        max_position_embeddings=64, tie_word_embeddings=False,
        sliding_window=None)
    hf = transformers.Qwen2ForCausalLM(cfg)
    from safetensors.numpy import save_file
    save_file({k: v.detach().float().numpy() for k, v in hf.state_dict().items()},
              str(d / "model.safetensors"))
    cd = json.loads(cfg.to_json_string())
    cd["architectures"] = ["Qwen2ForCausalLM"]
    (d / "config.json").write_text(json.dumps(cd))

    out = str(tmp_path / "m.bin")
    convert(str(d), out, "f32")
    m = load_model(out, RuntimeConfig(**RT32))

    bad = []
    for s in _fuzz_cases(120):
        ours = m.tokenizer.encode(s)
        want = tk.encode(s, add_special_tokens=False).ids
        if ours != want:
            bad.append((s, ours[:20], want[:20]))
    assert not bad, bad[:5]
    # decode roundtrip on a sample
    for s in ("hello world", "mixed中文English", "def foo(x):\n    return 1"):
        assert m.tokenizer.decode(m.tokenizer.encode(s)) == s


def test_native_bpe_matches_python(tmp_path):
    """The C++ BPE merge engine (native/bpe.cpp) must produce byte-identical
    ids to the Python _merge_ranked on adversarial inputs — both decoder
    modes, incl. byte-fallback and invalid UTF-8."""
    import json
    import os
    import random

    import numpy as np
    import transformers
    from safetensors.numpy import save_file

    from chatllm_tpu.models import RuntimeConfig, load_model
    from chatllm_tpu.tools.convert import convert
    from crossbinary_common import train_bpe_tok

    # hermetic trained-merges fixture (round-5: replaces the old /tmp/fuzz
    # leftover from a previous session)
    d = tmp_path / "hf"
    d.mkdir()
    tk = train_bpe_tok()
    tk.save(str(d / "tokenizer.json"))
    V = tk.get_vocab_size()
    cfg = transformers.Qwen2Config(
        vocab_size=V, hidden_size=32, num_attention_heads=2,
        num_key_value_heads=2, num_hidden_layers=1, intermediate_size=32,
        max_position_embeddings=64, tie_word_embeddings=True,
        sliding_window=None, bos_token_id=1, eos_token_id=0)
    hf = transformers.Qwen2ForCausalLM(cfg)
    save_file({k: v.detach().float().numpy()
               for k, v in hf.state_dict().items()},
              str(d / "model.safetensors"))
    cd = json.loads(cfg.to_json_string())
    cd["architectures"] = ["Qwen2ForCausalLM"]
    (d / "config.json").write_text(json.dumps(cd))
    mbin = str(tmp_path / "m.bin")
    convert(str(d), mbin, "f32")

    rt = RuntimeConfig(weight_dtype="float32", compute_dtype="float32",
                       cache_dtype="float32")
    m_nat = load_model(mbin, rt)
    assert m_nat.tokenizer.tp._native_bpe() is not None, \
        "native BPE engine failed to build"
    os.environ["CHATLLM_TPU_NATIVE_BPE"] = "0"
    try:
        m_py = load_model(mbin, rt)
    finally:
        os.environ.pop("CHATLLM_TPU_NATIVE_BPE")
    random.seed(7)
    alph = ["a", "b", "الع", "你", "好", "\n", " ", "  ", "ё", "🙂", "e",
            "s", "t", "̀", "'s", "123", "ab", "\x07", "￿"]
    for _ in range(200):
        s = "".join(random.choice(alph) for _ in range(random.randint(0, 64)))
        assert m_nat.tokenizer.encode(s) == m_py.tokenizer.encode(s), repr(s)


def test_native_spm_matches_python(tmp_path):
    """The C++ SP-score merge (spm_encode) matches BPEProcessor1's Python
    path — score ties, insertion-order tie-break, byte+3 fallback."""
    import os

    from chatllm_tpu.tokenizer.processor import (BPEProcessor1, TokenRecord,
                                                 TokenType)

    # tiny SP vocab with deliberate score ties and multi-byte pieces
    pieces = [(b"<unk>", 0.0), (b"<s>", 0.0), (b"</s>", 0.0)]
    pieces += [(bytes([b]), -100.0) for b in range(0x20, 0x7F)]
    pieces += [(b"he", -1.0), (b"ll", -1.0), (b"lo", -1.0), (b"hell", -2.0),
               (b"hello", -3.0), (b" wo", -1.5), (b"rld", -1.5),
               (b"\xe4\xbd\xa0", -4.0), (b"\xe5\xa5\xbd", -4.0),
               (b"\xe4\xbd\xa0\xe5\xa5\xbd", -3.5)]

    def load_proc():
        tp = BPEProcessor1()
        for i, (tok, score) in enumerate(pieces):
            tp.vocab.token_to_id[tok] = i
            tp.vocab.id_to_token.append(
                TokenRecord(tok=tok, score=score, type=TokenType.NORMAL))
        tp._nbpe = None
        return tp

    import random
    random.seed(3)
    alph = ["hello", "hell", "world", "he", "llo", " ", "你", "好", "你好",
            "x", "~", "\x01"]
    tp_n = load_proc()
    assert tp_n._native_bpe_sp() is not None
    os.environ["CHATLLM_TPU_NATIVE_BPE"] = "0"
    try:
        tp_p = load_proc()
    finally:
        os.environ.pop("CHATLLM_TPU_NATIVE_BPE")
    for _ in range(300):
        s = "".join(random.choice(alph) for _ in range(random.randint(0, 40)))
        a, b = [], []
        tp_n._do_encode(s.encode(), a)
        tp_p._do_encode(s.encode(), b)
        assert a == b, repr(s)
