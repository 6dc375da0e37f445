"""Shared cross-binary golden-test protocol (round-5 VERDICT #4).

The reference C++ binary (built at /tmp/refbuild/bin/main, or
$CHATLLM_REF_BIN) is the ONLY oracle for ~40 zoo archs with no native HF
class.  The protocol proven on gemma4 + qwen2 f32/q8_0/q4_k
(tests/test_crossbinary_gemma4.py, test_crossbinary_quant.py):

  1. train a real-merges byte-BPE vocab in-test (hermetic — no /tmp
     fixtures), or synthesize an SP-score vocab for SP-family loaders;
  2. random-init HF-layout weights, x3-amplified so greedy argmax margins
     dwarf f32 accumulation-order noise (ggml vs XLA);
  3. damp non-UTF8 pieces + terminators out of the argmax (the reference
     streamer buffers incomplete UTF-8; early EOS truncates the compare);
  4. convert with tools/convert.py, run BOTH binaries greedy on the same
     prompt, require token-exact agreement.
"""
import json
import os
import subprocess

REF_BIN = os.environ.get("CHATLLM_REF_BIN", "/tmp/refbuild/bin/main")


def have_ref_bin() -> bool:
    return os.path.isfile(REF_BIN) and os.access(REF_BIN, os.X_OK)


# ---------------------------------------------------------------------------
# vocabs
# ---------------------------------------------------------------------------

_TOK_CACHE = {}


def train_bpe_tok():
    """Trained-merges byte-level BPE (Qwen pre-tokenizer regex); cached per
    process — training is ~2s."""
    if "bpe" in _TOK_CACHE:
        return _TOK_CACHE["bpe"]
    from tokenizers import (Regex, Tokenizer, decoders, models,
                            pre_tokenizers, trainers)

    from test_tokenizer_fuzz import _fuzz_cases

    code = ("def encode(text, ids): return tokenizer.encode(text) "
            "for i in range(n): print(hello world, vocab[idx]) "
            "import numpy as np x = np.zeros((128, 128)) " * 40)
    corpus = [code,
              "你好世界 こんにちは 안녕하세요 Привет мир 🌍🚀 café naïve résumé " * 80,
              " ".join(_fuzz_cases(60))]
    tk = Tokenizer(models.BPE())
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tk.decoder = decoders.ByteLevel()
    tk.train_from_iterator(corpus, trainers.BpeTrainer(
        vocab_size=1200,
        special_tokens=["<|endoftext|>", "<|im_start|>", "<|im_end|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet()))
    qwen_pat = (r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|"
                r"\p{N}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+")
    tk.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(Regex(qwen_pat), behavior="isolated"),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False)])
    _TOK_CACHE["bpe"] = tk
    return tk


def bpe_tok_json() -> dict:
    """The trained tokenizer as a tokenizer.json dict (hermetic replacement
    for the old /tmp/fuzz/hf/tokenizer.json fixture)."""
    return json.loads(train_bpe_tok().to_str())


def sp_vocab_json(extra_specials=()) -> dict:
    """Synthesized SP-score Unigram vocab with byte fallback for SP-family
    loaders (mistral/baichuan/chatglm1 class; protocol from
    tests/test_crossbinary_sp.py)."""
    uni = [["<unk>", 0.0], ["<s>", 0.0], ["</s>", 0.0]]
    uni += [[f"<0x{b:02X}>", -1000.0 - b] for b in range(256)]
    words = ["hello", "world", "the", "story", "ring", "code", "model",
             "data", "test", "value", "token", "text", "time", "line"]
    for i, w in enumerate(words):
        uni.append(["▁" + w, -10.0 - i])
        uni.append([w, -40.0 - i])
    for s in extra_specials:
        uni.append([s, 0.0])
    return {"version": "1.0", "added_tokens": [],
            "model": {"type": "Unigram", "unk_id": 0, "vocab": uni,
                      "byte_fallback": True}}


# ---------------------------------------------------------------------------
# checkpoint builder
# ---------------------------------------------------------------------------

def amplify_state_dict(sd: dict, tok_json: dict | None, *,
                       amp: float = 3.0,
                       head_keys=("lm_head.weight",)) -> dict:
    """x-amplify matrices, damp unprintable/terminator rows of the output
    head (protocol step 2+3).  sd values are numpy arrays."""
    from chatllm_tpu.tokenizer.processor import byte_level_decode

    out = {}
    for k, v in sd.items():
        a = v
        if a.ndim >= 2 and "norm" not in k and "ln" not in k:
            a = a * amp
        out[k] = a
    if tok_json is None:
        return out
    is_bpe = tok_json["model"]["type"] == "BPE"
    vocab = (tok_json["model"]["vocab"].items() if is_bpe else
             [(p, i) for i, (p, _s) in
              enumerate(tok_json["model"]["vocab"])])
    for hk in head_keys:
        if hk not in out:
            continue
        lm = out[hk].copy()
        for piece, idx in vocab:
            if idx >= lm.shape[0]:
                continue
            if is_bpe:
                bad = idx < 3
                if not bad:
                    try:
                        txt = byte_level_decode(piece.encode()).decode("utf-8")
                        bad = len(txt.strip()) == 0
                    except UnicodeDecodeError:
                        bad = True
            else:
                txt = piece.replace("▁", " ")
                bad = (piece.startswith("<") or len(txt.strip()) == 0)
            if bad:
                lm[idx] *= 0.01
        out[hk] = lm
    return out


def write_hf_dir(d, cfg_dict: dict, sd: dict, tok_json: dict) -> str:
    """Write config.json + model.safetensors + tokenizer.json."""
    from safetensors.numpy import save_file

    os.makedirs(str(d), exist_ok=True)
    save_file({k: v for k, v in sd.items()}, os.path.join(str(d), "model.safetensors"))
    with open(os.path.join(str(d), "config.json"), "w") as f:
        json.dump(cfg_dict, f)
    with open(os.path.join(str(d), "tokenizer.json"), "w",
              encoding="utf-8") as f:
        json.dump(tok_json, f, ensure_ascii=False)
    return str(d)


# ---------------------------------------------------------------------------
# both-binary greedy runners
# ---------------------------------------------------------------------------

def ref_chat(path: str, prompt: str, n_new: int = 8,
             extra: list[str] | None = None) -> str:
    r = subprocess.run([REF_BIN, "-m", path, "-p", prompt,
                        "--max_new_tokens", str(n_new), "--temp", "0"]
                       + (extra or []),
                       capture_output=True, text=True, timeout=600)
    out = r.stdout
    j = out.find("timings")
    return out[: j if j > 0 else None].strip()


def our_chat(path: str, capsys, prompt: str, n_new: int = 8,
             extra: list[str] | None = None) -> str:
    from chatllm_tpu.main import main

    rc = main(["-m", path, "-p", prompt, "--max_new_tokens", str(n_new),
               "--temp", "0", "--compute_dtype", "float32",
               "--cache_dtype", "float32"] + (extra or []))
    assert rc == 0
    out = capsys.readouterr().out
    for line in out.splitlines():
        if line.startswith("A.I. > "):
            return line[len("A.I. > "):].strip()
    raise AssertionError(f"no A.I. line in:\n{out}")


def assert_cross_parity(path: str, capsys, prompt: str = "hello world",
                        n_new: int = 8, extra_ref=None, extra_ours=None):
    want = ref_chat(path, prompt, n_new, extra_ref)
    got = our_chat(path, capsys, prompt, n_new, extra_ours)
    assert want, f"reference produced no text for {path}"
    assert got == want, (path, got, want)
