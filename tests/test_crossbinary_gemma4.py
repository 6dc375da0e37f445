"""Cross-binary Gemma4 validation: tiny GGMM files written by our writer are
loaded by the REFERENCE C++ binary (when available) and must produce the
same tokenization and the same greedy continuations.

Requires a built reference binary (skipped otherwise).  The full bisect run
(2026-08-17, /tmp/bisect_g4.py) validated each mechanism one at a time:
all-full, all-SWA, global-head-dim + k-as-v (both kv-head counts), cascaded
MoE, per-layer embeddings, KV-sharing, and most combinations matched the
reference's greedy output token-for-token; the few residual divergences had
~0.01 argmax margins on a 30-softcap logit scale — f32 accumulation-order
noise, not logic differences."""
import json
import os
import struct
import subprocess

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType
from chatllm_tpu.ggmm.writer import GGMMWriter
from chatllm_tpu.models import ModelType, RuntimeConfig, load_model
from chatllm_tpu.tokenizer.processor import byte_level_decode

REF_BIN = os.environ.get("CHATLLM_REF_BIN", "/tmp/refbuild/bin/main")
# hermetic since round 5: the trained vocab is built in-process
# (crossbinary_common.train_bpe_tok); a pre-existing /tmp fuzz fixture is
# used when present only to keep byte-compat with old interactive runs
FUZZ_TOK = "/tmp/fuzz/hf/tokenizer.json"

pytestmark = pytest.mark.skipif(
    not (os.path.isfile(REF_BIN) and os.access(REF_BIN, os.X_OK)),
    reason="reference binary not available")

RT32 = dict(weight_dtype="float32", compute_dtype="float32",
            cache_dtype="float32")
MAXL = 128


def _pieces_and_merges():
    if os.path.isfile(FUZZ_TOK):
        tok = json.load(open(FUZZ_TOK))
    else:
        from crossbinary_common import bpe_tok_json

        tok = bpe_tok_json()
    vocab = sorted(tok["model"]["vocab"].items(), key=lambda kv: kv[1])
    # raw-text vocab: gemma4's Sequence decoder skips byte-level mapping
    raw = [byte_level_decode(p.encode()) for p, _ in vocab]
    merges = []
    for m in tok["model"]["merges"]:
        a, b = (m.split(" ", 1) if isinstance(m, str) else m)
        merges.append(byte_level_decode(a.encode()).decode("utf-8", "replace")
                      + " " +
                      byte_level_decode(b.encode()).decode("utf-8", "replace"))
    import test_gemma4 as tg
    specials = tg._gemma4_specials()
    pieces = [(p, 1) for p in raw] + [(s.encode(), 4) for s in specials]
    return pieces, merges


def _write(path, pieces, merges, *, layers, pattern, n_shared, moe, ple,
           k_eq_v, ghd, gkv):
    import test_gemma4 as tg

    tg.V = len(pieces)
    tg.SWA = 512              # the reference templates only 512/1024 windows
    tg.GKV = gkv
    sd = tg._gen_state(tg._rng(0), layers, pattern, n_kv_shared=n_shared,
                       k_eq_v=k_eq_v, moe=moe, ple=ple)
    # amplify weights so greedy margins dwarf f32 ordering noise, and keep
    # non-utf8 pieces out of the argmax so the reference streamer's
    # incomplete-byte buffering cannot hide output
    sd = {k: (v * 3.0 if v.ndim >= 2 and not k.endswith("norm.weight")
              else v) for k, v in sd.items()}
    emb = sd["model.embed_tokens.weight"].copy()
    for i, (piece, _t) in enumerate(pieces):
        try:
            ok = len(piece.decode("utf-8").strip()) > 0
        except UnicodeDecodeError:
            ok = False
        if not ok:
            emb[i] *= 0.01
    sd["model.embed_tokens.weight"] = emb

    swa_arr = list(pattern) + [0] * (MAXL - layers)
    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.GEMMA4), 1, meta={})
        vals = [int(GGMLType.F32), tg.V, tg.HID, tg.HEADS, layers, tg.INTER,
                128, 2, 1, 0, -1]
        vals += [k_eq_v, ghd, tg.HD, tg.DPL if ple else 0,
                 tg.MOE_INTER if moe else -1, tg.NEXP if moe else -1,
                 gkv, tg.KV, n_shared, tg.SWA, tg.TOPK if moe else -1, 1]
        vals += swa_arr
        w.write_config(vals, fmt=f"{len(vals)}i")
        f.write(struct.pack("<4f", 30.0, 0.5, 1000000.0, 10000.0))
        w._patch_offset(12)
        w.write_vocab_bpe(pieces, merges)
        for name, arr in sd.items():
            w.write_tensor(name, arr, GGMLType.F32)


def _ref_completion(path, prompt, n):
    r = subprocess.run([REF_BIN, "-m", path, "-p", prompt,
                        "--max_new_tokens", str(n), "--temp", "0",
                        "--format", "completion"],
                       capture_output=True, text=True, timeout=600)
    out = r.stdout
    j = out.find("timings")
    return out[: j if j > 0 else None].strip()


def _our_completion(m, prompt, n):
    ids = [2] + m.tokenizer.encode(prompt)   # reference completion adds BOS
    cur, out = list(ids), []
    for _ in range(n):
        lg, _ = m.forward_logits(cur)
        nxt = int(np.argmax(np.asarray(lg)[0][-1]))
        out.append(nxt)
        cur.append(nxt)
    return m.tokenizer.decode(out).strip()


CASES = [
    # name, layers, pattern, n_shared, moe, ple, k_eq_v, gkv
    ("kv_shared", 4, [0, 0, 0, 0], 2, False, False, 0, 1),
    ("moe_keqv",  2, [0, 0],       0, True,  False, 1, 1),
    ("ple_mixed", 2, [1, 0],       0, False, True,  1, 1),
]


@pytest.mark.parametrize("name,layers,pattern,nsh,moe,ple,keqv,gkv", CASES)
def test_gemma4_greedy_matches_reference_binary(tmp_path, name, layers,
                                                pattern, nsh, moe, ple,
                                                keqv, gkv):
    import test_gemma4 as tg

    ghd = tg.GHD
    pieces, merges = _pieces_and_merges()
    path = str(tmp_path / f"{name}.bin")
    _write(path, pieces, merges, layers=layers, pattern=pattern,
           n_shared=nsh, moe=moe, ple=ple, k_eq_v=keqv, ghd=ghd, gkv=gkv)
    m = load_model(path, RuntimeConfig(**RT32))
    # tokenization byte-exact
    r = subprocess.run([REF_BIN, "-m", path, "--tokenize", "-p",
                        "hello world"], capture_output=True, text=True,
                       timeout=600)
    ref_ids = None
    for line in r.stdout.splitlines():
        if line.startswith("ID: "):
            ref_ids = [int(x) for x in
                       line[4:].strip().strip(",").split(",") if x.strip()]
    assert ref_ids == m.tokenizer.encode("hello world")
    # greedy continuation identical
    want = _ref_completion(path, "hello world", 4)
    got = _our_completion(m, "hello world", 4)
    assert got == want, (name, got, want)
