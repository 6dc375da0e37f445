"""Continuous-batching server: N concurrent HTTP chats over shared cache.

Responses must be byte-identical to the single-slot server's for the same
requests (greedy) — concurrency must not change outputs.
"""
import json
import threading
import urllib.request

import pytest

import conftest  # noqa: F401

from chatllm_tpu.models import RuntimeConfig, load_model
from chatllm_tpu.runtime.generate import GenerationConfig
from chatllm_tpu.serve.server import ApiServer, _make_handler

from http.server import ThreadingHTTPServer

from test_model_forward import make_tiny_qwen2

RT32 = dict(weight_dtype="float32", compute_dtype="float32",
            cache_dtype="float32")


@pytest.fixture(scope="module")
def servers(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("srvb") / "tiny.bin")
    make_tiny_qwen2(path)
    model = load_model(path, RuntimeConfig(**RT32))
    gen = GenerationConfig(do_sample=False, max_new_tokens=6)
    single = ApiServer(model, model_name="tiny", gen_config=gen)
    batched = ApiServer(model, model_name="tiny", gen_config=gen, max_slots=4)
    urls = []
    httpds = []
    for api in (single, batched):
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(api))
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        urls.append(f"http://127.0.0.1:{httpd.server_port}")
        httpds.append(httpd)
    yield urls[0], urls[1]
    for h in httpds:
        h.shutdown()
    batched.batch.shutdown()


def _post(url, obj, timeout=180):
    req = urllib.request.Request(url, json.dumps(obj).encode(),
                                 {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.read()


def _chat(url, text):
    out = json.loads(_post(url + "/v1/chat/completions",
                           {"messages": [{"role": "user", "content": text}]}))
    return out["choices"][0]["message"]["content"]


def test_props_and_slots(servers):
    single, batched = servers
    with urllib.request.urlopen(batched + "/props", timeout=30) as r:
        assert json.loads(r.read())["total_slots"] == 4
    with urllib.request.urlopen(batched + "/slots", timeout=30) as r:
        assert len(json.loads(r.read())) == 4


def test_concurrent_chats_match_single_slot(servers):
    single, batched = servers
    prompts = [f"tale number {i} about a fox" for i in range(6)]
    expect = [_chat(single, p) for p in prompts]

    got = [None] * len(prompts)
    errs = []

    def worker(i):
        try:
            got[i] = _chat(batched, prompts[i])
        except Exception as e:          # pragma: no cover
            errs.append((i, e))

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(len(prompts))]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert not errs, errs
    assert got == expect


def test_streaming_sse_batched(servers):
    _, batched = servers
    body = json.dumps({"messages": [{"role": "user", "content": "stream me"}],
                       "stream": True}).encode()
    req = urllib.request.Request(batched + "/v1/chat/completions", body,
                                 {"Content-Type": "application/json"})
    chunks = []
    with urllib.request.urlopen(req, timeout=180) as r:
        for line in r:
            line = line.strip()
            if line.startswith(b"data: ") and line != b"data: [DONE]":
                obj = json.loads(line[6:])
                delta = obj["choices"][0]["delta"]
                if "content" in delta:
                    chunks.append(delta["content"])
    ref = _chat(batched, "stream me")
    assert "".join(chunks) == ref
