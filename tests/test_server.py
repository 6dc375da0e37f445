"""HTTP API server tests against the tiny model (OpenAI + Ollama routes)."""
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


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("srv") / "tiny.bin")
    make_tiny_qwen2(path)
    model = load_model(path, RuntimeConfig(weight_dtype="float32",
                                           compute_dtype="float32",
                                           cache_dtype="float32"))
    api = ApiServer(model, model_name="tiny-qwen2",
                    gen_config=GenerationConfig(do_sample=False, max_new_tokens=4))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(api))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return json.loads(r.read())


def _post(url, obj):
    req = urllib.request.Request(url, json.dumps(obj).encode(),
                                 {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.read()


def test_models_and_health(server):
    assert _get(server + "/v1/models")["data"][0]["id"] == "tiny-qwen2"
    assert _get(server + "/health")["status"] == "ok"
    assert _get(server + "/api/version")["version"].endswith("chatllm_tpu")
    assert _get(server + "/api/tags")["models"][0]["name"] == "tiny-qwen2"


def test_chat_completion(server):
    out = json.loads(_post(server + "/v1/chat/completions", {
        "model": "x", "messages": [{"role": "user", "content": "hi"}]}))
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["role"] == "assistant"
    assert isinstance(out["choices"][0]["message"]["content"], str)


def test_chat_completion_stream(server):
    raw = _post(server + "/v1/chat/completions", {
        "model": "x", "stream": True,
        "messages": [{"role": "user", "content": "hi"}]}).decode()
    assert "data: " in raw and "[DONE]" in raw
    lines = [ln[6:] for ln in raw.splitlines() if ln.startswith("data: ")]
    assert lines[-1] == "[DONE]"
    first = json.loads(lines[0])
    assert first["object"] == "chat.completion.chunk"


def test_ollama_chat(server):
    out = json.loads(_post(server + "/api/chat", {
        "model": "x", "messages": [{"role": "user", "content": "hi"}]}))
    assert out["done"] is True
    assert out["message"]["role"] == "assistant"


def test_completions(server):
    out = json.loads(_post(server + "/v1/completions", {
        "model": "x", "prompt": "abc"}))
    assert out["object"] == "text_completion"


def test_rerank_route_and_sections(tmp_path):
    """/v1/rerank (reference server.nim ---rerank) + multi-model section
    splitting."""
    import json as _json
    from chatllm_tpu.serve.server import ApiServer, split_model_sections

    secs, srv = split_model_sections(
        ["--port", "9999", "---chat", "-m", "a.bin", "---emb", "-m",
         "b.bin", "---rerank", "-m", "c.bin"])
    assert srv == ["--port", "9999"]
    assert secs == {"chat": ["-m", "a.bin"], "emb": ["-m", "b.bin"],
                    "rerank": ["-m", "c.bin"]}

    class FakeRanker:
        def qa_rank(self, q, d):
            return float(len(d))

    path = str(tmp_path / "tiny.bin")
    make_tiny_qwen2(path)
    model = load_model(path, RuntimeConfig(weight_dtype="float32",
                                           compute_dtype="float32",
                                           cache_dtype="float32"))
    api = ApiServer(model, rerank_model=FakeRanker())
    scores = api.rerank("q", ["aa", "aaaa", "a"])
    assert scores == [2.0, 4.0, 1.0]


def test_web_ui_served_at_root(server):
    """Chat web UI on / (reference server.nim handle_index; round-5
    VERDICT #10): HTML page wired to /v1/chat/completions SSE."""
    with urllib.request.urlopen(server + "/", timeout=60) as r:
        assert r.headers.get("Content-Type", "").startswith("text/html")
        body = r.read().decode("utf-8")
    assert "<!DOCTYPE html>" in body
    assert "/v1/chat/completions" in body      # wired to the API
    # JSON service index moved to /about
    assert "endpoints" in _get(server + "/about")


def test_web_ui_custom_override(tmp_path_factory):
    """--ui FILE serves a user page verbatim (server.nim:629 semantics)."""
    import os as _os

    from chatllm_tpu.serve.server import ApiServer, _make_handler

    path = str(tmp_path_factory.mktemp("srvui") / "tiny.bin")
    make_tiny_qwen2(path)
    model = load_model(path, RuntimeConfig(weight_dtype="float32",
                                           compute_dtype="float32",
                                           cache_dtype="float32"))
    custom = str(tmp_path_factory.mktemp("ui") / "my.html")
    open(custom, "w").write("<html><body>CUSTOM-UI-MARKER</body></html>")
    api = ApiServer(model, ui=custom)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(api))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_port}/"
        with urllib.request.urlopen(url, timeout=60) as r:
            assert "CUSTOM-UI-MARKER" in r.read().decode()
    finally:
        httpd.shutdown()
