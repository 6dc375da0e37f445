"""Served FIM (fill-in-the-middle) + multimodal chat round-trips
(round-5 VERDICT items #6/#7).

Reference behavior being matched:
  - scripts/openai_api.py:188-189  — model names starting/ending in "fim"
    route to the ---fim model (completion format)
  - scripts/openai_api.py:510-531  — the ---fim CLI section
  - bindings/server.nim:229        — image_url content parts in chat
"""
import base64
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.models import RuntimeConfig, load_model
from chatllm_tpu.runtime.generate import GenerationConfig
from chatllm_tpu.serve.server import ApiServer, _make_handler

from http.server import ThreadingHTTPServer

from test_model_forward import make_tiny_qwen2

RT32 = RuntimeConfig(weight_dtype="float32", compute_dtype="float32",
                     cache_dtype="float32")
FIM_PIECES = ["<|fim_prefix|>", "<|fim_suffix|>", "<|fim_middle|>"]


def _post(url, obj, timeout=120):
    req = urllib.request.Request(url, json.dumps(obj).encode(),
                                 {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.read()


def _serve(api):
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(api))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, f"http://127.0.0.1:{httpd.server_port}"


@pytest.fixture(scope="module")
def fim_server(tmp_path_factory):
    d = tmp_path_factory.mktemp("fim")
    chat_path, fim_path = str(d / "chat.bin"), str(d / "fim.bin")
    make_tiny_qwen2(chat_path)
    # the fim model's vocab carries real FIM special tokens
    make_tiny_qwen2(fim_path, vocab=260, extra_pieces=FIM_PIECES)
    chat = load_model(chat_path, RT32)
    fim = load_model(fim_path, RT32)
    api = ApiServer(chat, model_name="tiny", fim_model=fim,
                    gen_config=GenerationConfig(do_sample=False,
                                                max_new_tokens=4))
    httpd, url = _serve(api)
    yield api, url
    httpd.shutdown()


def test_fim_token_detection(fim_server):
    api, _ = fim_server
    ids = api._fim_token_ids(api.fim_model)
    assert ids is not None and len(ids) == 3
    tp = api.fim_model.tokenizer.tp
    assert [tp.id_to_piece(i) for i in ids] == FIM_PIECES
    # the chat model has none
    assert api._fim_token_ids(api.model) is None


def test_completions_with_suffix(fim_server):
    _, url = fim_server
    out = json.loads(_post(url + "/v1/completions", {
        "model": "code-fim", "prompt": "def add(a, b):\n    ",
        "suffix": "\n    return r", "max_tokens": 4}))
    assert out["object"] == "text_completion"
    assert isinstance(out["choices"][0]["text"], str)


def test_fim_named_model_routes_without_suffix(fim_server):
    """Reference routing: model name ending in 'fim' hits the fim model in
    plain completion mode (openai_api.py:188)."""
    _, url = fim_server
    out = json.loads(_post(url + "/v1/completions", {
        "model": "qwen-fim", "prompt": "abc", "max_tokens": 3}))
    assert out["object"] == "text_completion"


def test_fim_named_chat_request(fim_server):
    """A chat request naming a fim model is served as completion
    (openai_api.py handle_COMPLETION aggregation of user messages)."""
    _, url = fim_server
    out = json.loads(_post(url + "/v1/chat/completions", {
        "model": "fim", "max_tokens": 3,
        "messages": [{"role": "user", "content": "xyz"}]}))
    assert out["object"] == "text_completion"


def test_infill_route(fim_server):
    _, url = fim_server
    out = json.loads(_post(url + "/infill", {
        "input_prefix": "a", "input_suffix": "b", "max_tokens": 3}))
    assert out["stop"] is True and isinstance(out["content"], str)


def test_ollama_generate_with_suffix(fim_server):
    _, url = fim_server
    out = json.loads(_post(url + "/api/generate", {
        "model": "x", "prompt": "a", "suffix": "b",
        "options": {"max_tokens": 3}}))
    assert out["done"] is True and isinstance(out["response"], str)


def test_suffix_without_fim_tokens_is_400():
    """Suffix on a model with no FIM vocab must fail cleanly, not crash."""
    import tempfile, os

    f = tempfile.NamedTemporaryFile(suffix=".bin", delete=False)
    f.close()
    try:
        make_tiny_qwen2(f.name)
        api = ApiServer(load_model(f.name, RT32), model_name="t",
                        gen_config=GenerationConfig(do_sample=False,
                                                    max_new_tokens=2))
        httpd, url = _serve(api)
        try:
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(url + "/v1/completions",
                      {"prompt": "a", "suffix": "b"})
            assert ei.value.code == 400
        finally:
            httpd.shutdown()
    finally:
        os.unlink(f.name)


# ---------------------------------------------------------------------------
# image_url content parts -> the engine's chat_image path
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def vl_server(tmp_path_factory):
    PIL = pytest.importorskip("PIL")  # noqa: F841
    from test_adept import make_tiny_fuyu

    path = str(tmp_path_factory.mktemp("vl") / "fuyu.bin")
    make_tiny_fuyu(path)
    model = load_model(path, RT32)
    api = ApiServer(model, model_name="tiny-fuyu",
                    gen_config=GenerationConfig(do_sample=False,
                                                max_new_tokens=3))
    httpd, url = _serve(api)
    yield api, url
    httpd.shutdown()


def _png_data_uri():
    from PIL import Image

    img = Image.fromarray((np.random.default_rng(0).random((12, 16, 3))
                           * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return ("data:image/png;base64,"
            + base64.b64encode(buf.getvalue()).decode())


def test_chat_with_image_url(vl_server):
    _, url = vl_server
    out = json.loads(_post(url + "/v1/chat/completions", {
        "model": "x", "max_tokens": 3,
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "what is this?"},
            {"type": "image_url", "image_url": {"url": _png_data_uri()}},
        ]}]}))
    assert out["object"] == "chat.completion"
    assert isinstance(out["choices"][0]["message"]["content"], str)


def test_ollama_chat_with_images(vl_server):
    _, url = vl_server
    b64 = _png_data_uri().split(",", 1)[1]
    out = json.loads(_post(url + "/api/chat", {
        "model": "x",
        "messages": [{"role": "user", "content": "look",
                      "images": [b64]}]}))
    assert out["done"] is True


def test_remote_image_url_rejected(vl_server):
    _, url = vl_server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(url + "/v1/chat/completions", {
            "model": "x",
            "messages": [{"role": "user", "content": [
                {"type": "image_url",
                 "image_url": {"url": "https://example.com/x.png"}}]}]})
    assert ei.value.code == 400


def test_text_only_content_parts_unaffected(vl_server):
    """Content-part arrays WITHOUT media still take the text path."""
    _, url = vl_server
    out = json.loads(_post(url + "/v1/chat/completions", {
        "model": "x", "max_tokens": 3,
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "plain"}]}]}))
    assert out["object"] == "chat.completion"
