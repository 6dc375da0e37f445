"""Serving COMPOSED with the mesh (VERDICT r3 item #7): the continuous-
batching server runs over the virtual dp=2 x tp=4 CPU mesh — weights
tensor-parallel, the shared KV cache batch-sharded — and 4+ concurrent HTTP
chats return byte-identical text to the unsharded single-slot server."""
import json
import threading
import urllib.request

import pytest

import conftest  # noqa: F401

from chatllm_tpu.models import RuntimeConfig, load_model
from chatllm_tpu.parallel.mesh import make_mesh
from chatllm_tpu.runtime.generate import GenerationConfig
from chatllm_tpu.serve.server import ApiServer, _make_handler

from http.server import ThreadingHTTPServer

from test_model_forward import make_tiny_qwen2

RT32 = dict(weight_dtype="float32", compute_dtype="float32",
            cache_dtype="float32")


@pytest.fixture(scope="module")
def servers(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("srvsh") / "tiny.bin")
    # heads divisible by tp=4; kv heads too (GQA group preserved per shard)
    make_tiny_qwen2(path, heads=8, kv_heads=4, hidden=64)
    model = load_model(path, RuntimeConfig(**RT32))
    gen = GenerationConfig(do_sample=False, max_new_tokens=6)
    single = ApiServer(model, model_name="tiny", gen_config=gen)
    mesh = make_mesh(tp=4, dp=2)
    sharded = ApiServer(model, model_name="tiny", gen_config=gen,
                        max_slots=4, mesh=mesh)
    assert sharded.batch is not None and sharded.batch.mesh is mesh
    urls, httpds = [], []
    for api in (single, sharded):
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(api))
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        urls.append(f"http://127.0.0.1:{httpd.server_port}")
        httpds.append(httpd)
    yield urls[0], urls[1], sharded
    for h in httpds:
        h.shutdown()
    sharded.batch.shutdown()


def _chat(url, text):
    req = urllib.request.Request(
        url + "/v1/chat/completions",
        json.dumps({"messages": [{"role": "user", "content": text}]}).encode(),
        {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())["choices"][0]["message"]["content"]


def test_params_actually_sharded(servers):
    _, _, sharded = servers
    import numpy as np

    eng = sharded.batch
    # at least one weight is split over tp (not fully replicated)
    specs = [x.sharding.spec for x in
             __import__("jax").tree.leaves(eng.params)
             if hasattr(x, "sharding") and hasattr(x.sharding, "spec")]
    assert any("tp" in str(s) for s in specs), specs[:5]
    # the KV cache batch dim is sharded over dp
    kc = __import__("jax").tree.leaves(eng.cache)[0]
    assert "dp" in str(kc.sharding.spec), kc.sharding.spec


def test_concurrent_sharded_chats_match_single(servers):
    single, sharded, _ = servers
    prompts = [f"story {i} of the mesh" for i in range(5)]
    expect = [_chat(single, p) for p in prompts]

    got = [None] * len(prompts)
    errs = []

    def worker(i):
        try:
            got[i] = _chat(sharded, prompts[i])
        except Exception as e:  # pragma: no cover
            errs.append((i, repr(e)))

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(len(prompts))]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    assert not errs, errs
    assert got == expect
