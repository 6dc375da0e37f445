"""Vector store + XLMRoberta encoder (vs HF) + RAG pipeline tests."""
import base64

import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.rag import CVectorStore, DistanceStrategy, RAGPipeline

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_vectorstore_roundtrip(tmp_path):
    vs = CVectorStore(DistanceStrategy.MaxInnerProduct, emb_len=4)
    vs.contents = ["alpha", "beta", "gamma"]
    vs.metadata = ["m1", "m2", "m3"]
    vs.embeddings = np.eye(3, 4, dtype=np.float32)
    fn = str(tmp_path / "db.vsdb")
    vs.export_db(fn)

    vs2 = CVectorStore.load(DistanceStrategy.MaxInnerProduct, fn)
    assert len(vs2) == 3
    assert vs2.get_record(1) == ("beta", "m2")
    idx = vs2.query(np.array([0, 1, 0, 0], np.float32), top_n=2)
    assert idx[0] == 1


def test_vectorstore_from_plain_data(tmp_path):
    fn = str(tmp_path / "plain.txt")
    with open(fn, "w") as f:
        for c, m in [("hello world", "doc1"), ("goodbye", "doc2")]:
            f.write(base64.b64encode(c.encode()).decode() + "\n")
            f.write(base64.b64encode(m.encode()).decode() + "\n")
    emb = lambda text: np.array([len(text), 1.0, 0, 0], np.float32)
    vs = CVectorStore.from_plain_data(DistanceStrategy.CosineSimilarity, 4, emb, fn)
    assert len(vs) == 2
    assert vs.get_record(0) == ("hello world", "doc1")


def make_tiny_bce(path, seed=3):
    """Tiny XLMRoberta → BCE_Embedding GGMM; returns the HF model."""
    from chatllm_tpu.ggmm.quants import GGMLType
    from chatllm_tpu.ggmm.writer import GGMMWriter
    from chatllm_tpu.models import ModelType

    vocab, hidden, heads, layers, inter, max_len = 128, 32, 2, 2, 64, 64
    torch.manual_seed(seed)
    cfg = transformers.XLMRobertaConfig(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_hidden_layers=layers, intermediate_size=inter,
        max_position_embeddings=max_len + 2, layer_norm_eps=1e-12,
        pad_token_id=1)
    hf = transformers.XLMRobertaModel(cfg, add_pooling_layer=False).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    with open(path, "wb") as f:
        w = GGMMWriter(f, int(ModelType.BCE_Embedding), 1, meta={})
        w.write_config([int(GGMLType.F32), vocab, hidden, heads, layers, inter,
                        max_len, 0, 2, 1, -1], fmt="11i")
        # unigram vocab: (piece, score) — token pieces irrelevant for logits
        w.write_vocab_sp([(f"w{i}".encode(), -float(i)) for i in range(vocab)])
        # converter folds token_type row into position embeddings
        # (convert.py XLMRobertaConverter.state_dict_pp:6411)
        pos_plus_type = (sd["embeddings.position_embeddings.weight"]
                         + sd["embeddings.token_type_embeddings.weight"][0])
        names = {
            "embeddings.word_embeddings.weight": sd["embeddings.word_embeddings.weight"],
            "embeddings.position_embeddings.weight": pos_plus_type,
            "embeddings.LayerNorm.weight": sd["embeddings.LayerNorm.weight"],
            "embeddings.LayerNorm.bias": sd["embeddings.LayerNorm.bias"],
        }
        for i in range(layers):
            pfx = f"encoder.layer.{i}"
            for src, dst in [
                (f"{pfx}.attention.self.query", f"{pfx}.attention.self.query"),
                (f"{pfx}.attention.self.key", f"{pfx}.attention.self.key"),
                (f"{pfx}.attention.self.value", f"{pfx}.attention.self.value"),
                (f"{pfx}.attention.output.dense", f"{pfx}.attention.output.dense"),
                (f"{pfx}.intermediate.dense", f"{pfx}.intermediate.dense"),
                (f"{pfx}.output.dense", f"{pfx}.output.dense"),
            ]:
                names[dst + ".weight"] = sd[src + ".weight"]
                names[dst + ".bias"] = sd[src + ".bias"]
            names[f"{pfx}.attention.output.LayerNorm.weight"] = sd[f"{pfx}.attention.output.LayerNorm.weight"]
            names[f"{pfx}.attention.output.LayerNorm.bias"] = sd[f"{pfx}.attention.output.LayerNorm.bias"]
            names[f"{pfx}.output.LayerNorm.weight"] = sd[f"{pfx}.output.LayerNorm.weight"]
            names[f"{pfx}.output.LayerNorm.bias"] = sd[f"{pfx}.output.LayerNorm.bias"]
        for n, arr in names.items():
            w.write_tensor(n, arr, GGMLType.F32)
    return hf


def test_xlmroberta_matches_hf(tmp_path):
    """Tiny XLMRoberta: our bert_forward vs HF XLMRobertaModel hidden."""
    import jax.numpy as jnp

    from chatllm_tpu.models import RuntimeConfig, load_model

    path = str(tmp_path / "bce.bin")
    hf = make_tiny_bce(path)
    rt = RuntimeConfig(weight_dtype="float32", compute_dtype="float32")
    model = load_model(path, rt)

    ids = np.array([[0, 5, 17, 42, 99, 2]], np.int32)
    from chatllm_tpu.nn.bert import bert_forward

    ours = np.asarray(bert_forward(model.cfg, model.params, jnp.asarray(ids)))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_rag_pipeline_augments_prompt(tmp_path):
    from test_model_forward import make_tiny_qwen2

    from chatllm_tpu.models import RuntimeConfig, load_model
    from chatllm_tpu.runtime import GenerationConfig

    path = str(tmp_path / "chat.bin")
    make_tiny_qwen2(path)
    model = load_model(path, RuntimeConfig(weight_dtype="float32",
                                           compute_dtype="float32",
                                           cache_dtype="float32"))

    class FakeEmb:
        def embed(self, text):
            return np.array([1.0, 0, 0, 0], np.float32)

    vs = CVectorStore(DistanceStrategy.MaxInnerProduct, emb_len=4)
    vs.contents = ["the capital of France is Paris"]
    vs.metadata = ["wiki"]
    vs.embeddings = np.array([[1, 0, 0, 0]], np.float32)

    pipe = RAGPipeline(model, embedding_model=FakeEmb(), vector_stores=[vs])
    pipe.gen_config = GenerationConfig(do_sample=False, max_new_tokens=4)
    refs = []
    from chatllm_tpu.runtime import CallbackStreamer, TextType

    streamer = CallbackStreamer(
        on_line=lambda line, t: refs.append((t, line)))
    pipe.chat("capital of France?", streamer)
    assert pipe.last_references == ["wiki"]
    assert any(t == TextType.REF for t, _ in refs)
    # augmented prompt entered the history
    assert "Paris" in pipe.history[0].content


def test_cli_rag_flow(tmp_path, capsys):
    """CLI RAG flags end-to-end (reference main.cpp RAG args): --init_vs
    builds a .vsdb with the embedding model, then a chat run with
    --vector_store retrieves and augments."""
    import base64 as b64
    import os

    from test_model_forward import make_tiny_qwen2

    from chatllm_tpu.main import main

    emb_bin = str(tmp_path / "bce.bin")
    make_tiny_bce(emb_bin)
    chat_bin = str(tmp_path / "chat.bin")
    make_tiny_qwen2(chat_bin)

    plain = str(tmp_path / "corpus.txt")
    with open(plain, "w") as f:
        for c, m in [("the capital of France is Paris", "wiki/France"),
                     ("bananas are yellow", "wiki/Banana")]:
            f.write(b64.b64encode(c.encode()).decode() + "\n")
            f.write(b64.b64encode(m.encode()).decode() + "\n")

    rc = main(["--init_vs", plain, "--embedding_model", emb_bin,
               "--weight_dtype", "float32", "--compute_dtype", "float32"])
    assert rc == 0
    assert os.path.isfile(plain + ".vsdb")

    rc = main(["-m", chat_bin, "--embedding_model", emb_bin,
               "--vector_store", plain + ".vsdb",
               "--retrieve_top_n", "1", "-p", "capital of France?",
               "--max_new_tokens", "4", "--temp", "0",
               "--weight_dtype", "float32", "--compute_dtype", "float32",
               "--cache_dtype", "float32", "--hide_banner"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "wiki/" in out          # reference line printed


def _mini_store(contents, metas, embs):
    vs = CVectorStore(DistanceStrategy.MaxInnerProduct, emb_len=len(embs[0]))
    vs.contents = list(contents)
    vs.metadata = list(metas)
    vs.embeddings = np.asarray(embs, np.float32)
    return vs


def test_named_vector_stores_select(tmp_path):
    """--set_vs_name / VectorStores: retrieval hits only the SELECTED
    store (reference src/chat.cpp:2612-2650 + select_vector_store)."""
    from test_model_forward import make_tiny_qwen2

    from chatllm_tpu.models import RuntimeConfig, load_model
    from chatllm_tpu.rag.vectorstore import VectorStores
    from chatllm_tpu.runtime import GenerationConfig

    path = str(tmp_path / "chat.bin")
    make_tiny_qwen2(path)
    model = load_model(path, RuntimeConfig(weight_dtype="float32",
                                           compute_dtype="float32",
                                           cache_dtype="float32"))

    class FakeEmb:
        def embed(self, text):
            return np.array([1.0, 0, 0, 0], np.float32)

    docs = _mini_store(["Paris is in France"], ["docs"], [[1, 0, 0, 0]])
    web = _mini_store(["Rome is in Italy"], ["web"], [[1, 0, 0, 0]])
    stores = VectorStores({"docs": docs, "web": web})

    pipe = RAGPipeline(model, embedding_model=FakeEmb(),
                       vector_stores=stores)
    pipe.gen_config = GenerationConfig(do_sample=False, max_new_tokens=2)
    assert [c for c, _ in pipe.retrieve("q")] == ["Paris is in France"]
    assert pipe.select_vector_store("web") is True
    assert [c for c, _ in pipe.retrieve("q")] == ["Rome is in Italy"]
    assert pipe.select_vector_store("nope") is False


def test_rag_post_extending():
    """--rag_post_extending N merges same-source neighbor records around
    each hit (reference src/chat.cpp:2327-2350)."""
    from chatllm_tpu.rag.pipeline import RAGPipeline as RP

    vs = _mini_store(
        ["a0", "a1", "a2", "b0", "b1"],
        ["A", "A", "A", "B", "B"],
        [[0, 1], [1, 0], [0, 1], [0, 1], [0, 1]])

    class FakeEmb:
        def embed(self, text):
            return np.array([1.0, 0], np.float32)

    pipe = RP.__new__(RP)          # skip model plumbing; test retrieve only
    from chatllm_tpu.rag.vectorstore import VectorStores

    pipe.embedding_model = FakeEmb()
    pipe.reranker_model = None
    pipe.vector_stores = VectorStores({"default": vs})
    pipe.retrieve_top_n = 1
    pipe.rewrite_template = ""
    pipe.emb_rank_query_sep = ""
    pipe.rag_post_extending = 2
    got = pipe.retrieve("q")
    # hit = a1 (idx 1); extended with a0 before and a2 after (same meta A),
    # but NOT b0 (different meta)
    assert got == [("a0\na1\na2", "A")]

    pipe.rag_post_extending = 0
    assert pipe.retrieve("q") == [("a1", "A")]


def test_emb_rank_query_sep():
    """--emb_rank_query_sep: text before the sep embeds, text after ranks
    (reference src/chat.cpp:2299-2306)."""
    from chatllm_tpu.rag.pipeline import RAGPipeline as RP
    from chatllm_tpu.rag.vectorstore import VectorStores

    vs = _mini_store(["doc ONE", "doc TWO"], ["m1", "m2"],
                     [[1, 0], [0, 1]])
    seen = {}

    class FakeEmb:
        def embed(self, text):
            seen["emb"] = text
            return np.array([1.0, 0], np.float32)

    class FakeRank:
        def qa_rank(self, q, d):
            seen.setdefault("rank", []).append(q)
            return 1.0

    pipe = RP.__new__(RP)
    pipe.embedding_model = FakeEmb()
    pipe.reranker_model = FakeRank()
    pipe.vector_stores = VectorStores({"default": vs})
    pipe.retrieve_top_n = 2
    pipe.rerank_top_n = 1
    pipe.rerank_score_threshold = 0.0
    pipe.rewrite_template = ""
    pipe.emb_rank_query_sep = "|||"
    pipe.rag_post_extending = 0
    pipe.retrieve("embed this|||rank this")
    assert seen["emb"] == "embed this"
    assert all(q == "rank this" for q in seen["rank"])
