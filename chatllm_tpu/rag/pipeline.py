"""RAG pipeline: retrieval-augmented chat.

Reference: RAGPipeline (/root/reference/src/chat.h:1530-1598,
src/chat.cpp:2276-2369): before each chat round, embed the query, retrieve
top-n from the vector stores, optionally rerank, compose an augmented
prompt, then run the normal chat flow; afterwards emit references.
"""
from __future__ import annotations

from typing import Optional

from ..runtime.pipeline import ExtendingMethod, Pipeline
from .vectorstore import CVectorStore, DistanceStrategy, VectorStores


class AugmentedQueryComposer:
    """Prompt template filling {context}/{question}
    (reference src/chat.cpp AugmentedQueryComposer)."""

    DEFAULT_TEMPLATE = (
        "Answer the question according to below information:\n"
        "```\n{context}\n```\n"
        "Question: {question}")

    def __init__(self, template: str = "", context_sep: str = "\n```\n"):
        self.template = template or self.DEFAULT_TEMPLATE
        self.context_sep = context_sep

    def compose(self, question: str, contexts: list[str]) -> str:
        ctx = self.context_sep.join(contexts)
        return (self.template.replace("{context}", ctx)
                             .replace("{question}", question))


class RAGPipeline(Pipeline):
    def __init__(self, model, *, embedding_model, reranker_model=None,
                 vector_stores=None, extending: ExtendingMethod = ExtendingMethod.RESTART,
                 retrieve_top_n: int = 2, rerank_top_n: int = 1,
                 rerank_score_threshold: float = 0.35,
                 dump: bool = False, hide_reference: bool = False,
                 composer: Optional[AugmentedQueryComposer] = None,
                 rewrite_template: str = "",
                 rag_post_extending: int = 0,
                 emb_rank_query_sep: str = ""):
        super().__init__(model, extending=extending)
        self.embedding_model = embedding_model
        self.reranker_model = reranker_model
        # named stores with a selectable default (reference VectorStores,
        # src/chat.cpp:2612); plain lists/dicts are wrapped
        if isinstance(vector_stores, VectorStores):
            self.vector_stores = vector_stores
        elif isinstance(vector_stores, dict):
            self.vector_stores = VectorStores(vector_stores)
        else:
            self.vector_stores = VectorStores(
                {f"store{i}" if i else "default": s
                 for i, s in enumerate(vector_stores or [])})
        self.rag_post_extending = rag_post_extending
        self.emb_rank_query_sep = emb_rank_query_sep
        self.retrieve_top_n = retrieve_top_n
        self.rerank_top_n = rerank_top_n
        self.rerank_score_threshold = rerank_score_threshold
        self.hide_reference = hide_reference
        self.composer = composer or AugmentedQueryComposer()
        self.rewrite_template = rewrite_template
        self.last_references: list[str] = []

    def rewrite_query(self, question: str, streamer=None) -> str:
        """Optional LLM query rewriting for retrieval
        (reference src/chat.cpp:2256)."""
        if not self.rewrite_template:
            return question
        prompt = self.rewrite_template.replace("{question}", question)
        rewritten = self.model.engine and self.text_completion(prompt)
        if streamer is not None and rewritten:
            streamer.put_rewritten_query(rewritten)
        return rewritten or question

    def select_vector_store(self, name: str) -> bool:
        """Switch retrieval to the named store (reference
        RAGPipeline::select_vector_store, src/chat.cpp:2371)."""
        return self.vector_stores.select(name)

    def _extend_record(self, vs, idx: int, content: str, meta: str) -> str:
        """--rag_post_extending: merge up to N neighboring records that
        share the retrieved record's metainfo (same source document)
        before/after it (reference src/chat.cpp:2327-2350)."""
        n = self.rag_post_extending
        for j in range(idx - 1, max(-1, idx - n - 1), -1):
            if j < 0:
                break
            c0, m0 = vs.get_record(j)
            if m0 != meta:
                break
            content = c0 + "\n" + content
        for j in range(idx + 1, idx + n + 1):
            if j >= len(vs.contents):
                break
            c0, m0 = vs.get_record(j)
            if m0 != meta:
                break
            content = content + "\n" + c0
        return content

    def retrieve(self, question: str, streamer=None) -> list[tuple[str, str]]:
        """→ [(content, metadata)] after retrieval + optional rerank.
        Queries the SELECTED store only (reference vs.get()->Query,
        src/chat.cpp:2311)."""
        emb_query = rank_query = self.rewrite_query(question, streamer)
        if not self.rewrite_template and self.emb_rank_query_sep:
            # --emb_rank_query_sep: "<emb query><sep><rank query>" when no
            # rewrite model is loaded (reference src/chat.cpp:2299-2306)
            pos = question.find(self.emb_rank_query_sep)
            if pos >= 0:
                emb_query = question[:pos]
                rank_query = question[pos + len(self.emb_rank_query_sep):]
        vs = self.vector_stores.get()
        if vs is None:
            return []
        emb = self.embedding_model.embed(emb_query)
        candidates: list[tuple[float, str, str]] = []
        for idx in vs.query(emb, self.retrieve_top_n):
            c, m = vs.get_record(idx)
            if self.rag_post_extending > 0:
                c = self._extend_record(vs, idx, c, m)
            candidates.append((0.0, c, m))
        if self.reranker_model is not None and candidates:
            scored = [(self.reranker_model.qa_rank(rank_query, c), c, m)
                      for (_, c, m) in candidates]
            scored.sort(key=lambda t: -t[0])
            candidates = [t for t in scored[: self.rerank_top_n]
                          if t[0] >= self.rerank_score_threshold]
        return [(c, m) for (_, c, m) in candidates]

    def chat(self, user_input: str, streamer=None, gen_config=None) -> str:
        # before_chat hook (reference src/chat.cpp:2276)
        results = (self.retrieve(user_input, streamer)
                   if self.vector_stores.get() is not None else [])
        self.last_references = [m for (_, m) in results]
        # with emb_rank_query_sep, the chat prompt uses the RANK part
        # (reference: `query` after the erase, src/chat.cpp:2305)
        if (not self.rewrite_template and self.emb_rank_query_sep
                and self.emb_rank_query_sep in user_input):
            user_input = user_input.split(self.emb_rank_query_sep, 1)[1]
        augmented = (self.composer.compose(user_input, [c for (c, _) in results])
                     if results else user_input)
        reply = super().chat(augmented, streamer, gen_config)
        # post_chat: emit references (reference src/chat.h:1586)
        if streamer is not None and not self.hide_reference:
            for ref in self.last_references:
                if ref:
                    streamer.put_reference(ref)
        return reply
