"""RAG pipeline: retrieval-augmented chat.

Reference: RAGPipeline (/root/reference/src/chat.h:1530-1598,
src/chat.cpp:2276-2369): before each chat round, embed the query, retrieve
top-n from the vector stores, optionally rerank, compose an augmented
prompt, then run the normal chat flow; afterwards emit references.
"""
from __future__ import annotations

from typing import Optional

from ..runtime.pipeline import ExtendingMethod, Pipeline
from .vectorstore import CVectorStore, DistanceStrategy


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
                 rewrite_template: str = ""):
        super().__init__(model, extending=extending)
        self.embedding_model = embedding_model
        self.reranker_model = reranker_model
        self.vector_stores: list[CVectorStore] = list(vector_stores or [])
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

    def retrieve(self, question: str, streamer=None) -> list[tuple[str, str]]:
        """→ [(content, metadata)] after retrieval + optional rerank."""
        query = self.rewrite_query(question, streamer)
        emb = self.embedding_model.embed(query)
        candidates: list[tuple[float, str, str]] = []
        for vs in self.vector_stores:
            for idx in vs.query(emb, self.retrieve_top_n):
                c, m = vs.get_record(idx)
                candidates.append((0.0, c, m))
        if self.reranker_model is not None and candidates:
            scored = [(self.reranker_model.qa_rank(question, c), c, m)
                      for (_, c, m) in candidates]
            scored.sort(key=lambda t: -t[0])
            candidates = [t for t in scored[: self.rerank_top_n]
                          if t[0] >= self.rerank_score_threshold]
        return [(c, m) for (_, c, m) in candidates]

    def chat(self, user_input: str, streamer=None, gen_config=None) -> str:
        # before_chat hook (reference src/chat.cpp:2276)
        results = self.retrieve(user_input, streamer) if self.vector_stores else []
        self.last_references = [m for (_, m) in results]
        augmented = (self.composer.compose(user_input, [c for (c, _) in results])
                     if results else user_input)
        reply = super().chat(augmented, streamer, gen_config)
        # post_chat: emit references (reference src/chat.h:1586)
        if streamer is not None and not self.hide_reference:
            for ref in self.last_references:
                if ref:
                    streamer.put_reference(ref)
        return reply
