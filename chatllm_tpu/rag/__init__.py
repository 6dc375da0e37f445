"""RAG subsystem: vector store + retrieval-augmented chat.

Reference analog: src/vectorstore.{h,cpp} + RAGPipeline (src/chat.h:1530).
"""
from .vectorstore import CVectorStore, DistanceStrategy
from .pipeline import AugmentedQueryComposer, RAGPipeline

__all__ = ["CVectorStore", "DistanceStrategy", "AugmentedQueryComposer",
           "RAGPipeline"]
