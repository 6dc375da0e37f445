"""Runtime: chat history/templates, generation loop, streaming, pipelines.

Reference analog: src/chat.{h,cpp} + the generate loop in src/models.cpp.
"""
from .chat import ChatTokenizer, HistoryEncoder, ChatMLEncoder, Message, Messages, MsgRole
from .generate import GenerationConfig, InferenceEngine, PerfInfo
from .pipeline import ExtendingMethod, Pipeline
from .streamer import (BaseStreamer, CallbackStreamer, ChunkInterceptor,
                       TextStreamer, TextType, ThoughtChunkInterceptor)

__all__ = [
    "ChatTokenizer", "HistoryEncoder", "ChatMLEncoder", "Message", "Messages",
    "MsgRole", "GenerationConfig", "InferenceEngine", "PerfInfo",
    "ExtendingMethod", "Pipeline", "BaseStreamer", "CallbackStreamer",
    "ChunkInterceptor", "TextStreamer", "TextType", "ThoughtChunkInterceptor",
]
