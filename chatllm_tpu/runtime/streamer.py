"""Streaming output: typed out-of-band lines + chunk interceptor chain.

Port of the reference's streamer protocol (/root/reference/src/chat.h:557-668)
— this typed-line protocol IS the observability interface every binding
depends on (SURVEY.md §5.5), so TextType values match the C ABI exactly.
"""
from __future__ import annotations

import enum
from typing import Optional


class TextType(enum.IntEnum):
    # /root/reference/src/chat.h:576-592
    META = 1
    ERR = 2
    REF = 3
    REWRITTEN_QUERY = 4
    HISTORY_USER = 5
    HISTORY_AI = 6
    TOOL_CALLING = 7
    EMBEDDING = 8
    RANKING = 9
    TOKEN_IDS = 10
    LOGGING = 11
    BEAM_SEARCH = 12
    MODEL_INFO = 13
    THOUGHT_CHUNK = 14


class ChunkInterceptor:
    """src/chat.h:559-572."""

    def __init__(self):
        self.next: Optional["ChunkInterceptor"] = None
        self.streamer: Optional["BaseStreamer"] = None

    def intercept(self, next_, streamer):
        self.next = next_
        self.streamer = streamer

    def put_chunk(self, first: bool, chunk: str):
        if self.next:
            self.next.put_chunk(first, chunk)

    def end(self):
        if self.next:
            self.next.end()


class _Sink(ChunkInterceptor):
    """Chain terminator: routes chunks into the streamer's output methods;
    its chain-end is a no-op (the streamer's public end() drives cleanup)."""

    def __init__(self, streamer: "BaseStreamer"):
        super().__init__()
        self.s = streamer

    def put_chunk(self, first, chunk):
        self.s.put_chunk(first, chunk)

    def end(self):
        pass


class BaseStreamer(ChunkInterceptor):
    """Token → utf8 chunk streaming with an interceptor chain.

    Incremental detokenization buffers raw piece bytes and only emits
    complete UTF-8 prefixes (the reference buffers token_cache + print_len,
    src/chat.cpp BaseStreamer::put)."""

    def __init__(self, tokenizer=None):
        super().__init__()
        self.tokenizer = tokenizer
        self.is_prompt = True
        self.is_first = True
        self.log_level = 5
        self._byte_buf = b""
        self._sink = _Sink(self)
        self.interceptor: ChunkInterceptor = self._sink

    # -- subclass API -------------------------------------------------------
    def put_chunk(self, first: bool, chunk: str):
        raise NotImplementedError

    def put_thought_chunk(self, first: bool, chunk: str):
        pass

    def end_thought(self):
        pass

    def putln(self, line: str, text_type: TextType = TextType.META):
        raise NotImplementedError

    # -- engine-facing API ---------------------------------------------------
    def put(self, output_ids: list[int]):
        tok = self.tokenizer
        pieces = b"".join(tok.piece_bytes(t) for t in output_ids)
        self._byte_buf += pieces
        # emit the longest valid utf8 prefix
        buf = self._byte_buf
        cut = len(buf)
        while cut > 0:
            try:
                text = buf[:cut].decode("utf-8")
                break
            except UnicodeDecodeError as e:
                if e.start > 0:
                    cut = e.start
                    text = buf[:cut].decode("utf-8", errors="ignore")
                    break
                cut -= 1
        else:
            return
        if cut == 0 or not text:
            return
        self._byte_buf = buf[cut:]
        self.call_put_chunk(self.is_first, text)
        self.is_first = False

    def call_put_chunk(self, first: bool, chunk: str):
        self.interceptor.put_chunk(first, chunk)

    def set_interceptor(self, interceptor: ChunkInterceptor):
        if interceptor is self.interceptor:
            return
        interceptor.intercept(self.interceptor, self)
        self.interceptor = interceptor

    def remove_interceptors(self):
        self.interceptor = self._sink

    def end(self):
        if self._byte_buf:
            text = self._byte_buf.decode("utf-8", errors="replace")
            self.call_put_chunk(self.is_first, text)
            self._byte_buf = b""
        self.interceptor.end()
        self.is_first = True
        self.is_prompt = True

    # RAG / tool helpers (src/chat.h:612-636)
    def put_reference(self, line): self.putln(line, TextType.REF)
    def put_rewritten_query(self, line): self.putln(line, TextType.REWRITTEN_QUERY)
    def put_history_user(self, line): self.putln(line, TextType.HISTORY_USER)
    def put_history_ai(self, line): self.putln(line, TextType.HISTORY_AI)
    def put_tool_calling(self, line): self.putln(line, TextType.TOOL_CALLING)


class TextStreamer(BaseStreamer):
    """Print chunks to a file object (reference src/main.cpp TextStreamer)."""

    def __init__(self, tokenizer=None, out=None):
        super().__init__(tokenizer)
        import sys

        self.out = out or sys.stdout

    def put_chunk(self, first: bool, chunk: str):
        self.out.write(chunk)
        self.out.flush()

    def put_thought_chunk(self, first: bool, chunk: str):
        self.out.write(chunk)
        self.out.flush()

    def end_thought(self):
        self.out.write("\n")

    def putln(self, line: str, text_type: TextType = TextType.META):
        if text_type == TextType.META:
            self.out.write(line + "\n")
        elif text_type == TextType.ERR:
            import sys

            sys.stderr.write("ERROR: " + line + "\n")
        else:
            self.out.write(f"[{text_type.name}] {line}\n")
        self.out.flush()


class CallbackStreamer(BaseStreamer):
    """Route chunks/lines to callables (the FFI streamer analog,
    src/main.cpp:1580-1628)."""

    def __init__(self, tokenizer=None, on_chunk=None, on_line=None,
                 on_thought=None, on_end=None):
        super().__init__(tokenizer)
        self.on_chunk = on_chunk
        self.on_line = on_line
        self.on_thought = on_thought
        self.on_end = on_end

    def put_chunk(self, first, chunk):
        if self.on_chunk:
            self.on_chunk(first, chunk)

    def put_thought_chunk(self, first, chunk):
        if self.on_thought:
            self.on_thought(first, chunk)

    def putln(self, line, text_type=TextType.META):
        if self.on_line:
            self.on_line(line, text_type)

    def end(self):
        super().end()
        if self.on_end:
            self.on_end()


class ThoughtChunkInterceptor(ChunkInterceptor):
    """Strips <think>...</think> (configurable tag pairs) out of the chat
    stream and reroutes it as thought chunks
    (reference src/chat.h:646-668, src/chat.cpp ThoughtChunkInterceptor)."""

    def __init__(self, tags=(("<think>", "</think>"),)):
        super().__init__()
        self.tags = list(tags)
        self.reset()

    def reset(self):
        self.detecting = False
        self.is_thinking = False
        self.acc = ""
        self.tag_closing = ""
        self.first_thought = True

    def put_chunk(self, first: bool, chunk: str):
        if first:
            self.reset()
            self.detecting = True
        if self.is_thinking:
            self.acc += chunk
            if self.tag_closing in self.acc:
                self._drain_thinking()
            else:
                # stream all but a tail that might hold a partial closing tag
                keep = len(self.tag_closing)
                if len(self.acc) > keep:
                    out = self.acc[:-keep]
                    self.acc = self.acc[-keep:]
                    if out:
                        self.streamer.put_thought_chunk(self.first_thought, out)
                        self.first_thought = False
            return
        if self.detecting:
            self.acc += chunk
            probe = self.acc.lstrip()
            matched = False
            for opening, closing in self.tags:
                if probe.startswith(opening):
                    self.is_thinking = True
                    self.tag_closing = closing
                    self.acc = probe[len(opening):]
                    matched = True
                    break
                if opening.startswith(probe):
                    return  # might still match; keep buffering
            self.detecting = False
            if not matched:
                out = self.acc
                self.acc = ""
                super().put_chunk(first, out)
            else:
                self._drain_thinking()
            return
        super().put_chunk(first, chunk)

    def _drain_thinking(self):
        pos = self.acc.find(self.tag_closing)
        if pos >= 0:
            thought = self.acc[:pos]
            rest = self.acc[pos + len(self.tag_closing):]
            if thought:
                self.streamer.put_thought_chunk(self.first_thought, thought)
                self.first_thought = False
            self.streamer.end_thought()
            self.is_thinking = False
            self.acc = ""
            if rest:
                super().put_chunk(False, rest)

    def end(self):
        if self.is_thinking and self.acc:
            self.streamer.put_thought_chunk(self.first_thought, self.acc)
            self.streamer.end_thought()
        elif self.acc:
            super().put_chunk(False, self.acc)
        self.reset()
        super().end()
