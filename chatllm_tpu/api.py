"""The libchatllm-equivalent embedding API.

Mirrors the C ABI surface (/root/reference/bindings/libchatllm.h:69-510) and
the Python binding's ChatLLM class (bindings/chatllm.py:431) semantics:
objects are configured with the SAME param strings as the CLI, started, then
driven with user_input / tool_input / abort; output flows through callbacks
with the typed-line protocol.  This is the surface HTTP servers, tool-calling
scripts, and ports build on.
"""
from __future__ import annotations

import threading
from typing import Callable, Optional

from .main import Args, build_gen_config, parse_args
from .models import RuntimeConfig, load_model
from .runtime.chat import MsgRole
from .runtime.pipeline import ExtendingMethod, Pipeline
from .runtime.streamer import CallbackStreamer, TextType, ThoughtChunkInterceptor


class ChatLLM:
    """chatllm_create/append_param/start/user_input lifecycle
    (libchatllm.h:76-140, 285-305)."""

    def __init__(self, *params: str):
        self._params: list[str] = list(params)
        self.pipeline: Optional[Pipeline] = None
        self.args: Optional[Args] = None
        self.streamer: Optional[CallbackStreamer] = None
        self.on_print: Callable[[str], None] = lambda s: None
        self.on_print_meta: Callable[[str, int], None] = lambda s, t: None
        self.on_thought: Callable[[str], None] = lambda s: None
        self.on_end: Callable[[], None] = lambda: None
        self._async_thread: Optional[threading.Thread] = None
        self._is_async_busy = False
        self.references: list[str] = []

    # -- lifecycle -----------------------------------------------------------
    def append_param(self, *params: str):
        self._params.extend(params)

    def start(self):
        """chatllm_start (libchatllm.h:131; impl src/main.cpp:1783)."""
        a = parse_args(self._params)
        self.args = a
        rt = RuntimeConfig(cache_dtype=a.cache_dtype, max_length=a.max_length,
                           re_quantize=a.re_quantize,
                           weight_dtype=a.weight_dtype,
                           compute_dtype=a.compute_dtype,
                           mla_cache=a.mla_cache, additional=dict(a.additional),
                           layer_spec=getattr(a, 'layer_spec', ''))
        model = load_model(a.model_path, rt)
        pipe = Pipeline(model, extending=ExtendingMethod(a.extending))
        pipe.gen_config = build_gen_config(a)
        if getattr(a, "ai_prefix", ""):
            pipe.ai_prefix = a.ai_prefix
        if getattr(a, "reversed_role", False):
            pipe.reversed_role = True
        if a.format == "qa":
            pipe.qa_format = True
        if a.system is not None:
            model.tokenizer.sys_prompt = a.system
        for k, v in a.additional.items():
            # --set k v forwarded to the model (reference
            # set_additional_args, src/chat.h:986)
            setter = getattr(model, "set_additional_args", None)
            if setter:
                setter({k: v})
        self.pipeline = pipe

        def on_line(line, ttype):
            if ttype == TextType.REF:
                self.references.append(line)
            self.on_print_meta(line, int(ttype))

        self.streamer = CallbackStreamer(
            model.tokenizer,
            on_chunk=lambda first, c: self.on_print(c),
            on_line=on_line,
            on_thought=lambda first, c: self.on_thought(c),
            on_end=lambda: self.on_end(),
        )
        if a.detect_thoughts:
            self.streamer.set_interceptor(ThoughtChunkInterceptor())
        if a.load_session:
            pipe.load_session(a.load_session)
        return self

    # -- chat ----------------------------------------------------------------
    def chat(self, user_input: str) -> str:
        """chatllm_user_input (sync) — returns the full reply."""
        assert self.pipeline is not None, "call start() first"
        self.references.clear()
        return self.pipeline.chat(user_input, self.streamer)

    user_input = chat

    def async_chat(self, user_input: str):
        """chatllm_async_user_input (libchatllm.h:1876 impl): worker thread,
        completion signalled via on_end."""
        assert not self._is_async_busy, "async operation in progress"
        self._is_async_busy = True

        def run():
            try:
                self.chat(user_input)
            finally:
                self._is_async_busy = False

        self._async_thread = threading.Thread(target=run, daemon=True)
        self._async_thread.start()

    def wait(self):
        if self._async_thread is not None:
            self._async_thread.join()

    def tool_input(self, content: str) -> str:
        """chatllm_tool_input (libchatllm.h:285): feed a tool result."""
        assert self.pipeline is not None
        self.pipeline.history.push_back(MsgRole.TOOL, content)
        ids = self.pipeline.tokenizer.encode_history(
            self.pipeline.history, self.pipeline.model.cfg.max_length,
            incremental=True)
        out = self.pipeline._gen(ids, self.streamer)
        text = self.pipeline.tokenizer.decode(out)
        self.pipeline.history.push_back(MsgRole.ASSISTANT, text)
        if self.streamer:
            self.streamer.end()
        return text

    def ai_continue(self, suffix: str = "") -> str:
        """chatllm_ai_continue (libchatllm.h:305): optionally append
        `suffix` to the last AI message, then continue generating it."""
        if suffix:
            hist = self.pipeline.history
            assert len(hist) > 0
            hist.items[-1].content += suffix
        return self.pipeline.chat_continue(self.streamer)

    def tool_completion(self, content: str) -> str:
        """chatllm_tool_completion (libchatllm.h:305): append `content` to
        the last AI message (e.g. a code-interpreter's captured output) and
        continue generation from there."""
        p = self.pipeline
        assert len(p.history) > 0 and \
            p.history[len(p.history) - 1].role == MsgRole.ASSISTANT
        p.history.items[-1].content += content
        return p.chat_continue(self.streamer)

    def abort_generation(self):
        """chatllm_abort_generation (libchatllm.h:361)."""
        if self.pipeline:
            self.pipeline.abort_generation()

    def set_ai_prefix(self, prefix: str):
        """chatllm_set_ai_prefix (libchatllm.h): seed the NEXT AI reply
        with this text (ya_o1-style staged thinking)."""
        self.pipeline.ai_prefix = prefix

    # -- history / sessions --------------------------------------------------
    def restart(self, sys_prompt: str | None = None):
        """chatllm_restart (libchatllm.h:144-156)."""
        if sys_prompt is not None:
            self.pipeline.tokenizer.sys_prompt = sys_prompt
            self.pipeline.restart(keep_sys_prompt=False)
        else:
            self.pipeline.restart(keep_sys_prompt=True)
        self.pipeline.history.clear()

    def history_append(self, role: int, content: str):
        self.pipeline.history.push_back(MsgRole(role), content)

    def get_cursor(self) -> int:
        return self.pipeline.n_past

    def save_session(self, path: str) -> int:
        self.pipeline.save_session(path)
        return 0

    def load_session(self, path: str) -> int:
        self.pipeline.load_session(path)
        return 0

    # -- other modalities ----------------------------------------------------
    def text_embedding(self, text: str):
        """chatllm_text_embedding (libchatllm.h:331)."""
        model = self.pipeline.model
        assert hasattr(model, "embed"), "not an embedding model"
        return list(model.embed(text))

    def qa_rank(self, question: str, answer: str) -> float:
        """chatllm_qa_rank (libchatllm.h:339)."""
        model = self.pipeline.model
        assert hasattr(model, "qa_rank"), "not a reranker model"
        return model.qa_rank(question, answer)

    def text_tokenize(self, text: str) -> list[int]:
        """chatllm_text_tokenize (libchatllm.h:325)."""
        return self.pipeline.tokenizer.encode(text)

    def show_statistics(self) -> str:
        """chatllm_show_statistics (libchatllm.h:369-375)."""
        return self.pipeline.show_statistics()

    # -- C-ABI helpers (native/libchatllm.cpp) --------------------------------
    def set_cursor(self, pos: int) -> int:
        """chatllm_set_cursor (libchatllm.h:226-231): rewind-and-regenerate.
        Per the header's own warning, save-session history is unreliable
        after use."""
        self.pipeline.n_past = int(pos)
        return int(pos)

    def token_vocab(self) -> list[bytes]:
        """chatllm_get_token_vocab (libchatllm.h:480): all token pieces."""
        tok = self.pipeline.tokenizer
        return [tok.tp.id_to_piece_bytes(i) for i in range(tok.vocab_size)]

    def multimedia_msg_prepare(self):
        """chatllm_multimedia_msg_prepare (libchatllm.h:166)."""
        self._mm_pieces: list[tuple[str, str]] = []

    def multimedia_msg_append(self, kind: str, content: str) -> int:
        """chatllm_multimedia_msg_append: content is utf8 text or base64
        media bytes (libchatllm.h:171-178)."""
        if not hasattr(self, "_mm_pieces"):
            self._mm_pieces = []
        self._mm_pieces.append((kind, content))
        return 0

    def _mm_decode(self):
        import base64
        import tempfile

        texts = [c for t, c in getattr(self, "_mm_pieces", []) if t == "text"]
        media = [(t, c) for t, c in getattr(self, "_mm_pieces", [])
                 if t != "text"]
        paths = []
        for kind, b64 in media:
            f = tempfile.NamedTemporaryFile(suffix="." + kind, delete=False)
            f.write(base64.b64decode(b64))
            f.close()
            paths.append((kind, f.name))
        return " ".join(texts), paths

    def user_input_multimedia_msg(self) -> str:
        """chatllm_user_input_multimedia_msg: run the accumulated message
        (one media piece routed through the model's one-shot multimodal
        chat, matching the CLI's {{image:path}} path)."""
        import os

        text, paths = self._mm_decode()
        try:
            if not paths:
                return self.chat(text)
            assert len(paths) == 1, "one media piece per message supported"
            kind, path = paths[0]
            fn = {"image": "chat_image", "video": "chat_video",
                  "audio": "chat_audio"}.get(kind)
            assert fn is not None, f"unsupported media kind {kind!r}"
            model = self.pipeline.model
            assert hasattr(model, fn), f"model has no {fn}()"
            return getattr(model, fn)(path, text, self.pipeline.gen_config,
                                      self.streamer)
        finally:
            # every decoded temp file is unlinked on ANY exit — including
            # unsupported kinds and multi-piece asserts above
            for _k, p in paths:
                try:
                    os.unlink(p)
                except OSError:
                    pass

    def history_append_multimedia_msg(self, role: int) -> int:
        """chatllm_history_append_multimedia_msg: records the text pieces
        (media pieces in restored history are not re-embedded — limitation
        documented in docs/binding.md)."""
        text, paths = self._mm_decode()
        import os

        for _k, p in paths:
            os.unlink(p)
        self.pipeline.history.push_back(MsgRole(role), text)
        return 0

    def embedding(self, text: str, purpose: int = 0):
        """chatllm_embedding (libchatllm.h:336): purpose 0=doc, 1=query
        (forwarded when the model distinguishes, e.g. Qwen3-Embedding)."""
        model = self.pipeline.model
        assert hasattr(model, "embed"), "not an embedding model"
        try:
            return list(model.embed(text, purpose=purpose))
        except TypeError:
            return list(model.embed(text))

    def rag_select_store(self, name: str) -> int:
        """chatllm_rag_select_store: only meaningful on a RAG pipeline."""
        sel = getattr(self.pipeline, "select_store", None)
        if sel is None:
            return -1
        return int(sel(name))
