"""Pipeline: model + tokenizer orchestration for multi-round chat.

Port of the reference Pipeline (/root/reference/src/chat.h:1415-1497,
src/chat.cpp:1810-2170): context-extending strategies (Restart / Shift /
None), incremental history encoding, ai-continuation, system-prompt
pre-eval, session save/load, abort.
"""
from __future__ import annotations

import enum
import json
import os
import time
from typing import Optional

import numpy as np

from .chat import ChatTokenizer, Messages, MsgRole
from .generate import GenerationConfig, PerfInfo
from .streamer import BaseStreamer, TextStreamer, TextType


class ExtendingMethod(enum.Enum):
    # /root/reference/src/chat.h:1418-1423
    RESTART = "restart"
    SHIFT = "shift"
    NONE = "none"


SESSION_MAGIC = "CHATLLM-TPU-SESSION-v1"


class Pipeline:
    def __init__(self, model, *, extending: ExtendingMethod = ExtendingMethod.RESTART):
        self.model = model
        self.tokenizer: ChatTokenizer = model.tokenizer
        self.extending = extending
        self.history = Messages()
        self.gen_config = GenerationConfig()
        self._cache = None
        self.n_past = 0
        self.initial_n_past = 0      # set after eval_sys_prompt / load_session
        self.aborted = False
        self.perf = model.perf

    # ------------------------------------------------------------------ chat
    def abort_generation(self):
        self.aborted = True

    def _gen(self, ids, streamer: Optional[BaseStreamer], gen_config=None):
        gen_config = gen_config or self.gen_config
        self.aborted = False
        eng = self.model.engine
        max_len = eng.max_length
        prefix = getattr(self, "ai_prefix", "") if getattr(
            self, "_inject_ai_prefix", False) else ""
        self._inject_ai_prefix = False
        if prefix:
            # seed the AI turn with the prefix tokens (chatllm_set_ai_prefix)
            # and stream them like generated text (reference chat.cpp:1970
            # put_chunk's the prefix before generation starts)
            pids = list(self.tokenizer.encode(prefix))
            ids = list(ids) + pids
            if streamer is not None:
                streamer.tokenizer = self.tokenizer
                streamer.put(pids)

        def on_token(t):
            if streamer is not None:
                streamer.put([t])

        if self._cache is None:
            self._cache = eng.new_cache(1, max_len)

        out, self._cache, self.n_past = eng.generate(
            ids, gen_config,
            is_terminator=self.tokenizer.is_terminate_token,
            on_token=on_token,
            perf=self.perf,
            cache=self._cache,
            n_past=self.n_past,
            should_stop=lambda: self.aborted,
            terminate_seq=getattr(self.tokenizer, "terminate_seq", None),
        )
        return out

    def chat(self, user_input: str, streamer: Optional[BaseStreamer] = None,
             gen_config: Optional[GenerationConfig] = None) -> str:
        """One chat round: appends the user message, generates, appends the
        AI reply to history.  Returns the reply text.

        With `reversed_role` (reference main.cpp --reversed_role) the
        roles swap: the incoming text is recorded as the ASSISTANT turn and
        the model generates the USER side via append_user_opening."""
        rev = getattr(self, "reversed_role", False)
        if getattr(self, "qa_format", False) and len(self.history) > 0:
            # QA format (reference ChatFormat::QA, chat.cpp:822): drop the
            # conversation — every round stands alone
            self.history.clear()
            self.restart(keep_sys_prompt=False)
        self.history.push_back(MsgRole.ASSISTANT if rev else MsgRole.USER,
                               user_input)
        if streamer is not None:
            streamer.tokenizer = self.tokenizer
        gen_config = gen_config or self.gen_config
        self._inject_ai_prefix = True

        if self.extending == ExtendingMethod.NONE:
            out_ids = self._chat_without_extending(streamer, gen_config)
        elif self.extending == ExtendingMethod.SHIFT:
            out_ids = self._chat_with_shift(streamer, gen_config)
        else:
            out_ids = self._chat_with_restart(streamer, gen_config)

        text = self.tokenizer.decode(out_ids)
        prefix = getattr(self, "ai_prefix", "")
        if prefix:
            # chatllm_set_ai_prefix (libchatllm.h): the AI reply was seeded
            # with this text (injected in _gen) — it is part of the message
            text = prefix + text
        self.history.push_back(MsgRole.USER if rev else MsgRole.ASSISTANT,
                               text)
        if streamer is not None:
            streamer.end()
        return text

    def _needed_budget(self, ids) -> bool:
        eng = self.model.engine
        return self.n_past + len(ids) + 4 < eng.max_length

    def _chat_with_restart(self, streamer, gen_config):
        # reference src/chat.cpp:1810: if the context would overflow,
        # re-encode a truncated history from scratch
        ids = self.tokenizer.encode_history(self.history, self.model.cfg.max_length,
                                            incremental=True,
                                            reversed_role=getattr(self, "reversed_role", False))
        if not self._needed_budget(ids):
            self.restart(keep_sys_prompt=True)
            ids = self.tokenizer.encode_history(self.history, self.model.cfg.max_length,
                                                incremental=False,
                                                reversed_role=getattr(self, "reversed_role", False))
        return self._gen(ids, streamer, gen_config)

    def _chat_with_shift(self, streamer, gen_config):
        # reference src/chat.cpp:1870: shift half the KV cache and continue
        ids = self.tokenizer.encode_history(self.history, self.model.cfg.max_length,
                                            incremental=True,
                                            reversed_role=getattr(self, "reversed_role", False))
        eng = self.model.engine
        while not self._needed_budget(ids):
            keep = self.initial_n_past
            shift = (self.n_past - keep) // 2
            if shift <= 0:
                break
            self._cache = eng.shift_cache(self._cache, shift, keep, self.n_past)
            self.n_past -= shift
        return self._gen(ids, streamer, gen_config)

    def _chat_without_extending(self, streamer, gen_config):
        ids = self.tokenizer.encode_history(self.history, self.model.cfg.max_length,
                                            incremental=True,
                                            reversed_role=getattr(self, "reversed_role", False))
        return self._gen(ids, streamer, gen_config)

    def chat_continue(self, streamer: Optional[BaseStreamer] = None,
                      gen_config: Optional[GenerationConfig] = None) -> str:
        """Continue the last AI message (reference src/chat.cpp:2008)."""
        assert len(self.history) > 0 and self.history[len(self.history) - 1].role == MsgRole.ASSISTANT
        if streamer is not None:
            streamer.tokenizer = self.tokenizer
        # re-encode the tail assistant message without a terminator and go on
        last = self.history.items[-1]
        ids = self.tokenizer.encode(last.content)
        out = self._gen(ids, streamer, gen_config)
        text = self.tokenizer.decode(out)
        last.content += text
        if streamer is not None:
            streamer.end()
        return text

    def eval_sys_prompt(self, gen_config: Optional[GenerationConfig] = None):
        """Prefill the system prompt once so later chats reuse it
        (reference src/chat.cpp:1904)."""
        ids = self.tokenizer.encode_sys_prompt()
        if not ids:
            return
        eng = self.model.engine
        if self._cache is None:
            self._cache = eng.new_cache(1, eng.max_length)
        _, self._cache, self.n_past = eng.prefill(ids, self._cache, self.n_past)
        self.initial_n_past = self.n_past
        self.tokenizer.chat_encoder.skip_sys_prompt = True

    def restart(self, keep_sys_prompt: bool = True):
        """Return to the initial point (reference chatllm_restart semantics,
        bindings/libchatllm.h:144-156)."""
        self.n_past = self.initial_n_past if keep_sys_prompt else 0
        if not keep_sys_prompt:
            self.initial_n_past = 0
            if self.tokenizer.chat_encoder:
                self.tokenizer.chat_encoder.skip_sys_prompt = False
        self.history.cursor = 0

    def rewind(self, n_msgs: int = 1):
        for _ in range(n_msgs):
            self.history.pop()

    # -------------------------------------------------------------- sessions
    def save_session(self, path: str):
        """history + n_past + KV arrays (reference CHATLLM-SESSION format
        semantics, src/chat.cpp:2106-2170)."""
        meta = {
            "magic": SESSION_MAGIC,
            "model_type": int(self.model.model_type),
            "n_past": self.n_past,
            "initial_n_past": self.initial_n_past,
            "history": [
                {"role": int(m.role), "content": m.content, "round": m.round}
                for m in self.history.items
            ],
        }
        def _np(x):
            a = np.asarray(x)
            # bf16 has no stable npz representation (round-trips as void);
            # store those planes f32 — cast back to the cache dtype on load
            return a.astype(np.float32) if a.dtype.kind not in "fiu" else a

        arrays = {}
        if self._cache is not None:
            for i, (k, v) in enumerate(zip(self._cache.k, self._cache.v)):
                arrays[f"k{i}"] = _np(k[:, : self.n_past])
                arrays[f"v{i}"] = _np(v[:, : self.n_past])
            if self._cache.k_scale is not None:
                for i, (ks, vs) in enumerate(zip(self._cache.k_scale,
                                                 self._cache.v_scale)):
                    arrays[f"ks{i}"] = np.asarray(ks[:, : self.n_past])
                    arrays[f"vs{i}"] = np.asarray(vs[:, : self.n_past])
        # write to the EXACT filename (np.savez appends .npz; the reference
        # saves to the literal path the caller gave, src/chat.cpp:2106)
        import io

        buf = io.BytesIO()
        np.savez(buf, __meta__=json.dumps(meta), **arrays)
        with open(path, "wb") as f:
            f.write(buf.getvalue())

    def load_session(self, path: str):
        if not os.path.isfile(path) and os.path.isfile(path + ".npz"):
            path = path + ".npz"   # sessions saved by pre-round-4 builds
        data = np.load(path, allow_pickle=False)
        meta = json.loads(str(data["__meta__"]))
        assert meta["magic"] == SESSION_MAGIC, "bad session file"
        assert meta["model_type"] == int(self.model.model_type), "session/model mismatch"
        self.n_past = meta["n_past"]
        self.initial_n_past = meta["initial_n_past"]
        self.history.clear()
        for m in meta["history"]:
            msg = self.history.push_back(MsgRole(m["role"]), m["content"])
            msg.round = m["round"]
        self.history.move_cursor_to_end()
        eng = self.model.engine
        self._cache = eng.new_cache(1, eng.max_length)
        if "k0" in data:
            from ..nn.transformer import KVCache

            ks, vs = list(self._cache.k), list(self._cache.v)
            quant = self._cache.k_scale is not None
            kss = list(self._cache.k_scale) if quant else None
            vss = list(self._cache.v_scale) if quant else None
            for i in range(len(ks)):
                kk = data[f"k{i}"]
                ks[i] = ks[i].at[:, : kk.shape[1]].set(
                    kk.astype(ks[i].dtype))
                vs[i] = vs[i].at[:, : kk.shape[1]].set(
                    data[f"v{i}"].astype(vs[i].dtype))
                if quant and f"ks{i}" in data:
                    kss[i] = kss[i].at[:, : kk.shape[1]].set(data[f"ks{i}"])
                    vss[i] = vss[i].at[:, : kk.shape[1]].set(data[f"vs{i}"])
            self._cache = KVCache(k=tuple(ks), v=tuple(vs),
                                  k_scale=tuple(kss) if quant else None,
                                  v_scale=tuple(vss) if quant else None)
        if self.initial_n_past > 0 and self.tokenizer.chat_encoder:
            self.tokenizer.chat_encoder.skip_sys_prompt = True

    # ----------------------------------------------------------- other modes
    def text_completion(self, prompt: str, streamer=None,
                        gen_config: Optional[GenerationConfig] = None) -> str:
        if streamer is not None:
            streamer.tokenizer = self.tokenizer
        ids = self.tokenizer.encode(prompt)
        out = self._gen(ids, streamer, gen_config or self.gen_config)
        if streamer is not None:
            streamer.end()
        return self.tokenizer.decode(out)

    def show_statistics(self) -> str:
        return self.perf.summary()
