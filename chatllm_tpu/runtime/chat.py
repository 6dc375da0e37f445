"""Chat history + per-model template engine.

Port of the reference's BaseTokenizer chat-template machinery
(/root/reference/src/chat.h:270-400, src/chat.cpp:680-960):
  - `Messages`/`Message` multi-round history with a token-position cursor for
    incremental re-encoding
  - `HistoryEncoder` hook set (append_sys_prompt/user/ai/tool/ai_opening),
    with the stock ChatML implementation (src/chat_encoders.h:7-45)
  - `ChatTokenizer` wrapping a tokenizer.Processor: encode/decode with
    special-token filtering, encode_history with history truncation
    (`get_history_start`, src/chat.cpp:723) and incremental cursor.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional


class MsgRole(enum.IntEnum):
    # matches the C ABI role ids (/root/reference/bindings/libchatllm.h ROLE_*)
    AUTO = 0
    USER = 1
    ASSISTANT = 2
    SYSTEM = 3
    TOOL = 4


@dataclass
class Message:
    role: MsgRole
    content: str
    round: int = 0


class Messages:
    def __init__(self):
        self.items: list[Message] = []
        self.cursor = 0
        self.round = -1

    def push_back(self, role: MsgRole, content: str) -> Message:
        if role == MsgRole.USER:
            self.round += 1
        m = Message(role, content, max(self.round, 0))
        self.items.append(m)
        return m

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i) -> Message:
        return self.items[i]

    def move_cursor_to_end(self):
        self.cursor = len(self.items)

    def pop(self) -> Optional[Message]:
        if not self.items:
            return None
        m = self.items.pop()
        self.cursor = min(self.cursor, len(self.items))
        if m.role == MsgRole.USER:
            self.round -= 1
        return m

    def clear(self):
        self.items.clear()
        self.cursor = 0
        self.round = -1


class HistoryEncoder:
    """Per-model chat-template hooks (reference BaseHistoryEncoder,
    src/chat.h:376-400).  `tokenizer` is attached by ChatTokenizer."""

    def __init__(self):
        self.tokenizer: "ChatTokenizer" = None
        self.skip_sys_prompt = False

    def append_sys_prompt(self, ids: list[int]):
        pass

    def append_user(self, round_idx: int, user: str, ids: list[int]):
        raise NotImplementedError

    def append_ai(self, round_idx: int, ai: str, ids: list[int]):
        self.append_ai_opening(round_idx, ids)
        ids.extend(self.tokenizer.encode(ai))

    def append_ai_opening(self, round_idx: int, ids: list[int]):
        pass

    def append_user_opening(self, round_idx: int, ids: list[int]):
        pass

    def append_tool(self, round_idx: int, content: str, ids: list[int]):
        self.append_user(round_idx, content, ids)

    def append_message(self, msg: Message, ids: list[int]):
        # reference src/chat.cpp:945
        if len(ids) < 1 and msg.round == 0 and not self.skip_sys_prompt:
            self.append_sys_prompt(ids)
        if msg.role == MsgRole.USER:
            self.append_user(msg.round, msg.content, ids)
        elif msg.role == MsgRole.ASSISTANT:
            self.append_ai(msg.round, msg.content, ids)
        elif msg.role == MsgRole.TOOL:
            self.append_tool(msg.round, msg.content, ids)
        elif msg.role == MsgRole.SYSTEM:
            pass  # system content is carried via tokenizer.sys_prompt


class ChatMLEncoder(HistoryEncoder):
    """<|im_start|>role\\n...<|im_end|>\\n template (reference
    HistoryEncoderImStartImEnd, src/chat_encoders.h:7; qwen variant
    models/qwen.cpp v1 namespace)."""

    def _tagged(self, role: str, text: str, ids: list[int], close: bool = True):
        tok = self.tokenizer
        ids.append(tok.im_start_token_id)
        ids.extend(tok.encode(role + "\n"))
        ids.extend(tok.encode(text))
        if close:
            ids.append(tok.im_end_token_id)
            ids.extend(tok.encode("\n"))

    def append_sys_prompt(self, ids: list[int]):
        if self.tokenizer.sys_prompt:
            self._tagged("system", self.tokenizer.sys_prompt, ids)

    def append_user(self, round_idx, user, ids):
        self._tagged("user", user, ids)

    def append_ai(self, round_idx, ai, ids):
        self._tagged("assistant", ai, ids)

    def append_ai_opening(self, round_idx, ids):
        tok = self.tokenizer
        ids.append(tok.im_start_token_id)
        ids.extend(tok.encode("assistant\n"))

    def append_user_opening(self, round_idx, ids):
        tok = self.tokenizer
        ids.append(tok.im_start_token_id)
        ids.extend(tok.encode("user\n"))


class ChatTokenizer:
    """BaseTokenizer analog: owns the byte-exact Processor + chat encoder +
    special ids + terminator set."""

    def __init__(self, processor, chat_encoder: HistoryEncoder | None = None,
                 *, sys_prompt: str = ""):
        self.tp = processor
        self.sys_prompt = sys_prompt
        self.chat_encoder = chat_encoder
        self.completion_encoder: HistoryEncoder | None = None
        if chat_encoder is not None:
            chat_encoder.tokenizer = self
        self.bos_token_id = -1
        self.eos_token_id = -1
        self.pad_token_id = -1
        self.im_start_token_id = -1
        self.im_end_token_id = -1
        self.nl_token_id = -1
        self.special_ids: set[int] = set()
        self.terminate_ids: set[int] = set()
        self.auto_add_bos = False
        self.vocab_size = processor.get_piece_size() if processor is not None else 0

    # -- primitive encode/decode -------------------------------------------
    def encode(self, text: str) -> list[int]:
        return self.tp.encode(text)

    def decode(self, ids: list[int]) -> str:
        normal = [i for i in ids if not self.is_special_id(i)]
        return self.tp.decode(normal)

    def decode_id(self, tid: int) -> str:
        return self.tp.decode([tid]) if not self.is_special_id(tid) else ""

    def piece_bytes(self, tid: int) -> bytes:
        """Raw decoded bytes of one token (for incremental utf8 streaming)."""
        if self.is_special_id(tid):
            return b""
        dec = getattr(self.tp, "decode_piece_bytes", None)
        if dec is not None:
            return dec(tid)
        return self.tp.decode([tid]).encode("utf-8")

    def is_special_id(self, tid: int) -> bool:
        # per-model marker ids excluded from DISPLAY (reference
        # Tokenizer::is_special_id overrides, e.g. bluelm.cpp:101-104)
        return tid in self.special_ids

    def is_terminate_token(self, tid: int) -> bool:
        return tid == self.eos_token_id or tid in self.terminate_ids

    # -- chat template ------------------------------------------------------
    def get_history_start(self, history: Messages, max_length: int) -> int:
        # reference src/chat.cpp:723: drop oldest rounds so ~max_length/2 fits
        start = len(history) - 1
        total = len(self.encode(history[start].content))
        start -= 1
        while start >= 1:
            total += len(self.encode(history[start].content))
            total += len(self.encode(history[start - 1].content))
            if total >= max_length:
                break
            start -= 2
        return max(start, 0)

    def encode_history(self, history: Messages, max_length: int = 8192, *,
                       incremental: bool = False, ai_opening: bool = True,
                       reversed_role: bool = False) -> list[int]:
        encoder = self.chat_encoder
        if encoder is None:
            ids = self.encode(history[len(history) - 1].content)
            if self.auto_add_bos and self.bos_token_id >= 0 and (not ids or ids[0] != self.bos_token_id):
                ids.insert(0, self.bos_token_id)
            return ids

        ids: list[int] = []
        start = history.cursor
        skip_role = MsgRole.USER if reversed_role else MsgRole.ASSISTANT
        if not incremental:
            start = self.get_history_start(history, max_length // 2)
        else:
            while start < len(history) and history[start].role == skip_role:
                start += 1
        for i in range(start, len(history)):
            encoder.append_message(history[i], ids)
        if ai_opening:
            rnd = history[start - 1].round if start > 0 else 0
            # reversed role (reference chat.cpp:761-767): the model speaks
            # as the USER, so open a user turn instead of an AI turn
            if reversed_role:
                encoder.append_user_opening(rnd, ids)
            else:
                encoder.append_ai_opening(rnd, ids)
        history.move_cursor_to_end()
        if not incremental and self.auto_add_bos and self.bos_token_id >= 0:
            if not ids or ids[0] != self.bos_token_id:
                ids.insert(0, self.bos_token_id)
        return ids

    def encode_sys_prompt(self) -> list[int]:
        ids: list[int] = []
        if self.chat_encoder is not None:
            self.chat_encoder.append_sys_prompt(ids)
        if self.auto_add_bos and self.bos_token_id >= 0:
            if not ids or ids[0] != self.bos_token_id:
                ids.insert(0, self.bos_token_id)
        return ids
