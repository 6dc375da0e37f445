"""Byte-exact tokenizers.

Re-implements the reference's tokenizer semantics in Python so that token
ids match the C++ engine exactly (parity anchors:
/root/reference/src/tokenizer.cpp — llama_sp_tokenizer:54, llm_bpe_tokenizer:492,
unigram_tokenizer:876, load_vocab_list:330, Processor::Encode:225).

Vocabulary is loaded from the model file itself (GGMM vocab span), never from
external tokenizer files.

Four processors:
  BPEProcessor1  — sentencepiece-score BPE (Llama-2/Qwen-era SP models)
  BPEProcessor2  — HF byte-level BPE with regex pre-split + merge ranks
  BPEProcessor3  — byte-level vocab, but greedy-score merges (tiktoken-ish)
  UnigramProcessor — unigram LM Viterbi
"""
from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import regex as _regex

# ---------------------------------------------------------------------------
# vocab
# ---------------------------------------------------------------------------


class TokenType:
    UNDEFINED = 0
    NORMAL = 1
    UNKNOWN = 2
    CONTROL = 3
    USER_DEFINED = 4
    UNUSED = 5
    BYTE = 6


@dataclass
class TokenRecord:
    tok: bytes
    score: float = 0.0
    type: int = TokenType.NORMAL


@dataclass
class Vocab:
    token_to_id: dict[bytes, int] = field(default_factory=dict)
    id_to_token: list[TokenRecord] = field(default_factory=list)
    special_tokens: dict[int, bytes] = field(default_factory=dict)
    bpe_ranks: dict[tuple[bytes, bytes], int] = field(default_factory=dict)
    byte_fallback_tok_ids: list[int] = field(default_factory=lambda: [-1] * 256)
    byte_fallback_ready: bool = False

    def find_bpe_rank(self, left: bytes, right: bytes) -> int:
        return self.bpe_ranks.get((left, right), -1)

    def is_normal(self, tid: int) -> bool:
        return 0 <= tid < len(self.id_to_token) and self.id_to_token[tid].type == TokenType.NORMAL

    def is_control(self, tid: int) -> bool:
        return 0 <= tid < len(self.id_to_token) and self.id_to_token[tid].type == TokenType.CONTROL


def load_vocab_list(vocab: Vocab, reader, has_score: bool, has_type: bool, start_id: int = 0) -> int:
    """Parse the vocab records written by the converter (format:
    /root/reference/convert.py write_vocab; byte-fallback detection:
    /root/reference/src/tokenizer.cpp:330-379)."""
    count = 0
    byte_fallback_started = False
    last_byte = -1
    while True:
        ln = reader.i32()
        if ln < 0:
            break
        tid = start_id + count
        word = reader.read(ln)
        score = reader.f32() if has_score else 0.0
        ttype = reader.u8() if has_type else TokenType.NORMAL

        flag = False
        if len(word) == 1:
            ch = word[0]
            if not byte_fallback_started and ch == 0:
                byte_fallback_started = True
                last_byte = -1
            if byte_fallback_started:
                if ch == last_byte + 1:
                    last_byte = ch
                    vocab.byte_fallback_tok_ids[last_byte] = tid
                    flag = True
                else:
                    byte_fallback_started = False
        if not flag:
            vocab.token_to_id[word] = tid
        while len(vocab.id_to_token) <= tid:
            vocab.id_to_token.append(TokenRecord(b""))
        vocab.id_to_token[tid] = TokenRecord(word, score, ttype)
        count += 1
    for i in range(last_byte + 1):
        vocab.token_to_id.setdefault(bytes([i]), vocab.byte_fallback_tok_ids[i])
    if last_byte == 255:
        vocab.byte_fallback_ready = True
    return count


def load_vocab_merges(vocab: Vocab, reader) -> int:
    count = 0
    while True:
        ln = reader.i32()
        if ln < 0:
            break
        word = reader.read(ln)
        pos = word.find(b" ", 1)
        if pos >= 0:
            vocab.bpe_ranks[(word[:pos], word[pos + 1 :])] = count
        count += 1
    return count


# ---------------------------------------------------------------------------
# utf-8 walking (the reference walks possibly-invalid utf8 with a lookup
# table; we mirror that so malformed bytes split identically)
# ---------------------------------------------------------------------------

_UTF8_LEN = [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 3, 4]


def utf8_char_lengths(data: bytes) -> list[int]:
    out = []
    off = 0
    n = len(data)
    while off < n:
        ln = min(n - off, _UTF8_LEN[data[off] >> 4])
        out.append(ln)
        off += ln
    return out


# ---------------------------------------------------------------------------
# GPT-2 byte-level mapping
# ---------------------------------------------------------------------------

def _build_byte_maps():
    b2u = {}
    for ch in list(range(0x21, 0x7F)) + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100)):
        b2u[ch] = chr(ch)
    n = 0
    for ch in range(256):
        if ch not in b2u:
            b2u[ch] = chr(256 + n)
            n += 1
    u2b = {v: k for k, v in b2u.items()}
    return b2u, u2b


BYTE_TO_UNICODE, UNICODE_TO_BYTE = _build_byte_maps()


def byte_level_encode(data: bytes) -> bytes:
    """raw bytes -> byte-level token text (utf-8 of mapped chars)."""
    return "".join(BYTE_TO_UNICODE[b] for b in data).encode("utf-8")


def byte_level_decode(text: bytes) -> bytes:
    """byte-level token text -> raw bytes (unmappable chars pass through)."""
    out = bytearray()
    for ch in text.decode("utf-8", errors="replace"):
        b = UNICODE_TO_BYTE.get(ch)
        if b is None:
            out.extend(ch.encode("utf-8"))
        else:
            out.append(b)
    return bytes(out)


# ---------------------------------------------------------------------------
# preprocessors (src/tokenizer.cpp:1020-1060)
# ---------------------------------------------------------------------------


class TextPrepTrim:
    def transform(self, s: str) -> str:
        return s.rstrip(" ")


class TextTrim:
    def transform(self, s: str) -> str:
        return s.strip(" \t\r\n")


class TextPrepDeleteMultiSpaces:
    _re = _regex.compile(r" {2,}")

    def transform(self, s: str) -> str:
        return self._re.sub(" ", s)


class TextPrepNewlineToSpaces:
    _re = _regex.compile(r"[\r\n]+")

    def transform(self, s: str) -> str:
        return self._re.sub(" ", s)


class TextPrepAddLeadingSpace:
    def transform(self, s: str) -> str:
        if len(s) < 1:
            return " "
        return s if s[0] == " " else " " + s


# ---------------------------------------------------------------------------
# special-token trie (faithful to NearestKeywordSearcher semantics,
# src/tokenizer.cpp:712-818: only leaf keywords match; earliest position wins)
# ---------------------------------------------------------------------------


class KeywordSearcher:
    def __init__(self, keywords: dict[int, bytes]):
        self.root: dict = {}
        for tid, kw in keywords.items():
            node = self.root
            for b in kw:
                node = node.setdefault(b, {})
            node["id"] = tid

    def _match(self, data: bytes, index: int) -> tuple[int, int]:
        """Returns (token_id, length) matching at index, walking until a
        leaf; -1 if none (keywords that are strict prefixes of others only
        match through their longest extension — reference quirk)."""
        node = self.root
        level = 0
        while True:
            children = [k for k in node if k != "id"]
            if not children:
                return node.get("id", -1), level
            if index >= len(data):
                return -1, 0
            b = data[index]
            if b not in node:
                return -1, 0
            node = node[b]
            index += 1
            level += 1

    def split(self, data: bytes):
        """Yield (leading_bytes, token_id) pieces; final piece has id=-1."""
        while True:
            idx = 0
            found = -1
            ln = 0
            while idx < len(data):
                found, ln = self._match(data, idx)
                if found >= 0:
                    break
                idx += 1
            if found >= 0:
                yield data[:idx], found
                data = data[idx + ln :]
            else:
                yield data, -1
                return


# ---------------------------------------------------------------------------
# processors
# ---------------------------------------------------------------------------


class Processor:
    def __init__(self):
        self.vocab = Vocab()
        self.piece_size = 0
        self.id_unk_token = -1
        self.token_unk_id = "<?>"
        self.ret_special_token = False
        self.pp: list = []
        self.token_override: dict[int, str] = {}
        self.added_tokens: list[tuple[str, int]] = []

    # -- loading -----------------------------------------------------------
    def load(self, reader, n_vocab: int) -> int:
        raise NotImplementedError

    # -- encode/decode -----------------------------------------------------
    def _do_encode(self, text: bytes, ids: list[int]):
        raise NotImplementedError

    def encode(self, text: str) -> list[int]:
        s = text
        for p in self.pp:
            s = p.transform(s)
        ids: list[int] = []
        data = s
        # added-token split: earliest occurrence of any added token wins
        # (src/tokenizer.cpp:225-262)
        while True:
            special_pos = None
            special_id = -1
            special_len = 0
            for tok, tid in self.added_tokens:
                pos = data.find(tok)
                if pos >= 0 and (special_pos is None or pos < special_pos):
                    special_pos = pos
                    special_id = tid
                    special_len = len(tok)
            if special_pos is None:
                break
            self._do_encode(data[:special_pos].encode("utf-8"), ids)
            data = data[special_pos + special_len :]
            ids.append(special_id)
        self._do_encode(data.encode("utf-8"), ids)
        return ids

    def decode(self, ids: list[int]) -> str:
        return b"".join(self.id_to_piece_bytes(i) for i in ids).decode("utf-8", errors="replace")

    def id_to_piece_bytes(self, tid: int) -> bytes:
        if tid in self.token_override:
            return self.token_override[tid].encode("utf-8")
        if tid < 0:
            return self.token_unk_id.encode("utf-8")
        if tid < len(self.vocab.id_to_token):
            return self.vocab.id_to_token[tid].tok
        return self.token_unk_id.encode("utf-8")

    def id_to_piece(self, tid: int) -> str:
        return self.id_to_piece_bytes(tid).decode("utf-8", errors="replace")

    def piece_to_id(self, piece: str) -> int:
        for tok, tid in self.added_tokens:
            if tok == piece:
                return tid
        return self.vocab.token_to_id.get(piece.encode("utf-8"), self.id_unk_token)

    # -- config ------------------------------------------------------------
    def register_preprocessor(self, prep):
        self.pp.append(prep)

    def override_token_decoding(self, tid: int, tok: str):
        if tid < 0:
            return
        self.token_override[tid] = tok

    def add_added_token(self, tok: str, tid: int):
        assert tid >= 0, f"add_added_token: {tok}, id={tid}"
        self.override_token_decoding(tid, tok)
        self.added_tokens.append((tok, tid))

    def enable_return_special_token(self, en: bool):
        self.ret_special_token = en

    def set_id_unknown_token(self, tid: int):
        self.id_unk_token = tid

    def get_piece_size(self) -> int:
        return self.piece_size

    def _finish_load(self):
        for rec_id, rec in enumerate(self.vocab.id_to_token):
            if rec.type != TokenType.NORMAL:
                self.vocab.special_tokens[rec_id] = rec.tok


class BPEProcessor1(Processor):
    """SentencePiece-score BPE (llama_sp_tokenizer parity)."""

    def load(self, reader, n_vocab: int) -> int:
        start = reader.off
        self.piece_size = load_vocab_list(self.vocab, reader, True, False, 0)
        del self.vocab.id_to_token[self.piece_size :]
        self._nbpe_sp = None
        return reader.off - start

    def _native_bpe_sp(self):
        """Lazy C++ SP-score merge (native/bpe.cpp spm_encode).  Named
        separately from BPEProcessor2's ranked engine so BPEProcessor3
        (BPE2 subclass delegating here) builds the SCORE engine, not the
        rank one."""
        if getattr(self, "_nbpe_sp", None) is None:
            import os

            if os.environ.get("CHATLLM_TPU_NATIVE_BPE", "1") == "0":
                self._nbpe_sp = False
            else:
                try:
                    from ..native import NativeBPE

                    v = self.vocab
                    nb = NativeBPE(list(v.token_to_id.items()), [],
                                   scores=[r.score for r in v.id_to_token])
                    self._nbpe_sp = nb if nb.ok else False
                except Exception:
                    self._nbpe_sp = False
        return self._nbpe_sp or None

    def _do_encode(self, text: bytes, ids: list[int]):
        if not text:
            return
        nb = self._native_bpe_sp()
        if nb is not None:
            got = nb.encode_sp(text)
            if got is not None:
                ids.extend(got)
                return
        v = self.vocab
        # symbols: (start, length) over bytes; linked list via prev/next
        lens = utf8_char_lengths(text)
        n = len(lens)
        start = []
        off = 0
        for ln in lens:
            start.append(off)
            off += ln
        length = lens[:]
        prev = list(range(-1, n - 1))
        nxt = [i + 1 if start[i] + length[i] < len(text) else -1 for i in range(n)]

        heap: list[tuple[float, int, int, int, int]] = []
        counter = 0

        def try_add_bigram(left: int, right: int):
            nonlocal counter
            if left == -1 or right == -1:
                return
            cand = text[start[left] : start[right] + length[right]]
            tid = v.token_to_id.get(cand)
            if tid is None or tid >= len(v.id_to_token):
                return
            score = v.id_to_token[tid].score
            # C++ max-heap: higher score first; tie -> smaller left index
            heapq.heappush(heap, (-score, left, counter, right, len(cand)))
            counter += 1

        for i in range(1, n):
            try_add_bigram(i - 1, i)

        while heap:
            negscore, left, _, right, size = heapq.heappop(heap)
            if length[left] == 0 or length[right] == 0 or length[left] + length[right] != size:
                continue
            length[left] += length[right]
            length[right] = 0
            nxt[left] = nxt[right]
            if nxt[right] >= 0:
                prev[nxt[right]] = left
            try_add_bigram(prev[left], left)
            try_add_bigram(left, nxt[left])

        i = 0
        while i != -1:
            piece = text[start[i] : start[i] + length[i]]
            tid = v.token_to_id.get(piece)
            if tid is None:
                for b in piece:
                    ids.append(b + 3)  # llama.cpp byte-fallback convention
            else:
                ids.append(tid)
            i = nxt[i]


class BPEProcessor2(Processor):
    """HF byte-level BPE: regex pre-split, byte->unicode mapping, rank-based
    merges, ByteLevel or Sequence decoder."""

    DEFAULT_REGEXES = [
        r"[\p{P}\$\+<=>\^~\|]+",
        r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)",
        r"\p{N}+",
        r"[0-9][0-9][0-9]",
    ]

    DECODER_BYTE_LEVEL = 0
    DECODER_SEQUENCE = 1

    def __init__(self, regex_exprs: list[str] | None = None):
        super().__init__()
        self.regex_exprs = regex_exprs if regex_exprs is not None else self.DEFAULT_REGEXES
        self._compiled = [_regex.compile(e) for e in self.regex_exprs]
        self.searcher: KeywordSearcher | None = None
        self.dec_type = self.DECODER_BYTE_LEVEL
        self._nbpe = None          # lazy NativeBPE (False = unavailable)

    def set_decoder_type(self, t: int):
        self.dec_type = t

    def _native_bpe(self):
        """Lazy C++ merge engine (native/bpe.cpp) mirroring _merge_ranked;
        falls back to the Python path when the toolchain is absent or any
        encode reports a miss.  CHATLLM_TPU_NATIVE_BPE=0 disables."""
        if self._nbpe is None:
            import os

            if os.environ.get("CHATLLM_TPU_NATIVE_BPE", "1") == "0":
                self._nbpe = False
            else:
                try:
                    from ..native import NativeBPE

                    v = self.vocab
                    ranked = sorted(v.bpe_ranks.items(), key=lambda kv: kv[1])
                    nb = NativeBPE(list(v.token_to_id.items()),
                                   [lr for lr, _ in ranked])
                    self._nbpe = nb if nb.ok else False
                except Exception:
                    self._nbpe = False
        return self._nbpe or None

    def load(self, reader, n_vocab: int) -> int:
        start = reader.off
        self.piece_size = load_vocab_list(self.vocab, reader, False, True, 0)
        del self.vocab.id_to_token[self.piece_size :]
        load_vocab_merges(self.vocab, reader)
        self._finish_load()
        self.searcher = KeywordSearcher(self.vocab.special_tokens)
        return reader.off - start

    # regex split applied sequentially: each expr further splits the pieces
    def _regex_split(self, text: str) -> list[str]:
        pieces = [text]
        for creg in self._compiled:
            nxt = []
            for p in pieces:
                last = 0
                for m in creg.finditer(p):
                    if m.start() > last:
                        nxt.append(p[last : m.start()])
                    if m.end() > m.start():
                        nxt.append(p[m.start() : m.end()])
                    last = m.end()
                if last < len(p):
                    nxt.append(p[last:])
            pieces = nxt
        return pieces

    def _do_encode(self, text: bytes, ids: list[int]):
        if not text:
            return
        # split around special tokens appearing literally in the text
        for leading, sp_id in self.searcher.split(text):
            self._do_encode2(leading, ids)
            if sp_id >= 0:
                ids.append(sp_id)

    def _bpe_words(self, text: bytes) -> list[bytes]:
        words = self._regex_split(text.decode("utf-8", errors="replace"))
        if self.dec_type == self.DECODER_SEQUENCE:
            # Sequence decoder == raw-text vocab: the reference skips the
            # byte-level alphabet mapping entirely (BPEProcessor2::DoEncode2,
            # src/tokenizer.cpp:659-661 — mapping only for ByteLevel)
            return [w.encode("utf-8") for w in words]
        return [byte_level_encode(w.encode("utf-8")) for w in words]

    def _do_encode2(self, text: bytes, ids: list[int]):
        if not text:
            return
        words = self._bpe_words(text)
        self._merge_ranked(words, ids)

    def _merge_ranked(self, words: list[bytes], ids: list[int]):
        """Rank-queue BPE merge (llm_bpe_tokenizer parity: lower rank first,
        tie -> smaller left index), then byte-fallback to single mapped
        chars.  The C++ engine (native/bpe.cpp) runs the same algorithm
        ~6x faster; any miss falls back to this Python path."""
        nb = self._native_bpe()
        if nb is not None:
            got = nb.encode_words(words,
                                  self.dec_type == self.DECODER_SEQUENCE)
            if got is not None:
                ids.extend(got)
                return
        v = self.vocab
        for word in words:
            lens = utf8_char_lengths(word)
            n = len(lens)
            if n == 0:
                continue
            starts = []
            off = 0
            for ln in lens:
                starts.append(off)
                off += ln
            length = lens[:]
            prev = list(range(-1, n - 1))
            nxt = [i + 1 if starts[i] + length[i] < len(word) else -1 for i in range(n)]
            heap: list[tuple[int, int, bytes]] = []

            def add_bigram(left, right):
                if left == -1 or right == -1:
                    return
                lt = word[starts[left] : starts[left] + length[left]]
                rt = word[starts[right] : starts[right] + length[right]]
                rank = v.find_bpe_rank(lt, rt)
                if rank < 0:
                    return
                heapq.heappush(heap, (rank, left, right, lt + rt))

            for i in range(1, n):
                add_bigram(i - 1, i)

            while heap:
                rank, left, right, btext = heapq.heappop(heap)
                if length[left] == 0 or length[right] == 0:
                    continue
                cur = word[starts[left] : starts[left] + length[left]] + word[
                    starts[right] : starts[right] + length[right]
                ]
                if cur != btext:
                    continue
                length[left] += length[right]
                length[right] = 0
                nxt[left] = nxt[right]
                if nxt[right] >= 0:
                    prev[nxt[right]] = left
                add_bigram(prev[left], left)
                add_bigram(left, nxt[left])

            i = 0
            while i != -1:
                if length[i] > 0:
                    piece = word[starts[i] : starts[i] + length[i]]
                    tid = v.token_to_id.get(piece)
                    if tid is None:
                        # fallback: mapped chars (byte-level vocabs) or raw
                        # single bytes (Sequence/raw vocabs — the reference
                        # falls back per BYTE, tokenizer.cpp:603-609)
                        if self.dec_type == self.DECODER_SEQUENCE:
                            units = [piece[j:j + 1] for j in range(len(piece))]
                        else:
                            units = []
                            coff = 0
                            for cl in utf8_char_lengths(piece):
                                units.append(piece[coff:coff + cl])
                                coff += cl
                        for ch in units:
                            ctid = v.token_to_id.get(ch)
                            if ctid is None:
                                raise ValueError(f"byte not found in vocab: {ch!r}")
                            ids.append(ctid)
                    else:
                        ids.append(tid)
                i = nxt[i]

    def id_to_piece_bytes(self, tid: int) -> bytes:
        if tid in self.token_override:
            return self.token_override[tid].encode("utf-8")
        v = self.vocab
        if v.is_normal(tid):
            raw = v.id_to_token[tid].tok
            if self.dec_type == self.DECODER_BYTE_LEVEL:
                return byte_level_decode(raw)
            return raw
        if v.is_control(tid):
            return b""
        if self.ret_special_token and 0 <= tid < len(v.id_to_token):
            return v.id_to_token[tid].tok
        return b""


class BPEProcessor3(BPEProcessor2):
    """Byte-level vocab with score-greedy merges (no regex pre-split)."""

    def __init__(self, regex_exprs: list[str] | None = None):
        super().__init__(regex_exprs)

    # score-greedy merge engine borrowed from BPEProcessor1 (the reference's
    # BPEProcessor3::DoEncode2 runs llama_sp_tokenizer, tokenizer.cpp:674)
    _native_bpe_sp = BPEProcessor1._native_bpe_sp

    def _do_encode2(self, text: bytes, ids: list[int]):
        if not text:
            return
        BPEProcessor1._do_encode(self, text, ids)

    def id_to_piece_bytes(self, tid: int) -> bytes:
        if tid in self.token_override:
            return self.token_override[tid].encode("utf-8")
        v = self.vocab
        if v.is_normal(tid):
            return v.id_to_token[tid].tok
        if v.is_control(tid):
            return b""
        if self.ret_special_token and 0 <= tid < len(v.id_to_token):
            return v.id_to_token[tid].tok
        return b""


class UnigramProcessor(Processor):
    """Unigram-LM Viterbi tokenizer (unigram_tokenizer parity)."""

    def __init__(self, unk_tok_id: int):
        super().__init__()
        self.unk_tok_id = unk_tok_id
        self.tok_max_len = 0

    def load(self, reader, n_vocab: int) -> int:
        start = reader.off
        self.piece_size = load_vocab_list(self.vocab, reader, True, False, 0)
        del self.vocab.id_to_token[self.piece_size :]
        self.tok_max_len = max((len(r.tok) for r in self.vocab.id_to_token), default=0)
        return reader.off - start

    def _do_encode(self, text: bytes, ids: list[int]):
        if not text:
            return
        v = self.vocab
        lens = utf8_char_lengths(text)
        # symbol ends: position 0 plus end of each char
        ends = [0]
        off = 0
        for ln in lens:
            off += ln
            ends.append(off)
        n = len(ends)
        if n <= 1:
            return
        # trace[i] = (prev, score, tok_id)
        trace = [(0, 0.0, 0)]
        for pos in range(1, n):
            lo = max(0, pos - self.tok_max_len)
            best_score = -float("inf")
            best_prev = -1
            best_tok = -1
            for i in range(lo, pos):
                piece = text[ends[i] : ends[pos]]
                tid = v.token_to_id.get(piece)
                if tid is None:
                    continue
                sc = trace[i][1] + v.id_to_token[tid].score
                if sc > best_score:
                    best_score = sc
                    best_prev = i
                    best_tok = tid
            if best_prev < 0:
                i = pos - 1
                best_prev = i
                best_score = trace[i][1] + v.id_to_token[self.unk_tok_id].score
                best_tok = self.unk_tok_id
            trace.append((best_prev, best_score, best_tok))
        out = []
        prev = n - 1
        while prev != 0:
            p, _, tid = trace[prev]
            out.append(tid)
            prev = p
        ids.extend(reversed(out))
