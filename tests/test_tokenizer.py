"""Tokenizer parity tests.

BPEProcessor2 is validated against HF `tokenizers` (byte-level BPE ground
truth); BPE1/Unigram against hand-constructed vocabs with known outputs."""
import io
import struct

import pytest

from chatllm_tpu.ggmm.reader import SpanReader
from chatllm_tpu.tokenizer import (
    BPEProcessor1,
    BPEProcessor2,
    UnigramProcessor,
)
from chatllm_tpu.tokenizer.processor import TokenType, byte_level_encode, byte_level_decode

GPT2_REGEX = [r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"]

SAMPLES = [
    "Hello, world!",
    "  leading spaces and\ttabs\n\nnewlines",
    "numbers 123456 and mixed a1b2c3",
    "CamelCase snake_case kebab-case",
    "unicode: naïve café 中文分词 😀 emoji",
    "don't stop believing, it's 2024!",
    "    ",
    "a",
    "",
    "price: $19.99 (20% off) — deal!!",
]


def _mk_span(payload: bytes) -> SpanReader:
    return SpanReader(memoryview(payload), 0)


def _bpe_vocab_bytes(vocab_items, merges) -> bytes:
    out = io.BytesIO()
    for text, tt in vocab_items:
        out.write(struct.pack("<i", len(text)))
        out.write(text)
        out.write(struct.pack("<B", tt))
    out.write(struct.pack("<i", -1))
    for m in merges:
        b = m.encode()
        out.write(struct.pack("<i", len(b)))
        out.write(b)
    out.write(struct.pack("<i", -1))
    return out.getvalue()


@pytest.fixture(scope="module")
def hf_bpe():
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=True)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=600, special_tokens=["<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    corpus = [
        "The quick brown fox jumps over the lazy dog. " * 3,
        "Hello world, hello tokenizer, don't stop believing! 12345",
        "def main():\n    print('hi')\n",
        "naïve café übermensch 中文",
    ]
    tok.train_from_iterator(corpus, trainer)
    return tok


def _processor_from_hf(tok) -> BPEProcessor2:
    vocab = tok.get_vocab()  # str(mapped) -> id
    id2tok = sorted(vocab.items(), key=lambda kv: kv[1])
    items = []
    for text, tid in id2tok:
        assert tid == len(items)
        tt = TokenType.CONTROL if text in ("<s>", "</s>") else TokenType.NORMAL
        items.append((text.encode(), tt))
    # tokenizers >= 0.20 exposes merges via the serialized model
    import json

    data = json.loads(tok.to_str())
    merges = []
    for m in data["model"]["merges"]:
        if isinstance(m, list):
            merges.append(f"{m[0]} {m[1]}")
        else:
            merges.append(m)
    payload = _bpe_vocab_bytes(items, merges)
    p = BPEProcessor2(GPT2_REGEX)
    p.load(_mk_span(payload), len(items))
    return p


def test_bpe2_matches_hf(hf_bpe):
    p = _processor_from_hf(hf_bpe)
    for s in SAMPLES:
        expected = hf_bpe.encode(s).ids
        got = p.encode(s)
        assert got == expected, f"{s!r}: {got} != {expected}"


def test_bpe2_decode_roundtrip(hf_bpe):
    p = _processor_from_hf(hf_bpe)
    for s in SAMPLES:
        ids = p.encode(s)
        assert p.decode(ids) == s


def test_byte_level_mapping_roundtrip():
    data = bytes(range(256))
    assert byte_level_decode(byte_level_encode(data)) == data


def test_bpe1_sentencepiece_style():
    # vocab: 3 reserved ids then byte-fallback style pieces + merges by score
    # id layout mimics llama: 0=<unk>,1=<s>,2=</s>, 3..258 bytes, then pieces
    out = io.BytesIO()

    def w(text: bytes, score: float):
        out.write(struct.pack("<i", len(text)))
        out.write(text)
        out.write(struct.pack("<f", score))

    w(b" \xe2\x81\x87 ", 0.0)  # unk
    w(b"<s>", 0.0)
    w(b"</s>", 0.0)
    for i in range(256):
        w(bytes([i]), 0.0) if i == 0 else w(bytes([i]), 0.0)
    pieces = [(b"he", -1.0), (b"ll", -2.0), (b"hell", -3.0), (b"o", -0.5), (b"hello", -6.0), (b"\xe2\x96\x81", -4.0)]
    for t, s in pieces:
        w(t, s)
    out.write(struct.pack("<i", -1))

    p = BPEProcessor1()
    p.load(_mk_span(out.getvalue()), 259 + len(pieces))
    # merge order: he(-1) then o stays, ll(-2), hell(-3), hello(-6)
    ids = p.encode("hello")
    assert [p.id_to_piece(i) for i in ids] == ["hello"]
    # unknown char falls back to byte ids (byte + 3)
    ids = p.encode("h~")
    assert ids[-1] == ord("~") + 3


def test_unigram_viterbi():
    out = io.BytesIO()

    def w(text: bytes, score: float):
        out.write(struct.pack("<i", len(text)))
        out.write(text)
        out.write(struct.pack("<f", score))

    toks = [(b"<unk>", -10.0), (b"a", -1.0), (b"b", -1.0), (b"ab", -1.5), (b"abc", -4.0), (b"c", -1.0)]
    for t, s in toks:
        w(t, s)
    out.write(struct.pack("<i", -1))
    p = UnigramProcessor(unk_tok_id=0)
    p.load(_mk_span(out.getvalue()), len(toks))
    # "abc": ab(-1.5)+c(-1.0) = -2.5 beats a+b+c=-3 and abc=-4
    ids = p.encode("abc")
    assert [p.id_to_piece(i) for i in ids] == ["ab", "c"]
    # unknown char -> unk id
    ids = p.encode("az")
    assert ids == [1, 0]


def test_added_tokens_split():
    out = io.BytesIO()

    def w(text: bytes, score: float):
        out.write(struct.pack("<i", len(text)))
        out.write(text)
        out.write(struct.pack("<f", score))

    toks = [(b"x", -1.0), (b"y", -1.0)]
    for t, s in toks:
        w(t, s)
    out.write(struct.pack("<i", -1))
    p = BPEProcessor1()
    p.load(_mk_span(out.getvalue()), 2)
    p.add_added_token("<|sp|>", 100)
    ids = p.encode("x<|sp|>y")
    assert ids == [0, 100, 1]
    assert p.id_to_piece(100) == "<|sp|>"
