"""Flat brute-force vector store, file-compatible with the reference's
.vsdb format (/root/reference/src/vectorstore.cpp:19-26 `file_header`
{magic "CHATLLMVS", u64 emb_len, u64 size} with C struct padding, then
(u32-length-prefixed content, meta) pairs, then f32 embeddings).

Scoring is one numpy matmul instead of the reference's scalar loop
(vectorstore.cpp:720 "TODO: use GGML to accelerate" — done here).
"""
from __future__ import annotations

import base64
import enum
import struct

import numpy as np

VS_MAGIC = b"CHATLLMVS"
_HEADER = struct.Struct("<9s7xQQ")      # magic, pad to 8, emb_len, size


class DistanceStrategy(enum.IntEnum):
    # /root/reference/src/vectorstore.h:11-17
    EuclideanDistance = 0
    MaxInnerProduct = 1
    InnerProduct = 2
    CosineSimilarity = 3


def parse_distance_strategy(s: str) -> DistanceStrategy:
    return {
        "euclidean": DistanceStrategy.EuclideanDistance,
        "max_inner_product": DistanceStrategy.MaxInnerProduct,
        "inner_product": DistanceStrategy.InnerProduct,
        "cosine_similarity": DistanceStrategy.CosineSimilarity,
    }[s.lower()]


class CVectorStore:
    def __init__(self, vec_cmp: DistanceStrategy = DistanceStrategy.MaxInnerProduct,
                 emb_len: int = 0):
        self.vec_cmp = vec_cmp
        self.emb_len = emb_len
        self.contents: list[str] = []
        self.metadata: list[str] = []
        self.embeddings = np.zeros((0, emb_len), np.float32)

    # -- construction -------------------------------------------------------
    @classmethod
    def from_plain_data(cls, vec_cmp, emb_len: int, text_emb, fn: str) -> "CVectorStore":
        """Build from base64 (content, meta) line pairs
        (reference FromPlainData, vectorstore.cpp:218)."""
        vs = cls(vec_cmp, emb_len)
        with open(fn, "rb") as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        for i in range(0, len(lines) - 1, 2):
            vs.contents.append(base64.b64decode(lines[i]).decode("utf-8"))
            vs.metadata.append(base64.b64decode(lines[i + 1]).decode("utf-8"))
        embs = [np.asarray(text_emb(c), np.float32) for c in vs.contents]
        vs.embeddings = np.stack(embs) if embs else np.zeros((0, emb_len), np.float32)
        return vs

    @classmethod
    def load(cls, vec_cmp, files) -> "CVectorStore":
        vs = cls(vec_cmp)
        if isinstance(files, str):
            files = [files]
        for fn in files:
            vs._load_db(fn)
        return vs

    def _load_db(self, fn: str):
        with open(fn, "rb") as f:
            hdr = f.read(_HEADER.size)
            magic, emb_len, size = _HEADER.unpack(hdr)
            assert magic == VS_MAGIC, f"bad vsdb magic in {fn}"
            emb_len = int(emb_len)
            if self.emb_len == 0:
                self.emb_len = emb_len
            assert self.emb_len == emb_len, "embedding length mismatch"
            for _ in range(size):
                for target in (self.contents, self.metadata):
                    (n,) = struct.unpack("<I", f.read(4))
                    target.append(f.read(n).decode("utf-8"))
            embs = np.frombuffer(f.read(size * emb_len * 4), np.float32)
            embs = embs.reshape(size, emb_len)
        self.embeddings = (embs if self.embeddings.size == 0
                           else np.concatenate([self.embeddings, embs]))

    def export_db(self, fn: str):
        with open(fn, "wb") as f:
            f.write(_HEADER.pack(VS_MAGIC, self.emb_len, len(self.contents)))
            for c, m in zip(self.contents, self.metadata):
                for s in (c, m):
                    b = s.encode("utf-8")
                    f.write(struct.pack("<I", len(b)))
                    f.write(b)
            f.write(np.ascontiguousarray(self.embeddings, np.float32).tobytes())

    # -- query --------------------------------------------------------------
    def __len__(self):
        return len(self.contents)

    def get_record(self, index: int) -> tuple[str, str]:
        return self.contents[index], self.metadata[index]

    def query(self, vec, top_n: int = 20) -> list[int]:
        v = np.asarray(vec, np.float32)
        E = self.embeddings
        if len(E) == 0:
            return []
        if self.vec_cmp == DistanceStrategy.EuclideanDistance:
            scores = np.square(E - v[None, :]).sum(axis=1)
            best_max = False
        elif self.vec_cmp in (DistanceStrategy.MaxInnerProduct, DistanceStrategy.InnerProduct):
            scores = E @ v
            best_max = True
        else:  # cosine
            scores = (E @ v) / (np.linalg.norm(E, axis=1) * np.linalg.norm(v) + 1e-8)
            best_max = True
        order = np.argsort(-scores if best_max else scores, kind="stable")
        return order[:top_n].tolist()


class VectorStores:
    """Named vector-store registry with a selectable default
    (reference src/chat.cpp:2612-2650 `VectorStores`: first store created
    becomes the default; `select(name)` switches retrieval to another)."""

    def __init__(self, stores: dict[str, CVectorStore] | None = None):
        self.stores: dict[str, CVectorStore] = dict(stores or {})
        self.def_store: CVectorStore | None = next(
            iter(self.stores.values()), None)

    def get(self, name: str | None = None) -> CVectorStore | None:
        if name is None:
            return self.def_store
        return self.stores.get(name)

    def select(self, name: str) -> bool:
        p = self.stores.get(name)
        if p is not None:
            self.def_store = p
            return True
        return False
