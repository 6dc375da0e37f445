"""GGMM file writer.

Produces files byte-compatible with the reference converter's container
layout (/root/reference/convert.py:1327-1358 `BaseConverter.convert`).
Used for tests (synthetic tiny models) and for re-quantization tooling.
"""
from __future__ import annotations

import json
import struct
from typing import Iterable, Sequence

import numpy as np

from .quants import GGMLType, quantize
from .reader import GGML_MEM_ALIGN


class GGMMWriter:
    def __init__(self, f, model_type: int, file_version: int = 1, meta: dict | None = None):
        self.f = f
        f.write(b"ggmm")
        f.write(struct.pack("<4I", 1, 0, 0, 0))  # ver + 3 placeholder offsets
        meta_bytes = json.dumps(meta or {}, ensure_ascii=False).encode()
        meta_bytes += b"\x00" * (-len(meta_bytes) % 4)
        f.write(meta_bytes)
        self._patch_offset(8)
        self._type_pos = f.tell()
        f.write(struct.pack("<ii", model_type, file_version))

    def patch_model_type(self, model_type: int):
        """Rewrite the model-type id (converters decide it after inspecting
        the config)."""
        end = self.f.tell()
        self.f.seek(self._type_pos)
        self.f.write(struct.pack("<i", int(model_type)))
        self.f.seek(end)

    def patch_file_version(self, version: int):
        """QWen-v1 files carry FILE_VERSION 2 (reference QWenConverter)."""
        end = self.f.tell()
        self.f.seek(self._type_pos + 4)
        self.f.write(struct.pack("<i", int(version)))
        self.f.seek(end)

    def _patch_offset(self, pos: int):
        size = self.f.tell()
        self.f.seek(pos)
        self.f.write(struct.pack("<I", size))
        self.f.seek(0, 2)

    def write_config(self, values: Sequence, fmt: str | None = None):
        """Write the per-arch Config struct. If fmt is None, all values are
        packed as i32 except floats which are packed as f32."""
        if fmt is not None:
            self.f.write(struct.pack("<" + fmt, *values))
        else:
            for v in values:
                if isinstance(v, float):
                    self.f.write(struct.pack("<f", v))
                else:
                    self.f.write(struct.pack("<i", int(v)))
        self._patch_offset(12)

    def write_vocab_sp(self, tokens: Iterable[tuple[bytes, float]]):
        """SentencePiece-style vocab: (text, score) pairs."""
        for text, score in tokens:
            self.f.write(struct.pack("<i", len(text)))
            self.f.write(text)
            self.f.write(struct.pack("<f", score))
        self.f.write(struct.pack("<i", -1))
        self._patch_offset(16)

    def write_vocab_bpe(self, tokens: Iterable[tuple[bytes, int]], merges: Iterable[str]):
        """Byte-level BPE vocab: (text, token_type) pairs + merge list."""
        for text, tt in tokens:
            self.f.write(struct.pack("<i", len(text)))
            self.f.write(text)
            self.f.write(struct.pack("<B", tt))
        self.f.write(struct.pack("<i", -1))
        for s in merges:
            b = s.encode("utf-8")
            self.f.write(struct.pack("<i", len(b)))
            self.f.write(b)
        self.f.write(struct.pack("<i", -1))
        self._patch_offset(16)

    def write_tensor(self, name: str, tensor: np.ndarray, dtype: GGMLType):
        nb = name.encode()
        self.f.write(struct.pack("<i", len(nb)))
        self.f.write(nb)
        self.f.write(struct.pack(f"<{1 + tensor.ndim}i", tensor.ndim, *tensor.shape))
        self.f.write(struct.pack("<i", int(dtype)))
        pos = self.f.tell()
        aligned = (pos + GGML_MEM_ALIGN - 1) // GGML_MEM_ALIGN * GGML_MEM_ALIGN
        if aligned != pos:
            self.f.write(b"\x00" * (aligned - pos))
        self.f.write(quantize(np.asarray(tensor, dtype=np.float32), dtype))
