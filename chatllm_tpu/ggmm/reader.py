"""GGML/GGMM model-file container reader.

File layout (writer spec: /root/reference/convert.py:1327-1358; reader
parity: /root/reference/src/models.cpp:1996-2048, src/chat.cpp:1425-1459):

  GGMM:
    "ggmm" | u32 version(=1) | u32 offset_config | u32 offset_tokenizer
    | u32 offset_tensors | meta JSON (NUL-padded to offset_config)
    @offset_config:    i32 model_type | i32 file_version | config bytes...
    @offset_tokenizer: vocab records
    @offset_tensors:   tensor records
  GGML (legacy): "ggml" | i32 model_type | i32 file_version | config ...

  vocab record:   i32 len | bytes | (f32 score [SP/Unigram] or u8 type [BPE]);
                  terminated by len = -1.  BPE vocabs are followed by a merge
                  list (i32 len | bytes, terminated by -1).
  tensor record:  i32 name_len | name | i32 ndim | i32 dims[ndim] (outermost
                  first) | i32 ggml_dtype | <align 16> | data
"""
from __future__ import annotations

import json
import mmap
import struct
from dataclasses import dataclass, field

import numpy as np

from .quants import GGMLType, dequantize, nbytes_for, type_to_str

GGML_MEM_ALIGN = 16


@dataclass
class TensorEntry:
    name: str
    shape: tuple[int, ...]       # numpy/torch order (outermost first)
    dtype: GGMLType
    data_offset: int             # absolute offset of (aligned) data in file

    @property
    def n_elements(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n

    @property
    def nbytes(self) -> int:
        return nbytes_for(self.dtype, self.n_elements)


@dataclass
class GGMMFile:
    """Parsed model file with lazy, mmap-backed tensor access."""

    path: str
    fmt: str = "GGMM"
    model_type: int = -1
    version: int = -1
    meta: dict = field(default_factory=dict)
    config_offset: int = 0
    tokenizer_offset: int = 0
    tensors_offset: int = 0
    tensors: dict[str, TensorEntry] = field(default_factory=dict)
    _mm: mmap.mmap | None = None
    _buf: memoryview | None = None

    # -- construction ------------------------------------------------------
    @classmethod
    def open(cls, path: str) -> "GGMMFile":
        f = open(path, "rb")
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        self = cls(path=path)
        self._mm = mm
        self._buf = memoryview(mm)
        self._parse_header()
        self._scan_tensors()
        return self

    def close(self):
        if self._buf is not None:
            self._buf.release()
            self._buf = None
        if self._mm is not None:
            self._mm.close()
            self._mm = None

    def _u32(self, off) -> int:
        return struct.unpack_from("<I", self._buf, off)[0]

    def _i32(self, off) -> int:
        return struct.unpack_from("<i", self._buf, off)[0]

    def _parse_header(self):
        magic = bytes(self._buf[0:4])
        if magic == b"ggmm":
            self.fmt = "GGMM"
            ver = self._u32(4)
            if ver != 1:
                raise ValueError(f"GGMM version {ver} unsupported")
            off_cfg, off_tok, off_tensors = struct.unpack_from("<III", self._buf, 8)
            meta_raw = bytes(self._buf[20:off_cfg]).rstrip(b"\x00")
            if meta_raw:
                try:
                    self.meta = json.loads(meta_raw.decode("utf-8"))
                except Exception:
                    self.meta = {}
            self.config_offset = off_cfg + 8  # past model_type + file_version
            self.tokenizer_offset = off_tok
            self.tensors_offset = off_tensors
            self.model_type = self._i32(off_cfg)
            self.version = self._i32(off_cfg + 4)
        elif magic == b"ggml":
            self.fmt = "GGML"
            self.model_type = self._i32(4)
            self.version = self._i32(8)
            self.config_offset = 12
            self.tokenizer_offset = 0   # follows config; resolved by model code
            self.tensors_offset = 0
        else:
            raise ValueError(f"bad magic {magic!r} in {self.path}")

    # -- raw regions -------------------------------------------------------
    def config_bytes(self, n: int) -> bytes:
        """Raw per-arch Config struct bytes starting at the config offset."""
        return bytes(self._buf[self.config_offset : self.config_offset + n])

    def read_config(self, fmt: str) -> tuple:
        """struct-unpack the config. `fmt` is a struct format (little-endian
        is implied)."""
        fmt = "<" + fmt
        return struct.unpack_from(fmt, self._buf, self.config_offset)

    def tokenizer_reader(self) -> "SpanReader":
        if self.tokenizer_offset == 0:
            raise ValueError("GGML legacy file: tokenizer offset is model-specific")
        return SpanReader(self._buf, self.tokenizer_offset)

    # -- tensors -----------------------------------------------------------
    def _scan_tensors(self):
        if self.fmt != "GGMM":
            return
        off = self.tensors_offset
        size = len(self._buf)
        while off < size:
            (name_len,) = struct.unpack_from("<i", self._buf, off)
            off += 4
            name = bytes(self._buf[off : off + name_len]).decode("utf-8")
            off += name_len
            (ndim,) = struct.unpack_from("<i", self._buf, off)
            off += 4
            dims = struct.unpack_from(f"<{ndim}i", self._buf, off)
            off += 4 * ndim
            (dtype,) = struct.unpack_from("<i", self._buf, off)
            off += 4
            data_off = (off + GGML_MEM_ALIGN - 1) // GGML_MEM_ALIGN * GGML_MEM_ALIGN
            e = TensorEntry(name, tuple(dims), GGMLType(dtype), data_off)
            self.tensors[name] = e
            off = data_off + e.nbytes

    def has_tensor(self, name: str) -> bool:
        return name in self.tensors

    def tensor_shape(self, name: str) -> tuple[int, ...]:
        """Shape (numpy/torch order) without reading the data."""
        return self.tensors[name].shape

    def raw_tensor(self, name: str) -> np.ndarray:
        """Raw quantized bytes of a tensor (zero-copy view into the mmap)."""
        e = self.tensors[name]
        return np.frombuffer(self._buf, dtype=np.uint8, count=e.nbytes, offset=e.data_offset)

    def tensor_f32(self, name: str) -> np.ndarray:
        """Fully dequantized float32 tensor (numpy order)."""
        e = self.tensors[name]
        return dequantize(self.raw_tensor(name), e.dtype, e.shape)

    def describe(self) -> str:
        lines = [
            f"file     : {self.path} ({self.fmt} v{self.version})",
            f"model    : 0x{self.model_type:08x} {self.meta.get('model_name', '')}",
            f"tensors  : {len(self.tensors)}",
        ]
        for e in self.tensors.values():
            lines.append(f"  {e.name:60s} {str(list(e.shape)):24s} {type_to_str(e.dtype)}")
        return "\n".join(lines)


class SpanReader:
    """Sequential little-endian reader over a memoryview (for vocab blobs)."""

    def __init__(self, buf: memoryview, offset: int):
        self.buf = buf
        self.off = offset

    def i32(self) -> int:
        v = struct.unpack_from("<i", self.buf, self.off)[0]
        self.off += 4
        return v

    def u32(self) -> int:
        v = struct.unpack_from("<I", self.buf, self.off)[0]
        self.off += 4
        return v

    def f32(self) -> float:
        v = struct.unpack_from("<f", self.buf, self.off)[0]
        self.off += 4
        return v

    def u8(self) -> int:
        v = self.buf[self.off]
        self.off += 1
        return v

    def read(self, n: int) -> bytes:
        v = bytes(self.buf[self.off : self.off + n])
        self.off += n
        return v
