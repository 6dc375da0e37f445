"""Native (C++) repack engine: builds on first use, loaded via ctypes.

The TPU-native analog of the reference's native data loader
(/root/reference/src/chat.h:670 ModelLoader + ggml-quants.c codecs): decodes
block-quantized tensors straight into the transposed planar device layout
with threads.  Falls back silently to the numpy path when no toolchain is
available (`chatllm_tpu.ops.qtensor` handles the fallback).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_lib = None
_lock = threading.Lock()
_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "repack.cpp"), os.path.join(_DIR, "bpe.cpp")]
_SO = os.path.join(tempfile.gettempdir(),
                   f"chatllm_tpu_native_{os.getuid()}.so")

N_THREADS = max(1, min(16, os.cpu_count() or 1))


def _build() -> str | None:
    if os.path.exists(_SO) and all(os.path.getmtime(_SO) >= os.path.getmtime(s)
                                   for s in _SRCS):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread", *_SRCS, "-o", _SO + ".tmp"],
            check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except Exception:
        return None


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib if _lib is not False else None
    with _lock:
        if _lib is not None:
            return _lib if _lib is not False else None
        so = _build()
        if so is None:
            _lib = False
            return None
        try:
            lib = ctypes.CDLL(so)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i8p = ctypes.POINTER(ctypes.c_int8)
            f32p = ctypes.POINTER(ctypes.c_float)
            i64 = ctypes.c_int64
            lib.repack_q4_k.argtypes = [u8p, i64, i64, u8p, f32p, f32p, ctypes.c_int]
            lib.repack_q4_0.argtypes = [u8p, i64, i64, u8p, f32p, ctypes.c_int]
            lib.repack_q8_0.argtypes = [u8p, i64, i64, i8p, f32p, ctypes.c_int]
            u16p = ctypes.POINTER(ctypes.c_uint16)
            lib.repack_q4_k_sb.argtypes = [u8p, i64, i64, u8p, i8p, i8p,
                                           u16p, u16p, ctypes.c_int]
            i64p = ctypes.POINTER(ctypes.c_int64)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.bpe_new.argtypes = [u8p, i64p, i32p, i64,
                                    u8p, i64p, u8p, i64p, i64]
            lib.bpe_new.restype = ctypes.c_void_p
            lib.bpe_free.argtypes = [ctypes.c_void_p]
            lib.bpe_encode.argtypes = [ctypes.c_void_p, u8p, i64p, i64,
                                       ctypes.c_int32, i32p, i64]
            lib.bpe_encode.restype = i64
            lib.bpe_set_scores.argtypes = [ctypes.c_void_p,
                                           ctypes.POINTER(ctypes.c_float), i64]
            lib.spm_encode.argtypes = [ctypes.c_void_p, u8p, i64, i32p, i64]
            lib.spm_encode.restype = i64
            _lib = lib
            return lib
        except Exception:
            _lib = False
            return None


def _u8(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeBPE:
    """C++ rank-queue BPE merge (native/bpe.cpp) behind the exact
    _merge_ranked semantics.  Built from (piece bytes, id) pairs + ordered
    merges; `encode_words` returns ids or None (caller falls back to the
    Python merge)."""

    def __init__(self, pieces: list[tuple[bytes, int]],
                 merges: list[tuple[bytes, bytes]], scores=None):
        self._lib = get_lib()
        self._ctx = None
        if self._lib is None or not hasattr(self._lib, "bpe_new"):
            return
        blob = b"".join(p for p, _ in pieces)
        off = np.zeros(len(pieces) + 1, np.int64)
        np.cumsum([len(p) for p, _ in pieces], out=off[1:])
        ids = np.asarray([i for _, i in pieces], np.int32)
        ml = b"".join(l for l, _ in merges)
        mlo = np.zeros(len(merges) + 1, np.int64)
        np.cumsum([len(l) for l, _ in merges], out=mlo[1:])
        mr = b"".join(r for _, r in merges)
        mro = np.zeros(len(merges) + 1, np.int64)
        np.cumsum([len(r) for _, r in merges], out=mro[1:])
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        self._blob_refs = (blob, ml, mr)   # keep alive during bpe_new
        self._ctx = self._lib.bpe_new(
            ctypes.cast(ctypes.c_char_p(blob), ctypes.POINTER(ctypes.c_uint8)),
            off.ctypes.data_as(i64p), ids.ctypes.data_as(i32p),
            len(pieces),
            ctypes.cast(ctypes.c_char_p(ml), ctypes.POINTER(ctypes.c_uint8)),
            mlo.ctypes.data_as(i64p),
            ctypes.cast(ctypes.c_char_p(mr), ctypes.POINTER(ctypes.c_uint8)),
            mro.ctypes.data_as(i64p), len(merges))
        if self._ctx is not None and scores is not None:
            sc = np.asarray(scores, np.float32)
            self._lib.bpe_set_scores(
                self._ctx, sc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                len(sc))

    @property
    def ok(self) -> bool:
        return self._ctx is not None

    def encode_words(self, words: list[bytes], seq_mode: bool):
        """Merge-encode pre-tokenized words; None on any miss (fallback)."""
        if self._ctx is None:
            return None
        blob = b"".join(words)
        off = np.zeros(len(words) + 1, np.int64)
        np.cumsum([len(wd) for wd in words], out=off[1:])
        cap = len(blob) + len(words) + 8
        out = np.empty(cap, np.int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        n = self._lib.bpe_encode(
            self._ctx,
            ctypes.cast(ctypes.c_char_p(blob), ctypes.POINTER(ctypes.c_uint8)),
            off.ctypes.data_as(i64p), len(words), int(seq_mode),
            out.ctypes.data_as(i32p), cap)
        if n < 0:
            return None
        return out[:n].tolist()

    def encode_sp(self, text: bytes):
        """SP-score BPE over one span (BPEProcessor1); None on overflow."""
        if self._ctx is None:
            return None
        cap = len(text) + 8
        out = np.empty(cap, np.int32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        n = self._lib.spm_encode(
            self._ctx,
            ctypes.cast(ctypes.c_char_p(text), ctypes.POINTER(ctypes.c_uint8)),
            len(text), out.ctypes.data_as(i32p), cap)
        if n < 0:
            return None
        return out[:n].tolist()

    def __del__(self):
        try:
            if self._ctx is not None and self._lib is not None:
                self._lib.bpe_free(self._ctx)
        except Exception:
            pass


def native_repack_q4k_super(raw, shape):
    """q4_k → superblock planar layout (see qtensor.repack_q4_k_super).

    Returns (qp, sc, m, d, dmin) or None if no native lib."""
    lib = get_lib()
    if lib is None or len(shape) != 2 or not hasattr(lib, "repack_q4_k_sb"):
        return None
    out_dim, in_dim = int(shape[0]), int(shape[1])
    if isinstance(raw, (bytes, bytearray, memoryview)):
        raw = np.frombuffer(raw, dtype=np.uint8)
    raw = np.ascontiguousarray(raw.view(np.uint8))
    qp = np.empty((in_dim // 2, out_dim), np.uint8)
    sc = np.empty((in_dim // 32, out_dim), np.int8)
    m = np.empty((in_dim // 32, out_dim), np.int8)
    d = np.empty((in_dim // 256, out_dim), np.float16)
    dmin = np.empty((in_dim // 256, out_dim), np.float16)
    i8 = ctypes.POINTER(ctypes.c_int8)
    u16 = ctypes.POINTER(ctypes.c_uint16)
    lib.repack_q4_k_sb(_u8(raw), out_dim, in_dim, _u8(qp),
                       sc.ctypes.data_as(i8), m.ctypes.data_as(i8),
                       d.ctypes.data_as(u16), dmin.ctypes.data_as(u16),
                       N_THREADS)
    return qp, sc, m, d, dmin


def native_repack(raw: np.ndarray, ggml_type: int, shape):
    """Repack [out, in]-shaped quantized bytes into the packed planar layout.

    Returns (q, s, b, group, packed, zero_point) or None if unsupported /
    no native lib."""
    from ..ggmm.quants import GGMLType

    lib = get_lib()
    if lib is None or len(shape) != 2:
        return None
    out_dim, in_dim = int(shape[0]), int(shape[1])
    if isinstance(raw, (bytes, bytearray, memoryview)):
        raw = np.frombuffer(raw, dtype=np.uint8)
    raw = np.ascontiguousarray(raw.view(np.uint8))
    t = GGMLType(ggml_type)
    if t == GGMLType.Q4_K and in_dim % 256 == 0:
        qp = np.empty((in_dim // 2, out_dim), np.uint8)
        s = np.empty((in_dim // 32, out_dim), np.float32)
        b = np.empty((in_dim // 32, out_dim), np.float32)
        lib.repack_q4_k(_u8(raw), out_dim, in_dim, _u8(qp), _f32(s), _f32(b),
                        N_THREADS)
        return qp, s, b, 32, True, 0
    if t == GGMLType.Q4_0 and in_dim % 32 == 0:
        qp = np.empty((in_dim // 2, out_dim), np.uint8)
        s = np.empty((in_dim // 32, out_dim), np.float32)
        lib.repack_q4_0(_u8(raw), out_dim, in_dim, _u8(qp), _f32(s), N_THREADS)
        return qp, s, None, 32, True, 8
    if t == GGMLType.Q8_0 and in_dim % 32 == 0:
        q = np.empty((in_dim, out_dim), np.int8)
        s = np.empty((in_dim // 32, out_dim), np.float32)
        lib.repack_q8_0(_u8(raw), out_dim, in_dim,
                        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                        _f32(s), N_THREADS)
        return q, s, None, 32, False, 0
    return None
