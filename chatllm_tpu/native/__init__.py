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
_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "repack.cpp")
_SO = os.path.join(tempfile.gettempdir(),
                   f"chatllm_tpu_repack_{os.getuid()}.so")

N_THREADS = max(1, min(16, os.cpu_count() or 1))


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread", _SRC, "-o", _SO + ".tmp"],
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
            _lib = lib
            return lib
        except Exception:
            _lib = False
            return None


def _u8(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


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
