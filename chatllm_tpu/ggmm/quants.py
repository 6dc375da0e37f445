"""ggml block-quantization codecs (pure numpy, host-side).

These implement the public on-disk ggml block formats so that files produced
by the reference converter (`/root/reference/convert.py:327-567`) and files in
the wild load bit-exactly.  Dequantization math follows the ggml format spec
(`/root/reference/ggml/src/ggml-quants.c` dequantize_row_* semantics) —
re-implemented from the format definition, vectorized with numpy.

On TPU, these host codecs are only used at *load* time: weights are repacked
into a planar "grouped-affine" device layout (see `chatllm_tpu/ops/qtensor.py`)
where every format collapses to {packed int4/int8 values, per-32-group scale,
per-32-group bias}, which one Pallas kernel family serves.
"""
from __future__ import annotations

import enum
import numpy as np

QK = 32        # elements per simple block (q4_0/q4_1/q5_0/q5_1/q8_0)
QK_K = 256     # elements per K-quant super-block


class GGMLType(enum.IntEnum):
    # numeric values are the on-disk ggml dtype ids
    # (/root/reference/ggml/include/ggml.h:390-430)
    F32 = 0
    F16 = 1
    Q4_0 = 2
    Q4_1 = 3
    Q5_0 = 6
    Q5_1 = 7
    Q8_0 = 8
    Q8_1 = 9
    Q2_K = 10
    Q3_K = 11
    Q4_K = 12
    Q5_K = 13
    Q6_K = 14
    Q8_K = 15
    I8 = 24
    I16 = 25
    I32 = 26
    I64 = 27
    F64 = 28
    BF16 = 30


_BLOCK = {
    GGMLType.F32: (1, 4),
    GGMLType.F16: (1, 2),
    GGMLType.BF16: (1, 2),
    GGMLType.F64: (1, 8),
    GGMLType.I8: (1, 1),
    GGMLType.I16: (1, 2),
    GGMLType.I32: (1, 4),
    GGMLType.I64: (1, 8),
    GGMLType.Q4_0: (QK, 2 + 16),
    GGMLType.Q4_1: (QK, 4 + 16),
    GGMLType.Q5_0: (QK, 2 + 4 + 16),
    GGMLType.Q5_1: (QK, 4 + 4 + 16),
    GGMLType.Q8_0: (QK, 2 + 32),
    GGMLType.Q2_K: (QK_K, 16 + 64 + 2 + 2),
    GGMLType.Q3_K: (QK_K, 32 + 64 + 12 + 2),
    GGMLType.Q4_K: (QK_K, 2 + 2 + 12 + 128),
    GGMLType.Q5_K: (QK_K, 2 + 2 + 12 + 32 + 128),
    GGMLType.Q6_K: (QK_K, 128 + 64 + 16 + 2),
}


def type_block_size(t: GGMLType) -> int:
    return _BLOCK[GGMLType(t)][0]


def type_bytes_per_block(t: GGMLType) -> int:
    return _BLOCK[GGMLType(t)][1]


def nbytes_for(t: GGMLType, n_elements: int) -> int:
    bs, bb = _BLOCK[GGMLType(t)]
    assert n_elements % bs == 0, f"{n_elements} not a multiple of block {bs} for {t}"
    return n_elements // bs * bb


def type_to_str(t) -> str:
    try:
        return GGMLType(t).name
    except ValueError:
        return f"type{int(t)}"


def _f16(buf: np.ndarray) -> np.ndarray:
    """View little-endian fp16 pairs of bytes as float32."""
    return buf.view(np.float16).astype(np.float32)


# --------------------------------------------------------------------------
# Dequantization (bytes -> float32), vectorized over blocks.
# Each takes raw bytes as uint8[nblocks, bytes_per_block].
# --------------------------------------------------------------------------

def _deq_q4_0(raw: np.ndarray) -> np.ndarray:
    d = _f16(raw[:, 0:2])                       # [nb, 1]
    qs = raw[:, 2:18]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=1).astype(np.int8) - 8
    return d * q.astype(np.float32)


def _deq_q4_1(raw: np.ndarray) -> np.ndarray:
    d = _f16(raw[:, 0:2])
    m = _f16(raw[:, 2:4])
    qs = raw[:, 4:20]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=1).astype(np.float32)
    return d * q + m


def _deq_q5_0(raw: np.ndarray) -> np.ndarray:
    d = _f16(raw[:, 0:2])
    qh = raw[:, 2:6].copy().view(np.uint32)     # [nb, 1]
    qs = raw[:, 6:22]
    shifts = np.arange(32, dtype=np.uint32)
    hb = ((qh >> shifts) & 1).astype(np.uint8)  # [nb, 32]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=1) | (hb << 4)
    return d * (q.astype(np.float32) - 16.0)


def _deq_q5_1(raw: np.ndarray) -> np.ndarray:
    d = _f16(raw[:, 0:2])
    m = _f16(raw[:, 2:4])
    qh = raw[:, 4:8].copy().view(np.uint32)
    qs = raw[:, 8:24]
    shifts = np.arange(32, dtype=np.uint32)
    hb = ((qh >> shifts) & 1).astype(np.uint8)
    q = np.concatenate([qs & 0xF, qs >> 4], axis=1) | (hb << 4)
    return d * q.astype(np.float32) + m


def _deq_q8_0(raw: np.ndarray) -> np.ndarray:
    d = _f16(raw[:, 0:2])
    q = raw[:, 2:34].view(np.int8).astype(np.float32)
    return d * q


def _k4_scale_min(scales: np.ndarray):
    """Unpack the 12-byte 6-bit scale/min packing of q4_k/q5_k.

    Returns (sc, m): uint8[nb, 8] each.
    """
    sc = np.empty(scales.shape[:-1] + (8,), np.uint8)
    m = np.empty_like(sc)
    sc[..., :4] = scales[..., 0:4] & 63
    m[..., :4] = scales[..., 4:8] & 63
    sc[..., 4:] = (scales[..., 8:12] & 0xF) | ((scales[..., 0:4] >> 6) << 4)
    m[..., 4:] = (scales[..., 8:12] >> 4) | ((scales[..., 4:8] >> 6) << 4)
    return sc, m


def _deq_q4_k(raw: np.ndarray) -> np.ndarray:
    nb = raw.shape[0]
    d = _f16(raw[:, 0:2])                       # [nb,1]
    dmin = _f16(raw[:, 2:4])
    sc, m = _k4_scale_min(raw[:, 4:16])         # [nb,8]
    qs = raw[:, 16:144].reshape(nb, 4, 32)      # 4 chunks of 64 values
    lo = (qs & 0xF).astype(np.float32)          # sub-block 2i
    hi = (qs >> 4).astype(np.float32)           # sub-block 2i+1
    q = np.stack([lo, hi], axis=2).reshape(nb, 8, 32)
    dd = d * sc.astype(np.float32)              # [nb,8]
    mm = dmin * m.astype(np.float32)
    return (q * dd[:, :, None] - mm[:, :, None]).reshape(nb, QK_K)


def _deq_q5_k(raw: np.ndarray) -> np.ndarray:
    nb = raw.shape[0]
    d = _f16(raw[:, 0:2])
    dmin = _f16(raw[:, 2:4])
    sc, m = _k4_scale_min(raw[:, 4:16])
    qh = raw[:, 16:48]                          # [nb,32]
    qs = raw[:, 48:176].reshape(nb, 4, 32)
    lo = (qs & 0xF)
    hi = (qs >> 4)
    # chunk i: low nibbles use qh bit 2i, high nibbles bit 2i+1
    bits = np.arange(4, dtype=np.uint8)
    hlo = ((qh[:, None, :] >> (2 * bits)[None, :, None]) & 1).astype(np.uint8)
    hhi = ((qh[:, None, :] >> (2 * bits + 1)[None, :, None]) & 1).astype(np.uint8)
    qlo = lo + (hlo << 4)
    qhi = hi + (hhi << 4)
    q = np.stack([qlo, qhi], axis=2).reshape(nb, 8, 32).astype(np.float32)
    dd = d * sc.astype(np.float32)
    mm = dmin * m.astype(np.float32)
    return (q * dd[:, :, None] - mm[:, :, None]).reshape(nb, QK_K)


def _deq_q6_k(raw: np.ndarray) -> np.ndarray:
    nb = raw.shape[0]
    ql = raw[:, 0:128].reshape(nb, 2, 64)       # two 128-value halves
    qh = raw[:, 128:192].reshape(nb, 2, 32)
    sc = raw[:, 192:208].view(np.int8).reshape(nb, 2, 8).astype(np.float32)
    d = _f16(raw[:, 208:210])                   # [nb,1]
    l0, l1 = ql[:, :, :32], ql[:, :, 32:]
    q1 = ((l0 & 0xF) | (((qh >> 0) & 3) << 4)).astype(np.int8) - 32
    q2 = ((l1 & 0xF) | (((qh >> 2) & 3) << 4)).astype(np.int8) - 32
    q3 = ((l0 >> 4) | (((qh >> 4) & 3) << 4)).astype(np.int8) - 32
    q4 = ((l1 >> 4) | (((qh >> 6) & 3) << 4)).astype(np.int8) - 32
    q = np.concatenate([q1, q2, q3, q4], axis=2).astype(np.float32)  # [nb,2,128]
    # scale index: value l in 0..127 of a half uses sc[l//16]
    scl = np.repeat(sc, 16, axis=2)             # [nb,2,128]
    y = (q * scl).reshape(nb, QK_K) * d
    return y


def _deq_q2_k(raw: np.ndarray) -> np.ndarray:
    nb = raw.shape[0]
    scales = raw[:, 0:16]                        # 4-bit scale | 4-bit min per 16-elem group... (16 groups of 16)
    qs = raw[:, 16:80].reshape(nb, 2, 32)        # two halves of 128 values, 2 bits each
    d = _f16(raw[:, 80:82])
    dmin = _f16(raw[:, 82:84])
    sc = (scales & 0xF).astype(np.float32)       # [nb,16]
    mn = (scales >> 4).astype(np.float32)
    shifts = np.array([0, 2, 4, 6], dtype=np.uint8)
    q = ((qs[:, :, None, :] >> shifts[None, None, :, None]) & 3)  # [nb,2,4,32]
    q = q.reshape(nb, 16, 16).astype(np.float32)  # 16 groups of 16, scale per group
    y = (d[:, 0][:, None, None] * sc[:, :, None]) * q - (dmin[:, 0][:, None, None] * mn[:, :, None])
    return y.reshape(nb, QK_K)


def _deq_q3_k(raw: np.ndarray) -> np.ndarray:
    """block_q3_K: hmask[32] | qs[64] | scales[12] | d:f16
    (dequantize_row_q3_K, ggml/src/ggml-quants.c:1128-1175)."""
    nb = raw.shape[0]
    hm = raw[:, 0:32]
    qs = raw[:, 32:96].reshape(nb, 2, 32)         # two 128-value halves
    d = _f16(raw[:, 108:110])                     # [nb,1]
    aux = np.ascontiguousarray(raw[:, 96:108]).view(np.uint32)  # [nb,3]
    a0, a1, tmp = (aux[:, 0].astype(np.uint32), aux[:, 1].astype(np.uint32),
                   aux[:, 2].astype(np.uint32))
    k1, k2 = np.uint32(0x03030303), np.uint32(0x0F0F0F0F)
    n0 = (a0 & k2) | (((tmp >> 0) & k1) << 4)
    n1 = (a1 & k2) | (((tmp >> 2) & k1) << 4)
    n2 = ((a0 >> 4) & k2) | (((tmp >> 4) & k1) << 4)
    n3 = ((a1 >> 4) & k2) | (((tmp >> 6) & k1) << 4)
    sc = np.ascontiguousarray(
        np.stack([n0, n1, n2, n3], axis=1)).view(np.uint8)      # [nb,16]
    sc = sc.astype(np.float32) - 32.0
    shifts = np.arange(4, dtype=np.uint8)
    q = (qs[:, :, None, :] >> (2 * shifts)[None, None, :, None]) & 3
    hbit_idx = (4 * np.arange(2)[:, None] + shifts[None, :]).astype(np.uint8)
    hb = (hm[:, None, None, :] >> hbit_idx[None, :, :, None]) & 1
    vals = q.astype(np.float32) + 4.0 * hb.astype(np.float32) - 4.0
    # scale group g = 8*half + 2*shift + (lane >= 16)
    vals = vals.reshape(nb, 2, 4, 2, 16)
    scg = sc.reshape(nb, 2, 4, 2)
    y = d[:, 0][:, None, None, None, None] * scg[..., None] * vals
    return y.reshape(nb, QK_K)


_DEQ = {
    GGMLType.Q4_0: _deq_q4_0,
    GGMLType.Q4_1: _deq_q4_1,
    GGMLType.Q5_0: _deq_q5_0,
    GGMLType.Q5_1: _deq_q5_1,
    GGMLType.Q8_0: _deq_q8_0,
    GGMLType.Q4_K: _deq_q4_k,
    GGMLType.Q5_K: _deq_q5_k,
    GGMLType.Q6_K: _deq_q6_k,
    GGMLType.Q2_K: _deq_q2_k,
    GGMLType.Q3_K: _deq_q3_k,
}


def dequantize(data: bytes | np.ndarray, t: GGMLType, shape) -> np.ndarray:
    """Decode raw tensor bytes of ggml dtype `t` into float32 of `shape`.

    `shape` is the logical (row-major, numpy-order) shape; blocks run along
    the last (contiguous) axis.
    """
    t = GGMLType(t)
    n = int(np.prod(shape))
    buf = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else data
    if t == GGMLType.F32:
        return buf.view(np.float32)[:n].reshape(shape).copy()
    if t == GGMLType.F16:
        return buf.view(np.float16)[:n].astype(np.float32).reshape(shape)
    if t == GGMLType.BF16:
        u = buf.view(np.uint16)[:n].astype(np.uint32) << 16
        return u.view(np.float32).reshape(shape)
    if t in (GGMLType.I8, GGMLType.I16, GGMLType.I32, GGMLType.I64, GGMLType.F64):
        dt = {GGMLType.I8: np.int8, GGMLType.I16: np.int16, GGMLType.I32: np.int32,
              GGMLType.I64: np.int64, GGMLType.F64: np.float64}[t]
        return buf.view(dt)[:n].astype(np.float32).reshape(shape)
    bs, bb = _BLOCK[t]
    assert n % bs == 0, f"{shape} not blockable by {t}"
    raw = buf[: n // bs * bb].reshape(n // bs, bb)
    return _DEQ[t](raw).reshape(shape)


# --------------------------------------------------------------------------
# Quantization (float32 -> bytes).  Matches the reference converter's
# rounding semantics (/root/reference/convert.py:327-567) so that files we
# write for tests are comparable, and --re_quantize behaves the same.
# --------------------------------------------------------------------------

def _enc_q8_0(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, QK)
    d = np.abs(x).max(axis=1, keepdims=True) / 127.0
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.where(d > 0, x / d, 0.0)
    q = np.clip(np.round(q), -128, 127).astype(np.int8)
    out = np.empty((x.shape[0], 34), np.uint8)
    out[:, 0:2] = d.astype(np.float16).view(np.uint8)
    out[:, 2:] = q.view(np.uint8)
    return out


def _enc_q4_0(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, QK)
    idx = np.abs(x).argmax(axis=1)
    mx = x[np.arange(x.shape[0]), idx][:, None]
    d = mx / -8.0
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.where(d != 0, x / d, 0.0)
    q = np.clip(np.round(q + 8), 0, 15).astype(np.uint8)
    out = np.empty((x.shape[0], 18), np.uint8)
    out[:, 0:2] = d.astype(np.float16).view(np.uint8)
    out[:, 2:] = q[:, :16] | (q[:, 16:] << 4)
    return out


def _enc_q4_1(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, QK)
    mx = x.max(axis=1, keepdims=True)
    mn = x.min(axis=1, keepdims=True)
    d = (mx - mn) / 15.0
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.where(d > 0, (x - mn) / d, 0.0)
    q = np.clip(np.round(q), 0, 15).astype(np.uint8)
    out = np.empty((x.shape[0], 20), np.uint8)
    out[:, 0:2] = d.astype(np.float16).view(np.uint8)
    out[:, 2:4] = mn.astype(np.float16).view(np.uint8)
    out[:, 4:] = q[:, :16] | (q[:, 16:] << 4)
    return out


def _qkx2_quants(x: np.ndarray, nmax: float, rmin: float, rdelta: float, nstep: int):
    """Weighted affine sub-block fit used by K-quants (numpy port of the
    reference converter's batched_qkx2_quants, convert.py:369-443)."""
    S, N = x.shape
    av = np.linalg.norm(x, axis=1) / np.sqrt(N)
    w = av[:, None] + np.abs(x)
    mn = np.minimum(x.min(axis=1), 0.0)
    mx = x.max(axis=1)
    sw = w.sum(axis=1)
    sx = (w * x).sum(axis=1)
    degen = mn == mx
    rng = np.where(degen, 1.0, mx - mn)
    iscale = nmax / rng
    scale = 1.0 / iscale
    L = np.clip(np.round(iscale[:, None] * (x - mn[:, None])), 0, nmax)
    offset = -mn
    diff = np.square(scale[:, None] * L + mn[:, None] - x)
    best = (w * diff).sum(axis=1)
    inv_rng = 1.0 / rng
    for step in range(nstep):
        isc = (rmin + rdelta * step + nmax) * inv_rng
        l = np.clip(np.round(isc[:, None] * (x - mn[:, None])), 0, nmax)
        sl = (w * l).sum(axis=1)
        sl2 = (w * l * l).sum(axis=1)
        sxl = (w * l * x).sum(axis=1)
        D = sw * sl2 - sl * sl
        Dinv = np.where(D > 0, 1.0 / np.where(D == 0, 1.0, D), 0.0)
        ts = (sw * sxl - sx * sl) * Dinv
        tm = (sl2 * sx - sl * sxl) * Dinv
        pos = tm > 0
        sl2s = np.where(sl2 == 0, 1.0, sl2)
        ts = np.where(pos, sxl / sl2s, ts)
        tm = np.where(pos, 0.0, tm)
        nd = (w * np.square(ts[:, None] * l + tm[:, None] - x)).sum(axis=1)
        better = (D > 0) & (nd < best)
        best = np.where(better, nd, best)
        L = np.where(better[:, None], l, L)
        scale = np.where(better, ts, scale)
        offset = np.where(better, -tm, offset)
    scale = np.where(degen, 0.0, scale)
    offset = np.where(degen, 0.0, offset)
    L = np.where(degen[:, None], 0.0, L)
    return scale, offset, L


def _enc_q4_k(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    sub = x.reshape(nb * 8, 32)
    scale, offset, L = _qkx2_quants(sub, 15.0, -1.0, 0.1, 20)
    scale = scale.reshape(nb, 8)
    offset = offset.reshape(nb, 8)
    L = L.reshape(nb, 8, 32)
    max_scale = scale.max(axis=1)
    max_off = offset.max(axis=1)
    inv_s = np.where(max_scale > 0, 63.0 / np.where(max_scale == 0, 1.0, max_scale), 0.0)
    inv_o = np.where(max_off > 0, 64.0 / np.where(max_off == 0, 1.0, max_off), 0.0)
    ls = np.minimum(np.round(inv_s[:, None] * scale), 63).astype(np.uint8)
    lm = np.minimum(np.round(inv_o[:, None] * offset), 63).astype(np.uint8)
    packed = np.zeros((nb, 12), np.uint8)
    packed[:, 0:4] = ls[:, 0:4]
    packed[:, 4:8] = lm[:, 0:4]
    packed[:, 8:12] = (ls[:, 4:8] & 0xF) | ((lm[:, 4:8] & 0xF) << 4)
    packed[:, 0:4] |= (ls[:, 4:8] >> 4) << 6
    packed[:, 4:8] |= (lm[:, 4:8] >> 4) << 6
    d = (max_scale / 63.0).astype(np.float16)
    dmin = (max_off / 63.0).astype(np.float16)
    rs = (ls.astype(np.float32) * d.astype(np.float32)[:, None])[:, :, None]
    ro = (lm.astype(np.float32) * dmin.astype(np.float32)[:, None])[:, :, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        Lq = np.where(rs != 0, (x.reshape(nb, 8, 32) + ro) / rs, 0.0)
    Lq = np.clip(np.round(Lq), 0, 15).astype(np.uint8)
    Lq = Lq.reshape(nb, 4, 2, 32)
    qs = (Lq[:, :, 0, :] | (Lq[:, :, 1, :] << 4)).reshape(nb, 128)
    out = np.empty((nb, 144), np.uint8)
    out[:, 0:2] = d.view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = dmin.view(np.uint8).reshape(nb, 2)
    out[:, 4:16] = packed
    out[:, 16:] = qs
    return out


_ENC = {
    GGMLType.Q8_0: _enc_q8_0,
    GGMLType.Q4_0: _enc_q4_0,
    GGMLType.Q4_1: _enc_q4_1,
    GGMLType.Q4_K: _enc_q4_k,
}


def quantize(x: np.ndarray, t: GGMLType) -> bytes:
    """Encode float32 array into raw ggml bytes of dtype `t`."""
    t = GGMLType(t)
    x = np.ascontiguousarray(x, dtype=np.float32)
    if t == GGMLType.F32:
        return x.tobytes()
    if t == GGMLType.F16:
        return x.astype(np.float16).tobytes()
    if t == GGMLType.BF16:
        u = x.view(np.uint32)
        # round-to-nearest-even bf16
        rounded = ((u + 0x7FFF + ((u >> 16) & 1)) >> 16).astype(np.uint16)
        return rounded.tobytes()
    if t not in _ENC:
        raise NotImplementedError(f"quantize to {t}")
    return _ENC[t](x).tobytes()
