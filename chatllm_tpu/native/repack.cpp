// Native weight repack engine: ggml block formats -> TPU planar layout.
//
// The reference's data loader is native C++ (ModelLoader,
// /root/reference/src/chat.h:670-869, with per-format C codecs in
// ggml/src/ggml-quants.c).  This is its TPU-native equivalent: it decodes
// block-quantized tensors straight from the mmapped file into the
// *transposed* planar device layout (q [in, out] packed nibbles,
// s/b [in/32, out] f32) that the Pallas kernels consume — multi-threaded,
// no intermediate numpy copies, no double transpose.
//
// Exposed as a tiny C ABI consumed via ctypes (chatllm_tpu/native/__init__.py).
#include <cstdint>
#include <cstring>
#include <cmath>
#include <functional>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {  // subnormal
            int e = -1;
            do { man <<= 1; e++; } while (!(man & 0x400));
            man &= 0x3FF;
            bits = sign | ((uint32_t)(127 - 15 - e) << 23) | (man << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp + 112) << 23) | (man << 13);
    }
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}

void parallel_rows(int64_t n, const std::function<void(int64_t, int64_t)>& fn,
                   int nthreads) {
    if (nthreads <= 1) { fn(0, n); return; }
    std::vector<std::thread> ts;
    int64_t chunk = (n + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; t++) {
        int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back(fn, lo, hi);
    }
    for (auto& th : ts) th.join();
}

// 6-bit scale/min unpack for q4_k/q5_k (ggml get_scale_min_k4 semantics)
inline void k4_scale_min(const uint8_t* sc, int j, uint8_t* d, uint8_t* m) {
    if (j < 4) {
        *d = sc[j] & 63;
        *m = sc[j + 4] & 63;
    } else {
        *d = (sc[j + 4] & 0xF) | ((sc[j - 4] >> 6) << 4);
        *m = (sc[j + 4] >> 4) | ((sc[j] >> 6) << 4);
    }
}

}  // namespace

extern "C" {

// q4_k: 144-byte superblocks of 256 values.
// out layout: q_packed uint8 [in/2, out] (group-local pairing: within each
// 32-row group, byte j = row(32g+j) | row(32g+j+16)<<4), s/b f32 [in/32, out].
// zero_point = 0 (values already unsigned 0..15); b = -(dmin*m).
void repack_q4_k(const uint8_t* raw, int64_t out_dim, int64_t in_dim,
                 uint8_t* qp, float* s, float* b, int nthreads) {
    const int64_t nb = in_dim / 256;           // superblocks per row
    const int64_t bytes_per_row = nb * 144;
    const int64_t gs_total = in_dim / 32;      // groups per row

    parallel_rows(out_dim, [&](int64_t lo, int64_t hi) {
        for (int64_t o = lo; o < hi; o++) {
            const uint8_t* row = raw + o * bytes_per_row;
            for (int64_t sb = 0; sb < nb; sb++) {
                const uint8_t* blk = row + sb * 144;
                float d = f16_to_f32(*(const uint16_t*)(blk + 0));
                float dmin = f16_to_f32(*(const uint16_t*)(blk + 2));
                const uint8_t* scales = blk + 4;
                const uint8_t* qs = blk + 16;
                for (int j = 0; j < 8; j++) {           // 8 groups of 32
                    uint8_t sc6, m6;
                    k4_scale_min(scales, j, &sc6, &m6);
                    int64_t g = sb * 8 + j;             // group index in row
                    s[g * out_dim + o] = d * (float)sc6;
                    b[g * out_dim + o] = -(dmin * (float)m6);
                    // values: chunk c=j/2 (64 values), nibble side j%2
                    const uint8_t* chunk = qs + (j / 2) * 32;
                    bool high = j & 1;
                    // pack rows 0..15 with 16..31 of this group
                    for (int r = 0; r < 16; r++) {
                        uint8_t v_lo = high ? (chunk[r] >> 4) : (chunk[r] & 0xF);
                        uint8_t v_hi = high ? (chunk[r + 16] >> 4) : (chunk[r + 16] & 0xF);
                        qp[(g * 16 + r) * out_dim + o] = v_lo | (v_hi << 4);
                    }
                }
            }
        }
    }, nthreads);
}

// q4_k -> SUPERBLOCK planar layout: the 6-bit sc/m stay int8 (0..63) and the
// f16 d/dmin are kept verbatim per 256-superblock, so the per-weight scale
// overhead is 0.625 bits instead of the classic layout's 1.0 — the Pallas
// kernels compose s = d*sc and b = -(dmin*m) in VMEM (bit-identical to
// ggml's dequantize_row_q4_K f32 products, reference ggml/src/ggml-quants.c).
void repack_q4_k_sb(const uint8_t* raw, int64_t out_dim, int64_t in_dim,
                    uint8_t* qp, int8_t* sc_out, int8_t* m_out,
                    uint16_t* d_out, uint16_t* dmin_out, int nthreads) {
    const int64_t nb = in_dim / 256;
    const int64_t bytes_per_row = nb * 144;

    parallel_rows(out_dim, [&](int64_t lo, int64_t hi) {
        for (int64_t o = lo; o < hi; o++) {
            const uint8_t* row = raw + o * bytes_per_row;
            for (int64_t sb = 0; sb < nb; sb++) {
                const uint8_t* blk = row + sb * 144;
                d_out[sb * out_dim + o] = *(const uint16_t*)(blk + 0);
                dmin_out[sb * out_dim + o] = *(const uint16_t*)(blk + 2);
                const uint8_t* scales = blk + 4;
                const uint8_t* qs = blk + 16;
                for (int j = 0; j < 8; j++) {           // 8 groups of 32
                    uint8_t sc6, m6;
                    k4_scale_min(scales, j, &sc6, &m6);
                    int64_t g = sb * 8 + j;
                    sc_out[g * out_dim + o] = (int8_t)sc6;
                    m_out[g * out_dim + o] = (int8_t)m6;
                    const uint8_t* chunk = qs + (j / 2) * 32;
                    bool high = j & 1;
                    for (int r = 0; r < 16; r++) {
                        uint8_t v_lo = high ? (chunk[r] >> 4) : (chunk[r] & 0xF);
                        uint8_t v_hi = high ? (chunk[r + 16] >> 4) : (chunk[r + 16] & 0xF);
                        qp[(g * 16 + r) * out_dim + o] = v_lo | (v_hi << 4);
                    }
                }
            }
        }
    }, nthreads);
}

// q4_0: 18-byte blocks of 32 values, symmetric (values 0..15, zero_point 8).
void repack_q4_0(const uint8_t* raw, int64_t out_dim, int64_t in_dim,
                 uint8_t* qp, float* s, int nthreads) {
    const int64_t nb = in_dim / 32;
    const int64_t bytes_per_row = nb * 18;
    parallel_rows(out_dim, [&](int64_t lo, int64_t hi) {
        for (int64_t o = lo; o < hi; o++) {
            const uint8_t* row = raw + o * bytes_per_row;
            for (int64_t g = 0; g < nb; g++) {
                const uint8_t* blk = row + g * 18;
                s[g * out_dim + o] = f16_to_f32(*(const uint16_t*)blk);
                const uint8_t* qs = blk + 2;
                // block value order: lo nibbles = rows 0..15, hi = 16..31 —
                // exactly the kernel's group-local pairing, copy through
                for (int r = 0; r < 16; r++) {
                    qp[(g * 16 + r) * out_dim + o] = qs[r];
                }
            }
        }
    }, nthreads);
}

// q8_0: 34-byte blocks of 32 int8 values.
void repack_q8_0(const uint8_t* raw, int64_t out_dim, int64_t in_dim,
                 int8_t* q, float* s, int nthreads) {
    const int64_t nb = in_dim / 32;
    const int64_t bytes_per_row = nb * 34;
    parallel_rows(out_dim, [&](int64_t lo, int64_t hi) {
        for (int64_t o = lo; o < hi; o++) {
            const uint8_t* row = raw + o * bytes_per_row;
            for (int64_t g = 0; g < nb; g++) {
                const uint8_t* blk = row + g * 34;
                s[g * out_dim + o] = f16_to_f32(*(const uint16_t*)blk);
                const int8_t* qs = (const int8_t*)(blk + 2);
                for (int r = 0; r < 32; r++) {
                    q[(g * 32 + r) * out_dim + o] = qs[r];
                }
            }
        }
    }, nthreads);
}

// dequantize q4_k/q8_0/f16 rows to f32 (for embeddings / dense loads),
// transposed output [in, out]
void dequant_f16_t(const uint8_t* raw, int64_t out_dim, int64_t in_dim,
                   float* out, int nthreads) {
    parallel_rows(out_dim, [&](int64_t lo, int64_t hi) {
        const uint16_t* src = (const uint16_t*)raw;
        for (int64_t o = lo; o < hi; o++)
            for (int64_t i = 0; i < in_dim; i++)
                out[i * out_dim + o] = f16_to_f32(src[o * in_dim + i]);
    }, nthreads);
}

}  // extern "C"
