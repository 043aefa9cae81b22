// Host-side stem-layout packer for the pallas Focus-stem kernel.
//
// Packs a raw frame into the patch layout the TPU kernel consumes
// (stereotracking_tpu/ops/stem_pallas.py): the image zero-padded by 2 on
// every edge is stored as (H/4 + 1, 16*C, WQ) with element
//   out[g][r*4C + s*C + c][q] = pad2(img)[4g + r][4q + s][c]
// so that every detector output row's whole im2col patch matrix is one
// contiguous slice on device.  This replaces the device-side minor-dim
// transpose that XLA executes ~8x off the memory floor at 1080p (the
// reference performs its whole image pipeline host-side too — mmcv
// loaders/transforms; see SURVEY.md L3/L4).
//
// The inner loops are a 12-way (image) / 4-way (disparity) byte/word
// deinterleave.  Key identity exploited by the SIMD path: output stream
// k = s*C + c at position q reads byte 12q + k - 6 of the row (C = 3), so
// all 12 streams share one linear 192-byte window per 16 outputs, which
// AVX-512 VBMI (vpermi2b/vpermb) splits in 4 instructions per stream.
// The disparity path converts u16/16 fixed point to bf16 with
// vcvtne2ps2bf16 (round-to-nearest-even, bit-identical to the scalar
// helper for finite inputs).  Scalar fallbacks keep other hosts working.
//
// Multi-threaded over row groups (and frames in the *_batch entries).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>
#ifdef __linux__
#include <sched.h>
#endif

#if defined(__AVX512VBMI__) && defined(__AVX512BW__) && \
    defined(__AVX512BF16__)
#define STEM_PACK_SIMD 1
#include <immintrin.h>
#endif

namespace {

// round-to-nearest-even float32 -> bfloat16 (matches XLA's astype)
static inline uint16_t f32_to_bf16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t lsb = (x >> 16) & 1u;
    x += 0x7fffu + lsb;
    return static_cast<uint16_t>(x >> 16);
}

static int usable_cpus() {
#ifdef __linux__
    cpu_set_t set;
    if (sched_getaffinity(0, sizeof(set), &set) == 0)
        return CPU_COUNT(&set);   // cgroup/affinity-aware, unlike
                                  // hardware_concurrency on shared hosts
#endif
    return (int)std::thread::hardware_concurrency();
}

template <typename Fn>
void parallel_for(int n, Fn fn) {
    int nt = std::min<int>(usable_cpus(), 16);
    nt = std::max(1, std::min(nt, n));
    if (nt == 1) {
        fn(0, n);
        return;
    }
    std::vector<std::thread> ts;
    int chunk = (n + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int lo = t * chunk, hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back(fn, lo, hi);
    }
    for (auto& t : ts) t.join();
}

// ---------------------------------------------------------------------
// scalar row packers (reference semantics; any C, any host)

// Pack image row `row` (W*C bytes) into C*4 streams og[(s*C+c)*WQ + q] =
// pad2-row byte (4q + s - 2)*C + c.
static void pack_img_row_scalar(const uint8_t* row, int W, int C, int WQ,
                                int WQ0, uint8_t* og) {
    for (int s = 0; s < 4; ++s) {
        for (int c = 0; c < C; ++c) {
            uint8_t* o = og + ((size_t)s * C + c) * WQ;
            int x0 = s - 2;
            int qlo = x0 < 0 ? 1 : 0;
            o[0] = 0;
            if (x0 >= 0) o[0] = row[(size_t)x0 * C + c];
            const uint8_t* src = row + (size_t)(4 * qlo + x0) * C + c;
            int qhi = std::min(WQ0, (W - 1 - x0) / 4 + 1);
            for (int q = qlo; q < qhi; ++q)
                o[q] = src[(size_t)(q - qlo) * 4 * C];
            for (int q = std::max(qhi, qlo); q < WQ; ++q) o[q] = 0;
        }
    }
}

static inline uint16_t disp_val(const uint16_t* row, long i) {
    uint16_t d = row[i];
    return f32_to_bf16(d == 65535 ? 0.f : d / 16.f);
}

static void pack_disp_row_scalar(const uint16_t* row, int W, int WQ,
                                 int WQ0, uint16_t* og) {
    for (int s = 0; s < 4; ++s) {
        uint16_t* o = og + (size_t)s * WQ;
        int x0 = s - 2;
        int qlo = x0 < 0 ? 1 : 0;
        o[0] = x0 >= 0 ? disp_val(row, x0) : 0;
        int qhi = std::min(WQ0, (W - 1 - x0) / 4 + 1);
        for (int q = qlo; q < qhi; ++q) o[q] = disp_val(row, 4L * q + x0);
        for (int q = std::max(qhi, qlo); q < WQ; ++q) o[q] = 0;
    }
}

#ifdef STEM_PACK_SIMD
// ---------------------------------------------------------------------
// AVX-512 row packers (C == 3)

static bool simd_ok() {
    static const bool ok = __builtin_cpu_supports("avx512vbmi") &&
                           __builtin_cpu_supports("avx512bw") &&
                           __builtin_cpu_supports("avx512bf16");
    return ok;
}

struct ImgTables {
    alignas(64) uint8_t idxA[12][64];  // window offsets < 128 -> z0:z1
    alignas(64) uint8_t idxB[12][64];  // window offsets >= 128 -> z2
    __mmask64 maskB[12];
    ImgTables() {
        for (int k = 0; k < 12; ++k) {
            uint64_t m = 0;
            for (int j = 0; j < 16; ++j) {
                int off = k + 12 * j;   // byte offset in the 192B window
                if (off < 128) {
                    idxA[k][j] = (uint8_t)off;
                    idxB[k][j] = 0;
                } else {
                    idxA[k][j] = 0;
                    idxB[k][j] = (uint8_t)(off - 128);
                    m |= 1ull << j;
                }
            }
            for (int j = 16; j < 64; ++j) idxA[k][j] = idxB[k][j] = 0;
            maskB[k] = m;
        }
    }
};

// 12-stream deinterleave: o_k[q] = row[12q + k - 6] (zero outside [0, 3W)).
static void pack_img_row_avx512(const uint8_t* row, int W, int WQ, int WQ0,
                                uint8_t* og) {
    static const ImgTables T;
    const int WB = 3 * W;
    // q = 0 and per-stream bounds
    int qhi[12];
    for (int k = 0; k < 12; ++k) {
        og[(size_t)k * WQ] = k >= 6 ? row[k - 6] : 0;
        qhi[k] = std::min(WQ0, (WB + 5 - k) / 12 + 1);
    }
    // SIMD interior: blocks of 16 q, window [12q0-6, 12q0+186) in-range
    int qblk_end = 1;                       // first q not covered by SIMD
    int qmax = (WB - 186) / 12;             // last valid block q
    if (qmax >= 16) {
        __m512i idxA[12], idxB[12];
        for (int k = 0; k < 12; ++k) {
            idxA[k] = _mm512_load_si512((const void*)T.idxA[k]);
            idxB[k] = _mm512_load_si512((const void*)T.idxB[k]);
        }
        int q0 = 1;
        for (; q0 + 15 <= qmax && q0 + 15 < WQ0; q0 += 16) {
            const uint8_t* wnd = row + 12 * q0 - 6;
            __m512i z0 = _mm512_loadu_si512((const void*)wnd);
            __m512i z1 = _mm512_loadu_si512((const void*)(wnd + 64));
            __m512i z2 = _mm512_loadu_si512((const void*)(wnd + 128));
            for (int k = 0; k < 12; ++k) {
                __m512i a = _mm512_permutex2var_epi8(z0, idxA[k], z1);
                __m512i b = _mm512_permutexvar_epi8(idxB[k], z2);
                __m512i r = _mm512_mask_blend_epi8(T.maskB[k], a, b);
                _mm_storeu_si128(
                    (__m128i*)(og + (size_t)k * WQ + q0),
                    _mm512_castsi512_si128(r));
            }
        }
        qblk_end = q0;
    }
    // scalar tail + zero fill
    for (int k = 0; k < 12; ++k) {
        uint8_t* o = og + (size_t)k * WQ;
        for (int q = qblk_end; q < qhi[k]; ++q) o[q] = row[12 * q + k - 6];
        for (int q = std::max(qhi[k], qblk_end); q < WQ; ++q) o[q] = 0;
    }
}

// 4-stream deinterleave + u16/16 -> bf16: o_s[q] = bf16(san(row[4q+s-2])/16)
static void pack_disp_row_avx512(const uint16_t* row, int W, int WQ,
                                 int WQ0, uint16_t* og) {
    alignas(64) static const uint16_t idx16[32] = {
        0, 4, 8, 12, 16, 20, 24, 28, 32, 36, 40, 44, 48, 52, 56, 60,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0};
    const __m512i idx = _mm512_load_si512((const void*)idx16);
    const __m512i inval = _mm512_set1_epi16((short)0xFFFF);
    const __m512 sc = _mm512_set1_ps(0.0625f);
    int qhi[4];
    for (int s = 0; s < 4; ++s) {
        og[(size_t)s * WQ] = s >= 2 ? disp_val(row, s - 2) : 0;
        qhi[s] = std::min(WQ0, (W - 1 - (s - 2)) / 4 + 1);
    }
    int qblk_end[4] = {1, 1, 1, 1};
    for (int s = 0; s < 4; ++s) {
        uint16_t* o = og + (size_t)s * WQ;
        // window loads 128 u16 from 4q0 + s - 2; keep them in-range
        int qmax = (W - 126 - (s - 2)) / 4;
        int q0 = 1;
        for (; q0 + 31 <= qmax && q0 + 31 < WQ0; q0 += 32) {
            const uint16_t* wnd = row + 4 * q0 + s - 2;
            __m512i z0 = _mm512_loadu_si512((const void*)wnd);
            __m512i z1 = _mm512_loadu_si512((const void*)(wnd + 32));
            __m512i z2 = _mm512_loadu_si512((const void*)(wnd + 64));
            __m512i z3 = _mm512_loadu_si512((const void*)(wnd + 96));
            __m512i a = _mm512_permutex2var_epi16(z0, idx, z1);
            __m512i b = _mm512_permutex2var_epi16(z2, idx, z3);
            __m512i v = _mm512_shuffle_i64x2(a, b, 0x44);
            __mmask32 bad = _mm512_cmpeq_epi16_mask(v, inval);
            v = _mm512_maskz_mov_epi16(~bad, v);
            __m512 flo = _mm512_mul_ps(_mm512_cvtepi32_ps(
                _mm512_cvtepu16_epi32(_mm512_castsi512_si256(v))), sc);
            __m512 fhi = _mm512_mul_ps(_mm512_cvtepi32_ps(
                _mm512_cvtepu16_epi32(_mm512_extracti64x4_epi64(v, 1))),
                sc);
            __m512i bf = (__m512i)_mm512_cvtne2ps_pbh(fhi, flo);
            _mm512_storeu_si512((void*)(o + q0), bf);
        }
        qblk_end[s] = q0;
    }
    for (int s = 0; s < 4; ++s) {
        uint16_t* o = og + (size_t)s * WQ;
        for (int q = qblk_end[s]; q < qhi[s]; ++q)
            o[q] = disp_val(row, 4L * q + s - 2);
        for (int q = std::max(qhi[s], qblk_end[s]); q < WQ; ++q) o[q] = 0;
    }
}
#endif  // STEM_PACK_SIMD

// ---------------------------------------------------------------------
// per-group packers

static void pack_img_group(const uint8_t* img, int g, int H, int W, int C,
                           int WQ, int WQ0, uint8_t* og) {
    for (int r = 0; r < 4; ++r) {
        int y = 4 * g + r - 2;            // padded row -> image row
        uint8_t* ogr = og + (size_t)r * 4 * C * WQ;
        if (y < 0 || y >= H) {
            std::memset(ogr, 0, (size_t)4 * C * WQ);
            continue;
        }
        const uint8_t* row = img + (size_t)y * W * C;
#ifdef STEM_PACK_SIMD
        if (C == 3 && simd_ok()) {
            pack_img_row_avx512(row, W, WQ, WQ0, ogr);
            continue;
        }
#endif
        pack_img_row_scalar(row, W, C, WQ, WQ0, ogr);
    }
}

static void pack_disp_group(const uint16_t* disp, int g, int H, int W,
                            int WQ, int WQ0, uint16_t* og) {
    for (int r = 0; r < 4; ++r) {
        int y = 4 * g + r - 2;
        uint16_t* ogr = og + (size_t)r * 4 * WQ;
        if (y < 0 || y >= H) {
            std::memset(ogr, 0, (size_t)4 * WQ * 2);
            continue;
        }
        const uint16_t* row = disp + (size_t)y * W;
#ifdef STEM_PACK_SIMD
        if (simd_ok()) {
            pack_disp_row_avx512(row, W, WQ, WQ0, ogr);
            continue;
        }
#endif
        pack_disp_row_scalar(row, W, WQ, WQ0, ogr);
    }
}

}  // namespace

extern "C" {

// img: (H, W, C) uint8 row-major -> out: (HP/4+1, 16C, WQ) uint8, zeroed
// pad.  HP/WP are the model-padded dims (multiples of 4, >= H/W): rows
// >= H and cols >= W read as zero, exactly like the device-side
// pad-to-divisor the packed layout replaces.  WQ >= WP/4 + 1.
void stem_pack_u8(const uint8_t* img, int H, int W, int C, int HP, int WP,
                  int WQ, uint8_t* out) {
    const int HQ = HP / 4 + 1, WQ0 = WP / 4 + 1;
    parallel_for(HQ, [&](int glo, int ghi) {
        for (int g = glo; g < ghi; ++g)
            pack_img_group(img, g, H, W, C, WQ, WQ0,
                           out + (size_t)g * 16 * C * WQ);
    });
}

// disp: (H, W) uint16 SGBM/16 fixed point -> packed bf16 disparity
// (H/4+1, 16, WQ): value = (d == 65535 ? 0 : d) / 16.0f, layout as above
// with C=1 (the model's disp_postp channel-repeat is folded into the stem
// kernel instead).
void stem_pack_disp_bf16(const uint16_t* disp, int H, int W, int HP,
                         int WP, int WQ, uint16_t* out) {
    const int HQ = HP / 4 + 1, WQ0 = WP / 4 + 1;
    parallel_for(HQ, [&](int glo, int ghi) {
        for (int g = glo; g < ghi; ++g)
            pack_disp_group(disp, g, H, W, WQ, WQ0,
                            out + (size_t)g * 16 * WQ);
    });
}

// Batched variants: imgs (S, H, W, C) -> out (S, HP/4+1, 16C, WQ), one
// call for a whole stream batch (the data-loader shape; avoids S python
// round-trips and the np.stack copy).
void stem_pack_u8_batch(const uint8_t* imgs, int S, int H, int W, int C,
                        int HP, int WP, int WQ, uint8_t* out) {
    const int HQ = HP / 4 + 1, WQ0 = WP / 4 + 1;
    const size_t in_sz = (size_t)H * W * C;
    const size_t out_sz = (size_t)HQ * 16 * C * WQ;
    parallel_for(S * HQ, [&](int lo, int hi) {
        for (int i = lo; i < hi; ++i) {
            int s = i / HQ, g = i % HQ;
            pack_img_group(imgs + (size_t)s * in_sz, g, H, W, C, WQ, WQ0,
                           out + (size_t)s * out_sz +
                               (size_t)g * 16 * C * WQ);
        }
    });
}

void stem_pack_disp_bf16_batch(const uint16_t* disps, int S, int H, int W,
                               int HP, int WP, int WQ, uint16_t* out) {
    const int HQ = HP / 4 + 1, WQ0 = WP / 4 + 1;
    const size_t in_sz = (size_t)H * W;
    const size_t out_sz = (size_t)HQ * 16 * WQ;
    parallel_for(S * HQ, [&](int lo, int hi) {
        for (int i = lo; i < hi; ++i) {
            int s = i / HQ, g = i % HQ;
            pack_disp_group(disps + (size_t)s * in_sz, g, H, W, WQ, WQ0,
                            out + (size_t)s * out_sz + (size_t)g * 16 * WQ);
        }
    });
}

}  // extern "C"
