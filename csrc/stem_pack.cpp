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
// Multi-threaded over row groups; the inner loop is a strided gather the
// compiler vectorizes.  Throughput on the dev host: ~GB/s per thread.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>
#ifdef __linux__
#include <sched.h>
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

}  // namespace

extern "C" {

// img: (H, W, C) uint8 row-major -> out: (HP/4+1, 16C, WQ) uint8, zeroed
// pad.  HP/WP are the model-padded dims (multiples of 4, >= H/W): rows
// >= H and cols >= W read as zero, exactly like the device-side
// pad-to-divisor the packed layout replaces.  WQ >= WP/4 + 1.
void stem_pack_u8(const uint8_t* img, int H, int W, int C, int HP, int WP,
                  int WQ, uint8_t* out) {
    const int HQ = HP / 4 + 1, R16C = 16 * C, WQ0 = WP / 4 + 1;
    parallel_for(HQ, [&](int glo, int ghi) {
        for (int g = glo; g < ghi; ++g) {
            uint8_t* og = out + (size_t)g * R16C * WQ;
            for (int r = 0; r < 4; ++r) {
                int y = 4 * g + r - 2;            // padded row -> image row
                if (y < 0 || y >= H) {
                    std::memset(og + (size_t)r * 4 * C * WQ, 0,
                                (size_t)4 * C * WQ);
                    continue;
                }
                const uint8_t* row = img + (size_t)y * W * C;
                for (int s = 0; s < 4; ++s) {
                    for (int c = 0; c < C; ++c) {
                        uint8_t* o =
                            og + ((size_t)(r * 4 + s) * C + c) * WQ;
                        // q: image col x = 4q + s - 2
                        int x0 = s - 2;
                        int qlo = x0 < 0 ? 1 : 0;
                        o[0] = 0;
                        if (x0 >= 0) o[0] = row[(size_t)x0 * C + c];
                        const uint8_t* src = row + (size_t)(4 * qlo + x0) * C
                                             + c;
                        int qhi = std::min(WQ0, (W - 1 - x0) / 4 + 1);
                        for (int q = qlo; q < qhi; ++q)
                            o[q] = src[(size_t)(q - qlo) * 4 * C];
                        for (int q = std::max(qhi, qlo); q < WQ; ++q)
                            o[q] = 0;
                    }
                }
            }
        }
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
        for (int g = glo; g < ghi; ++g) {
            uint16_t* og = out + (size_t)g * 16 * WQ;
            for (int r = 0; r < 4; ++r) {
                int y = 4 * g + r - 2;
                if (y < 0 || y >= H) {
                    std::memset(og + (size_t)r * 4 * WQ, 0,
                                (size_t)4 * WQ * 2);
                    continue;
                }
                const uint16_t* row = disp + (size_t)y * W;
                for (int s = 0; s < 4; ++s) {
                    uint16_t* o = og + (size_t)(r * 4 + s) * WQ;
                    int x0 = s - 2;
                    int qlo = x0 < 0 ? 1 : 0;
                    o[0] = 0;
                    if (x0 >= 0) {
                        uint16_t d = row[x0];
                        o[0] = f32_to_bf16(d == 65535 ? 0.f : d / 16.f);
                    }
                    int qhi = std::min(WQ0, (W - 1 - x0) / 4 + 1);
                    for (int q = qlo; q < qhi; ++q) {
                        uint16_t d = row[(size_t)4 * q + x0];
                        o[q] = f32_to_bf16(d == 65535 ? 0.f : d / 16.f);
                    }
                    for (int q = std::max(qhi, qlo); q < WQ; ++q) o[q] = 0;
                }
            }
        }
    });
}

}  // extern "C"
