// Native host-side kernels for point_cloud_viewer_tpu.
//
// The TPU handles the O(N log N) compute; these C++ kernels cover the
// host-resident hot paths that feed it — position codec, Morton encoding,
// and a multithreaded radix argsort — mirroring where the reference keeps
// its native code (the Rust codec in src/read_write/codec.rs and the
// sort-heavy builder in src/octree/generation.rs).
//
// Built as a plain shared library; Python binds via ctypes (no pybind11).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <atomic>
#include <cmath>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Position codec: fixpoint/normalized encode+decode, interleaved xyz.
// t = clamp((p - min) / edge, 0, 1); integers truncate (Rust `as` semantics).

static inline double clamp01(double v) {
    if (!(v > 0.0)) return 0.0;  // also catches NaN
    if (v > 1.0) return 1.0;
    return v;
}

void encode_positions_u8(const double* pos, const double* cube_min,
                         const double* edge, int64_t n, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const double e = edge[i];
        for (int d = 0; d < 3; ++d) {
            double t = e > 0.0 ? (pos[3 * i + d] - cube_min[3 * i + d]) / e : 0.0;
            out[3 * i + d] = (uint8_t)(clamp01(t) * 255.0);
        }
    }
}

void encode_positions_u16(const double* pos, const double* cube_min,
                          const double* edge, int64_t n, uint16_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const double e = edge[i];
        for (int d = 0; d < 3; ++d) {
            double t = e > 0.0 ? (pos[3 * i + d] - cube_min[3 * i + d]) / e : 0.0;
            out[3 * i + d] = (uint16_t)(clamp01(t) * 65535.0);
        }
    }
}

void decode_positions_u8(const uint8_t* enc, const double* cube_min,
                         const double* edge, int64_t n, double* out) {
    for (int64_t i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d)
            out[3 * i + d] =
                (double)enc[3 * i + d] / 255.0 * edge[i] + cube_min[3 * i + d];
}

void decode_positions_u16(const uint16_t* enc, const double* cube_min,
                          const double* edge, int64_t n, double* out) {
    for (int64_t i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d)
            out[3 * i + d] =
                (double)enc[3 * i + d] / 65535.0 * edge[i] + cube_min[3 * i + d];
}

// ---------------------------------------------------------------------------
// Morton encoding: (N, 3) u32 cells (21 bits/axis) -> u64 codes, x msb.

static inline uint64_t spread3(uint64_t x) {
    x &= 0x1fffff;
    x = (x | (x << 32)) & 0x1f00000000ffffULL;
    x = (x | (x << 16)) & 0x1f0000ff0000ffULL;
    x = (x | (x << 8)) & 0x100f00f00f00f00fULL;
    x = (x | (x << 4)) & 0x10c30c30c30c30c3ULL;
    x = (x | (x << 2)) & 0x1249249249249249ULL;
    return x;
}

void morton_encode(const uint32_t* cells, int64_t n, uint64_t* out) {
    const int num_threads =
        (int)std::min<int64_t>(std::thread::hardware_concurrency(), 16);
    if (n < 100000 || num_threads <= 1) {
        for (int64_t i = 0; i < n; ++i)
            out[i] = (spread3(cells[3 * i]) << 2) |
                     (spread3(cells[3 * i + 1]) << 1) | spread3(cells[3 * i + 2]);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (n + num_threads - 1) / num_threads;
    for (int t = 0; t < num_threads; ++t) {
        int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
        threads.emplace_back([=]() {
            for (int64_t i = lo; i < hi; ++i)
                out[i] = (spread3(cells[3 * i]) << 2) |
                         (spread3(cells[3 * i + 1]) << 1) |
                         spread3(cells[3 * i + 2]);
        });
    }
    for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// Stable LSD radix argsort of u64 keys (8 passes of 8 bits), multithreaded
// histogramming. Returns the permutation (like np.argsort, stable) and the
// sorted keys.

void radix_argsort_u64(const uint64_t* keys, int64_t n, int64_t* perm_out,
                       uint64_t* keys_out) {
    constexpr int RADIX_BITS = 16;
    constexpr int BUCKETS = 1 << RADIX_BITS;
    std::vector<uint64_t> k0(keys, keys + n), k1(n);
    std::vector<int64_t> p0(n), p1(n);
    for (int64_t i = 0; i < n; ++i) p0[i] = i;

    uint64_t* kin = k0.data();
    uint64_t* kout = k1.data();
    int64_t* pin = p0.data();
    int64_t* pout = p1.data();

    const int num_threads = std::max(
        1, (int)std::min<int64_t>(std::thread::hardware_concurrency(), 16));
    std::vector<int64_t> hist(
        (size_t)num_threads * BUCKETS);  // per-thread histograms
    const int64_t chunk = (n + num_threads - 1) / num_threads;

    for (int pass = 0; pass < 4; ++pass) {
        const int shift = pass * RADIX_BITS;
        std::fill(hist.begin(), hist.end(), 0);
        // Parallel histogram.
        {
            std::vector<std::thread> threads;
            for (int t = 0; t < num_threads; ++t) {
                threads.emplace_back([&, t]() {
                    int64_t* h = hist.data() + (size_t)t * BUCKETS;
                    const int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
                    for (int64_t i = lo; i < hi; ++i)
                        h[(kin[i] >> shift) & (BUCKETS - 1)]++;
                });
            }
            for (auto& th : threads) th.join();
        }
        // Skip constant digits.
        int nonzero = 0;
        int64_t totals_check = 0;
        for (int b = 0; b < BUCKETS && nonzero < 2; ++b) {
            int64_t s = 0;
            for (int t = 0; t < num_threads; ++t)
                s += hist[(size_t)t * BUCKETS + b];
            if (s) nonzero++;
            totals_check += s;
        }
        if (nonzero < 2) continue;
        // Exclusive prefix over (bucket, thread) so each thread scatters to
        // disjoint ranges (stable).
        int64_t acc = 0;
        for (int b = 0; b < BUCKETS; ++b) {
            for (int t = 0; t < num_threads; ++t) {
                int64_t& h = hist[(size_t)t * BUCKETS + b];
                int64_t c = h;
                h = acc;
                acc += c;
            }
        }
        // Parallel scatter.
        {
            std::vector<std::thread> threads;
            for (int t = 0; t < num_threads; ++t) {
                threads.emplace_back([&, t]() {
                    int64_t* h = hist.data() + (size_t)t * BUCKETS;
                    const int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
                    for (int64_t i = lo; i < hi; ++i) {
                        const int64_t o = h[(kin[i] >> shift) & (BUCKETS - 1)]++;
                        kout[o] = kin[i];
                        pout[o] = pin[i];
                    }
                });
            }
            for (auto& th : threads) th.join();
        }
        std::swap(kin, kout);
        std::swap(pin, pout);
    }
    std::memcpy(keys_out, kin, sizeof(uint64_t) * n);
    std::memcpy(perm_out, pin, sizeof(int64_t) * n);
}

// ---------------------------------------------------------------------------
// Wire-blob decode for the viewer: normalized fixpoint -> f32 world coords
// relative to an f64 offset (keeps f32 precision for rendering).

void decode_to_f32_relative(const uint16_t* enc, int64_t n, double min_x,
                            double min_y, double min_z, double edge,
                            double off_x, double off_y, double off_z,
                            float* out) {
    const double mins[3] = {min_x - off_x, min_y - off_y, min_z - off_z};
    for (int64_t i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d)
            out[3 * i + d] =
                (float)((double)enc[3 * i + d] / 65535.0 * edge + mins[d]);
}

int pcv_native_abi_version() { return 1; }

}  // extern "C"
