// Fast host-side bit-packing for owq_tpu checkpoints.
//
// TPU-native counterpart of the reference's CPU packing loop
// (owq/quant.py:321-350, a per-word Python/numpy loop): packs integer
// quantization codes into the paired half-word plane-chunk layout
// (owq_tpu/core/packing.py) in a single multithreaded pass.  Exposed via
// ctypes (no pybind11 in this image); owq_tpu.native falls back to the
// numpy implementation when the shared object is absent.
//
// Build: make -C native   (produces libowqpack.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline uint32_t plane_offset(int bits, int p, int half) {
    return (p < half) ? static_cast<uint32_t>(bits * p)
                      : static_cast<uint32_t>(16 + bits * (p - half));
}

// Pair-interleaved row assignment (owq_tpu/core/packing.py): plane p
// (pair k = p % half, half-word h = p / half) of word w holds logical
// input row k*2*nw + 2*w + h.
inline int64_t plane_row(int p, int64_t w, int64_t nw, int half) {
    const int k = (p < half) ? p : p - half;
    const int h = (p < half) ? 0 : 1;
    return static_cast<int64_t>(k) * 2 * nw + 2 * w + h;
}

void pack_range(const int32_t* q, int64_t in_pad, int64_t out, int bits,
                int64_t nw, int v, int32_t* words, int64_t c0, int64_t c1) {
    const int half = v / 2;
    const uint32_t mask = (1u << bits) - 1u;
    for (int64_t c = c0; c < c1; ++c) {
        for (int64_t w = 0; w < nw; ++w) {
            uint32_t acc = 0;
            for (int p = 0; p < v; ++p) {
                const uint32_t val =
                    static_cast<uint32_t>(q[plane_row(p, w, nw, half)
                                            * out + c]) & mask;
                acc |= val << plane_offset(bits, p, half);
            }
            words[w * out + c] = static_cast<int32_t>(acc);
        }
    }
}

void unpack_range(const int32_t* words, int64_t nw, int64_t out, int bits,
                  int v, int32_t* q, int64_t c0, int64_t c1) {
    const int half = v / 2;
    const uint32_t mask = (1u << bits) - 1u;
    for (int64_t c = c0; c < c1; ++c) {
        for (int64_t w = 0; w < nw; ++w) {
            const uint32_t word = static_cast<uint32_t>(words[w * out + c]);
            for (int p = 0; p < v; ++p) {
                q[plane_row(p, w, nw, half) * out + c] =
                    static_cast<int32_t>((word >> plane_offset(bits, p, half))
                                         & mask);
            }
        }
    }
}

void parallel_cols(int64_t out, int nthreads,
                   const std::function<void(int64_t, int64_t)>& fn) {
    if (nthreads <= 1 || out < 256) {
        fn(0, out);
        return;
    }
    std::vector<std::thread> threads;
    const int64_t chunk = (out + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; ++t) {
        const int64_t c0 = t * chunk;
        const int64_t c1 = std::min(out, c0 + chunk);
        if (c0 >= c1) break;
        threads.emplace_back(fn, c0, c1);
    }
    for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// q: [in_pad, out] int32 codes (row-major), in_pad == nw * v.
// words: [nw, out] int32 output.
void owq_pack(const int32_t* q, int64_t in_pad, int64_t out, int bits,
              int32_t* words, int nthreads) {
    const int v = (bits == 3) ? 10 : 8;
    const int64_t nw = in_pad / v;
    parallel_cols(out, nthreads, [&](int64_t c0, int64_t c1) {
        pack_range(q, in_pad, out, bits, nw, v, words, c0, c1);
    });
}

// words: [nw, out] int32; q out: [nw * v, out] int32.
void owq_unpack(const int32_t* words, int64_t nw, int64_t out, int bits,
                int32_t* q, int nthreads) {
    const int v = (bits == 3) ? 10 : 8;
    parallel_cols(out, nthreads, [&](int64_t c0, int64_t c1) {
        unpack_range(words, nw, out, bits, v, q, c0, c1);
    });
}

int owq_pack_abi_version() { return 3; }

}  // extern "C"
