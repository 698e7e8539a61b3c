// Native host-side frame preprocessing for the video data loader.
//
// TPU-native counterpart of the reference's native runtime pieces
// (sat/ops/csrc): on GPU the hot host loop is hidden by CUDA streams; on
// TPU the host must keep the input pipeline ahead of the device, and the
// uint8 HWC -> float32 CHW normalize over 81 full-res frames is the
// dominant host cost.  Multi-threaded C++ beats numpy's strided transpose
// by avoiding the intermediate materialisation.
//
// Exposed via a plain C ABI and loaded with ctypes
// (scail_tpu/native/__init__.py); no pybind11 dependency.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

extern "C" {

// (t, h, w, c) uint8 -> (t, c, h, w) float32, normalized to [-1, 1]
// ((x - 127.5) / 127.5; reference data_video normalize)
void normalize_frames_u8_to_f32(const uint8_t* in, float* out,
                                int64_t t, int64_t h, int64_t w, int64_t c,
                                int n_threads) {
    const int64_t hw = h * w;
    const int64_t frame_in = hw * c;
    const int64_t frame_out = c * hw;
    if (n_threads <= 0) {
        n_threads = std::max(1u, std::thread::hardware_concurrency());
    }
    n_threads = (int)std::min<int64_t>(n_threads, t > 0 ? t : 1);

    auto work = [&](int64_t t0, int64_t t1) {
        // precomputed LUT: 256 entries of (v - 127.5) / 127.5
        float lut[256];
        for (int v = 0; v < 256; ++v) lut[v] = (v - 127.5f) / 127.5f;
        for (int64_t ti = t0; ti < t1; ++ti) {
            const uint8_t* src = in + ti * frame_in;
            float* dst = out + ti * frame_out;
            for (int64_t p = 0; p < hw; ++p) {
                const uint8_t* px = src + p * c;
                for (int64_t ch = 0; ch < c; ++ch) {
                    dst[ch * hw + p] = lut[px[ch]];
                }
            }
        }
    };

    std::vector<std::thread> threads;
    const int64_t per = (t + n_threads - 1) / n_threads;
    for (int i = 0; i < n_threads; ++i) {
        int64_t t0 = i * per;
        int64_t t1 = std::min<int64_t>(t0 + per, t);
        if (t0 >= t1) break;
        threads.emplace_back(work, t0, t1);
    }
    for (auto& th : threads) th.join();
}

// Separable banded resize of (planes, in_h, in_w) float32 -> (planes,
// out_h, out_w).  The caller supplies, per axis, a uniform-width band:
// for output index i the taps cover input [lo[i], lo[i] + taps) with
// weights w[i*taps .. i*taps+taps).  The bands are extracted from the
// SAME torch-exact dense weight matrices the jax path uses
// (scail_tpu/ops/resize.py builds them; scail_tpu/native/resize_kernels.py
// is the shared numpy source), so host and device resizes agree to
// float32 rounding.  Parallelised over planes (T*C for video).
void resize_separable_f32(const float* in, float* out,
                          int64_t planes, int64_t in_h, int64_t in_w,
                          int64_t out_h, int64_t out_w,
                          const int32_t* h_lo, const float* h_w, int64_t h_taps,
                          const int32_t* w_lo, const float* w_w, int64_t w_taps,
                          int n_threads) {
    if (n_threads <= 0) {
        n_threads = std::max(1u, std::thread::hardware_concurrency());
    }
    n_threads = (int)std::min<int64_t>(n_threads, planes > 0 ? planes : 1);

    auto work = [&](int64_t p0, int64_t p1) {
        // per-thread scratch for the H-resized intermediate (out_h, in_w)
        std::vector<float> tmp((size_t)(out_h * in_w));
        for (int64_t p = p0; p < p1; ++p) {
            const float* src = in + p * in_h * in_w;
            // H pass: tmp[y, :] = sum_k h_w[y,k] * src[h_lo[y]+k, :]
            for (int64_t y = 0; y < out_h; ++y) {
                float* trow = tmp.data() + y * in_w;
                const float* wr = h_w + y * h_taps;
                const int64_t lo = h_lo[y];
                std::memset(trow, 0, sizeof(float) * in_w);
                for (int64_t k = 0; k < h_taps; ++k) {
                    const float wk = wr[k];
                    if (wk == 0.0f) continue;
                    const float* srow = src + (lo + k) * in_w;
                    for (int64_t x = 0; x < in_w; ++x) trow[x] += wk * srow[x];
                }
            }
            // W pass: out[y, x] = sum_k w_w[x,k] * tmp[y, w_lo[x]+k]
            float* dst = out + p * out_h * out_w;
            for (int64_t y = 0; y < out_h; ++y) {
                const float* trow = tmp.data() + y * in_w;
                float* drow = dst + y * out_w;
                for (int64_t x = 0; x < out_w; ++x) {
                    const float* wr = w_w + x * w_taps;
                    const float* s = trow + w_lo[x];
                    float acc = 0.0f;
                    for (int64_t k = 0; k < w_taps; ++k) acc += wr[k] * s[k];
                    drow[x] = acc;
                }
            }
        }
    };

    std::vector<std::thread> threads;
    const int64_t per = (planes + n_threads - 1) / n_threads;
    for (int i = 0; i < n_threads; ++i) {
        int64_t p0 = i * per;
        int64_t p1 = std::min<int64_t>(p0 + per, planes);
        if (p0 >= p1) break;
        threads.emplace_back(work, p0, p1);
    }
    for (auto& th : threads) th.join();
}

// fused center-crop of a (t, c, h, w) float32 tensor
void center_crop_f32(const float* in, float* out,
                     int64_t t, int64_t c, int64_t h, int64_t w,
                     int64_t top, int64_t left, int64_t oh, int64_t ow) {
    for (int64_t ti = 0; ti < t; ++ti) {
        for (int64_t ch = 0; ch < c; ++ch) {
            const float* src = in + ((ti * c + ch) * h + top) * w + left;
            float* dst = out + (ti * c + ch) * oh * ow;
            for (int64_t y = 0; y < oh; ++y) {
                std::memcpy(dst + y * ow, src + y * w, sizeof(float) * ow);
            }
        }
    }
}

}  // extern "C"
