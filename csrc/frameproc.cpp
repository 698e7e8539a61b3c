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
