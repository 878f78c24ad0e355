// sat_tpu native host-side image preprocessing.
//
// The hot CPU loop of the serving/data path: bilinear resize of a decoded
// RGB image to the model resolution plus ImageNet normalization, fused in
// one pass over the output (the Python path materializes the resized uint8
// image, a float [0,1] copy, and the normalized copy; reference
// train.py:27-32 does the same through three torchvision transforms).
//
// Sampling convention: half-pixel centers (align_corners=false), matching
// the numpy reference implementation in sat_tpu/data/native.py, which tests
// compare against exactly.
//
// Build: tools/build_native.sh  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <algorithm>

extern "C" {

// src: (sh, sw, 3) uint8 RGB, C-contiguous.
// dst: (dh, dw, 3) float32, C-contiguous, normalized (x/255 - mean) / std.
void resize_normalize(const uint8_t* src, int sh, int sw,
                      float* dst, int dh, int dw,
                      const float* mean, const float* stddev) {
    // Coordinates in double: keeps index/weight math exact for large
    // downscale factors (the per-pixel blend stays float32).
    const double scale_h = static_cast<double>(sh) / dh;
    const double scale_w = static_cast<double>(sw) / dw;
    const float inv255 = 1.0f / 255.0f;
    float inv_std[3] = {1.0f / stddev[0], 1.0f / stddev[1], 1.0f / stddev[2]};

    for (int oy = 0; oy < dh; ++oy) {
        double fy = (oy + 0.5) * scale_h - 0.5;
        fy = std::max(0.0, std::min(fy, static_cast<double>(sh - 1)));
        const int y0 = static_cast<int>(fy);
        const int y1 = std::min(y0 + 1, sh - 1);
        const float wy = static_cast<float>(fy - y0);

        float* out_row = dst + static_cast<int64_t>(oy) * dw * 3;
        const uint8_t* row0 = src + static_cast<int64_t>(y0) * sw * 3;
        const uint8_t* row1 = src + static_cast<int64_t>(y1) * sw * 3;

        for (int ox = 0; ox < dw; ++ox) {
            double fx = (ox + 0.5) * scale_w - 0.5;
            fx = std::max(0.0, std::min(fx, static_cast<double>(sw - 1)));
            const int x0 = static_cast<int>(fx);
            const int x1 = std::min(x0 + 1, sw - 1);
            const float wx = static_cast<float>(fx - x0);

            const float w00 = (1 - wy) * (1 - wx), w01 = (1 - wy) * wx;
            const float w10 = wy * (1 - wx), w11 = wy * wx;
            const uint8_t* p00 = row0 + x0 * 3;
            const uint8_t* p01 = row0 + x1 * 3;
            const uint8_t* p10 = row1 + x0 * 3;
            const uint8_t* p11 = row1 + x1 * 3;

            for (int c = 0; c < 3; ++c) {
                const float v = w00 * p00[c] + w01 * p01[c]
                              + w10 * p10[c] + w11 * p11[c];
                out_row[ox * 3 + c] = (v * inv255 - mean[c]) * inv_std[c];
            }
        }
    }
}

// Batch entry point: n images with per-image (sh, sw) dims packed in
// `dims`, sources via an offset table into one contiguous byte buffer.
void resize_normalize_batch(const uint8_t* src_buf, const int64_t* offsets,
                            const int* dims, int n,
                            float* dst, int dh, int dw,
                            const float* mean, const float* stddev) {
    const int64_t out_stride = static_cast<int64_t>(dh) * dw * 3;
    for (int i = 0; i < n; ++i) {
        resize_normalize(src_buf + offsets[i], dims[2 * i], dims[2 * i + 1],
                         dst + i * out_stride, dh, dw, mean, stddev);
    }
}

}  // extern "C"
