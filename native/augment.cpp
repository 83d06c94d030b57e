// nemar_tpu native data-path kernels.
//
// The reference delegates its input pipeline's hot loops to torch's C++
// (DataLoader collate, torchvision transform kernels — SURVEY.md §3.3).
// This library owns the equivalent fused step for the TPU build: one pass
// over each decoded uint8 image performing crop + horizontal flip +
// normalize-to-[-1,1] + collate directly into the float32 NHWC batch
// buffer the device transfer reads from. No intermediate tensors, no
// per-item Python arithmetic.
//
// Build: make -C native        (produces libnemar_native.so)
// Python binding: nemar_tpu/data/native_ops.py (ctypes, numpy fallback).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Crop a (h, w, c) uint8 image at (y0, x0) to (ch, cw), optional horizontal
// flip, normalize u8 -> [-1, 1] float32, writing to out (ch, cw, c).
void crop_flip_norm_u8(const uint8_t* img, int h, int w, int c,
                       int y0, int x0, int ch, int cw, int flip,
                       float* out) {
    const float scale = 2.0f / 255.0f;
    for (int i = 0; i < ch; ++i) {
        const uint8_t* row = img + ((static_cast<int64_t>(y0 + i) * w) + x0) * c;
        float* orow = out + static_cast<int64_t>(i) * cw * c;
        if (!flip) {
            const int64_t n = static_cast<int64_t>(cw) * c;
            for (int64_t k = 0; k < n; ++k)
                orow[k] = row[k] * scale - 1.0f;
        } else {
            for (int j = 0; j < cw; ++j) {
                const uint8_t* px = row + static_cast<int64_t>(cw - 1 - j) * c;
                float* opx = orow + static_cast<int64_t>(j) * c;
                for (int k = 0; k < c; ++k)
                    opx[k] = px[k] * scale - 1.0f;
            }
        }
    }
}

// Batched variant: n images (each h, w, c, contiguous in `imgs` at stride
// h*w*c) with per-item crop offsets and flips, collated into a single
// (n, ch, cw, c) float32 buffer. Parallelized across items.
void batch_crop_flip_norm_u8(const uint8_t* imgs, int n, int h, int w, int c,
                             const int* y0, const int* x0, const uint8_t* flip,
                             int ch, int cw, float* out, int num_threads) {
    const int64_t in_stride = static_cast<int64_t>(h) * w * c;
    const int64_t out_stride = static_cast<int64_t>(ch) * cw * c;
    if (num_threads <= 1 || n == 1) {
        for (int i = 0; i < n; ++i)
            crop_flip_norm_u8(imgs + i * in_stride, h, w, c, y0[i], x0[i],
                              ch, cw, flip[i], out + i * out_stride);
        return;
    }
    std::vector<std::thread> pool;
    int t = num_threads < n ? num_threads : n;
    for (int ti = 0; ti < t; ++ti) {
        pool.emplace_back([=]() {
            for (int i = ti; i < n; i += t)
                crop_flip_norm_u8(imgs + i * in_stride, h, w, c, y0[i], x0[i],
                                  ch, cw, flip[i], out + i * out_stride);
        });
    }
    for (auto& th : pool) th.join();
}

// Bilinear uint8 resize (h, w, c) -> (oh, ow, c), PIL-style half-pixel
// centers (align_corners=False convention).
void resize_bilinear_u8(const uint8_t* img, int h, int w, int c,
                        int oh, int ow, uint8_t* out) {
    const float sy = static_cast<float>(h) / oh;
    const float sx = static_cast<float>(w) / ow;
    for (int i = 0; i < oh; ++i) {
        float fy = (i + 0.5f) * sy - 0.5f;
        int y0 = fy < 0 ? 0 : static_cast<int>(fy);
        if (y0 > h - 2) y0 = h - 2;
        float wy = fy - y0;
        if (wy < 0) wy = 0;
        if (wy > 1) wy = 1;
        for (int j = 0; j < ow; ++j) {
            float fx = (j + 0.5f) * sx - 0.5f;
            int x0 = fx < 0 ? 0 : static_cast<int>(fx);
            if (x0 > w - 2) x0 = w - 2;
            float wx = fx - x0;
            if (wx < 0) wx = 0;
            if (wx > 1) wx = 1;
            const uint8_t* p00 = img + (static_cast<int64_t>(y0) * w + x0) * c;
            const uint8_t* p01 = p00 + c;
            const uint8_t* p10 = p00 + static_cast<int64_t>(w) * c;
            const uint8_t* p11 = p10 + c;
            uint8_t* o = out + (static_cast<int64_t>(i) * ow + j) * c;
            for (int k = 0; k < c; ++k) {
                float v = (1 - wy) * ((1 - wx) * p00[k] + wx * p01[k]) +
                          wy * ((1 - wx) * p10[k] + wx * p11[k]);
                o[k] = static_cast<uint8_t>(v + 0.5f);
            }
        }
    }
}

}  // extern "C"
