// Native data-loader kernels: fused resize + center-crop + normalize.
//
// The reference's input pipeline leans on torch/cv2 C++ kernels for frame
// preprocessing; this is the TPU build's equivalent for the host-side data
// path. One pass over uint8 frames producing float32 CTHW in [0, 1]:
//   bilinear short-side resize -> center crop -> /255 -> HWC->CHW
//
// Built as a plain shared library (no Python.h); numpy arrays cross via
// ctypes pointers. See easyanimate_tpu/data/native.py.

#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

// frames: (T, H, W, 3) uint8 contiguous
// out:    (3, T, out_h, out_w) float32 contiguous
void resize_crop_normalize(const uint8_t* frames, int64_t t, int64_t h,
                           int64_t w, int64_t out_h, int64_t out_w,
                           float* out) {
  // short-side scale so both dims cover the target, then center crop
  const double scale =
      std::max((double)out_h / (double)h, (double)out_w / (double)w);
  const double inv = 1.0 / scale;
  const int64_t nh = (int64_t)(h * scale + 0.5);
  const int64_t nw = (int64_t)(w * scale + 0.5);
  const int64_t top = (nh - out_h) / 2;
  const int64_t left = (nw - out_w) / 2;

  const int64_t frame_in = h * w * 3;
  const int64_t plane_out = t * out_h * out_w;

  for (int64_t f = 0; f < t; ++f) {
    const uint8_t* src = frames + f * frame_in;
    for (int64_t y = 0; y < out_h; ++y) {
      // position in source coordinates (half-pixel centers)
      const double sy = ((double)(y + top) + 0.5) * inv - 0.5;
      int64_t y0 = (int64_t)sy;
      double fy = sy - y0;
      if (sy < 0) { y0 = 0; fy = 0; }
      int64_t y1 = std::min(y0 + 1, h - 1);
      y0 = std::min(std::max(y0, (int64_t)0), h - 1);
      for (int64_t x = 0; x < out_w; ++x) {
        const double sx = ((double)(x + left) + 0.5) * inv - 0.5;
        int64_t x0 = (int64_t)sx;
        double fx = sx - x0;
        if (sx < 0) { x0 = 0; fx = 0; }
        int64_t x1 = std::min(x0 + 1, w - 1);
        x0 = std::min(std::max(x0, (int64_t)0), w - 1);
        const uint8_t* p00 = src + (y0 * w + x0) * 3;
        const uint8_t* p01 = src + (y0 * w + x1) * 3;
        const uint8_t* p10 = src + (y1 * w + x0) * 3;
        const uint8_t* p11 = src + (y1 * w + x1) * 3;
        const double w00 = (1 - fy) * (1 - fx), w01 = (1 - fy) * fx;
        const double w10 = fy * (1 - fx), w11 = fy * fx;
        const int64_t o = f * out_h * out_w + y * out_w + x;
        for (int c = 0; c < 3; ++c) {
          const double v = w00 * p00[c] + w01 * p01[c] + w10 * p10[c] +
                           w11 * p11[c];
          out[c * plane_out + o] = (float)(v * (1.0 / 255.0));
        }
      }
    }
  }
}

// uint8 (T,H,W,3) -> float32 (3,T,H,W) in [-1, 1] (VAE input convention)
void to_chw_normalized(const uint8_t* frames, int64_t t, int64_t h, int64_t w,
                       float* out) {
  const int64_t plane = t * h * w;
  for (int64_t f = 0; f < t; ++f) {
    for (int64_t i = 0; i < h * w; ++i) {
      const uint8_t* p = frames + (f * h * w + i) * 3;
      const int64_t o = f * h * w + i;
      for (int c = 0; c < 3; ++c) {
        out[c * plane + o] = (float)p[c] * (2.0f / 255.0f) - 1.0f;
      }
    }
  }
}

}  // extern "C"
