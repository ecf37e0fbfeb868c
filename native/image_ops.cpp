// Native host-side image ops: separable Gaussian mask blur + composite.
//
// The reference's final compositing (Gaussian-blur the mask, then
// out = result*m + input*(1-m), reference app.py:371-381) runs per request
// on the serving host; at 2048^2 outpaint canvases the numpy version costs
// tens of milliseconds per call.  This C++ path is the production route,
// exposed via C ABI + ctypes (powerpaint_tpu/tasks/native.py), with the
// numpy implementation kept as fallback.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// In-place separable Gaussian blur of a float32 mask (h, w).
void ppt_gaussian_blur(float* mask, int32_t h, int32_t w, float sigma) {
  if (sigma <= 0.f) return;
  int half = std::max(1, static_cast<int>(3.f * sigma));
  std::vector<float> k(2 * half + 1);
  float sum = 0.f;
  for (int i = -half; i <= half; ++i) {
    float v = std::exp(-0.5f * (i / sigma) * (i / sigma));
    k[i + half] = v;
    sum += v;
  }
  for (auto& v : k) v /= sum;

  std::vector<float> tmp(static_cast<size_t>(h) * w);
  // horizontal pass (edge-clamped)
  for (int y = 0; y < h; ++y) {
    const float* row = mask + static_cast<size_t>(y) * w;
    float* out = tmp.data() + static_cast<size_t>(y) * w;
    for (int x = 0; x < w; ++x) {
      float acc = 0.f;
      for (int i = -half; i <= half; ++i) {
        int xx = std::clamp(x + i, 0, w - 1);
        acc += row[xx] * k[i + half];
      }
      out[x] = acc;
    }
  }
  // vertical pass
  for (int y = 0; y < h; ++y) {
    float* out = mask + static_cast<size_t>(y) * w;
    for (int x = 0; x < w; ++x) {
      float acc = 0.f;
      for (int i = -half; i <= half; ++i) {
        int yy = std::clamp(y + i, 0, h - 1);
        acc += tmp[static_cast<size_t>(yy) * w + x] * k[i + half];
      }
      out[x] = acc;
    }
  }
}

// out = result*m + original*(1-m), all (h, w, 3) uint8, m (h, w) float32.
void ppt_blend(const uint8_t* result, const uint8_t* original,
               const float* mask, int32_t h, int32_t w, uint8_t* out) {
  const size_t n = static_cast<size_t>(h) * w;
  for (size_t i = 0; i < n; ++i) {
    float m = mask[i];
    if (m < 0.f) m = 0.f;
    if (m > 1.f) m = 1.f;
    for (int c = 0; c < 3; ++c) {
      float v = result[i * 3 + c] * m + original[i * 3 + c] * (1.f - m);
      out[i * 3 + c] = static_cast<uint8_t>(v + 0.5f);
    }
  }
}

// red-overlay mask visualization (reference app.py:365-370)
void ppt_red_overlay(const uint8_t* image, const float* mask, int32_t h,
                     int32_t w, float alpha, uint8_t* out) {
  const size_t n = static_cast<size_t>(h) * w;
  for (size_t i = 0; i < n; ++i) {
    float m = mask[i] >= 0.5f ? alpha : 0.f;
    float r = image[i * 3 + 0] * (1.f - m) + 255.f * m;
    out[i * 3 + 0] = static_cast<uint8_t>(r + 0.5f);
    out[i * 3 + 1] = static_cast<uint8_t>(image[i * 3 + 1] * (1.f - m) + 0.5f);
    out[i * 3 + 2] = static_cast<uint8_t>(image[i * 3 + 2] * (1.f - m) + 0.5f);
  }
}

}  // extern "C"
