// fastimage: native host-side image preprocessing for the data loader.
//
// The reference's data path decodes with PIL and resizes per-image in Python
// (`datasets/base.py:26-42`); on a TPU host the input pipeline shares cores
// with dispatch, so the hot per-sample work (antialiased bilinear resample,
// horizontal flip, [0,1]/[-1,1] normalization, uint8->float) lives here as a
// single fused C++ pass. Resampling matches PIL's triangle-filter convolution
// (support widens by the scale factor on downscale), computed in float32.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Coeffs {
  // For each output index: input window [lo, hi) and normalized weights.
  std::vector<int> lo, hi;
  std::vector<float> weights;  // flattened, stride = max window size
  int kmax = 0;
};

// PIL-style triangle (bilinear) filter coefficient table.
Coeffs build_coeffs(int in_size, int out_size) {
  Coeffs c;
  double scale = static_cast<double>(in_size) / out_size;
  double support = (scale >= 1.0) ? scale : 1.0;  // widen on downscale
  int kmax = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.kmax = kmax;
  c.lo.resize(out_size);
  c.hi.resize(out_size);
  c.weights.assign(static_cast<size_t>(out_size) * kmax, 0.0f);
  double filterscale = std::max(scale, 1.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int lo = static_cast<int>(std::max(center - support + 0.5, 0.0));
    int hi = static_cast<int>(std::min(center + support + 0.5,
                                       static_cast<double>(in_size)));
    c.lo[xx] = lo;
    c.hi[xx] = hi;
    double sum = 0.0;
    for (int x = lo; x < hi; ++x) {
      double arg = (x - center + 0.5) / filterscale;
      double w = 1.0 - std::abs(arg);  // triangle
      if (w < 0.0) w = 0.0;
      c.weights[static_cast<size_t>(xx) * kmax + (x - lo)] =
          static_cast<float>(w);
      sum += w;
    }
    if (sum > 0.0) {
      for (int k = 0; k < hi - lo; ++k) {
        c.weights[static_cast<size_t>(xx) * kmax + k] /=
            static_cast<float>(sum);
      }
    }
  }
  return c;
}

}  // namespace

extern "C" {

// src: uint8 HWC (h, w, ch); dst: float32 (oh, ow, ch).
// flip: mirror horizontally before resampling.
// to_normal: 1 -> [-1, 1], 0 -> [0, 1].
//
// Vertical pass first: its inner loops run contiguously over w*ch floats and
// auto-vectorize; the horizontal pass then works on the reduced (oh, w)
// intermediate, so the strided-channel loops touch ~h/oh times less data.
void preprocess_image(const uint8_t* src, int h, int w, int ch, float* dst,
                      int oh, int ow, int flip, int to_normal) {
  Coeffs cx = build_coeffs(w, ow);
  Coeffs cy = build_coeffs(h, oh);
  const size_t rowlen = static_cast<size_t>(w) * ch;

  // vertical pass: u8 rows -> accumulated float rows (contiguous SIMD-able)
  std::vector<float> tmp(static_cast<size_t>(oh) * rowlen);
  for (int yy = 0; yy < oh; ++yy) {
    const float* wts = cy.weights.data() + static_cast<size_t>(yy) * cy.kmax;
    int lo = cy.lo[yy], hi = cy.hi[yy];
    float* trow = tmp.data() + static_cast<size_t>(yy) * rowlen;
    std::memset(trow, 0, rowlen * sizeof(float));
    for (int y = lo; y < hi; ++y) {
      const float wv = wts[y - lo];
      const uint8_t* row = src + static_cast<size_t>(y) * rowlen;
      for (size_t j = 0; j < rowlen; ++j) {
        trow[j] += wv * row[j];
      }
    }
  }

  // horizontal pass + flip + normalization
  const float inv255 = 1.0f / 255.0f;
  for (int yy = 0; yy < oh; ++yy) {
    const float* trow = tmp.data() + static_cast<size_t>(yy) * rowlen;
    float* drow = dst + static_cast<size_t>(yy) * ow * ch;
    for (int xx = 0; xx < ow; ++xx) {
      const float* wts = cx.weights.data() + static_cast<size_t>(xx) * cx.kmax;
      int lo = cx.lo[xx], hi = cx.hi[xx];
      for (int c0 = 0; c0 < ch; ++c0) {
        float acc = 0.0f;
        for (int x = lo; x < hi; ++x) {
          int sx = flip ? (w - 1 - x) : x;
          acc += wts[x - lo] * trow[static_cast<size_t>(sx) * ch + c0];
        }
        float v = acc * inv255;
        if (to_normal) {
          v = v * 2.0f - 1.0f;
          v = std::min(1.0f, std::max(-1.0f, v));
        } else {
          v = std::min(1.0f, std::max(0.0f, v));
        }
        drow[static_cast<size_t>(xx) * ch + c0] = v;
      }
    }
  }
}

// Batched variant: n images with identical geometry, contiguous buffers.
void preprocess_batch(const uint8_t* src, int n, int h, int w, int ch,
                      float* dst, int oh, int ow, const int* flips,
                      int to_normal) {
  for (int i = 0; i < n; ++i) {
    preprocess_image(src + static_cast<size_t>(i) * h * w * ch, h, w, ch,
                     dst + static_cast<size_t>(i) * oh * ow * ch, oh, ow,
                     flips ? flips[i] : 0, to_normal);
  }
}

}  // extern "C"
