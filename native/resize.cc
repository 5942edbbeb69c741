// Native host-side bicubic resampling for the image pipeline.
//
// The reference's resize runs inside torchvision's C++ ops
// (image_processing_perception_lm_fast.py:268-290, BICUBIC + antialias);
// our Python fallback (data/resize.py) is an exact numpy reimplementation
// of the same classic algorithm (Keys a=-0.5 separable convolution, PIL
// window convention). This file is the C++ equivalent: identical math in
// float64, multithreaded over rows, called through ctypes (which releases
// the GIL — so the PrefetchLoader's worker threads genuinely overlap
// preprocessing with device steps).
//
// Build: native/build.sh -> libgar_native.so (shared with rle.cc).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <functional>
#include <thread>
#include <vector>

namespace {

constexpr double kA = -0.5;  // Keys cubic coefficient (PIL/torchvision)

inline double cubic(double x) {
  double ax = std::fabs(x);
  double ax2 = ax * ax, ax3 = ax2 * ax;
  if (ax <= 1.0) return (kA + 2.0) * ax3 - (kA + 3.0) * ax2 + 1.0;
  if (ax < 2.0) return kA * ax3 - 5.0 * kA * ax2 + 8.0 * kA * ax - 4.0 * kA;
  return 0.0;
}

struct AxisWeights {
  int ksize = 0;
  std::vector<int64_t> idx;  // (out, ksize) clamped source indices
  std::vector<double> w;     // (out, ksize) normalized weights
};

// Mirrors data/resize.py _axis_weights exactly (PIL convention: window
// start floor(center-support+0.5) clipped to 0, end min(floor(center+
// support+0.5), in), kernel evaluated at clipped positions, normalized).
AxisWeights axis_weights(int64_t in_size, int64_t out_size, bool antialias) {
  double scale = static_cast<double>(in_size) / static_cast<double>(out_size);
  double filterscale = antialias ? std::max(scale, 1.0) : 1.0;
  double support = 2.0 * filterscale;
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 2;

  AxisWeights aw;
  aw.ksize = ksize;
  aw.idx.assign(static_cast<size_t>(out_size) * ksize, 0);
  aw.w.assign(static_cast<size_t>(out_size) * ksize, 0.0);
  for (int64_t o = 0; o < out_size; ++o) {
    double center = (static_cast<double>(o) + 0.5) * scale;
    int64_t xmin = static_cast<int64_t>(std::floor(center - support + 0.5));
    if (xmin < 0) xmin = 0;
    int64_t xmax = std::min(
        static_cast<int64_t>(std::floor(center + support + 0.5)), in_size);
    int64_t size = xmax - xmin;
    double wsum = 0.0;
    for (int k = 0; k < ksize; ++k) {
      int64_t i = xmin + k;
      int64_t ic = std::min(std::max(i, int64_t{0}), in_size - 1);
      double x = (static_cast<double>(i) + 0.5 - center) / filterscale;
      double wv = (k < size) ? cubic(x) : 0.0;
      aw.idx[o * ksize + k] = ic;
      aw.w[o * ksize + k] = wv;
      wsum += wv;
    }
    if (wsum == 0.0) wsum = 1.0;
    for (int k = 0; k < ksize; ++k) aw.w[o * ksize + k] /= wsum;
  }
  return aw;
}

void parallel_rows(int64_t rows, int n_threads,
                   const std::function<void(int64_t, int64_t)>& fn) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
    n_threads = std::min(n_threads, 8);
  }
  n_threads = static_cast<int>(
      std::min<int64_t>(n_threads, std::max<int64_t>(rows, 1)));
  if (n_threads == 1) {
    fn(0, rows);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(rows, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(fn, lo, hi);
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// in: (h, w, c) float64 C-contiguous; out: (oh, ow, c) float64.
// Separable: horizontal pass into a temp (h, ow, c), then vertical.
void gar_resize_bicubic(const double* in, int64_t h, int64_t w, int64_t c,
                        double* out, int64_t oh, int64_t ow, int antialias,
                        int n_threads) {
  AxisWeights hw = axis_weights(w, ow, antialias != 0);
  AxisWeights vw = axis_weights(h, oh, antialias != 0);
  std::vector<double> tmp(static_cast<size_t>(h) * ow * c);

  parallel_rows(h, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t y = lo; y < hi; ++y) {
      const double* row = in + y * w * c;
      double* trow = tmp.data() + y * ow * c;
      for (int64_t o = 0; o < ow; ++o) {
        const int64_t* idx = hw.idx.data() + o * hw.ksize;
        const double* wt = hw.w.data() + o * hw.ksize;
        for (int64_t ch = 0; ch < c; ++ch) {
          double acc = 0.0;
          for (int k = 0; k < hw.ksize; ++k) acc += row[idx[k] * c + ch] * wt[k];
          trow[o * c + ch] = acc;
        }
      }
    }
  });

  parallel_rows(oh, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t o = lo; o < hi; ++o) {
      const int64_t* idx = vw.idx.data() + o * vw.ksize;
      const double* wt = vw.w.data() + o * vw.ksize;
      double* orow = out + o * ow * c;
      for (int64_t x = 0; x < ow * c; ++x) {
        double acc = 0.0;
        for (int k = 0; k < vw.ksize; ++k) acc += tmp[idx[k] * ow * c + x] * wt[k];
        orow[x] = acc;
      }
    }
  });
}

}  // extern "C"
