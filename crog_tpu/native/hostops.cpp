// crog_tpu native host ops.
//
// The reference leaned on OpenCV/skimage C++ kernels for its input pipeline
// (cv2.warpAffine letterboxing utils/dataset.py:858-890, skimage polygon
// rasterization :652-676, gaussian blur :673-676).  These are the host-side
// hot path between PNG decode and device transfer; this library provides
// them natively so the feed can keep a TPU busy from a small host.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
// Numerics match crog_tpu.ops exactly: cubic kernel A = -0.75, constant
// border, even-odd polygon rule, gaussian with truncate=4.0 and edge
// ('nearest') padding.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kCubicA = -0.75;

inline double cubic_k(double x) {
  x = std::fabs(x);
  if (x <= 1.0) return ((kCubicA + 2.0) * x - (kCubicA + 3.0)) * x * x + 1.0;
  if (x < 2.0)
    return ((kCubicA * x - 5.0 * kCubicA) * x + 8.0 * kCubicA) * x -
           4.0 * kCubicA;
  return 0.0;
}

struct Affine {
  double a, b, c, d, e, f;  // [a b c; d e f]
};

inline Affine invert(const Affine& m) {
  double det = m.a * m.e - m.b * m.d;
  double ia = m.e / det, ib = -m.b / det;
  double id = -m.d / det, ie = m.a / det;
  return {ia, ib, -(ia * m.c + ib * m.f), id, ie, -(id * m.c + ie * m.f)};
}

template <typename T>
inline double tap(const T* img, int h, int w, int c, int x, int y, int ch,
                  double border) {
  if (x < 0 || x >= w || y < 0 || y >= h) return border;
  return static_cast<double>(img[(static_cast<int64_t>(y) * w + x) * c + ch]);
}

template <typename T>
void warp_affine_impl(const T* src, int sh, int sw, int c, const double* mat,
                      int oh, int ow, int interp /*0 nearest,1 linear,2 cubic*/,
                      const double* border, T* dst) {
  Affine fwd{mat[0], mat[1], mat[2], mat[3], mat[4], mat[5]};
  Affine inv = invert(fwd);
  for (int y = 0; y < oh; ++y) {
    for (int x = 0; x < ow; ++x) {
      double sx = inv.a * x + inv.b * y + inv.c;
      double sy = inv.d * x + inv.e * y + inv.f;
      for (int ch = 0; ch < c; ++ch) {
        double v = 0.0;
        if (interp == 0) {
          int ix = static_cast<int>(std::lround(sx));
          int iy = static_cast<int>(std::lround(sy));
          v = tap(src, sh, sw, c, ix, iy, ch, border[ch]);
        } else if (interp == 1) {
          int x0 = static_cast<int>(std::floor(sx));
          int y0 = static_cast<int>(std::floor(sy));
          double fx = sx - x0, fy = sy - y0;
          v = (1 - fy) * ((1 - fx) * tap(src, sh, sw, c, x0, y0, ch, border[ch]) +
                          fx * tap(src, sh, sw, c, x0 + 1, y0, ch, border[ch])) +
              fy * ((1 - fx) * tap(src, sh, sw, c, x0, y0 + 1, ch, border[ch]) +
                    fx * tap(src, sh, sw, c, x0 + 1, y0 + 1, ch, border[ch]));
        } else {
          int x0 = static_cast<int>(std::floor(sx));
          int y0 = static_cast<int>(std::floor(sy));
          double fx = sx - x0, fy = sy - y0;
          double wx[4], wy[4];
          wx[0] = cubic_k(1.0 + fx); wx[1] = cubic_k(fx);
          wx[2] = cubic_k(1.0 - fx); wx[3] = cubic_k(2.0 - fx);
          wy[0] = cubic_k(1.0 + fy); wy[1] = cubic_k(fy);
          wy[2] = cubic_k(1.0 - fy); wy[3] = cubic_k(2.0 - fy);
          for (int j = 0; j < 4; ++j)
            for (int i = 0; i < 4; ++i)
              v += wy[j] * wx[i] *
                   tap(src, sh, sw, c, x0 + i - 1, y0 + j - 1, ch, border[ch]);
        }
        int64_t o = (static_cast<int64_t>(y) * ow + x) * c + ch;
        if (sizeof(T) == 1) {  // uint8: round+clip like the numpy path
          dst[o] = static_cast<T>(std::min(255.0, std::max(0.0, std::round(v))));
        } else {
          dst[o] = static_cast<T>(v);
        }
      }
    }
  }
}

// Separable resample along one axis: for each output index, 4 (cubic) or 2
// (linear) source taps + weights; out-of-range taps take the border value.
struct AxisTaps {
  std::vector<int> idx;     // ntaps per output, -1 = border
  std::vector<double> wgt;
  int ntaps;
};

AxisTaps make_axis_taps(int in_size, int out_size, double scale, double offset,
                        int interp) {
  AxisTaps t;
  t.ntaps = interp == 2 ? 4 : (interp == 1 ? 2 : 1);
  t.idx.resize(static_cast<size_t>(out_size) * t.ntaps);
  t.wgt.resize(static_cast<size_t>(out_size) * t.ntaps);
  for (int o = 0; o < out_size; ++o) {
    double src = scale * o + offset;
    if (interp == 0) {
      int i = static_cast<int>(std::lround(src));
      t.idx[o] = (i >= 0 && i < in_size) ? i : -1;
      t.wgt[o] = 1.0;
    } else if (interp == 1) {
      int x0 = static_cast<int>(std::floor(src));
      double f = src - x0;
      int base = o * 2;
      t.idx[base] = (x0 >= 0 && x0 < in_size) ? x0 : -1;
      t.wgt[base] = 1.0 - f;
      t.idx[base + 1] = (x0 + 1 >= 0 && x0 + 1 < in_size) ? x0 + 1 : -1;
      t.wgt[base + 1] = f;
    } else {
      int x0 = static_cast<int>(std::floor(src));
      double f = src - x0;
      double w[4] = {cubic_k(1.0 + f), cubic_k(f), cubic_k(1.0 - f),
                     cubic_k(2.0 - f)};
      for (int k = 0; k < 4; ++k) {
        int xi = x0 + k - 1;
        t.idx[o * 4 + k] = (xi >= 0 && xi < in_size) ? xi : -1;
        t.wgt[o * 4 + k] = w[k];
      }
    }
  }
  return t;
}

// Axis-aligned (no shear/rotation) warp = two 1-D resamples.  Exactly equals
// the dense 2-D warp for such matrices, at ~(2*ntaps)/(ntaps^2) the work.
template <typename T>
void warp_axis_aligned_impl(const T* src, int sh, int sw, int c,
                            const double* mat, int oh, int ow, int interp,
                            const double* border, T* dst) {
  Affine fwd{mat[0], mat[1], mat[2], mat[3], mat[4], mat[5]};
  Affine inv = invert(fwd);
  AxisTaps tx = make_axis_taps(sw, ow, inv.a, inv.c, interp);
  AxisTaps ty = make_axis_taps(sh, oh, inv.e, inv.f, interp);
  // pass 1: horizontal, src rows -> (sh, ow, c) float
  std::vector<double> tmp(static_cast<size_t>(sh) * ow * c);
  for (int y = 0; y < sh; ++y) {
    const T* row = src + static_cast<int64_t>(y) * sw * c;
    double* trow = tmp.data() + static_cast<int64_t>(y) * ow * c;
    for (int x = 0; x < ow; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (int k = 0; k < tx.ntaps; ++k) {
          int xi = tx.idx[x * tx.ntaps + k];
          double v = xi < 0 ? border[ch]
                            : static_cast<double>(row[xi * c + ch]);
          acc += tx.wgt[x * tx.ntaps + k] * v;
        }
        trow[x * c + ch] = acc;
      }
    }
  }
  // pass 2: vertical
  for (int y = 0; y < oh; ++y) {
    T* orow = dst + static_cast<int64_t>(y) * ow * c;
    for (int x = 0; x < ow; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (int k = 0; k < ty.ntaps; ++k) {
          int yi = ty.idx[y * ty.ntaps + k];
          double v = yi < 0
                         ? border[ch]
                         : tmp[(static_cast<int64_t>(yi) * ow + x) * c + ch];
          acc += ty.wgt[y * ty.ntaps + k] * v;
        }
        if (sizeof(T) == 1) {
          orow[x * c + ch] =
              static_cast<T>(std::min(255.0, std::max(0.0, std::round(acc))));
        } else {
          orow[x * c + ch] = static_cast<T>(acc);
        }
      }
    }
  }
}

}  // namespace

extern "C" {

void warp_axis_aligned_u8(const uint8_t* src, int sh, int sw, int c,
                          const double* mat, int oh, int ow, int interp,
                          const double* border, uint8_t* dst) {
  warp_axis_aligned_impl<uint8_t>(src, sh, sw, c, mat, oh, ow, interp, border,
                                  dst);
}

void warp_axis_aligned_f32(const float* src, int sh, int sw, int c,
                           const double* mat, int oh, int ow, int interp,
                           const double* border, float* dst) {
  warp_axis_aligned_impl<float>(src, sh, sw, c, mat, oh, ow, interp, border,
                                dst);
}

void warp_affine_u8(const uint8_t* src, int sh, int sw, int c,
                    const double* mat, int oh, int ow, int interp,
                    const double* border, uint8_t* dst) {
  warp_affine_impl<uint8_t>(src, sh, sw, c, mat, oh, ow, interp, border, dst);
}

void warp_affine_f32(const float* src, int sh, int sw, int c,
                     const double* mat, int oh, int ow, int interp,
                     const double* border, float* dst) {
  warp_affine_impl<float>(src, sh, sw, c, mat, oh, ow, interp, border, dst);
}

// Even-odd polygon fill over the vertex bounding box, writing `value` into a
// float64 canvas (matches crog_tpu.ops.rects.polygon_indices semantics:
// r = first axis of the vertex arrays; canvas indexed [cc, rr] by callers).
void polygon_fill(const double* vr, const double* vc, int n, double* canvas,
                  int canvas_h, int canvas_w, int clip_r, int clip_c,
                  double value) {
  double rmin = vr[0], rmax = vr[0], cmin = vc[0], cmax = vc[0];
  for (int i = 1; i < n; ++i) {
    rmin = std::min(rmin, vr[i]); rmax = std::max(rmax, vr[i]);
    cmin = std::min(cmin, vc[i]); cmax = std::max(cmax, vc[i]);
  }
  int r0 = std::max(0, static_cast<int>(rmin));
  int r1 = static_cast<int>(std::ceil(rmax));
  int c0 = std::max(0, static_cast<int>(cmin));
  int c1 = static_cast<int>(std::ceil(cmax));
  if (clip_r > 0) r1 = std::min(clip_r - 1, r1);
  if (clip_c > 0) c1 = std::min(clip_c - 1, c1);
  for (int r = r0; r <= r1; ++r) {
    for (int c = c0; c <= c1; ++c) {
      bool inside = false;
      int j = n - 1;
      for (int i = 0; i < n; ++i) {
        if (((vr[i] > r) != (vr[j] > r)) &&
            (c < (vc[j] - vc[i]) * (r - vr[i]) / (vr[j] - vr[i]) + vc[i])) {
          inside = !inside;
        }
        j = i;
      }
      // reference indexing: pos_out[cc, rr] -> canvas[c_index=c? no:
      // callers pass (x, y) as (vr, vc); the canvas write is [cc, rr]
      if (inside && c >= 0 && c < canvas_h && r >= 0 && r < canvas_w) {
        canvas[static_cast<int64_t>(c) * canvas_w + r] = value;
      }
    }
  }
}

// Separable gaussian blur, float64, edge padding, truncate=4.0.
void gaussian_blur_f64(const double* src, int h, int w, double sigma,
                       double* dst) {
  int radius = static_cast<int>(4.0 * sigma + 0.5);
  std::vector<double> k(2 * radius + 1);
  double s = 0.0;
  for (int i = -radius; i <= radius; ++i) {
    k[i + radius] = std::exp(-0.5 * (i / sigma) * (i / sigma));
    s += k[i + radius];
  }
  for (auto& v : k) v /= s;
  std::vector<double> tmp(static_cast<size_t>(h) * w);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      double acc = 0.0;
      for (int i = -radius; i <= radius; ++i) {
        int yy = std::min(h - 1, std::max(0, y + i));
        acc += k[i + radius] * src[static_cast<int64_t>(yy) * w + x];
      }
      tmp[static_cast<int64_t>(y) * w + x] = acc;
    }
  }
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      double acc = 0.0;
      for (int i = -radius; i <= radius; ++i) {
        int xx = std::min(w - 1, std::max(0, x + i));
        acc += k[i + radius] * tmp[static_cast<int64_t>(y) * w + xx];
      }
      dst[static_cast<int64_t>(y) * w + x] = acc;
    }
  }
}

}  // extern "C"
