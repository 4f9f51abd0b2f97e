// SPEGNet-TPU native data plane.
//
// Host-side hot loops of the input pipeline, in C++ (the reference delegates
// these to OpenCV/scipy/torch C++ kernels; here they are first-party):
//   * antialiased bilinear resize + ImageNet normalization (fused), with the
//     exact triangle-filter weights of torch's antialias=True path
//     (reference: utils/image_processor.py:123-129);
//   * exact Euclidean distance transform with nearest-foreground indices
//     (Felzenszwalb & Huttenlocher two-pass), feeding the weighted
//     F-measure (replaces scipy.ndimage.distance_transform_edt);
//   * binary morphological edge extraction (dilate - erode + close), the
//     CAMO GT edge generator's kernel (reference: camo_edge_processor.py).
//
// Build: make -C native   ->  libspegnet_native.so  (ctypes binding in
// spegnet_tpu/native/__init__.py; every entry point has a NumPy fallback).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Antialiased bilinear resize (separable triangle filter, torch semantics).
// ---------------------------------------------------------------------------

namespace {

struct Taps {
  std::vector<int> xmin;    // first source index per output pixel
  std::vector<int> count;   // taps per output pixel
  std::vector<float> w;     // weights, stride = max_taps
  int max_taps = 0;
};

// Mirrors spegnet_tpu.ops.resize.resize_matrix_np (verified against torch).
Taps make_taps(int in_size, int out_size, bool antialias) {
  Taps t;
  t.xmin.resize(out_size);
  t.count.resize(out_size);
  double scale = static_cast<double>(in_size) / out_size;
  if (antialias && scale > 1.0) {
    double support = scale;
    t.max_taps = static_cast<int>(std::ceil(2 * support)) + 1;
    t.w.assign(static_cast<size_t>(out_size) * t.max_taps, 0.f);
    for (int i = 0; i < out_size; ++i) {
      double center = (i + 0.5) * scale;
      int xmin = std::max(static_cast<int>(center - support + 0.5), 0);
      int xmax = std::min(static_cast<int>(center + support + 0.5), in_size);
      double total = 0.0;
      for (int j = xmin; j < xmax; ++j) {
        double wj = std::max(0.0, 1.0 - std::abs((j + 0.5) - center) / scale);
        t.w[static_cast<size_t>(i) * t.max_taps + (j - xmin)] =
            static_cast<float>(wj);
        total += wj;
      }
      for (int j = 0; j < xmax - xmin; ++j)
        t.w[static_cast<size_t>(i) * t.max_taps + j] /=
            static_cast<float>(std::max(total, 1e-12));
      t.xmin[i] = xmin;
      t.count[i] = xmax - xmin;
    }
  } else {
    t.max_taps = 2;
    t.w.assign(static_cast<size_t>(out_size) * 2, 0.f);
    for (int i = 0; i < out_size; ++i) {
      double src = std::min(std::max((i + 0.5) * scale - 0.5, 0.0),
                            static_cast<double>(in_size - 1));
      int i0 = static_cast<int>(std::floor(src));
      int i1 = std::min(i0 + 1, in_size - 1);
      float frac = static_cast<float>(src - i0);
      t.xmin[i] = i0;
      if (i1 == i0) {
        t.count[i] = 1;
        t.w[static_cast<size_t>(i) * 2] = 1.f;
      } else {
        t.count[i] = 2;
        t.w[static_cast<size_t>(i) * 2] = 1.f - frac;
        t.w[static_cast<size_t>(i) * 2 + 1] = frac;
      }
    }
  }
  return t;
}

}  // namespace

// in:  uint8 HWC (c channels), out: float32 out_h x out_w x c, fused
// u8 -> /255 -> antialiased resize -> (x - mean) / std per channel.
int preprocess_image(const uint8_t* in, int h, int w, int c, float* out,
                     int out_h, int out_w, const float* mean,
                     const float* stddev) {
  if (h <= 0 || w <= 0 || c <= 0 || out_h <= 0 || out_w <= 0) return -1;
  Taps th = make_taps(h, out_h, h > out_h);
  Taps tw = make_taps(w, out_w, w > out_w);

  // Pass 1: horizontal resize into tmp [h, out_w, c] (float).
  std::vector<float> tmp(static_cast<size_t>(h) * out_w * c);
  constexpr float kInv255 = 1.0f / 255.0f;
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = in + static_cast<size_t>(y) * w * c;
    float* trow = tmp.data() + static_cast<size_t>(y) * out_w * c;
    for (int x = 0; x < out_w; ++x) {
      const float* wt = tw.w.data() + static_cast<size_t>(x) * tw.max_taps;
      int x0 = tw.xmin[x], n = tw.count[x];
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.f;
        for (int k = 0; k < n; ++k)
          acc += wt[k] * row[(x0 + k) * c + ch];
        trow[x * c + ch] = acc * kInv255;
      }
    }
  }
  // Pass 2: vertical resize + normalization.
  for (int y = 0; y < out_h; ++y) {
    const float* wt = th.w.data() + static_cast<size_t>(y) * th.max_taps;
    int y0 = th.xmin[y], n = th.count[y];
    float* orow = out + static_cast<size_t>(y) * out_w * c;
    for (int x = 0; x < out_w; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.f;
        for (int k = 0; k < n; ++k)
          acc += wt[k] * tmp[(static_cast<size_t>(y0 + k) * out_w + x) * c + ch];
        orow[x * c + ch] = (acc - mean[ch]) / stddev[ch];
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Exact EDT with nearest-foreground indices (Felzenszwalb-Huttenlocher).
// ---------------------------------------------------------------------------

// fg: uint8 h*w (nonzero = foreground).  Outputs: dist (float32 h*w,
// distance to nearest fg pixel, 0 on fg) and idx (int32 h*w, flat h*w index
// of the nearest fg pixel; identity where no fg exists).
int edt_with_indices(const uint8_t* fg, int h, int w, float* dist,
                     int32_t* idx) {
  const float INF = std::numeric_limits<float>::infinity();
  // Column pass: vertical squared distance g and source row.
  std::vector<float> g(static_cast<size_t>(h) * w, INF);
  std::vector<int32_t> src_row(static_cast<size_t>(h) * w, -1);
  for (int x = 0; x < w; ++x) {
    int last = -1;
    for (int y = 0; y < h; ++y) {
      if (fg[static_cast<size_t>(y) * w + x]) last = y;
      if (last >= 0) {
        float d = static_cast<float>(y - last);
        g[static_cast<size_t>(y) * w + x] = d * d;
        src_row[static_cast<size_t>(y) * w + x] = last;
      }
    }
    last = -1;
    for (int y = h - 1; y >= 0; --y) {
      if (fg[static_cast<size_t>(y) * w + x]) last = y;
      if (last >= 0) {
        float d = static_cast<float>(last - y);
        if (d * d < g[static_cast<size_t>(y) * w + x]) {
          g[static_cast<size_t>(y) * w + x] = d * d;
          src_row[static_cast<size_t>(y) * w + x] = last;
        }
      }
    }
  }
  // Row pass: 1-D squared EDT via the lower envelope of parabolas.
  std::vector<int> v(w);
  std::vector<float> z(w + 1);
  for (int y = 0; y < h; ++y) {
    const float* f = g.data() + static_cast<size_t>(y) * w;
    int k = 0;
    v[0] = 0;
    z[0] = -INF;
    z[1] = INF;
    for (int q = 1; q < w; ++q) {
      if (f[q] == INF) continue;
      float s;
      while (true) {
        int p = v[k];
        if (f[p] == INF) {
          // previous vertex has no fg in its column: drop it
          if (k == 0) { v[0] = q; z[0] = -INF; z[1] = INF; s = -INF; break; }
          --k;
          continue;
        }
        s = ((f[q] + q * q) - (f[p] + p * p)) / (2.f * (q - p));
        if (s <= z[k]) {
          if (k == 0) { v[0] = q; z[1] = INF; break; }
          --k;
        } else {
          ++k;
          v[k] = q;
          z[k] = s;
          z[k + 1] = INF;
          break;
        }
      }
    }
    k = 0;
    for (int q = 0; q < w; ++q) {
      size_t o = static_cast<size_t>(y) * w + q;
      while (z[k + 1] < q) ++k;
      int p = v[k];
      if (f[p] == INF) {  // row has no reachable fg at all
        dist[o] = INF;
        idx[o] = static_cast<int32_t>(o);
        continue;
      }
      float dq = static_cast<float>(q - p);
      float d2 = dq * dq + f[p];
      dist[o] = std::sqrt(d2);
      idx[o] = src_row[static_cast<size_t>(y) * w + p] * w + p;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Binary morphology: dilate/erode (3x3 ones, `iters` times) + edge map.
// ---------------------------------------------------------------------------

namespace {

void dilate3(const uint8_t* in, uint8_t* out, int h, int w) {
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      uint8_t m = 0;
      for (int dy = -1; dy <= 1; ++dy) {
        int yy = y + dy;
        if (yy < 0 || yy >= h) continue;
        for (int dx = -1; dx <= 1; ++dx) {
          int xx = x + dx;
          if (xx < 0 || xx >= w) continue;
          m = std::max(m, in[static_cast<size_t>(yy) * w + xx]);
        }
      }
      out[static_cast<size_t>(y) * w + x] = m;
    }
  }
}

void erode3(const uint8_t* in, uint8_t* out, int h, int w) {
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      uint8_t m = 255;
      for (int dy = -1; dy <= 1; ++dy) {
        int yy = y + dy;
        for (int dx = -1; dx <= 1; ++dx) {
          int xx = x + dx;
          // cv2 BORDER_CONSTANT for erode uses the max value at the border
          // (so borders don't erode masks not touching them); replicate.
          uint8_t val = (yy < 0 || yy >= h || xx < 0 || xx >= w)
                            ? 255
                            : in[static_cast<size_t>(yy) * w + xx];
          m = std::min(m, val);
        }
      }
      out[static_cast<size_t>(y) * w + x] = m;
    }
  }
}

}  // namespace

// mask: uint8 h*w in {0, 255}; out: uint8 edge map in {0, 255}.
// dilate^k - erode^k, then MORPH_CLOSE (dilate then erode once).
int morphological_edges(const uint8_t* mask, int h, int w, int edge_width,
                        uint8_t* out) {
  size_t n = static_cast<size_t>(h) * w;
  std::vector<uint8_t> a(mask, mask + n), b(n), d(n), e(n);
  // dilate edge_width times
  std::memcpy(d.data(), mask, n);
  for (int i = 0; i < edge_width; ++i) {
    dilate3(d.data(), b.data(), h, w);
    d.swap(b);
  }
  // erode edge_width times
  std::memcpy(e.data(), mask, n);
  for (int i = 0; i < edge_width; ++i) {
    erode3(e.data(), b.data(), h, w);
    e.swap(b);
  }
  for (size_t i = 0; i < n; ++i)
    a[i] = static_cast<uint8_t>(d[i] > e[i] ? d[i] - e[i] : 0);
  // MORPH_CLOSE = dilate then erode
  dilate3(a.data(), b.data(), h, w);
  erode3(b.data(), out, h, w);
  return 0;
}

// mask -> binary threshold >127.5 as float32 (the GT loader's hot loop).
int threshold_mask(const uint8_t* in, int h, int w, float* out) {
  size_t n = static_cast<size_t>(h) * w;
  for (size_t i = 0; i < n; ++i) out[i] = in[i] > 127 ? 1.0f : 0.0f;
  return 0;
}

}  // extern "C"
