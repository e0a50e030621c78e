// Native data-loader core: multi-scale morphological depth completion.
//
// C++ rebuild of the reference's hot CPU preprocessing op
// (reference utils/data_utils.py:199-510, the ip_basic pipeline), matching
// the OpenCV call sequence semantically (dilate w/ cross kernels, 5x5 close,
// 5x5 median, 9x9 hole fill, 6x masked 5x5 dilation, 5x5 median, 5x5
// bilateral) but fused: one preallocated scratch set, no per-stage Mat
// allocations, no Python/cv2 dispatch per stage. Exposed via a plain C ABI
// consumed through ctypes (istnet_tpu/native/__init__.py).
//
// Border conventions follow OpenCV: dilation ignores out-of-bounds (constant
// -inf border), median uses BORDER_REPLICATE, bilateral uses reflect-101.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr float kValid = 0.01f;

struct Buf {
  int h, w;
  std::vector<float> data;
  Buf(int h_, int w_) : h(h_), w(w_), data(static_cast<size_t>(h_) * w_) {}
  float* ptr() { return data.data(); }
};

inline float at(const float* img, int h, int w, int y, int x) {
  return img[static_cast<size_t>(y) * w + x];
}

// dilate `src` into `dst` with a kernel given as offset list
void dilate(const float* src, float* dst, int h, int w,
            const int (*offs)[2], int n_offs) {
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float m = -1e30f;
      for (int k = 0; k < n_offs; ++k) {
        int yy = y + offs[k][0];
        int xx = x + offs[k][1];
        if (yy < 0 || yy >= h || xx < 0 || xx >= w) continue;
        m = std::max(m, at(src, h, w, yy, xx));
      }
      dst[static_cast<size_t>(y) * w + x] = m;
    }
  }
}

void erode(const float* src, float* dst, int h, int w,
           const int (*offs)[2], int n_offs) {
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float m = 1e30f;
      for (int k = 0; k < n_offs; ++k) {
        int yy = y + offs[k][0];
        int xx = x + offs[k][1];
        if (yy < 0 || yy >= h || xx < 0 || xx >= w) continue;
        m = std::min(m, at(src, h, w, yy, xx));
      }
      dst[static_cast<size_t>(y) * w + x] = m;
    }
  }
}

// 5x5 median with replicated borders
void median5(const float* src, float* dst, int h, int w) {
  float window[25];
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      int n = 0;
      for (int dy = -2; dy <= 2; ++dy) {
        int yy = std::min(std::max(y + dy, 0), h - 1);
        for (int dx = -2; dx <= 2; ++dx) {
          int xx = std::min(std::max(x + dx, 0), w - 1);
          window[n++] = at(src, h, w, yy, xx);
        }
      }
      std::nth_element(window, window + 12, window + 25);
      dst[static_cast<size_t>(y) * w + x] = window[12];
    }
  }
}

// 5x5 bilateral filter, sigma_color=0.5, sigma_space=2.0, reflect-101 border
void bilateral5(const float* src, float* dst, int h, int w,
                float sigma_color, float sigma_space) {
  const int radius = 2;
  float space_w[25];
  int offs[25][2];
  int n_offs = 0;
  const float gs = -0.5f / (sigma_space * sigma_space);
  for (int dy = -radius; dy <= radius; ++dy) {
    for (int dx = -radius; dx <= radius; ++dx) {
      double r = std::sqrt(static_cast<double>(dy * dy + dx * dx));
      if (r > radius) continue;  // OpenCV uses the disk, not the square
      space_w[n_offs] = std::exp(gs * static_cast<float>(dy * dy + dx * dx));
      offs[n_offs][0] = dy;
      offs[n_offs][1] = dx;
      ++n_offs;
    }
  }
  const float gc = -0.5f / (sigma_color * sigma_color);
  auto reflect = [](int p, int len) {
    if (p < 0) p = -p;
    if (p >= len) p = 2 * len - 2 - p;
    return p;
  };
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float center = at(src, h, w, y, x);
      float wsum = 0.f, vsum = 0.f;
      for (int k = 0; k < n_offs; ++k) {
        int yy = reflect(y + offs[k][0], h);
        int xx = reflect(x + offs[k][1], w);
        float v = at(src, h, w, yy, xx);
        float d = std::fabs(v - center);
        float wgt = space_w[k] * std::exp(gc * d * d);
        wsum += wgt;
        vsum += wgt * v;
      }
      dst[static_cast<size_t>(y) * w + x] = vsum / wsum;
    }
  }
}

template <int R>
void make_cross(int (*offs)[2], int* n) {
  *n = 0;
  for (int d = -R; d <= R; ++d) {
    offs[(*n)][0] = d; offs[(*n)][1] = 0; ++(*n);
    if (d != 0) { offs[(*n)][0] = 0; offs[(*n)][1] = d; ++(*n); }
  }
}

template <int R>
void make_full(int (*offs)[2], int* n) {
  *n = 0;
  for (int dy = -R; dy <= R; ++dy)
    for (int dx = -R; dx <= R; ++dx) {
      offs[(*n)][0] = dy; offs[(*n)][1] = dx; ++(*n);
    }
}

}  // namespace

extern "C" {

// In-place multi-scale depth completion of an (h, w) float32 buffer whose
// units are ALREADY divided by cam_scale (meters); max_depth = 3.0 matches
// fill_missing (data_utils.py:514-534).
void fill_in_multiscale(float* depth, int h, int w, float max_depth) {
  const size_t sz = static_cast<size_t>(h) * w;
  Buf tmp_a(h, w), tmp_b(h, w), band(h, w);
  float* out = depth;

  // distance-band masks computed on the raw input
  std::vector<unsigned char> near_m(sz), med_m(sz), far_m(sz);
  for (size_t i = 0; i < sz; ++i) {
    float v = depth[i];
    near_m[i] = (v > kValid && v <= 1.0f);
    med_m[i] = (v > 1.0f && v <= 2.0f);
    far_m[i] = (v > 2.0f);
  }

  // invert
  for (size_t i = 0; i < sz; ++i)
    if (out[i] > kValid) out[i] = max_depth - out[i];

  // per-band dilations with cross kernels 3/5/7; ALL bands read the original
  // inverted depths (data_utils.py:399-420), results combined far-to-near
  std::vector<float> inv0(out, out + sz);
  int offs[81][2];  // largest kernel is the 9x9 hole fill
  int n_offs;
  struct Band { const std::vector<unsigned char>* m; int r; };
  const Band bands[3] = {{&far_m, 1}, {&med_m, 2}, {&near_m, 3}};
  for (const Band& bd : bands) {
    for (size_t i = 0; i < sz; ++i)
      band.ptr()[i] = (*bd.m)[i] ? inv0[i] : 0.f;
    if (bd.r == 1) make_cross<1>(offs, &n_offs);
    else if (bd.r == 2) make_cross<2>(offs, &n_offs);
    else make_cross<3>(offs, &n_offs);
    dilate(band.ptr(), tmp_a.ptr(), h, w, offs, n_offs);
    for (size_t i = 0; i < sz; ++i)
      if (tmp_a.ptr()[i] > kValid) out[i] = tmp_a.ptr()[i];
  }

  // 5x5 closing (dilate then erode)
  make_full<2>(offs, &n_offs);
  dilate(out, tmp_a.ptr(), h, w, offs, n_offs);
  erode(tmp_a.ptr(), tmp_b.ptr(), h, w, offs, n_offs);
  std::memcpy(out, tmp_b.ptr(), sz * sizeof(float));

  // median blur on valid pixels
  median5(out, tmp_a.ptr(), h, w);
  for (size_t i = 0; i < sz; ++i)
    if (out[i] > kValid) out[i] = tmp_a.ptr()[i];

  // top mask + 9x9 hole fill
  std::vector<int> top_row(w, 0);
  auto compute_top = [&](std::vector<int>& tr) {
    for (int x = 0; x < w; ++x) {
      tr[x] = 0;
      for (int y = 0; y < h; ++y) {
        if (at(out, h, w, y, x) > kValid) { tr[x] = y; break; }
        if (y == h - 1) tr[x] = 0;  // empty column: mask stays all-true
      }
    }
  };
  compute_top(top_row);
  make_full<4>(offs, &n_offs);
  dilate(out, tmp_a.ptr(), h, w, offs, n_offs);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      size_t i = static_cast<size_t>(y) * w + x;
      if (!(out[i] > kValid) && y >= top_row[x]) out[i] = tmp_a.ptr()[i];
    }

  // recompute top mask, 6x masked 5x5 dilation
  compute_top(top_row);
  make_full<2>(offs, &n_offs);
  for (int it = 0; it < 6; ++it) {
    dilate(out, tmp_a.ptr(), h, w, offs, n_offs);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        size_t i = static_cast<size_t>(y) * w + x;
        if (out[i] < kValid && y >= top_row[x]) out[i] = tmp_a.ptr()[i];
      }
  }

  // median on valid & top-masked pixels
  median5(out, tmp_a.ptr(), h, w);
  std::vector<unsigned char> valid(sz);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      size_t i = static_cast<size_t>(y) * w + x;
      valid[i] = (out[i] > kValid && y >= top_row[x]);
      if (valid[i]) out[i] = tmp_a.ptr()[i];
    }

  // bilateral on the SAME valid set (the reference reuses the median-step
  // mask for the bilateral write, data_utils.py:315-322)
  bilateral5(out, tmp_a.ptr(), h, w, 0.5f, 2.0f);
  for (size_t i = 0; i < sz; ++i)
    if (valid[i]) out[i] = tmp_a.ptr()[i];

  // invert back
  for (size_t i = 0; i < sz; ++i)
    if (out[i] > kValid) out[i] = max_depth - out[i];
}

}  // extern "C"
