// Native acceleration-structure builder.
//
// TPU-native counterpart of the reference's C++ BVH builder
// (yocto_bvh.cpp `make_bvh`, SURVEY.md §2.4/§3.3): builds the
// Morton-ordered cluster/LBVH layout consumed by yhair_tpu.ops.clusters
// and accel.lbvh. Large wig assets (hundreds of thousands of segments)
// build here in milliseconds; the vectorized numpy path remains as a
// pure-Python fallback with identical output (tested in
// tests/test_native.py).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC). Loaded via ctypes
// (yhair_tpu/accel/native.py) — no pybind11 dependency.
//
// C ABI:
//   yh_build_clusters(p0, p1, r0, r1, n_seg, cluster_size,
//                     out_s0, out_s1, out_cmin, out_cmax, out_seg_index,
//                     n_clusters)  -> 0 on success   (Morton order)
//   yh_build_clusters_median(...)  -> same signature; longest-axis
//                     median-split order (bit-identical to
//                     accel/lbvh.py:_median_split_order — double-precision
//                     centroids + stable sort, like the numpy build)
// All float buffers are float32; caller allocates outputs with
// n_clusters = next_pow2(ceil(n/cluster_size)) clusters (query via
// yh_n_clusters first).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

inline uint64_t expand_bits(uint64_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

// double-precision quantization to bit-match accel/lbvh.py:morton3
// (numpy computes unit coordinates and the *1024 scale in float64)
inline uint64_t morton3(double x, double y, double z) {
  auto q = [](double a) -> uint64_t {
    double s = a * 1024.0;
    if (s < 0.0) s = 0.0;
    if (s > 1023.0) s = 1023.0;
    return (uint64_t)s;
  };
  return (expand_bits(q(x)) << 2) | (expand_bits(q(y)) << 1) |
         expand_bits(q(z));
}

inline int64_t next_pow2(int64_t v) {
  int64_t p = 1;
  while (p < v) p <<= 1;
  return p;
}

// segment bboxes in f32 (f32 +/- of f32 inputs rounds the exact result,
// identical to numpy's f64-compute-then-cast) and centroids in DOUBLE
// (the median sort keys must compare exactly like the numpy builder's
// float64 centroids)
void segment_bounds(const float* p0, const float* p1, const float* r0,
                    const float* r1, int64_t n, std::vector<float>& bmin,
                    std::vector<float>& bmax, std::vector<double>& cent) {
  bmin.resize(n * 3);
  bmax.resize(n * 3);
  cent.resize(n * 3);
  for (int64_t i = 0; i < n; ++i) {
    for (int k = 0; k < 3; ++k) {
      float a = p0[i * 3 + k] - r0[i];
      float b = p1[i * 3 + k] - r1[i];
      float mn = a < b ? a : b;
      a = p0[i * 3 + k] + r0[i];
      b = p1[i * 3 + k] + r1[i];
      float mx = a > b ? a : b;
      bmin[i * 3 + k] = mn;
      bmax[i * 3 + k] = mx;
      double amn = (double)p0[i * 3 + k] - (double)r0[i];
      double bmn = (double)p1[i * 3 + k] - (double)r1[i];
      double amx = (double)p0[i * 3 + k] + (double)r0[i];
      double bmx = (double)p1[i * 3 + k] + (double)r1[i];
      cent[i * 3 + k] = 0.5 * ((amn < bmn ? amn : bmn) +
                               (amx > bmx ? amx : bmx));
    }
  }
}

void emit_clusters(const float* p0, const float* p1, const float* r0,
                   const float* r1, const std::vector<float>& bmin,
                   const std::vector<float>& bmax,
                   const std::vector<int32_t>& order, int64_t n, int64_t C,
                   int64_t cluster_size, float* out_s0, float* out_s1,
                   float* out_cmin, float* out_cmax,
                   int32_t* out_seg_index) {
  const int64_t padded = C * cluster_size;
  for (int64_t i = 0; i < padded; ++i) {
    if (i < n) {
      int32_t s = order[i];
      for (int k = 0; k < 3; ++k) {
        out_s0[i * 4 + k] = p0[s * 3 + k];
        out_s1[i * 4 + k] = p1[s * 3 + k];
      }
      out_s0[i * 4 + 3] = r0[s];
      out_s1[i * 4 + 3] = r1[s];
      out_seg_index[i] = s;
    } else {
      for (int k = 0; k < 3; ++k) {
        out_s0[i * 4 + k] = 1e8f;
        out_s1[i * 4 + k] = 1e8f;
      }
      out_s0[i * 4 + 3] = 0.f;
      out_s1[i * 4 + 3] = 0.f;
      out_seg_index[i] = -1;
    }
  }
  for (int64_t c = 0; c < C; ++c) {
    float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
    bool any = false;
    for (int64_t j = 0; j < cluster_size; ++j) {
      int64_t i = c * cluster_size + j;
      if (i >= n) break;
      any = true;
      int32_t s = order[i];
      for (int k = 0; k < 3; ++k) {
        if (bmin[s * 3 + k] < mn[k]) mn[k] = bmin[s * 3 + k];
        if (bmax[s * 3 + k] > mx[k]) mx[k] = bmax[s * 3 + k];
      }
    }
    for (int k = 0; k < 3; ++k) {
      out_cmin[c * 3 + k] = any ? mn[k] : 4e30f;
      out_cmax[c * 3 + k] = any ? mx[k] : 4e30f;
    }
  }
}

}  // namespace

extern "C" {

// number of clusters the outputs must be sized for
int64_t yh_n_clusters(int64_t n_seg, int64_t cluster_size) {
  int64_t leaves = (n_seg + cluster_size - 1) / cluster_size;
  if (leaves < 1) leaves = 1;
  return next_pow2(leaves);
}

int yh_build_clusters(const float* p0, const float* p1, const float* r0,
                      const float* r1, int64_t n, int64_t cluster_size,
                      float* out_s0, float* out_s1, float* out_cmin,
                      float* out_cmax, int32_t* out_seg_index) {
  if (n <= 0 || cluster_size <= 0) return 1;
  const int64_t C = yh_n_clusters(n, cluster_size);
  const int64_t padded = C * cluster_size;

  // segment bboxes + centroids
  std::vector<float> bmin, bmax;
  std::vector<double> centd;
  segment_bounds(p0, p1, r0, r1, n, bmin, bmax, centd);
  double lo[3] = {1e30, 1e30, 1e30}, hi[3] = {-1e30, -1e30, -1e30};
  for (int64_t i = 0; i < n; ++i) {
    for (int k = 0; k < 3; ++k) {
      double c = centd[i * 3 + k];
      if (c < lo[k]) lo[k] = c;
      if (c > hi[k]) hi[k] = c;
    }
  }
  double span[3];
  for (int k = 0; k < 3; ++k) {
    span[k] = hi[k] - lo[k];
    if (span[k] < 1e-12) span[k] = 1e-12;
  }

  // morton codes + stable sort
  std::vector<uint64_t> codes(n);
  for (int64_t i = 0; i < n; ++i) {
    codes[i] = morton3((centd[i * 3] - lo[0]) / span[0],
                       (centd[i * 3 + 1] - lo[1]) / span[1],
                       (centd[i * 3 + 2] - lo[2]) / span[2]);
  }
  std::vector<int32_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int32_t a, int32_t b) { return codes[a] < codes[b]; });

  emit_clusters(p0, p1, r0, r1, bmin, bmax, order, n, C, cluster_size,
                out_s0, out_s1, out_cmin, out_cmax, out_seg_index);
  return 0;
}

// Longest-axis median-split ordering (mirrors
// accel/lbvh.py:_median_split_order exactly: double centroids, stable
// sort, first-max axis choice, (n_lv/2)*K left split).
int yh_build_clusters_median(const float* p0, const float* p1,
                             const float* r0, const float* r1, int64_t n,
                             int64_t cluster_size, float* out_s0,
                             float* out_s1, float* out_cmin,
                             float* out_cmax, int32_t* out_seg_index) {
  if (n <= 0 || cluster_size <= 0) return 1;
  const int64_t C = yh_n_clusters(n, cluster_size);
  const int64_t K = cluster_size;

  std::vector<float> bmin, bmax;
  std::vector<double> cent;
  segment_bounds(p0, p1, r0, r1, n, bmin, bmax, cent);

  std::vector<int32_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  struct Range { int64_t lo, hi, n_lv; };
  std::vector<Range> stack{{0, n, C}};
  while (!stack.empty()) {
    Range r = stack.back();
    stack.pop_back();
    if (r.n_lv <= 1 || r.hi - r.lo <= K) continue;
    double mn[3] = {1e300, 1e300, 1e300};
    double mx[3] = {-1e300, -1e300, -1e300};
    for (int64_t i = r.lo; i < r.hi; ++i) {
      const double* c = &cent[(int64_t)order[i] * 3];
      for (int k = 0; k < 3; ++k) {
        if (c[k] < mn[k]) mn[k] = c[k];
        if (c[k] > mx[k]) mx[k] = c[k];
      }
    }
    int ax = 0;
    double best = mx[0] - mn[0];
    for (int k = 1; k < 3; ++k) {
      if (mx[k] - mn[k] > best) {  // strict: keep the FIRST max (numpy)
        best = mx[k] - mn[k];
        ax = k;
      }
    }
    std::stable_sort(order.begin() + r.lo, order.begin() + r.hi,
                     [&](int32_t a, int32_t b) {
                       return cent[(int64_t)a * 3 + ax] <
                              cent[(int64_t)b * 3 + ax];
                     });
    int64_t left = std::min(r.hi - r.lo, (r.n_lv / 2) * K);
    // push right first so the left range pops first (order of disjoint
    // group processing is irrelevant; this just matches lbvh.py)
    stack.push_back({r.lo + left, r.hi, r.n_lv - r.n_lv / 2});
    stack.push_back({r.lo, r.lo + left, r.n_lv / 2});
  }

  emit_clusters(p0, p1, r0, r1, bmin, bmax, order, n, C, cluster_size,
                out_s0, out_s1, out_cmin, out_cmax, out_seg_index);
  return 0;
}

}  // extern "C"
