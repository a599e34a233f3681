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
//                     n_clusters)  -> 0 on success
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

inline uint64_t morton3(float x, float y, float z) {
  auto q = [](float a) -> uint64_t {
    float s = a * 1024.0f;
    if (s < 0.f) s = 0.f;
    if (s > 1023.f) s = 1023.f;
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
  std::vector<float> bmin(n * 3), bmax(n * 3), cent(n * 3);
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
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
      float c = 0.5f * (mn + mx);
      cent[i * 3 + k] = c;
      if (c < lo[k]) lo[k] = c;
      if (c > hi[k]) hi[k] = c;
    }
  }
  float span[3];
  for (int k = 0; k < 3; ++k) {
    span[k] = hi[k] - lo[k];
    if (span[k] < 1e-12f) span[k] = 1e-12f;
  }

  // morton codes + stable sort
  std::vector<uint64_t> codes(n);
  for (int64_t i = 0; i < n; ++i) {
    codes[i] = morton3((cent[i * 3] - lo[0]) / span[0],
                       (cent[i * 3 + 1] - lo[1]) / span[1],
                       (cent[i * 3 + 2] - lo[2]) / span[2]);
  }
  std::vector<int32_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int32_t a, int32_t b) { return codes[a] < codes[b]; });

  // emit reordered, padded SoA + cluster AABBs
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
  return 0;
}

}  // extern "C"
