// Native host-side BEV preprocessing ops.
//
// The PandaSet host pipeline (lmsu_tpu/data/pandaset.py) must keep a TPU
// slice fed from a weak host CPU; these C++ kernels replace the two numpy
// passes that dominate per-sample label/point preparation. Semantics match
// the reference exactly (reference: pandaset_dataset.py:23-45 first-write-
// wins rasterization; :121-127 downsample/zero-pad).
//
// Build: make -C native   (g++ -O3 -shared, zero dependencies)
// Python binding: lmsu_tpu/data/native.py via ctypes, with a numpy fallback
// when the shared library is absent.

#include <cstdint>
#include <cstring>

extern "C" {

// First-write-wins BEV label rasterization.
// Cells only accept a label while they still hold 0, so the first nonzero
// label per cell (in point order) sticks. out must be zero-initialized or
// not; it is cleared here. Returns the number of in-range points.
int64_t rasterize_bev_first_write(
    const float* x, const float* y, const int64_t* labels, int64_t n,
    int64_t h, int64_t w,
    float x_min, float x_max, float y_min, float y_max,
    int64_t* out) {
  std::memset(out, 0, sizeof(int64_t) * h * w);
  const float sx = (w - 1) / (x_max - x_min);
  const float sy = (h - 1) / (y_max - y_min);
  int64_t in_range = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float xi = x[i], yi = y[i];
    // Positive form so NaN coordinates (sensor dropout) fail the test and
    // are dropped — matching the numpy fallback (rasterize.py uses
    // x >= x_min). The inverted form would pass NaN through and the
    // float->int64 cast of NaN is undefined behavior.
    if (!(xi >= x_min && xi <= x_max && yi >= y_min && yi <= y_max))
      continue;
    ++in_range;
    int64_t col = static_cast<int64_t>((xi - x_min) * sx);
    int64_t row = static_cast<int64_t>((yi - y_min) * sy);
    if (col < 0) col = 0; else if (col >= w) col = w - 1;
    if (row < 0) row = 0; else if (row >= h) row = h - 1;
    int64_t* cell = out + row * w + col;
    if (*cell == 0) *cell = labels[i];
  }
  return in_range;
}

// Uniform downsample without replacement (partial Fisher-Yates over an
// index permutation) or zero-pad to max_points. points is [n, 4] row-major;
// out is [max_points, 4]; valid is [max_points] (1 = real point).
// Returns the number of valid points written.
int64_t sample_or_pad_points(
    const float* points, int64_t n, int64_t max_points, uint64_t seed,
    float* out, uint8_t* valid) {
  if (n <= max_points) {
    std::memcpy(out, points, sizeof(float) * 4 * n);
    std::memset(out + 4 * n, 0, sizeof(float) * 4 * (max_points - n));
    for (int64_t i = 0; i < max_points; ++i) valid[i] = i < n;
    return n;
  }
  // splitmix64 PRNG — deterministic per seed, no libc rand state.
  auto next = [&seed]() {
    seed += 0x9E3779B97F4A7C15ull;
    uint64_t z = seed;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
  };
  // Partial Fisher-Yates over [0, n): draw max_points unique indices.
  // Index permutation buffer sized n (heap) — n is ~1e5 for PandaSet sweeps.
  int64_t* perm = new int64_t[n];
  for (int64_t i = 0; i < n; ++i) perm[i] = i;
  for (int64_t i = 0; i < max_points; ++i) {
    const int64_t j = i + static_cast<int64_t>(next() % (n - i));
    const int64_t tmp = perm[i];
    perm[i] = perm[j];
    perm[j] = tmp;
    std::memcpy(out + 4 * i, points + 4 * perm[i], sizeof(float) * 4);
    valid[i] = 1;
  }
  delete[] perm;
  return max_points;
}

// Stable counting sort of points by BEV cell id, invalid/out-of-range last.
// Provides the input contract of the sorted-input scatter kernel
// (lmsu_tpu/ops/scatter_sorted_pallas.py) in O(n + h*w) per sample. The
// key math mirrors lmsu_tpu/data/rasterize.py::bev_cell_key — fp32, same
// op order as the device index computation (ops/scatter.py). point_dim is
// the trailing feature width (4 for x,y,z,i). valid may be null (all
// points treated as pipeline-valid; range still applies to the key).
void sort_points_by_cell(
    const float* points, const uint8_t* valid, int64_t n, int64_t point_dim,
    int64_t h, int64_t w,
    float x_min, float x_max, float y_min, float y_max,
    float* out, uint8_t* valid_out) {
  const int64_t hw = h * w;
  int32_t* keys = new int32_t[n];
  int64_t* counts = new int64_t[hw + 2]();
  for (int64_t i = 0; i < n; ++i) {
    // Match numpy/device rounding exactly: divide (a reciprocal-multiply
    // rounds differently).
    const float xn = (points[i * point_dim + 0] - x_min) / (x_max - x_min);
    const float yn = (points[i * point_dim + 1] - y_min) / (y_max - y_min);
    const bool in_range = xn >= 0.0f && xn <= 1.0f && yn >= 0.0f && yn <= 1.0f;
    const bool ok = in_range && (valid == nullptr || valid[i]);
    int32_t key = static_cast<int32_t>(hw);
    if (ok) {
      int32_t col = static_cast<int32_t>(xn * (w - 1));
      int32_t row = static_cast<int32_t>(yn * (h - 1));
      if (col < 0) col = 0; else if (col >= w) col = static_cast<int32_t>(w) - 1;
      if (row < 0) row = 0; else if (row >= h) row = static_cast<int32_t>(h) - 1;
      key = row * static_cast<int32_t>(w) + col;
    }
    keys[i] = key;
    ++counts[key + 1];
  }
  for (int64_t c = 1; c <= hw + 1; ++c) counts[c] += counts[c - 1];
  for (int64_t i = 0; i < n; ++i) {
    const int64_t pos = counts[keys[i]]++;
    std::memcpy(out + pos * point_dim, points + i * point_dim,
                sizeof(float) * point_dim);
    valid_out[pos] = valid == nullptr ? 1 : valid[i];
  }
  delete[] keys;
  delete[] counts;
}

}  // extern "C"
