// Native point-cloud runtime ops for d3fields_tpu.
//
// Replaces the reference's Open3D C++ dependency on the host path:
//   - voxel_grid downsample (reference utils/draw_utils.py:314-323,
//     fusion.py:720-722: o3d.geometry.PointCloud.voxel_down_sample)
//   - statistical outlier removal (reference vis_repr.py:79:
//     remove_statistical_outlier(nb_neighbors, std_ratio))
//   - farthest point sampling (reference utils/my_utils.py:478-497 fps_np,
//     the keypoint-selection host loop)
//
// All three are grid-hashed / O(N log N)-ish where the python fallbacks are
// quadratic. Exposed C ABI consumed via ctypes (no pybind11 policy):
//   pc_voxel_downsample(pts, n, voxel, keep_idx_out) -> n_kept
//   pc_statistical_outliers(pts, n, k, std_ratio, keep_mask_out) -> n_kept
//   pc_fps(pts, n, m, init_idx, idx_out, dist_out)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

struct Key {
  int64_t a, b, c;
  bool operator==(const Key& o) const { return a == o.a && b == o.b && c == o.c; }
};

struct KeyHash {
  size_t operator()(const Key& k) const {
    size_t h = std::hash<int64_t>()(k.a);
    h ^= std::hash<int64_t>()(k.b) + 0x9e3779b97f4a7c15ULL + (h << 6) + (h >> 2);
    h ^= std::hash<int64_t>()(k.c) + 0x9e3779b97f4a7c15ULL + (h << 6) + (h >> 2);
    return h;
  }
};

}  // namespace

extern "C" {

// Keeps the first point seen per voxel (index order == input order), writing
// kept indices to keep_idx (caller allocates n int64). Returns count.
int64_t pc_voxel_downsample(const float* pts, int64_t n, float voxel,
                            int64_t* keep_idx) {
  std::unordered_map<Key, int64_t, KeyHash> seen;
  seen.reserve(static_cast<size_t>(n));
  int64_t kept = 0;
  const float inv = 1.0f / voxel;
  for (int64_t i = 0; i < n; ++i) {
    Key k{static_cast<int64_t>(std::floor(pts[3 * i] * inv)),
          static_cast<int64_t>(std::floor(pts[3 * i + 1] * inv)),
          static_cast<int64_t>(std::floor(pts[3 * i + 2] * inv))};
    if (seen.emplace(k, i).second) keep_idx[kept++] = i;
  }
  return kept;
}

// Statistical outlier removal with a uniform-grid kNN. keep_mask: n uint8.
// Matches Open3D semantics: its KNN returns the query point itself (0
// distance) among the k results, so the per-point mean averages {0, k-1
// nearest neighbors}; the threshold uses the SAMPLE std (n-1 denominator).
int64_t pc_statistical_outliers(const float* pts, int64_t n, int k,
                                float std_ratio, uint8_t* keep_mask) {
  if (n == 0) return 0;
  // grid cell ~ median spacing heuristic: bounding box / cbrt(n)
  float lo[3] = {pts[0], pts[1], pts[2]}, hi[3] = {pts[0], pts[1], pts[2]};
  for (int64_t i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], pts[3 * i + d]);
      hi[d] = std::max(hi[d], pts[3 * i + d]);
    }
  float diag = 0;
  for (int d = 0; d < 3; ++d) diag += (hi[d] - lo[d]) * (hi[d] - lo[d]);
  diag = std::sqrt(diag);
  float cell = std::max(diag / std::cbrt(static_cast<double>(n) + 1.0), 1e-6);

  std::unordered_map<Key, std::vector<int64_t>, KeyHash> grid;
  grid.reserve(static_cast<size_t>(n));
  auto cell_of = [&](int64_t i) {
    return Key{static_cast<int64_t>(std::floor(pts[3 * i] / cell)),
               static_cast<int64_t>(std::floor(pts[3 * i + 1] / cell)),
               static_cast<int64_t>(std::floor(pts[3 * i + 2] / cell))};
  };
  for (int64_t i = 0; i < n; ++i) grid[cell_of(i)].push_back(i);

  std::vector<double> mean_d(n, 0.0);
  std::vector<float> best;
  for (int64_t i = 0; i < n; ++i) {
    best.assign(k, std::numeric_limits<float>::infinity());
    Key c = cell_of(i);
    // expand ring search until k neighbors are certainly inside the radius
    for (int ring = 0;; ++ring) {
      for (int64_t dz = -ring; dz <= ring; ++dz)
        for (int64_t dy = -ring; dy <= ring; ++dy)
          for (int64_t dx = -ring; dx <= ring; ++dx) {
            if (std::max(std::max(std::abs(dx), std::abs(dy)), std::abs(dz)) != ring)
              continue;
            auto it = grid.find(Key{c.a + dx, c.b + dy, c.c + dz});
            if (it == grid.end()) continue;
            for (int64_t j : it->second) {
              if (j == i) continue;
              float d2 = 0;
              for (int d = 0; d < 3; ++d) {
                float t = pts[3 * i + d] - pts[3 * j + d];
                d2 += t * t;
              }
              float d1 = std::sqrt(d2);
              if (d1 < best[k - 1]) {
                // insertion into the small sorted best list
                int p = k - 1;
                while (p > 0 && best[p - 1] > d1) {
                  best[p] = best[p - 1];
                  --p;
                }
                best[p] = d1;
              }
            }
          }
      // done when the kth best is within the guaranteed-covered radius
      if (best[k - 1] <= ring * cell || ring > 64) break;
    }
    // Open3D's SearchKNN(point, k) includes the query itself as one of the
    // k hits: average the k-1 nearest true neighbors together with the
    // implicit 0 self-distance, dividing by k.
    double s = 0;
    for (int j = 0; j < k - 1; ++j)
      if (std::isfinite(best[j])) s += best[j];
    mean_d[i] = k > 0 ? s / k : 0.0;
  }
  double mu = 0;
  for (int64_t i = 0; i < n; ++i) mu += mean_d[i];
  mu /= n;
  double var = 0;
  for (int64_t i = 0; i < n; ++i) var += (mean_d[i] - mu) * (mean_d[i] - mu);
  double thresh = mu + std_ratio * std::sqrt(var / std::max<int64_t>(n - 1, 1));
  int64_t kept = 0;
  for (int64_t i = 0; i < n; ++i) {
    keep_mask[i] = mean_d[i] <= thresh;
    kept += keep_mask[i];
  }
  return kept;
}

// Farthest point sampling; idx_out m int64, dist_out n float (final
// min-distance field, matching fps_np's dist return).
void pc_fps(const float* pts, int64_t n, int64_t m, int64_t init_idx,
            int64_t* idx_out, float* dist_out) {
  std::vector<float> dist(n, std::numeric_limits<float>::infinity());
  int64_t cur = init_idx < 0 ? 0 : init_idx % n;
  for (int64_t s = 0; s < m; ++s) {
    idx_out[s] = cur;
    float far_d = -1.0f;
    int64_t far_i = cur;
    for (int64_t i = 0; i < n; ++i) {
      float d2 = 0;
      for (int d = 0; d < 3; ++d) {
        float t = pts[3 * i + d] - pts[3 * cur + d];
        d2 += t * t;
      }
      if (d2 < dist[i]) dist[i] = d2;
      if (dist[i] > far_d) {
        far_d = dist[i];
        far_i = i;
      }
    }
    cur = far_i;
  }
  for (int64_t i = 0; i < n; ++i) dist_out[i] = std::sqrt(dist[i]);
}

}  // extern "C"
