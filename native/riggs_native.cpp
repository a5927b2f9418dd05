// riggs_native: C++ implementations of host-side (CPU) hot paths.
//
// The TPU compute path is JAX/XLA; these are the *runtime-side* pieces that
// run on the host — offline data preparation and between-stage graph
// algorithms — where the reference relies on skimage / python loops:
//   * zhang_suen_thin : mask -> 1px skeleton (per-frame data prep; the
//     numpy fallback is ~100x slower on 800x800 masks)
//   * prim_mst        : dense-cost Prim (skeleton extraction)
//   * floyd_warshall  : all-pairs geodesics over node graphs
//   * farthest_point_sample : host-side FPS for init/data prep
//
// Plain C ABI, loaded via ctypes (no pybind11 in this image). Build: `make`.
#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <limits>

extern "C" {

// In-place Zhang-Suen thinning of a binary mask (values 0/1), row-major.
// Returns the number of iterations executed.
int zhang_suen_thin(uint8_t* img, int h, int w, int max_iter) {
  auto at = [&](int r, int c) -> uint8_t& { return img[r * w + c]; };
  // clear the border (the algorithm reads 8-neighborhoods)
  for (int c = 0; c < w; ++c) { at(0, c) = 0; at(h - 1, c) = 0; }
  for (int r = 0; r < h; ++r) { at(r, 0) = 0; at(r, w - 1) = 0; }

  std::vector<int> kill;
  kill.reserve(1024);
  int it = 0;
  for (; it < max_iter; ++it) {
    bool changed = false;
    for (int phase = 0; phase < 2; ++phase) {
      kill.clear();
      for (int r = 1; r < h - 1; ++r) {
        for (int c = 1; c < w - 1; ++c) {
          if (!at(r, c)) continue;
          const uint8_t p2 = at(r - 1, c), p3 = at(r - 1, c + 1), p4 = at(r, c + 1),
                        p5 = at(r + 1, c + 1), p6 = at(r + 1, c), p7 = at(r + 1, c - 1),
                        p8 = at(r, c - 1), p9 = at(r - 1, c - 1);
          const int B = p2 + p3 + p4 + p5 + p6 + p7 + p8 + p9;
          if (B < 2 || B > 6) continue;
          const uint8_t seq[9] = {p2, p3, p4, p5, p6, p7, p8, p9, p2};
          int A = 0;
          for (int i = 0; i < 8; ++i) A += (seq[i] == 0 && seq[i + 1] == 1);
          if (A != 1) continue;
          const bool cond = phase == 0 ? (p2 * p4 * p6 == 0 && p4 * p6 * p8 == 0)
                                       : (p2 * p4 * p8 == 0 && p2 * p6 * p8 == 0);
          if (cond) kill.push_back(r * w + c);
        }
      }
      for (int idx : kill) img[idx] = 0;
      changed |= !kill.empty();
    }
    if (!changed) break;
  }
  return it;
}

// Prim MST over a dense cost matrix (n x n, row-major). Entries <= 0 mean
// "no edge". parents[init_id] = -1.
void prim_mst(const float* cost, int n, int init_id, int32_t* parents) {
  std::vector<float> key(n, std::numeric_limits<float>::infinity());
  std::vector<uint8_t> in_tree(n, 0);
  for (int i = 0; i < n; ++i) parents[i] = -1;
  key[init_id] = 0.f;
  for (int iter = 0; iter < n; ++iter) {
    int u = -1;
    float best = std::numeric_limits<float>::infinity();
    for (int v = 0; v < n; ++v)
      if (!in_tree[v] && key[v] < best) { best = key[v]; u = v; }
    if (u < 0) break;
    in_tree[u] = 1;
    const float* row = cost + (size_t)u * n;
    for (int v = 0; v < n; ++v) {
      if (!in_tree[v] && row[v] > 0.f && row[v] < key[v]) {
        key[v] = row[v];
        parents[v] = u;
      }
    }
  }
}

// In-place Floyd-Warshall over a dense distance matrix (inf = no edge).
void floyd_warshall(float* dist, int n) {
  for (int k = 0; k < n; ++k) {
    const float* dk = dist + (size_t)k * n;
    for (int i = 0; i < n; ++i) {
      const float dik = dist[(size_t)i * n + k];
      if (!std::isfinite(dik)) continue;
      float* di = dist + (size_t)i * n;
      for (int j = 0; j < n; ++j) {
        const float via = dik + dk[j];
        if (via < di[j]) di[j] = via;
      }
    }
  }
}

// Farthest point sampling: points (n, 3) row-major; writes k indices.
void farthest_point_sample(const float* pts, int n, int k, int init_idx, int32_t* out) {
  std::vector<float> min_d2(n, std::numeric_limits<float>::infinity());
  int cur = init_idx < 0 || init_idx >= n ? 0 : init_idx;
  for (int s = 0; s < k; ++s) {
    out[s] = cur;
    const float cx = pts[3 * cur], cy = pts[3 * cur + 1], cz = pts[3 * cur + 2];
    float best = -1.f;
    int next = cur;
    for (int i = 0; i < n; ++i) {
      const float dx = pts[3 * i] - cx, dy = pts[3 * i + 1] - cy, dz = pts[3 * i + 2] - cz;
      const float d2 = dx * dx + dy * dy + dz * dz;
      if (d2 < min_d2[i]) min_d2[i] = d2;
      if (min_d2[i] > best) { best = min_d2[i]; next = i; }
    }
    cur = next;
  }
}

}  // extern "C"
