// Fast classical-planning core for the synthetic dataset generator.
//
// The Python generator (ramp_tpu/data/generator.py) plans thousands of
// collision-free demonstrations with grid A* + random shortcutting +
// Chaikin smoothing + arc-length resampling. Pure-Python A* dominates
// dataset-generation wall-clock; this translation unit implements the same
// pipeline in C++ (exposed through a C ABI for ctypes) at ~two orders of
// magnitude higher throughput. Semantics match the Python implementation
// (same occupancy inflation, 8-connectivity, smoothing recurrences); the
// Python path remains as the reference and fallback.
//
// Build: make -C native    (produces libramp_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <random>
#include <vector>

namespace {

struct Node {
  float f;
  float g;
  int idx;
  bool operator<(const Node& o) const { return f > o.f; }  // min-heap
};

constexpr float kInf = std::numeric_limits<float>::infinity();

// 8-connected A* over an n x n occupancy grid. Returns the cell path
// (row-major indices) or empty when unreachable.
std::vector<int> astar(const uint8_t* occ, int n, int start, int goal) {
  if (occ[start] || occ[goal]) return {};
  const int sx = start / n, sy = start % n;
  const int gx = goal / n, gy = goal % n;
  (void)sx; (void)sy;
  std::vector<float> g(n * n, kInf);
  std::vector<int> came(n * n, -1);
  std::priority_queue<Node> open;
  auto heur = [&](int idx) {
    const int x = idx / n, y = idx % n;
    const float dx = float(x - gx), dy = float(y - gy);
    return std::sqrt(dx * dx + dy * dy);
  };
  g[start] = 0.f;
  open.push({heur(start), 0.f, start});
  const int dxs[8] = {-1, -1, -1, 0, 0, 1, 1, 1};
  const int dys[8] = {-1, 0, 1, -1, 1, -1, 0, 1};
  const float costs[8] = {1.41421356f, 1.f, 1.41421356f, 1.f,
                          1.f, 1.41421356f, 1.f, 1.41421356f};
  while (!open.empty()) {
    Node cur = open.top();
    open.pop();
    if (cur.idx == goal) {
      std::vector<int> path;
      for (int c = goal; c != -1; c = came[c]) path.push_back(c);
      std::reverse(path.begin(), path.end());
      return path;
    }
    if (cur.g > g[cur.idx]) continue;
    const int x = cur.idx / n, y = cur.idx % n;
    for (int k = 0; k < 8; ++k) {
      const int nx = x + dxs[k], ny = y + dys[k];
      if (nx < 0 || nx >= n || ny < 0 || ny >= n) continue;
      const int nidx = nx * n + ny;
      if (occ[nidx]) continue;
      const float ng = cur.g + costs[k];
      if (ng < g[nidx]) {
        g[nidx] = ng;
        came[nidx] = cur.idx;
        open.push({ng + heur(nidx), ng, nidx});
      }
    }
  }
  return {};
}

// Straight-line collision test in world coords ([-1,1]^2) over the grid.
bool segment_free(const uint8_t* occ, int n, float ax, float ay, float bx,
                  float by) {
  const float len = std::hypot(bx - ax, by - ay);
  const int steps = std::max(2, int(len * n));
  for (int i = 0; i < steps; ++i) {
    const float t = float(i) / float(steps - 1);
    const float x = ax + t * (bx - ax);
    const float y = ay + t * (by - ay);
    int cx = int(std::lround((x + 1.f) / 2.f * (n - 1)));
    int cy = int(std::lround((y + 1.f) / 2.f * (n - 1)));
    cx = std::min(std::max(cx, 0), n - 1);
    cy = std::min(std::max(cy, 0), n - 1);
    if (occ[cx * n + cy]) return false;
  }
  return true;
}

}  // namespace

extern "C" {

// Rasterize inflated axis-aligned boxes over [-1,1]^2 into occ (n*n bytes).
void ramp_occupancy_grid(const float* centers, const float* sizes,
                         int n_boxes, int n, float margin, uint8_t* occ) {
  std::memset(occ, 0, size_t(n) * n);
  for (int b = 0; b < n_boxes; ++b) {
    const float cx = centers[2 * b], cy = centers[2 * b + 1];
    const float hx = sizes[2 * b] / 2.f + margin;
    const float hy = sizes[2 * b + 1] / 2.f + margin;
    for (int i = 0; i < n; ++i) {
      const float x = -1.f + 2.f * float(i) / float(n - 1);
      if (std::fabs(x - cx) > hx) continue;
      for (int j = 0; j < n; ++j) {
        const float y = -1.f + 2.f * float(j) / float(n - 1);
        if (std::fabs(y - cy) <= hy) occ[i * n + j] = 1;
      }
    }
  }
}

// Full pipeline: A* -> random shortcut -> Chaikin x3 -> arc-length resample
// to `horizon` waypoints -> central-difference velocities (dt).
// Returns 1 on success and fills out[horizon*4]; 0 when unreachable.
int ramp_plan_trajectory(const uint8_t* occ, int n, float sx, float sy,
                         float gx, float gy, int horizon, float dt,
                         uint64_t seed, float* out) {
  auto to_cell = [&](float x, float y) {
    int cx = int(std::lround((x + 1.f) / 2.f * (n - 1)));
    int cy = int(std::lround((y + 1.f) / 2.f * (n - 1)));
    cx = std::min(std::max(cx, 0), n - 1);
    cy = std::min(std::max(cy, 0), n - 1);
    return cx * n + cy;
  };
  std::vector<int> cells = astar(occ, n, to_cell(sx, sy), to_cell(gx, gy));
  if (cells.empty()) return 0;

  std::vector<float> px, py;
  px.reserve(cells.size());
  py.reserve(cells.size());
  for (int c : cells) {
    px.push_back(float(c / n) / float(n - 1) * 2.f - 1.f);
    py.push_back(float(c % n) / float(n - 1) * 2.f - 1.f);
  }
  px.front() = sx; py.front() = sy;
  px.back() = gx;  py.back() = gy;

  // random shortcutting (60 iters, mirrors generator._shortcut)
  std::mt19937_64 rng(seed);
  for (int it = 0; it < 60 && px.size() > 2; ++it) {
    std::uniform_int_distribution<size_t> d(0, px.size() - 1);
    size_t i = d(rng), j = d(rng);
    if (i > j) std::swap(i, j);
    if (j - i < 2) continue;
    if (segment_free(occ, n, px[i], py[i], px[j], py[j])) {
      px.erase(px.begin() + i + 1, px.begin() + j);
      py.erase(py.begin() + i + 1, py.begin() + j);
    }
  }

  // Chaikin corner cutting x3 (keep endpoints)
  for (int it = 0; it < 3 && px.size() >= 3; ++it) {
    std::vector<float> nx{px.front()}, ny{py.front()};
    for (size_t i = 0; i + 1 < px.size(); ++i) {
      nx.push_back(0.75f * px[i] + 0.25f * px[i + 1]);
      ny.push_back(0.75f * py[i] + 0.25f * py[i + 1]);
      nx.push_back(0.25f * px[i] + 0.75f * px[i + 1]);
      ny.push_back(0.25f * py[i] + 0.75f * py[i + 1]);
    }
    nx.push_back(px.back());
    ny.push_back(py.back());
    px = std::move(nx);
    py = std::move(ny);
  }

  // arc-length resample to horizon
  std::vector<float> s(px.size(), 0.f);
  for (size_t i = 1; i < px.size(); ++i)
    s[i] = s[i - 1] + std::hypot(px[i] - px[i - 1], py[i] - py[i - 1]);
  const float total = std::max(s.back(), 1e-9f);
  std::vector<float> rx(horizon), ry(horizon);
  size_t seg = 0;
  for (int i = 0; i < horizon; ++i) {
    const float target = total * float(i) / float(horizon - 1);
    while (seg + 1 < s.size() && s[seg + 1] < target) ++seg;
    const size_t a = seg, b = std::min(seg + 1, s.size() - 1);
    const float denom = std::max(s[b] - s[a], 1e-12f);
    const float t = (a == b) ? 0.f : (target - s[a]) / denom;
    rx[i] = px[a] + t * (px[b] - px[a]);
    ry[i] = py[a] + t * (py[b] - py[a]);
  }
  rx.front() = sx; ry.front() = sy;
  rx.back() = gx;  ry.back() = gy;

  // central-difference velocities (np.gradient semantics), rest endpoints
  for (int i = 0; i < horizon; ++i) {
    float vx, vy;
    if (i == 0) {
      vx = (rx[1] - rx[0]) / dt;
      vy = (ry[1] - ry[0]) / dt;
    } else if (i == horizon - 1) {
      vx = (rx[i] - rx[i - 1]) / dt;
      vy = (ry[i] - ry[i - 1]) / dt;
    } else {
      vx = (rx[i + 1] - rx[i - 1]) / (2.f * dt);
      vy = (ry[i + 1] - ry[i - 1]) / (2.f * dt);
    }
    if (i == 0 || i == horizon - 1) { vx = 0.f; vy = 0.f; }
    out[4 * i + 0] = rx[i];
    out[4 * i + 1] = ry[i];
    out[4 * i + 2] = vx;
    out[4 * i + 3] = vy;
  }
  return 1;
}

}  // extern "C"
