// Native route planner: A* over the town lane graph + route-bank building.
//
// This is the performance-critical host-side component: at stage setup (and
// for large multi-town banks) thousands of routes are planned between spawn
// points.  It mirrors the reference's planner (A* with an L2 heuristic over
// the lane topology — reference navigation/route_planner.py:221-247 — and
// RoadOption turn annotation :274-348), operating on the flat lane arrays
// produced by envs/town.py.
//
// Exposed as a C ABI consumed via ctypes (native/__init__.py); the pure
// python planner in envs/route.py is the behavioural reference + fallback.
//
// Build: make -C carla_driving_rl_agent_tpu/native  (g++ -O2 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <queue>
#include <vector>
#include <limits>

namespace {

constexpr int RO_LEFT = 1, RO_RIGHT = 2, RO_STRAIGHT = 3, RO_LANE_FOLLOW = 4,
              RO_CL_LEFT = 5, RO_CL_RIGHT = 6;

struct Graph {
  int num_lanes;
  const int32_t* first_wp;   // (L,)
  const int32_t* last_wp;    // (L,)
  const int32_t* lane_src;   // (L,)
  const int32_t* lane_dst;   // (L,)
  const float* lane_length;  // (L,)
  const int32_t* succ;       // flattened successors
  const int32_t* succ_off;   // (L+1,) offsets into succ
  const float* wp_xy;        // (N, 2)
  const float* wp_yaw;       // (N,)
  const int32_t* wp_lane;    // (N,)
  // lateral (lane-change) adjacency; nullable for single-lane towns.
  // Zero-cost edges mirror the reference's _lane_change_link
  // (navigation/route_planner.py:174-219).
  const int32_t* lane_left;   // (L,) or nullptr
  const int32_t* lane_right;  // (L,) or nullptr
  const int32_t* wp_left;     // (N,) or nullptr
  const int32_t* wp_right;    // (N,) or nullptr
};

// xorshift128+ — deterministic, portable
struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    s0 = seed * 0x9E3779B97F4A7C15ull + 1;
    s1 = (seed ^ 0xDEADBEEFCAFEBABEull) * 0xBF58476D1CE4E5B9ull + 1;
    for (int i = 0; i < 8; ++i) next();
  }
  uint64_t next() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  int uniform_int(int n) { return static_cast<int>(next() % static_cast<uint64_t>(n)); }
};

inline float l2(const float* a, const float* b) {
  float dx = a[0] - b[0], dy = a[1] - b[1];
  return std::sqrt(dx * dx + dy * dy);
}

// A* over lanes; returns lane path (empty if unreachable).
std::vector<int> astar(const Graph& g, int src_lane, int dst_lane) {
  if (src_lane == dst_lane) return {src_lane};
  const float* goal_xy = &g.wp_xy[2 * g.first_wp[dst_lane]];
  std::vector<float> gscore(g.num_lanes, std::numeric_limits<float>::infinity());
  std::vector<int> came(g.num_lanes, -1);
  auto h = [&](int lane) {
    return l2(&g.wp_xy[2 * g.last_wp[lane]], goal_xy);
  };
  using QE = std::pair<float, std::pair<float, int>>;  // (f, (g, lane))
  std::priority_queue<QE, std::vector<QE>, std::greater<QE>> open;
  gscore[src_lane] = 0.f;
  open.push({h(src_lane), {0.f, src_lane}});
  while (!open.empty()) {
    auto [f, gl] = open.top();
    open.pop();
    auto [gc, lane] = gl;
    if (lane == dst_lane) {
      std::vector<int> path{lane};
      while (came[path.back()] != -1) path.push_back(came[path.back()]);
      std::reverse(path.begin(), path.end());
      return path;
    }
    if (gc > gscore[lane]) continue;
    for (int i = g.succ_off[lane]; i < g.succ_off[lane + 1]; ++i) {
      int nxt = g.succ[i];
      float ng = gc + g.lane_length[nxt];
      if (ng < gscore[nxt]) {
        gscore[nxt] = ng;
        came[nxt] = lane;
        open.push({ng + h(nxt), {ng, nxt}});
      }
    }
    if (g.lane_left != nullptr) {
      const int32_t lats[2] = {g.lane_left[lane], g.lane_right[lane]};
      for (int32_t nxt : lats) {
        if (nxt < 0) continue;
        float ng = gc;  // zero-cost lane change
        if (ng < gscore[nxt]) {
          gscore[nxt] = ng;
          came[nxt] = lane;
          open.push({ng + h(nxt), {ng, nxt}});
        }
      }
    }
  }
  return {};
}

int turn_option(float yaw_in, float yaw_out, float threshold_deg = 35.f) {
  float d = std::atan2(std::sin(yaw_out - yaw_in), std::cos(yaw_out - yaw_in));
  float deg = d * 180.f / static_cast<float>(M_PI);
  if (std::fabs(deg) < threshold_deg) return RO_STRAIGHT;
  return deg > 0 ? RO_LEFT : RO_RIGHT;
}

}  // namespace

extern "C" {

// Plan one route origin_wp -> dest_wp. Writes up to max_len waypoints into
// xy (max_len*2), yaw (max_len), option (max_len); returns the number of
// waypoints (0 if unreachable).
int32_t rp_trace_route(
    int32_t num_lanes, const int32_t* first_wp, const int32_t* last_wp,
    const int32_t* lane_src, const int32_t* lane_dst, const float* lane_length,
    const int32_t* succ, const int32_t* succ_off,
    const float* wp_xy, const float* wp_yaw, const int32_t* wp_lane,
    const int32_t* lane_left, const int32_t* lane_right,
    const int32_t* wp_left, const int32_t* wp_right,
    int32_t origin_wp, int32_t dest_wp, int32_t max_len,
    float* out_xy, float* out_yaw, int32_t* out_option) {
  Graph g{num_lanes, first_wp, last_wp, lane_src, lane_dst,
          lane_length, succ, succ_off, wp_xy, wp_yaw, wp_lane,
          lane_left, lane_right, wp_left, wp_right};
  int src_lane = wp_lane[origin_wp];
  int dst_lane = wp_lane[dest_wp];
  auto path = astar(g, src_lane, dst_lane);
  if (path.empty()) return 0;

  int n = 0;
  int start = -1;  // wp index to enter the current lane at (-1 = lane start)
  for (size_t i = 0; i < path.size() && n < max_len; ++i) {
    int lane = path[i];
    int f = first_wp[lane], l = last_wp[lane];
    if (i == 0 && origin_wp > f) f = origin_wp;
    int s = (start < 0) ? f : std::max(f, std::min(start, l));
    start = -1;
    int end = l;
    if (lane == dst_lane && i + 1 == path.size() && dest_wp < l) end = dest_wp;
    // lateral (lane-change) hop: emit a short diagonal blend annotated
    // CHANGELANELEFT/RIGHT, then continue on the target lane
    bool lateral = false, is_left = false;
    int nxt = -1;
    if (i + 1 < path.size() && lane_left != nullptr) {
      nxt = path[i + 1];
      if (lane_left[lane] == nxt) { lateral = true; is_left = true; }
      else if (lane_right[lane] == nxt) { lateral = true; }
    }
    if (lateral) {
      int change_at = std::min(s + 2, end);
      for (int w = s; w < change_at && n < max_len; ++w, ++n) {
        out_xy[2 * n] = wp_xy[2 * w];
        out_xy[2 * n + 1] = wp_xy[2 * w + 1];
        out_yaw[n] = wp_yaw[w];
        out_option[n] = RO_LANE_FOLLOW;
      }
      int tgt = is_left ? wp_left[change_at] : wp_right[change_at];
      if (tgt < 0) return 0;  // inconsistent adjacency
      int tgt_ahead = std::min(tgt + 8, (int)last_wp[nxt]);  // ~15 m
      const float* p0 = &wp_xy[2 * change_at];
      const float* p1 = &wp_xy[2 * tgt_ahead];
      float dxy[2] = {p1[0] - p0[0], p1[1] - p0[1]};
      float dist = std::sqrt(dxy[0] * dxy[0] + dxy[1] * dxy[1]);
      int nb = std::max(3, (int)std::lround(dist / 2.f) + 1);
      float byaw = std::atan2(dxy[1], dxy[0]);
      int opt = is_left ? RO_CL_LEFT : RO_CL_RIGHT;
      for (int b = 0; b + 1 < nb && n < max_len; ++b, ++n) {
        float t = (float)b / (float)(nb - 1);
        out_xy[2 * n] = p0[0] + t * dxy[0];
        out_xy[2 * n + 1] = p0[1] + t * dxy[1];
        out_yaw[n] = byaw;
        out_option[n] = opt;
      }
      start = tgt_ahead;
      continue;
    }
    if (end < s) continue;
    bool connector = lane_src[lane] == lane_dst[lane];
    int opt = RO_LANE_FOLLOW;
    if (connector) opt = turn_option(wp_yaw[s], wp_yaw[end]);
    for (int w = s; w <= end && n < max_len; ++w, ++n) {
      out_xy[2 * n] = wp_xy[2 * w];
      out_xy[2 * n + 1] = wp_xy[2 * w + 1];
      out_yaw[n] = wp_yaw[w];
      out_option[n] = opt;
    }
  }
  return n;
}

// Build a full route bank: num_routes routes from `origins` (spawn indices,
// -1-terminated or n_origins count) to random spawn destinations.
// Outputs are (num_routes, max_len, ...) row-major; returns #routes built.
int32_t rp_build_bank(
    int32_t num_lanes, const int32_t* first_wp, const int32_t* last_wp,
    const int32_t* lane_src, const int32_t* lane_dst, const float* lane_length,
    const int32_t* succ, const int32_t* succ_off,
    const float* wp_xy, const float* wp_yaw, const int32_t* wp_lane,
    const int32_t* lane_left, const int32_t* lane_right,
    const int32_t* wp_left, const int32_t* wp_right,
    const int32_t* spawn_wp, int32_t num_spawn,
    const int32_t* origins, int32_t num_origins,
    int32_t num_routes, int32_t max_len, int32_t min_waypoints, uint64_t seed,
    float* out_xy, float* out_yaw, int32_t* out_option, int32_t* out_len,
    int32_t* out_origin) {
  Rng rng(seed);
  int built = 0;
  int attempts = 0;
  const int max_attempts = num_routes * 40;
  while (built < num_routes && attempts < max_attempts) {
    ++attempts;
    int o = origins ? origins[rng.uniform_int(num_origins)]
                    : rng.uniform_int(num_spawn);
    int d = rng.uniform_int(num_spawn);
    if (o == d) continue;
    float* xy = &out_xy[static_cast<int64_t>(built) * max_len * 2];
    float* yaw = &out_yaw[static_cast<int64_t>(built) * max_len];
    int32_t* opt = &out_option[static_cast<int64_t>(built) * max_len];
    int n = rp_trace_route(num_lanes, first_wp, last_wp, lane_src, lane_dst,
                           lane_length, succ, succ_off, wp_xy, wp_yaw, wp_lane,
                           lane_left, lane_right, wp_left, wp_right,
                           spawn_wp[o], spawn_wp[d], max_len, xy, yaw, opt);
    if (n < min_waypoints) continue;
    // pad the tail with the final waypoint
    for (int w = n; w < max_len; ++w) {
      xy[2 * w] = xy[2 * (n - 1)];
      xy[2 * w + 1] = xy[2 * (n - 1) + 1];
      yaw[w] = yaw[n - 1];
      opt[w] = opt[n - 1];
    }
    out_len[built] = n;
    out_origin[built] = o;
    ++built;
  }
  // recycle built routes to keep shapes static (mirror of python fallback)
  for (int r = built; r < num_routes && built > 0; ++r) {
    int src = r % built;
    std::memcpy(&out_xy[(int64_t)r * max_len * 2], &out_xy[(int64_t)src * max_len * 2],
                sizeof(float) * max_len * 2);
    std::memcpy(&out_yaw[(int64_t)r * max_len], &out_yaw[(int64_t)src * max_len],
                sizeof(float) * max_len);
    std::memcpy(&out_option[(int64_t)r * max_len], &out_option[(int64_t)src * max_len],
                sizeof(int32_t) * max_len);
    out_len[r] = out_len[src];
    out_origin[r] = out_origin[src];
  }
  return built;
}

}  // extern "C"
