"""Procedural towns: host-side (numpy) generation of road networks.

The reference's towns are UE4 assets streamed from the CARLA server
(`rl/environments/carla/environment.py:257-279` loads them by name, the map
topology is read through `navigation/global_route_planner_dao.py:27-71`).
Here each town is generated procedurally from its name's seed as:

  * a lane graph: directed lane-center polylines densified at ~2 m resolution
    (the DAO's `sampling_resolution`), with successor links across junctions,
  * spawn points along lanes (mirroring `map.get_spawn_points()`),
  * traffic-light cycles per junction,
  * building boxes consumed by the camera rasterizer's above-horizon pass,
  * a semantic texture (uint8 class map) and a distance-to-road field — both
    HOST-ONLY artifacts kept for visualization/verification (tests assert
    against them): the rasterizer classifies pixels analytically from road
    segments and the off-road collision check uses exact segment distance
    (world.py), so neither array is uploaded to the device.

All eight evaluation towns (Town01..Town07, Town10) exist with different
sizes/topologies.  Arrays are padded to a common shape and stacked into a
`TownBank` so the simulation can switch towns on-device by indexing
(`random_towns` support, reference `core/carla_env.py:214-221`).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

LANE_WIDTH = 3.5           # m, CARLA-typical driving lane
SIDEWALK_WIDTH = 2.0       # m
WAYPOINT_RES = 2.0         # m, DAO sampling_resolution equivalent
JUNCTION_RADIUS = 9.0      # m, radius around a node considered "junction"
TEXTURE_RES = 0.5          # m / texel of the semantic map
DISTANCE_RES = 1.0         # m / texel of the distance-to-road field
CELL_RES = 20.0            # m / cell of the nearest-entity lookup tables
CELL_K_SEG = 24            # nearest segments cached per cell (full-quality K)
CELL_K_BLD = 16            # nearest buildings cached per cell
# per-cell PACKED geometry (bank-build-time materialization of the render
# pack's static prefix; must match ops/rasterizer_pallas.py K budgets)
PACK_K_SEG = 12            # render kernel's unrolled segment budget
PACK_K_BLD = 8             # render kernel's unrolled building budget
PACK_K_JUNC = 4            # render kernel's unrolled junction budget
CELL_SEGS_DIM = CELL_K_SEG * 4                              # 96
CELL_GEOM_DIM = PACK_K_SEG * 4 + PACK_K_BLD * 5 + PACK_K_JUNC * 2  # 96

# semantic classes (rasterizer palette indexes)
CLASS_TERRAIN = 0
CLASS_ROAD = 1
CLASS_MARKING = 2
CLASS_SIDEWALK = 3
CLASS_BUILDING = 4
CLASS_CROSSING = 5

MAX_SUCCESSORS = 3

# town name -> (blocks_x, blocks_y, block_size, drop_fraction, speed_limit kmh,
#               lanes_per_direction)
# Town04/Town06 are the reference's multi-lane highway towns (CARLA assets
# with 2+ lane directed roads) — the real generalization axis of the
# 48-scenario protocol; their roads here get two lanes per direction with
# lane-change machinery (reference navigation/route_planner.py:174-219).
TOWN_SPECS = {
    "Town01": (4, 3, 90.0, 0.10, 30.0, 1),
    "Town02": (3, 3, 80.0, 0.05, 30.0, 1),
    "Town03": (5, 4, 100.0, 0.15, 30.0, 1),
    "Town04": (5, 5, 110.0, 0.20, 40.0, 2),
    "Town05": (5, 4, 95.0, 0.12, 30.0, 1),
    "Town06": (6, 3, 105.0, 0.18, 40.0, 2),
    "Town07": (3, 4, 85.0, 0.25, 30.0, 1),
    "Town10": (4, 4, 90.0, 0.08, 30.0, 1),
    "Town10HD": (4, 4, 90.0, 0.08, 30.0, 1),
}


def _seed_from_name(name: str) -> int:
    return int(hashlib.md5(name.encode()).hexdigest()[:8], 16)


@dataclass
class Lane:
    """A directed lane between two junction nodes."""
    src: int
    dst: int
    points: np.ndarray        # (n, 2) dense polyline incl. endpoints
    yaws: np.ndarray          # (n,)
    lane_k: int = 0           # lane index within its direction (0 = innermost)


@dataclass
class TownData:
    name: str
    extent: Tuple[float, float]          # (width, height) in meters, origin at (0,0)
    # dense waypoint arrays over ALL lanes (graph for NPCs / planner)
    wp_xy: np.ndarray                    # (N, 2)
    wp_yaw: np.ndarray                   # (N,)
    wp_is_junction: np.ndarray           # (N,) bool
    wp_speed_limit: np.ndarray           # (N,) km/h
    wp_lane: np.ndarray                  # (N,) lane id
    wp_next: np.ndarray                  # (N, MAX_SUCCESSORS) successor wp index (-1 pad)
    wp_num_next: np.ndarray              # (N,)
    wp_junction_id: np.ndarray           # (N,) id of junction ahead (-1 none); set near lane ends
    wp_dist_to_junction: np.ndarray      # (N,) meters to the junction ahead (inf if none)
    # lane bookkeeping (for the host-side A* planner)
    lane_first_wp: np.ndarray            # (L,)
    lane_last_wp: np.ndarray             # (L,)
    lane_src: np.ndarray                 # (L,)
    lane_dst: np.ndarray                 # (L,)
    lane_length: np.ndarray              # (L,) meters
    lane_successors: List[List[int]]     # per-lane successor lane ids
    # junctions / lights
    junction_xy: np.ndarray              # (J, 2)
    junction_phase: np.ndarray           # (J,) phase offset (s)
    # spawn points
    spawn_xy: np.ndarray                 # (S, 2)
    spawn_yaw: np.ndarray                # (S,)
    spawn_wp: np.ndarray                 # (S,) waypoint index
    # render / collision fields
    texture: np.ndarray                  # (TH, TW) uint8 class map
    texture_origin: np.ndarray           # (2,) world xy of texel (0,0)
    texture_scale: float                 # meters per texel
    dist_field: np.ndarray               # (DH, DW) float16 distance to road centerline
    dist_origin: np.ndarray              # (2,)
    dist_scale: float
    buildings: np.ndarray                # (B, 5) cx, cy, half_w, half_h, height
    edges_xy: np.ndarray = None          # (E, 4) road centerline segments x0,y0,x1,y1
    nodes_xy: np.ndarray = field(default=None)
    # lateral lane adjacency (multi-lane roads; -1 = no neighbor).  "left" is
    # toward the road centerline, "right" toward the curb (right-hand traffic)
    lane_left: np.ndarray = None         # (L,)
    lane_right: np.ndarray = None        # (L,)
    wp_left: np.ndarray = None           # (N,) nearest wp on the left-neighbor lane
    wp_right: np.ndarray = None          # (N,) nearest wp on the right-neighbor lane
    road_half: float = LANE_WIDTH + 0.3  # road band half-width (render/off-road)
    # nearest-entity cell tables (CELL_RES m grid): per cell, the CELL_K_SEG
    # nearest road segments / CELL_K_BLD nearest buildings, ordered by
    # distance from the cell center.  Replaces the renderer's per-frame
    # top_k over all segments with one tiny gather (TPU: gathers are cheap
    # at K=12, top_k over hundreds of entries per world per frame is not).
    seg_cells: np.ndarray = None         # (GH, GW, CELL_K_SEG) int32
    bld_cells: np.ndarray = None         # (GH, GW, CELL_K_BLD) int32


def _build_grid_graph(rng: np.random.Generator, nx: int, ny: int, block: float,
                      drop: float):
    """Grid of nodes with jitter; some interior edges removed for variety."""
    nodes = []
    for j in range(ny + 1):
        for i in range(nx + 1):
            jitter = rng.uniform(-0.12, 0.12, size=2) * block
            # keep the outer ring straight so the town has a clean boundary
            if i in (0, nx):
                jitter[0] = 0.0
            if j in (0, ny):
                jitter[1] = 0.0
            nodes.append([60.0 + i * block + jitter[0], 60.0 + j * block + jitter[1]])
    nodes = np.asarray(nodes)

    def nid(i, j):
        return j * (nx + 1) + i

    edges = []
    for j in range(ny + 1):
        for i in range(nx + 1):
            if i < nx:
                edges.append((nid(i, j), nid(i + 1, j)))
            if j < ny:
                edges.append((nid(i, j), nid(i, j + 1)))

    # drop some interior edges, keeping node degree >= 2
    degree = np.zeros(len(nodes), int)
    for a, b in edges:
        degree[a] += 1
        degree[b] += 1
    keep = []
    order = rng.permutation(len(edges))
    drop_budget = int(drop * len(edges))
    dropped = 0
    is_border = lambda n: (nodes[n][0] in (60.0, 60.0 + nx * block)
                           or nodes[n][1] in (60.0, 60.0 + ny * block))
    drop_set = set()
    for e_idx in order:
        a, b = edges[e_idx]
        if dropped < drop_budget and degree[a] > 2 and degree[b] > 2 \
                and not (is_border(a) and is_border(b)):
            drop_set.add(e_idx)
            degree[a] -= 1
            degree[b] -= 1
            dropped += 1
    keep = [e for k, e in enumerate(edges) if k not in drop_set]
    return nodes, keep


MAX_BOW_FRAC = 0.08   # lateral road bow, fraction of edge length


def _bowed_centerline(p0: np.ndarray, p1: np.ndarray, bow: float,
                      res: float) -> np.ndarray:
    """Quadratic-bezier road centerline with a lateral bow (curved roads:
    straight grid streets make 'drive straight' trivially optimal, which
    erases the trained-vs-untrained gap the evaluation protocol measures)."""
    L = float(np.linalg.norm(p1 - p0))
    fwd = (p1 - p0) / max(L, 1e-9)
    perp = np.array([-fwd[1], fwd[0]])
    mid = (p0 + p1) / 2.0 + perp * bow * L
    n = max(4, int(round(1.1 * L / res)) + 1)
    t = np.linspace(0.0, 1.0, n)[:, None]
    return ((1 - t) ** 2 * p0 + 2 * (1 - t) * t * mid + t ** 2 * p1)


def _offset_trimmed(center: np.ndarray, half: float, trim: float) -> np.ndarray:
    """Offset a centerline to its right by `half`, trimming `trim` meters of
    arclength at both ends (the junction pocket)."""
    deltas = np.diff(center, axis=0)
    seglen = np.linalg.norm(deltas, axis=1)
    arclen = np.concatenate([[0.0], np.cumsum(seglen)])
    total = arclen[-1]
    keep = (arclen >= trim) & (arclen <= total - trim)
    if keep.sum() < 2:
        keep = np.ones(len(center), bool)
    tang = np.vstack([deltas, deltas[-1:]])
    tang = tang / np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-9)
    right = np.stack([tang[:, 1], -tang[:, 0]], axis=1)
    return (center + right * half)[keep]


def _densify(p0: np.ndarray, p1: np.ndarray, res: float) -> np.ndarray:
    d = float(np.linalg.norm(p1 - p0))
    n = max(2, int(round(d / res)) + 1)
    t = np.linspace(0.0, 1.0, n)[:, None]
    return p0[None] * (1 - t) + p1[None] * t


def _bezier(p0, h0, p1, h1, res: float) -> np.ndarray:
    """Cubic bezier from p0 (heading h0) to p1 (heading h1): smooth junction turns."""
    d = float(np.linalg.norm(p1 - p0))
    c0 = p0 + 0.4 * d * np.array([np.cos(h0), np.sin(h0)])
    c1 = p1 - 0.4 * d * np.array([np.cos(h1), np.sin(h1)])
    n = max(3, int(round(1.6 * d / res)) + 1)
    t = np.linspace(0.0, 1.0, n)[:, None]
    pts = ((1 - t) ** 3 * p0 + 3 * (1 - t) ** 2 * t * c0
           + 3 * (1 - t) * t ** 2 * c1 + t ** 3 * p1)
    return pts


def _polyline_yaws(points: np.ndarray) -> np.ndarray:
    deltas = np.diff(points, axis=0)
    yaws = np.arctan2(deltas[:, 1], deltas[:, 0])
    return np.concatenate([yaws, yaws[-1:]])


def build_town(name: str) -> TownData:
    if name not in TOWN_SPECS:
        raise ValueError(f"Unknown town {name!r}; one of {sorted(TOWN_SPECS)}")
    nx, ny, block, drop, speed_limit, lanes_per_dir = TOWN_SPECS[name]
    rng = np.random.default_rng(_seed_from_name(name))
    nodes, edges = _build_grid_graph(rng, nx, ny, block, drop)

    half = LANE_WIDTH / 2.0
    road_half = lanes_per_dir * LANE_WIDTH + 0.3

    # Bowed centerline per undirected edge (curved roads), then lanes_per_dir
    # directed lanes offset to the right of it per direction (right-hand
    # traffic): lane k's center sits at (k + 0.5) * LANE_WIDTH right of the
    # road centerline, k=0 innermost (next to the center marking).
    bows = rng.uniform(-MAX_BOW_FRAC, MAX_BOW_FRAC, size=len(edges))
    centerlines: List[np.ndarray] = []
    lanes: List[Lane] = []
    for e_i, (a, b) in enumerate(edges):
        center = _bowed_centerline(nodes[a], nodes[b], float(bows[e_i]),
                                   WAYPOINT_RES)
        centerlines.append(center)
        for direction in (1, -1):
            c = center if direction == 1 else center[::-1]
            src, dst = (a, b) if direction == 1 else (b, a)
            for k in range(lanes_per_dir):
                pts = _offset_trimmed(c, half + k * LANE_WIDTH,
                                      JUNCTION_RADIUS * 0.8)
                lanes.append(Lane(src=src, dst=dst, points=pts,
                                  yaws=_polyline_yaws(pts), lane_k=k))

    # lateral adjacency within one (edge, direction) group: left = toward the
    # centerline (k-1), right = toward the curb (k+1)
    lat_left: Dict[int, int] = {}
    lat_right: Dict[int, int] = {}
    for li, lane in enumerate(lanes):
        if lane.lane_k > 0:
            lat_left[li] = li - 1
            lat_right[li - 1] = li

    # lane successors: lanes leaving lane.dst, excluding the U-turn back to
    # src; prefer the successor lane with the SAME lane index (no implicit
    # lane change across a junction)
    out_lanes: Dict[int, List[int]] = {}
    for li, lane in enumerate(lanes):
        out_lanes.setdefault(lane.src, []).append(li)
    lane_successors: List[List[int]] = []
    for li, lane in enumerate(lanes):
        outs = [lj for lj in out_lanes.get(lane.dst, []) if lanes[lj].dst != lane.src]
        if not outs:  # dead end: allow the U-turn
            outs = [lj for lj in out_lanes.get(lane.dst, [])]
        same_k = [lj for lj in outs if lanes[lj].lane_k == lane.lane_k]
        outs = same_k if same_k else outs
        lane_successors.append(outs[:MAX_SUCCESSORS])

    # junction connector curves are appended to the SOURCE lane's polyline?
    # No — keep lanes straight; successors jump across the junction and the
    # bezier fills the gap ONLY in planned routes (see route.py). For the NPC
    # graph we add the connector points to the successor hop by inserting
    # short connector lanes.
    connector_of: Dict[Tuple[int, int], int] = {}
    base_lane_count = len(lanes)
    new_successors: List[List[int]] = [list() for _ in range(base_lane_count)]
    for li in range(base_lane_count):
        for lj in lane_successors[li]:
            key = (li, lj)
            if key not in connector_of:
                p0 = lanes[li].points[-1]
                h0 = lanes[li].yaws[-1]
                p1 = lanes[lj].points[0]
                h1 = lanes[lj].yaws[0]
                pts = _bezier(p0, h0, p1, h1, WAYPOINT_RES)[1:-1]
                if len(pts) < 2:
                    pts = _densify(p0, p1, WAYPOINT_RES)[1:-1]
                if len(pts) < 2:
                    pts = np.stack([(p0 + p1) / 2, (p0 * 0.25 + p1 * 0.75)])
                conn = Lane(src=lanes[li].dst, dst=lanes[li].dst,
                            points=pts, yaws=_polyline_yaws(pts))
                connector_of[key] = len(lanes)
                lanes.append(conn)
            new_successors[li].append(connector_of[key])
    # connectors' successors are the real target lanes
    connector_successors = {}
    for (li, lj), ci in connector_of.items():
        connector_successors.setdefault(ci, []).append(lj)
    all_successors = new_successors + [connector_successors[ci]
                                       for ci in range(base_lane_count, len(lanes))]

    # ---- flatten to dense waypoint arrays ----
    wp_xy, wp_yaw, wp_lane = [], [], []
    lane_first, lane_last = [], []
    for li, lane in enumerate(lanes):
        lane_first.append(len(wp_xy))
        wp_xy.extend(lane.points.tolist())
        wp_yaw.extend(lane.yaws.tolist())
        wp_lane.extend([li] * len(lane.points))
        lane_last.append(len(wp_xy) - 1)
    wp_xy = np.asarray(wp_xy, np.float32)
    wp_yaw = np.asarray(wp_yaw, np.float32)
    wp_lane = np.asarray(wp_lane, np.int32)
    n_wp = len(wp_xy)

    wp_next = np.full((n_wp, MAX_SUCCESSORS), -1, np.int32)
    wp_num_next = np.zeros(n_wp, np.int32)
    for li in range(len(lanes)):
        f, l = lane_first[li], lane_last[li]
        # inside a lane: single successor = next waypoint
        idx = np.arange(f, l)
        wp_next[idx, 0] = idx + 1
        wp_num_next[idx] = 1
        # lane end: successors are the first waypoints of successor lanes
        succ = all_successors[li]
        for k, lj in enumerate(succ[:MAX_SUCCESSORS]):
            wp_next[l, k] = lane_first[lj]
        wp_num_next[l] = max(1, min(len(succ), MAX_SUCCESSORS))
        if len(succ) == 0:
            wp_next[l, 0] = l  # absorbing (shouldn't happen)

    # junction flags: near any node
    junction_xy = nodes.astype(np.float32)
    d2 = ((wp_xy[:, None, :] - junction_xy[None, :, :]) ** 2).sum(-1)
    nearest_junction = d2.argmin(1).astype(np.int32)
    wp_is_junction = (d2.min(1) < JUNCTION_RADIUS ** 2)

    # junction ahead + distance (walk each base lane backwards from its end)
    wp_junction_id = np.full(n_wp, -1, np.int32)
    wp_dist_to_junction = np.full(n_wp, np.inf, np.float32)
    for li in range(base_lane_count):
        f, l = lane_first[li], lane_last[li]
        dst_j = lanes[li].dst
        end = wp_xy[l]
        d = np.linalg.norm(wp_xy[f:l + 1] - nodes[dst_j], axis=1)
        wp_junction_id[f:l + 1] = dst_j
        wp_dist_to_junction[f:l + 1] = d

    wp_speed_limit = np.full(n_wp, speed_limit, np.float32)

    # ---- lateral lane adjacency arrays (multi-lane roads) ----
    lane_left_arr = np.full(len(lanes), -1, np.int32)
    lane_right_arr = np.full(len(lanes), -1, np.int32)
    for li, lj in lat_left.items():
        lane_left_arr[li] = lj
    for li, lj in lat_right.items():
        lane_right_arr[li] = lj
    # per-waypoint lateral neighbor: nearest waypoint (by arclength fraction)
    # on the adjacent lane — lets NPCs/expert/ego change lanes on-device
    wp_left = np.full(n_wp, -1, np.int32)
    wp_right = np.full(n_wp, -1, np.int32)

    def _map_lateral(out, li, lj):
        f_i, l_i = lane_first[li], lane_last[li]
        f_j, l_j = lane_first[lj], lane_last[lj]
        n_i, n_j = l_i - f_i + 1, l_j - f_j + 1
        frac = np.linspace(0.0, 1.0, n_i)
        out[f_i:l_i + 1] = f_j + np.round(frac * (n_j - 1)).astype(np.int32)

    for li in range(len(lanes)):
        if lane_left_arr[li] >= 0:
            _map_lateral(wp_left, li, int(lane_left_arr[li]))
        if lane_right_arr[li] >= 0:
            _map_lateral(wp_right, li, int(lane_right_arr[li]))

    # light phase offsets: deterministic per junction
    junction_phase = (rng.uniform(0.0, 1.0, size=len(nodes)) * 24.0).astype(np.float32)

    # ---- spawn points: every ~25 m along base (non-connector) lanes ----
    spawn_xy, spawn_yaw, spawn_wp = [], [], []
    for li in range(base_lane_count):
        f, l = lane_first[li], lane_last[li]
        step = max(1, int(25.0 / WAYPOINT_RES))
        for w in range(f + 2, l - 2, step):
            if not wp_is_junction[w]:
                spawn_xy.append(wp_xy[w])
                spawn_yaw.append(wp_yaw[w])
                spawn_wp.append(w)
    spawn_xy = np.asarray(spawn_xy, np.float32)
    spawn_yaw = np.asarray(spawn_yaw, np.float32)
    spawn_wp = np.asarray(spawn_wp, np.int32)

    # ---- road segments (subdivided bowed centerlines) ----
    seg_list = []
    for center in centerlines:
        step = max(1, int(round(18.0 / WAYPOINT_RES)))
        coarse = center[::step]
        if not np.allclose(coarse[-1], center[-1]):
            coarse = np.vstack([coarse, center[-1]])
        for i in range(len(coarse) - 1):
            seg_list.append([coarse[i][0], coarse[i][1],
                             coarse[i + 1][0], coarse[i + 1][1]])
    segments = np.asarray(seg_list, np.float32)

    # ---- semantic texture + distance field + buildings ----
    width = float(nodes[:, 0].max() + 60.0)
    height = float(nodes[:, 1].max() + 60.0)
    texture, tex_origin = _rasterize_town(nodes, segments, width, height, rng,
                                          road_half=road_half)
    buildings = _make_buildings(rng, nodes, edges, nx, ny, block,
                                road_half=road_half)
    _stamp_buildings(texture, tex_origin, TEXTURE_RES, buildings)

    dist_field, dist_origin = _distance_field(segments, width, height)
    seg_cells = _nearest_cell_table(segments[:, :2], segments[:, 2:],
                                    width, height, CELL_K_SEG)
    bld_cells = _nearest_cell_table(buildings[:, :2], buildings[:, :2],
                                    width, height, CELL_K_BLD)

    return TownData(
        name=name, extent=(width, height),
        wp_xy=wp_xy, wp_yaw=wp_yaw,
        wp_is_junction=wp_is_junction.astype(np.bool_),
        wp_speed_limit=wp_speed_limit, wp_lane=wp_lane,
        wp_next=wp_next, wp_num_next=wp_num_next,
        wp_junction_id=wp_junction_id, wp_dist_to_junction=wp_dist_to_junction,
        lane_first_wp=np.asarray(lane_first, np.int32),
        lane_last_wp=np.asarray(lane_last, np.int32),
        lane_src=np.asarray([ln.src for ln in lanes], np.int32),
        lane_dst=np.asarray([ln.dst for ln in lanes], np.int32),
        lane_length=np.asarray([_polyline_length(ln.points) for ln in lanes], np.float32),
        lane_successors=all_successors,
        junction_xy=junction_xy, junction_phase=junction_phase,
        spawn_xy=spawn_xy, spawn_yaw=spawn_yaw, spawn_wp=spawn_wp,
        texture=texture, texture_origin=tex_origin, texture_scale=TEXTURE_RES,
        dist_field=dist_field, dist_origin=dist_origin, dist_scale=DISTANCE_RES,
        buildings=buildings,
        edges_xy=segments,
        nodes_xy=nodes.astype(np.float32),
        lane_left=lane_left_arr, lane_right=lane_right_arr,
        wp_left=wp_left, wp_right=wp_right,
        road_half=road_half,
        seg_cells=seg_cells, bld_cells=bld_cells,
    )


def _polyline_length(points: np.ndarray) -> float:
    return float(np.linalg.norm(np.diff(points, axis=0), axis=1).sum())


def _rasterize_town(nodes, segments, width, height, rng,
                    road_half=LANE_WIDTH + 0.3):
    th = int(round(height / TEXTURE_RES))
    tw = int(round(width / TEXTURE_RES))
    tex = np.full((th, tw), CLASS_TERRAIN, np.uint8)
    origin = np.zeros(2, np.float32)

    ys, xs = np.mgrid[0:th, 0:tw]
    px = (xs + 0.5) * TEXTURE_RES
    py = (ys + 0.5) * TEXTURE_RES
    pts = np.stack([px.ravel(), py.ravel()], axis=1)

    side_out = road_half + SIDEWALK_WIDTH

    min_d = np.full(len(pts), np.inf, np.float32)
    min_t = np.zeros(len(pts), np.float32)  # distance along nearest segment (for dashes)
    for seg in segments:
        d, t = _point_segment_distance(pts, seg[:2], seg[2:])
        closer = d < min_d
        min_d = np.where(closer, d, min_d)
        min_t = np.where(closer, t, min_t)

    tex_flat = tex.ravel()
    tex_flat[min_d < side_out] = CLASS_SIDEWALK
    tex_flat[min_d < road_half] = CLASS_ROAD
    # center line: dashed yellow-ish marking
    dashed = (np.floor(min_t / 2.0) % 2 == 0)
    tex_flat[(min_d < 0.15) & dashed] = CLASS_MARKING
    # lane-divider dashes on multi-lane roads (between lanes k and k+1)
    if road_half > LANE_WIDTH + 1.0:
        tex_flat[(np.abs(min_d - LANE_WIDTH) < 0.12) & dashed] = CLASS_MARKING
    # outer edge solid markings
    tex_flat[(np.abs(min_d - (road_half - 0.2)) < 0.12)] = CLASS_MARKING
    # pedestrian crossings near junctions
    for n in nodes:
        dn = np.linalg.norm(pts - n, axis=1)
        band = (dn > JUNCTION_RADIUS * 0.85) & (dn < JUNCTION_RADIUS * 0.85 + 2.0) & (min_d < road_half)
        stripes = (np.floor((pts[:, 0] + pts[:, 1]) / 0.6) % 2 == 0)
        tex_flat[band & stripes] = CLASS_CROSSING
    return tex_flat.reshape(th, tw), origin


def _point_segment_distance(pts, p0, p1):
    seg = p1 - p0
    L2 = float(seg @ seg)
    t = np.clip(((pts - p0) @ seg) / max(L2, 1e-9), 0.0, 1.0)
    proj = p0[None] + t[:, None] * seg[None]
    d = np.linalg.norm(pts - proj, axis=1)
    return d.astype(np.float32), (t * np.sqrt(L2)).astype(np.float32)


def _make_buildings(rng, nodes, edges, nx, ny, block,
                    road_half=LANE_WIDTH + 0.3):
    """1-3 rectangular buildings per city block interior (margin accounts
    for the maximum road bow)."""
    buildings = []
    margin = road_half + SIDEWALK_WIDTH + 4.0 + MAX_BOW_FRAC * block
    edge_set = {tuple(sorted(e)) for e in edges}

    def nid(i, j):
        return j * (nx + 1) + i

    for j in range(ny):
        for i in range(nx):
            corners = np.stack([nodes[nid(i, j)], nodes[nid(i + 1, j)],
                                nodes[nid(i + 1, j + 1)], nodes[nid(i, j + 1)]])
            lo = corners.min(0) + margin
            hi = corners.max(0) - margin
            if np.any(hi - lo < 12.0):
                continue
            for _ in range(int(rng.integers(1, 4))):
                cx = rng.uniform(lo[0] + 6, hi[0] - 6)
                cy = rng.uniform(lo[1] + 6, hi[1] - 6)
                hw = rng.uniform(5.0, min(16.0, (hi[0] - lo[0]) / 2.2))
                hh = rng.uniform(5.0, min(16.0, (hi[1] - lo[1]) / 2.2))
                h = rng.uniform(6.0, 22.0)
                buildings.append([cx, cy, hw, hh, h])
    if not buildings:
        buildings = [[-1000.0, -1000.0, 1.0, 1.0, 1.0]]
    return np.asarray(buildings, np.float32)


def _stamp_buildings(tex, origin, scale, buildings):
    th, tw = tex.shape
    for cx, cy, hw, hh, _ in buildings:
        x0 = max(0, int((cx - hw - origin[0]) / scale))
        x1 = min(tw, int((cx + hw - origin[0]) / scale))
        y0 = max(0, int((cy - hh - origin[1]) / scale))
        y1 = min(th, int((cy + hh - origin[1]) / scale))
        tex[y0:y1, x0:x1] = CLASS_BUILDING


def _nearest_cell_table(p0: np.ndarray, p1: np.ndarray, width: float,
                        height: float, k: int) -> np.ndarray:
    """(GH, GW, k) indices of the k nearest segments [p0->p1] (or points,
    when p0 is p1) per CELL_RES cell, ordered by distance from the cell
    center.  Distances are center-based; CELL_RES/sqrt(2) ~ 14 m of slack vs
    the renderer's ego-based exact top_k is visually negligible at K>=12."""
    gh = max(1, int(np.ceil(height / CELL_RES)))
    gw = max(1, int(np.ceil(width / CELL_RES)))
    ys, xs = np.mgrid[0:gh, 0:gw]
    centers = np.stack([(xs.ravel() + 0.5) * CELL_RES,
                        (ys.ravel() + 0.5) * CELL_RES], axis=1)  # (C, 2)
    n = len(p0)
    d = np.empty((len(centers), n), np.float32)
    for i in range(n):
        di, _ = _point_segment_distance(centers, p0[i], p1[i])
        d[:, i] = di
    k_eff = min(k, n)
    idx = np.argsort(d, axis=1)[:, :k_eff]
    if k_eff < k:  # pad by repeating the farthest entry
        idx = np.concatenate([idx, np.repeat(idx[:, -1:], k - k_eff, axis=1)],
                             axis=1)
    return idx.reshape(gh, gw, k).astype(np.int32)


def _distance_field(segments, width, height):
    dh = int(round(height / DISTANCE_RES))
    dw = int(round(width / DISTANCE_RES))
    ys, xs = np.mgrid[0:dh, 0:dw]
    pts = np.stack([(xs.ravel() + 0.5) * DISTANCE_RES,
                    (ys.ravel() + 0.5) * DISTANCE_RES], axis=1)
    min_d = np.full(len(pts), np.inf, np.float32)
    for seg in segments:
        d, _ = _point_segment_distance(pts, seg[:2], seg[2:])
        min_d = np.minimum(min_d, d)
    return min_d.reshape(dh, dw).astype(np.float16), np.zeros(2, np.float32)


# ------------------------------------------------------------------
# Town bank: all towns padded & stacked for on-device town switching
# ------------------------------------------------------------------

_TOWN_CACHE: Dict[str, TownData] = {}


def get_town(name: str) -> TownData:
    if name not in _TOWN_CACHE:
        _TOWN_CACHE[name] = build_town(name)
    return _TOWN_CACHE[name]


@dataclass
class TownBank:
    """Stacked per-town arrays (numpy, converted to jnp by the env)."""
    names: List[str]
    wp_xy: np.ndarray            # (T, Nmax, 2)
    wp_yaw: np.ndarray           # (T, Nmax)
    wp_is_junction: np.ndarray   # (T, Nmax)
    wp_speed_limit: np.ndarray   # (T, Nmax)
    wp_next: np.ndarray          # (T, Nmax, MAX_SUCCESSORS)
    wp_num_next: np.ndarray      # (T, Nmax)
    wp_junction_id: np.ndarray   # (T, Nmax)
    wp_dist_to_junction: np.ndarray  # (T, Nmax)
    wp_left: np.ndarray          # (T, Nmax) lateral neighbor wp (-1 none)
    wp_right: np.ndarray         # (T, Nmax)
    num_wp: np.ndarray           # (T,)
    junction_xy: np.ndarray      # (T, Jmax, 2)
    junction_phase: np.ndarray   # (T, Jmax)
    num_junctions: np.ndarray    # (T,)
    spawn_xy: np.ndarray         # (T, Smax, 2)
    spawn_yaw: np.ndarray        # (T, Smax)
    spawn_wp: np.ndarray         # (T, Smax)
    num_spawn: np.ndarray        # (T,)
    texture: np.ndarray          # (T, TH, TW) uint8
    texture_scale: float
    dist_field: np.ndarray       # (T, DH, DW) float16
    dist_scale: float
    buildings: np.ndarray        # (T, Bmax, 5)
    num_buildings: np.ndarray    # (T,)
    edges_xy: np.ndarray         # (T, Emax, 4) road centerline segments
    num_edges: np.ndarray        # (T,)
    extent: np.ndarray           # (T, 2)
    road_half: np.ndarray        # (T,) road band half-width (meters)
    seg_cells: np.ndarray        # (T, GHmax, GWmax, CELL_K_SEG) int32
    bld_cells: np.ndarray        # (T, GHmax, GWmax, CELL_K_BLD) int32
    # Packed per-cell geometry, materialized at bank build so the per-world
    # per-step device lookups are ONE contiguous row gather instead of a
    # chain of dependent index gathers (TPU gathers run ~1 element/cycle;
    # the dependent two-level form was the measured pack/off-road cost):
    cell_segs: np.ndarray        # (T, GHmax, GWmax, CELL_K_SEG*4) f32 seg endpoints
    cell_geom: np.ndarray        # (T, GHmax, GWmax, CELL_GEOM_DIM) f32 render prefix


def _pad_to(arr: np.ndarray, n: int, fill=0):
    pad = [(0, n - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill)


def _pad_cells(cells: np.ndarray, gh: int, gw: int) -> np.ndarray:
    """Pad a cell table to (gh, gw, K); out-of-extent cells repeat the edge
    cell's entries (ego never reaches them)."""
    out = np.pad(cells, ((0, gh - cells.shape[0]), (0, gw - cells.shape[1]),
                         (0, 0)), mode="edge")
    return out


def build_town_bank(names: List[str]) -> TownBank:
    towns = [get_town(n) for n in names]
    n_wp = max(len(t.wp_xy) for t in towns)
    n_j = max(len(t.junction_xy) for t in towns)
    n_s = max(len(t.spawn_xy) for t in towns)
    n_b = max(len(t.buildings) for t in towns)
    n_e = max(len(t.edges_xy) for t in towns)
    th = max(t.texture.shape[0] for t in towns)
    tw = max(t.texture.shape[1] for t in towns)
    dh = max(t.dist_field.shape[0] for t in towns)
    dw = max(t.dist_field.shape[1] for t in towns)
    gh_m = max(t.seg_cells.shape[0] for t in towns)
    gw_m = max(t.seg_cells.shape[1] for t in towns)

    def pad_tex(t):
        return np.pad(t.texture, ((0, th - t.texture.shape[0]), (0, tw - t.texture.shape[1])))

    def pad_dist(t):
        return np.pad(t.dist_field.astype(np.float32),
                      ((0, dh - t.dist_field.shape[0]), (0, dw - t.dist_field.shape[1])),
                      constant_values=1e4).astype(np.float16)

    seg_cells_s = np.stack([_pad_cells(t.seg_cells, gh_m, gw_m) for t in towns])
    bld_cells_s = np.stack([_pad_cells(t.bld_cells, gh_m, gw_m) for t in towns])
    edges_s = np.stack([_pad_to(t.edges_xy, n_e, 1e6) for t in towns])
    blds_s = np.stack([_pad_to(t.buildings, n_b) for t in towns])
    juncs_s = np.stack([_pad_to(t.junction_xy, n_j) for t in towns])
    cell_segs, cell_geom = _packed_cell_tables(
        towns, seg_cells_s, bld_cells_s, edges_s, blds_s, juncs_s)

    return TownBank(
        names=list(names),
        wp_xy=np.stack([_pad_to(t.wp_xy, n_wp) for t in towns]),
        wp_yaw=np.stack([_pad_to(t.wp_yaw, n_wp) for t in towns]),
        wp_is_junction=np.stack([_pad_to(t.wp_is_junction, n_wp) for t in towns]),
        wp_speed_limit=np.stack([_pad_to(t.wp_speed_limit, n_wp, 30.0) for t in towns]),
        wp_next=np.stack([_pad_to(t.wp_next, n_wp, -1) for t in towns]),
        wp_num_next=np.stack([_pad_to(t.wp_num_next, n_wp) for t in towns]),
        wp_junction_id=np.stack([_pad_to(t.wp_junction_id, n_wp, -1) for t in towns]),
        wp_dist_to_junction=np.stack([_pad_to(t.wp_dist_to_junction, n_wp, 1e9) for t in towns]),
        wp_left=np.stack([_pad_to(t.wp_left, n_wp, -1) for t in towns]),
        wp_right=np.stack([_pad_to(t.wp_right, n_wp, -1) for t in towns]),
        num_wp=np.asarray([len(t.wp_xy) for t in towns], np.int32),
        junction_xy=juncs_s,
        junction_phase=np.stack([_pad_to(t.junction_phase, n_j) for t in towns]),
        num_junctions=np.asarray([len(t.junction_xy) for t in towns], np.int32),
        spawn_xy=np.stack([_pad_to(t.spawn_xy, n_s) for t in towns]),
        spawn_yaw=np.stack([_pad_to(t.spawn_yaw, n_s) for t in towns]),
        spawn_wp=np.stack([_pad_to(t.spawn_wp, n_s) for t in towns]),
        num_spawn=np.asarray([len(t.spawn_xy) for t in towns], np.int32),
        texture=np.stack([pad_tex(t) for t in towns]),
        texture_scale=TEXTURE_RES,
        dist_field=np.stack([pad_dist(t) for t in towns]),
        dist_scale=DISTANCE_RES,
        buildings=blds_s,
        num_buildings=np.asarray([len(t.buildings) for t in towns], np.int32),
        edges_xy=edges_s,
        num_edges=np.asarray([len(t.edges_xy) for t in towns], np.int32),
        extent=np.asarray([t.extent for t in towns], np.float32),
        road_half=np.asarray([t.road_half for t in towns], np.float32),
        seg_cells=seg_cells_s,
        bld_cells=bld_cells_s,
        cell_segs=cell_segs,
        cell_geom=cell_geom,
    )


def _packed_cell_tables(towns, seg_cells_s, bld_cells_s, edges_s, blds_s,
                        juncs_s):
    """Materialize the per-cell packed geometry tables from the STACKED bank
    arrays (so padded cells/indices reproduce exactly what the on-device
    dependent gathers used to produce — edge-padded cell entries included).

    cell_segs: the CELL_K_SEG candidate segments' endpoints per cell —
      consumed by world._off_road_distance every physics step.
    cell_geom: the render pack's static prefix (PACK_K_SEG segments +
      PACK_K_BLD buildings + PACK_K_JUNC junctions) per cell — consumed by
      rasterizer_pallas.pack_geometry_banked.  NOTE deviation: junctions are
      the nearest-PACK_K_JUNC by CELL CENTER (same approximation class as
      the seg/bld cell tables, CELL_RES/sqrt(2) ~ 14 m slack) where the old
      per-world pack ranked them by ego position; the min-distance junction
      — the only quantity the kernel's crossing band depends on — is in the
      top-4-by-center whenever junction spacing exceeds the cell slack
      (pinned by tests/test_rasterizer.py)."""
    gh_m, gw_m = seg_cells_s.shape[1], seg_cells_s.shape[2]
    ys, xs = np.mgrid[0:gh_m, 0:gw_m]
    centers = np.stack([(xs + 0.5) * CELL_RES, (ys + 0.5) * CELL_RES],
                       axis=-1).astype(np.float32)          # (GH, GW, 2)
    cell_segs, cell_geom = [], []
    for i, t in enumerate(towns):
        segs_all = edges_s[i][seg_cells_s[i]]               # (GH, GW, Kseg, 4)
        cell_segs.append(segs_all.reshape(gh_m, gw_m, -1))
        segs12 = segs_all[..., :PACK_K_SEG, :]
        bidx = bld_cells_s[i][..., :PACK_K_BLD]
        b_ok = bidx < len(t.buildings)                      # always true per-town
        blds8 = blds_s[i][bidx] * b_ok[..., None]           # (GH, GW, Kbld, 5)
        n_j = juncs_s[i].shape[0]
        dj = np.linalg.norm(juncs_s[i][None, None] - centers[:, :, None],
                            axis=-1)                        # (GH, GW, Jmax)
        dj = np.where(np.arange(n_j)[None, None] < len(t.junction_xy), dj, 1e9)
        j4 = np.argsort(dj, axis=-1, kind="stable")[..., :PACK_K_JUNC]
        juncs4 = juncs_s[i][j4]                             # (GH, GW, 4, 2)
        cell_geom.append(np.concatenate([
            segs12.reshape(gh_m, gw_m, -1),
            blds8.reshape(gh_m, gw_m, -1),
            juncs4.reshape(gh_m, gw_m, -1)], axis=-1))
    return (np.stack(cell_segs).astype(np.float32),
            np.stack(cell_geom).astype(np.float32))
