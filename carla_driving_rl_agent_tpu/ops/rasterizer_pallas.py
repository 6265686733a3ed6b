"""Pallas TPU kernel for the three-camera renderer.

The XLA version (ops/rasterizer.py) is the semantics reference; this kernel
is the speed-of-light path.  Key idea: ALL pixels of all three views are
flattened into one (64, 128) = 8192-slot register tile (3 views x 45 x 60 =
8100 pixels at half resolution) — a perfect VPU tile, vs the (45, 60) arrays
XLA tiles at <50% lane utilization.  Per-pixel camera rays (with the per-view
yaw offsets pre-applied) live in a constant LUT; per-world geometry (nearest
road segments / buildings / junctions / actors, ego pose, weather) is packed
into one small SMEM block.  All K-loops are unrolled into straight-line VPU
code over the tile; the only HBM traffic is the LUT read and the final RGB
write.

Used when CARLAEnvConfig.render_mode == 'pallas'; numerically it matches the
'fast'-quality XLA renderer (same geometry terms, same shading).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from carla_driving_rl_agent_tpu.ops import rasterizer as R

# fast-quality geometry budgets
K_EDGES = 12
K_BUILDINGS = 8
K_ACTORS = 8          # vehicles + pedestrians combined
VIEW_H, VIEW_W = 45, 60
N_PIX = 3 * VIEW_H * VIEW_W            # 8100
TILE = (64, 128)                        # 8192 slots
CAMERA_HEIGHT = R.CAMERA_HEIGHT
FOV = R.FOV_DEG
FX = (VIEW_W / 2.0) / np.tan(np.deg2rad(FOV) / 2.0)

# geom packing offsets (per world, float32)
_O_SEGS = 0
_O_BLD = _O_SEGS + K_EDGES * 4          # 48
_O_JUNC = _O_BLD + K_BUILDINGS * 5      # 48 + 40 = 88
_O_ACT = _O_JUNC + 4 * 2                # 96
_O_EGO = _O_ACT + K_ACTORS * 8          # 96 + 64 = 160
_O_WEATHER = _O_EGO + 4                 # ex, ey, cos_yaw, sin_yaw
_O_ROADHALF = _O_WEATHER + 5            # 169: per-town road band half-width
GEOM_SIZE = _O_ROADHALF + 1             # 170
GEOM_PAD = 176                          # pad to a multiple of 8

# the bank-build packed prefix (envs/town.cell_geom) must cover exactly the
# static [segs|blds|juncs] head of this layout
from carla_driving_rl_agent_tpu.envs import town as _town  # noqa: E402

assert _town.PACK_K_SEG == K_EDGES and _town.PACK_K_BLD == K_BUILDINGS
assert _town.CELL_GEOM_DIM == _O_ACT, (_town.CELL_GEOM_DIM, _O_ACT)


def _build_lut() -> dict:
    """Constant per-pixel tables: view-offset-rotated camera rays + pixel
    (u, v) coordinates + view id, flattened to the (64, 128) tile."""
    u = np.arange(VIEW_W, dtype=np.float32) - (VIEW_W - 1) / 2.0
    v = np.arange(VIEW_H, dtype=np.float32) - (VIEW_H - 1) / 2.0
    dy = -u / FX                     # left positive
    dz = -v / FX                     # up positive
    dy = np.broadcast_to(dy[None, :], (VIEW_H, VIEW_W))
    dz = np.broadcast_to(dz[:, None], (VIEW_H, VIEW_W))
    dx = np.ones((VIEW_H, VIEW_W), np.float32)
    norm = np.sqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx / norm, dy / norm, dz / norm

    luts = dict(dx=[], dy=[], dz=[], u=[], v=[], vid=[])
    for vid, off in enumerate(np.asarray(R.CAMERA_YAWS, np.float32)):
        c, s = np.cos(off), np.sin(off)
        luts["dx"].append(dx * c - dy * s)
        luts["dy"].append(dx * s + dy * c)
        luts["dz"].append(dz + 0.0)
        luts["u"].append(np.broadcast_to(
            np.arange(VIEW_W, dtype=np.float32)[None, :], (VIEW_H, VIEW_W)))
        luts["v"].append(np.broadcast_to(
            np.arange(VIEW_H, dtype=np.float32)[:, None], (VIEW_H, VIEW_W)))
        luts["vid"].append(np.full((VIEW_H, VIEW_W), vid, np.float32))

    out = {}
    for k, planes in luts.items():
        flat = np.concatenate([p.ravel() for p in planes])
        flat = np.pad(flat, (0, TILE[0] * TILE[1] - flat.size),
                      constant_values=(-1.0 if k == "vid" else 0.0))
        out[k] = flat.reshape(TILE)  # numpy: safe to cache across traces
    return out


@functools.lru_cache(maxsize=1)
def _lut_cached():
    return _build_lut()


def _render_kernel(geom_ref, dx_ref, dy_ref, dz_ref, u_ref, v_ref, vid_ref,
                   out_ref, *, n_actors: int = K_ACTORS,
                   with_depth: bool = True, g_block: int = 1):
    """Render `g_block` worlds per grid step (unrolled).  g_block=1 is the
    vmap path (one world per grid step, ~0.5-1 us launch overhead per
    world); the grid path (render_tiles_grid) amortizes that fixed cost
    over g_block worlds per step."""
    for j in range(g_block):
        _render_world(j, geom_ref, dx_ref, dy_ref, dz_ref, u_ref, v_ref,
                      vid_ref, out_ref, n_actors=n_actors,
                      with_depth=with_depth)


def _render_world(j, geom_ref, dx_ref, dy_ref, dz_ref, u_ref, v_ref, vid_ref,
                  out_ref, *, n_actors: int = K_ACTORS,
                  with_depth: bool = True):
    g = lambda i: geom_ref[j, i]

    ex, ey = g(_O_EGO), g(_O_EGO + 1)
    cos_y, sin_y = g(_O_EGO + 2), g(_O_EGO + 3)
    w_sun, w_cld = g(_O_WEATHER), g(_O_WEATHER + 1)
    w_rain, w_wet, w_fog = g(_O_WEATHER + 2), g(_O_WEATHER + 3), g(_O_WEATHER + 4)
    rh = g(_O_ROADHALF)

    # rotate the LUT rays by the ego yaw
    dxc, dyc, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    dx = dxc * cos_y - dyc * sin_y
    dy = dxc * sin_y + dyc * cos_y

    # ---- ground intersection ----
    below = dz < -1e-4
    t_g = jnp.where(below, -CAMERA_HEIGHT / jnp.where(below, dz, -1.0), 1e6)
    t_g = jnp.minimum(t_g, R.MAX_DEPTH)
    gx = ex + t_g * dx
    gy = ey + t_g * dy

    # ---- min distance to K road segments (unrolled) ----
    d2 = jnp.full(TILE, 1e12)
    t_at = jnp.zeros(TILE)
    for k in range(K_EDGES):
        x0 = g(_O_SEGS + 4 * k)
        y0 = g(_O_SEGS + 4 * k + 1)
        x1 = g(_O_SEGS + 4 * k + 2)
        y1 = g(_O_SEGS + 4 * k + 3)
        sx, sy = x1 - x0, y1 - y0
        L2 = jnp.maximum(sx * sx + sy * sy, 1e-9)
        rx, ry = gx - x0, gy - y0
        t = jnp.clip((rx * sx + ry * sy) / L2, 0.0, 1.0)
        ddx, ddy = rx - t * sx, ry - t * sy
        d = ddx * ddx + ddy * ddy
        closer = d < d2
        t_at = jnp.where(closer, t * jnp.sqrt(L2), t_at)
        d2 = jnp.where(closer, d, d2)
    d_road = jnp.sqrt(d2)

    dashed = jnp.floor(t_at / 2.0) % 2 == 0
    lane_div = (rh > R.LANE_W + 1.0) & (jnp.abs(d_road - R.LANE_W) < 0.12) & dashed
    marking = (((d_road < 0.15) & dashed)
               | (jnp.abs(d_road - (rh - 0.2)) < 0.12) | lane_div)
    on_road = d_road < rh
    sidewalk = (d_road >= rh) & (d_road < rh + 2.0)

    # ---- crossings near junctions ----
    dj2 = jnp.full(TILE, 1e12)
    for k in range(4):
        jx = g(_O_JUNC + 2 * k)
        jy = g(_O_JUNC + 2 * k + 1)
        dj2 = jnp.minimum(dj2, (gx - jx) ** 2 + (gy - jy) ** 2)
    d_j = jnp.sqrt(dj2)
    band = (d_j > R.JUNCTION_RADIUS * 0.85) & (d_j < R.JUNCTION_RADIUS * 0.85 + 2.0)
    stripes = jnp.floor((gx + gy) / 0.6) % 2 == 0
    crossing = band & stripes & on_road

    def pick(c, m, r_, g_, b_):
        return (jnp.where(m, c[0], r_), jnp.where(m, c[1], g_),
                jnp.where(m, c[2], b_))

    r_, g_, b_ = (jnp.full(TILE, 96.0), jnp.full(TILE, 128.0), jnp.full(TILE, 72.0))
    r_, g_, b_ = pick((158.0, 152.0, 148.0), sidewalk, r_, g_, b_)
    r_, g_, b_ = pick((88.0, 88.0, 94.0), on_road, r_, g_, b_)
    r_, g_, b_ = pick((228.0, 228.0, 218.0), marking, r_, g_, b_)
    r_, g_, b_ = pick((200.0, 200.0, 200.0), crossing, r_, g_, b_)

    # ---- buildings: exact ray/box with height ----
    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < 1e-6, 1e-6, dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < 1e-6, 1e-6, dy)
    t_b = jnp.full(TILE, 1e6)
    for k in range(K_BUILDINGS):
        cx = g(_O_BLD + 5 * k)
        cy = g(_O_BLD + 5 * k + 1)
        hw = g(_O_BLD + 5 * k + 2)
        hh = g(_O_BLD + 5 * k + 3)
        bh = g(_O_BLD + 5 * k + 4)
        tx0 = (cx - hw - ex) * inv_dx
        tx1 = (cx + hw - ex) * inv_dx
        ty0 = (cy - hh - ey) * inv_dy
        ty1 = (cy + hh - ey) * inv_dy
        t_near = jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1))
        t_far = jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1))
        z = CAMERA_HEIGHT + t_near * dz
        hit = (t_near > 0.5) & (t_near <= t_far) & (z > 0.0) & (z < bh)
        t_b = jnp.minimum(t_b, jnp.where(hit, t_near, 1e6))

    # compose ground / building / sky
    sky_r = (135.0 * (1 - w_sun) + 240.0 * w_sun) * (1 - w_cld) + 150.0 * w_cld
    sky_g = (190.0 * (1 - w_sun) + 160.0 * w_sun) * (1 - w_cld) + 152.0 * w_cld
    sky_b = (235.0 * (1 - w_sun) + 110.0 * w_sun) * (1 - w_cld) + 158.0 * w_cld
    sky_r, sky_g, sky_b = (sky_r * (1 - 0.25 * w_rain), sky_g * (1 - 0.25 * w_rain),
                           sky_b * (1 - 0.25 * w_rain))

    tg_ok = below & (t_g < R.MAX_DEPTH)
    t_gm = jnp.where(tg_ok, t_g, 1e6)
    use_b = t_b < t_gm
    depth = jnp.minimum(t_gm, t_b)
    shade = 1.0 - 0.5 * jnp.clip(t_b / 150.0, 0.0, 1.0)
    r_ = jnp.where(use_b, 122.0 * shade, jnp.where(tg_ok, r_, sky_r))
    g_ = jnp.where(use_b, 102.0 * shade, jnp.where(tg_ok, g_, sky_g))
    b_ = jnp.where(use_b, 96.0 * shade, jnp.where(tg_ok, b_, sky_b))
    road_px = tg_ok & (on_road | marking | crossing) & ~use_b

    # ---- actors (billboards, view-dependent projection) ----
    # n_actors is the static count of slots that can ever be active for this
    # env config (min(4, v_max) + min(4, p_max)); slots beyond it are zero
    # rows in the geometry pack, so skipping them is exact (the stage-s1 /
    # bench config drops 6 of 8 unrolled slots, ~30% of kernel ops)
    uu, vv, vid = u_ref[:], v_ref[:], vid_ref[:]
    for k in range(n_actors):
        ax = g(_O_ACT + 8 * k)
        ay = g(_O_ACT + 8 * k + 1)
        ok = g(_O_ACT + 8 * k + 2)
        hwid = g(_O_ACT + 8 * k + 3)
        htop = g(_O_ACT + 8 * k + 4)
        car, cag, cab = (g(_O_ACT + 8 * k + 5), g(_O_ACT + 8 * k + 6),
                         g(_O_ACT + 8 * k + 7))
        rx, ry = ax - ex, ay - ey
        # ego-frame coords
        fx0 = rx * cos_y + ry * sin_y
        fy0 = -rx * sin_y + ry * cos_y
        # rotate into each view frame; select per pixel by view id
        cxs, cys = [], []
        for off in np.asarray(R.CAMERA_YAWS, np.float32):
            co, so = np.cos(off), np.sin(off)
            cxs.append(fx0 * co + fy0 * so)
            cys.append(-fx0 * so + fy0 * co)
        cx = jnp.where(vid == 0.0, cxs[0], jnp.where(vid == 1.0, cxs[1], cxs[2]))
        cy = jnp.where(vid == 0.0, cys[0], jnp.where(vid == 1.0, cys[1], cys[2]))
        denom = jnp.maximum(cx, 0.1)
        u_c = (-cy / denom) * FX + (VIEW_W - 1) / 2.0
        half_u = (hwid / denom) * FX
        v_bot = (CAMERA_HEIGHT / denom) * FX + (VIEW_H - 1) / 2.0
        v_top = ((CAMERA_HEIGHT - htop) / denom) * FX + (VIEW_H - 1) / 2.0
        cover = ((jnp.abs(uu - u_c) < half_u) & (vv >= v_top) & (vv <= v_bot)
                 & (cx > 0.8) & (ok > 0.5) & (vid >= 0.0))
        visible = cover & (cx < depth)
        r_ = jnp.where(visible, car, r_)
        g_ = jnp.where(visible, cag, g_)
        b_ = jnp.where(visible, cab, b_)
        depth = jnp.where(visible, cx, depth)

    # ---- weather shading ----
    light = 1.0 - 0.35 * w_cld - 0.15 * w_rain
    r_ = r_ * light * (1.0 + 0.25 * w_sun)
    g_ = g_ * light
    b_ = b_ * light * (1.0 - 0.2 * w_sun)
    wet_mix = 0.12 * w_wet
    r_ = jnp.where(road_px, r_ * (1.0 - 0.35 * w_wet) + sky_r * wet_mix, r_)
    g_ = jnp.where(road_px, g_ * (1.0 - 0.35 * w_wet) + sky_g * wet_mix, g_)
    b_ = jnp.where(road_px, b_ * (1.0 - 0.35 * w_wet) + sky_b * wet_mix, b_)
    fog_f = 1.0 - jnp.exp(-depth * (0.002 + 0.05 * w_fog))
    r_ = r_ * (1 - fog_f) + sky_r * fog_f
    g_ = g_ * (1 - fog_f) + sky_g * fog_f
    b_ = b_ * (1 - fog_f) + sky_b * fog_f

    # quantize to uint8 IN the kernel: the epilogue (tile_to_planes /
    # tile_to_image) previously cast outside, so the kernel's (B, C, 64,
    # 128) f32 planes round-tripped HBM at 4x the bytes for nothing —
    # clip+cast here is bitwise-identical (same truncation) and cuts the
    # kernel write + epilogue read traffic 4x (round-4 bench_parts:
    # rend_tile 6.4 ms/chunk)
    # Mosaic has no direct f32->u8 cast; f32->i32->u8 lowers and is the
    # same truncation for clipped [0, 255] values
    def q(v):
        return v.astype(jnp.int32).astype(out_ref.dtype)

    out_ref[j, 0] = q(jnp.clip(r_, 0.0, 255.0))
    out_ref[j, 1] = q(jnp.clip(g_, 0.0, 255.0))
    out_ref[j, 2] = q(jnp.clip(b_, 0.0, 255.0))
    if with_depth:
        # log-depth plane (rasterizer.depth_to_u8 encoding); the front-view
        # masking to mirror the reference's single depth camera happens in
        # tile_to_image
        d_m = jnp.minimum(depth, R.MAX_DEPTH)
        out_ref[j, 3] = q(jnp.log1p(d_m)
                          * np.float32(255.0 / np.log1p(R.MAX_DEPTH)))


def pack_geometry(inputs: R.RenderInputs) -> jax.Array:
    """Per-world geometry pack (GEOM_PAD,) from RenderInputs (single world)."""
    segs_idx = R._nearest_k(
        0.5 * (inputs.edges_xy[:, :2] + inputs.edges_xy[:, 2:]), inputs.ego_xy,
        jnp.arange(inputs.edges_xy.shape[0]) < inputs.num_edges, K_EDGES)
    segs = inputs.edges_xy[segs_idx]
    n = segs.shape[0]
    if n < K_EDGES:  # pad with far-away segments
        segs = jnp.concatenate(
            [segs, jnp.full((K_EDGES - n, 4), 1e6)], axis=0)

    b_idx = R._nearest_k(inputs.buildings[:, :2], inputs.ego_xy,
                         inputs.buildings[:, 4] > 0.5, K_BUILDINGS)
    blds = inputs.buildings[b_idx]
    if blds.shape[0] < K_BUILDINGS:
        blds = jnp.concatenate(
            [blds, jnp.zeros((K_BUILDINGS - blds.shape[0], 5))], axis=0)

    j_idx = R._nearest_k(inputs.junctions, inputs.ego_xy,
                         jnp.arange(inputs.junctions.shape[0]) < inputs.num_junctions, 4)
    juncs = inputs.junctions[j_idx]

    kv = K_ACTORS // 2
    v_idx = R._nearest_k(inputs.veh_xy, inputs.ego_xy, inputs.veh_active > 0,
                         min(kv, inputs.veh_xy.shape[0]))
    p_idx = R._nearest_k(inputs.ped_xy, inputs.ego_xy, inputs.ped_active > 0,
                         min(kv, inputs.ped_xy.shape[0]))
    veh_colors = jnp.asarray([[180, 30, 30], [30, 60, 180], [220, 220, 220],
                              [40, 40, 40], [200, 170, 40], [90, 140, 190]],
                             jnp.float32)

    def actor_rows(xy, idx, ok, hw, ht, colors):
        k = idx.shape[0]
        return jnp.concatenate([
            xy[idx], ok[idx][:, None],
            jnp.full((k, 1), hw), jnp.full((k, 1), ht), colors], axis=-1)

    v_rows = actor_rows(inputs.veh_xy, v_idx, inputs.veh_active, 1.0, 1.6,
                        veh_colors[v_idx % 6])
    p_rows = actor_rows(inputs.ped_xy, p_idx, inputs.ped_active, 0.3, 1.8,
                        jnp.tile(jnp.asarray([[190., 120., 90.]]), (p_idx.shape[0], 1)))
    actors = jnp.concatenate([v_rows, p_rows], axis=0)
    if actors.shape[0] < K_ACTORS:
        actors = jnp.concatenate(
            [actors, jnp.zeros((K_ACTORS - actors.shape[0], 8))], axis=0)

    geom = jnp.concatenate([
        segs.reshape(-1), blds.reshape(-1), juncs.reshape(-1),
        actors.reshape(-1),
        jnp.stack([inputs.ego_xy[0], inputs.ego_xy[1],
                   jnp.cos(inputs.ego_yaw), jnp.sin(inputs.ego_yaw)]),
        inputs.weather,
        jnp.reshape(inputs.road_half, (1,)).astype(jnp.float32),
    ])
    return jnp.pad(geom, (0, GEOM_PAD - geom.shape[0])).astype(jnp.float32)


def pack_geometry_banked(town, world, weather: jax.Array,
                         n_actors: int = K_ACTORS) -> jax.Array:
    """Geometry pack straight from the stacked town bank (TownDev) + world
    state.  The whole STATIC prefix of the pack (nearest segments, buildings
    and junctions) is materialized per CELL_RES cell at bank build
    (town.cell_geom, envs/town._packed_cell_tables), so the per-world cost
    here is ONE contiguous 96-float row gather + the dynamic tail (actors,
    ego pose, weather) — replacing the old chain of dependent index gathers
    and a per-world junction top-k (the measured pack cost, round-4
    bench_parts rend_pack split).  Junctions are ranked by cell center
    rather than ego position — see _packed_cell_tables for why that is
    exact for the kernel's crossing band."""
    from carla_driving_rl_agent_tpu.envs.town import CELL_RES
    from carla_driving_rl_agent_tpu.envs.dynamics import tgather

    tid = world.town_id
    ego_xy = jnp.stack([world.x, world.y])
    gh, gw = town.cell_geom.shape[1], town.cell_geom.shape[2]
    cx = jnp.clip((world.x / CELL_RES).astype(jnp.int32), 0, gw - 1)
    cy = jnp.clip((world.y / CELL_RES).astype(jnp.int32), 0, gh - 1)
    static_prefix = tgather(town.cell_geom, tid, cy, cx)     # (96,) one gather

    npc = world.npc
    if n_actors == 0:
        # zero-NPC configs (bench, stage-s1): no slot can ever activate, the
        # kernel statically skips the actor loop, and the whole actor block
        # of the pack is a constant — skip the per-world nearest-k/row build
        actors = jnp.zeros((K_ACTORS, 8))
        return _assemble_geom(static_prefix, actors, ego_xy, world, weather,
                              town, tid)
    kv = K_ACTORS // 2
    v_idx = R._nearest_k(npc.veh_xy, ego_xy, npc.veh_active > 0,
                         min(kv, npc.veh_xy.shape[0]))
    p_idx = R._nearest_k(npc.ped_xy, ego_xy, npc.ped_active > 0,
                         min(kv, npc.ped_xy.shape[0]))
    veh_colors = jnp.asarray([[180, 30, 30], [30, 60, 180], [220, 220, 220],
                              [40, 40, 40], [200, 170, 40], [90, 140, 190]],
                             jnp.float32)

    def actor_rows(xy, idx, ok, hw, ht, colors):
        k = idx.shape[0]
        return jnp.concatenate([
            xy[idx], ok[idx][:, None],
            jnp.full((k, 1), hw), jnp.full((k, 1), ht), colors], axis=-1)

    v_rows = actor_rows(npc.veh_xy, v_idx, npc.veh_active, 1.0, 1.6,
                        veh_colors[v_idx % 6])
    p_rows = actor_rows(npc.ped_xy, p_idx, npc.ped_active, 0.3, 1.8,
                        jnp.tile(jnp.asarray([[190., 120., 90.]]),
                                 (p_idx.shape[0], 1)))
    actors = jnp.concatenate([v_rows, p_rows], axis=0)
    if actors.shape[0] < K_ACTORS:
        actors = jnp.concatenate(
            [actors, jnp.zeros((K_ACTORS - actors.shape[0], 8))], axis=0)

    return _assemble_geom(static_prefix, actors, ego_xy, world, weather,
                          town, tid)


def _assemble_geom(static_prefix, actors, ego_xy, world, weather, town, tid):
    from carla_driving_rl_agent_tpu.envs.dynamics import tgather
    geom = jnp.concatenate([
        static_prefix.reshape(-1),        # segs(48) + blds(40) + juncs(8)
        actors.reshape(-1),
        jnp.stack([ego_xy[0], ego_xy[1],
                   jnp.cos(world.yaw), jnp.sin(world.yaw)]),
        weather,
        jnp.reshape(tgather(town.road_half, tid), (1,)).astype(jnp.float32),
    ])
    return jnp.pad(geom, (0, GEOM_PAD - geom.shape[0])).astype(jnp.float32)


def render_tile(geom: jax.Array, interpret: bool = False,
                n_actors: int = K_ACTORS,
                with_depth: bool = True) -> jax.Array:
    """Run the kernel for one world -> (C, 64, 128) float32 planes
    (RGB + optional log-depth; C = 4 or 3)."""
    lut = {k: jnp.asarray(v) for k, v in _lut_cached().items()}
    n_planes = 4 if with_depth else 3
    return pl.pallas_call(
        functools.partial(_render_kernel, n_actors=n_actors,
                          with_depth=with_depth),
        out_shape=jax.ShapeDtypeStruct((1, n_planes) + TILE, jnp.uint8),
        in_specs=[
            pl.BlockSpec((1, GEOM_PAD), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_planes) + TILE, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(geom[None], lut["dx"], lut["dy"], lut["dz"], lut["u"], lut["v"],
      lut["vid"])[0]


def render_tiles_grid(geoms: jax.Array, g_block: int = 8,
                      interpret: bool = False, n_actors: int = K_ACTORS,
                      with_depth: bool = True) -> jax.Array:
    """Batch render: (B, GEOM_PAD) geometry packs -> (B, C, 64, 128) planes
    with `g_block` worlds rendered per Pallas grid step.

    vmap over render_tile runs one world per grid step and pays the
    ~0.5-1 us per-step launch overhead B times (~20% of kernel time at the
    1024-world bench); this entry point unrolls g_block worlds into one
    grid step, amortizing the fixed cost g_block-fold.  Numerically
    identical to the vmap path (same kernel body per world)."""
    B = geoms.shape[0]
    assert B % g_block == 0, (B, g_block)
    lut = {k: jnp.asarray(v) for k, v in _lut_cached().items()}
    n_planes = 4 if with_depth else 3
    lut_spec = pl.BlockSpec(TILE, lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_render_kernel, n_actors=n_actors,
                          with_depth=with_depth, g_block=g_block),
        grid=(B // g_block,),
        out_shape=jax.ShapeDtypeStruct((B, n_planes) + TILE, jnp.uint8),
        in_specs=[
            pl.BlockSpec((g_block, GEOM_PAD), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            lut_spec, lut_spec, lut_spec, lut_spec, lut_spec, lut_spec,
        ],
        out_specs=pl.BlockSpec((g_block, n_planes) + TILE,
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(geoms, lut["dx"], lut["dy"], lut["dz"], lut["u"], lut["v"],
      lut["vid"])


def tile_to_image(planes: jax.Array, out_h: int = 90, out_w: int = 120,
                  with_depth: bool = False) -> jax.Array:
    """(C, 64, 128) planes -> (out_h, 3*out_w, C) uint8 (2x nearest upsample).

    Uses repeats + one transpose instead of jax.image.resize (a gather) —
    measured 4x faster at batch.  With with_depth, the 4th (log-depth) plane
    is kept for the FRONT view only (side views zeroed), matching the
    reference's single front depth camera (core/carla_env.py:285-287)."""
    c = 4 if with_depth else 3
    flat = planes[:c].reshape(c, TILE[0] * TILE[1])[:, :N_PIX]
    img = flat.reshape(c, 3, VIEW_H, VIEW_W)           # (chan, view, h, w)
    if with_depth:
        view_keep = jnp.asarray([0, 1, 0], img.dtype)  # front view only
        img = img.at[3].mul(view_keep[:, None, None])
    img = jnp.transpose(img, (2, 1, 3, 0))             # (h, view, w, chan)
    img = img.reshape(VIEW_H, 3 * VIEW_W, c)
    # cast BEFORE the upsample (no-op for the uint8 kernel planes; exact
    # truncation parity for the f32 test inputs): repeat(cast(x)) ==
    # cast(repeat(x)), so quantizing first cuts the repeat's HBM traffic 4x
    img = img.astype(jnp.uint8)
    ry = out_h // VIEW_H
    rx = out_w // VIEW_W
    if ry > 1:
        img = jnp.repeat(img, ry, axis=0)
    if rx > 1:
        img = jnp.repeat(img, rx, axis=1)
    return img


def tile_to_planes(planes: jax.Array, with_depth: bool = False) -> jax.Array:
    """(C, 64, 128) kernel planes -> (C, VIEW_H, 3*VIEW_W) uint8 HALF-RES
    planar storage (the three views side by side, NO upsample).

    This is the storage form of the env's frame stacks: rolling uint8
    half-res planes through EnvState costs 4x less HBM traffic than the
    full-res (H, 3W, C) image, and the 2x nearest upsample + channel
    interleave is deferred to CARLAEnv.observe() (once per frame USE instead
    of once per frame PUSH + roll).  Exactness:
    `carla_env.planes_to_image(tile_to_planes(p)) == tile_to_image(p)` —
    both quantize to uint8 at half-res first and repeat afterwards
    (repeat∘cast == cast∘repeat), pinned by tests/test_rasterizer.py.
    """
    c = 4 if with_depth else 3
    flat = planes[:c].reshape(c, TILE[0] * TILE[1])[:, :N_PIX]
    img = flat.reshape(c, 3, VIEW_H, VIEW_W)           # (chan, view, h, w)
    if with_depth:
        view_keep = jnp.asarray([0, 1, 0], img.dtype)  # front view only
        img = img.at[3].mul(view_keep[:, None, None])
    img = jnp.transpose(img, (0, 2, 1, 3))             # (chan, h, view, w)
    return img.reshape(c, VIEW_H, 3 * VIEW_W).astype(jnp.uint8)


def render_planes_banked(town, world, weather: jax.Array,
                         interpret: bool = False,
                         return_depth: bool = False,
                         n_actors: int = K_ACTORS) -> jax.Array:
    """Production render epilogue for planar storage: cell-table geometry
    pack + kernel + tile_to_planes — returns (C, 45, 180) uint8, no
    upsample (see tile_to_planes)."""
    geom = pack_geometry_banked(town, world, weather, n_actors=n_actors)
    planes = render_tile(geom, interpret=interpret, n_actors=n_actors,
                         with_depth=return_depth)
    return tile_to_planes(planes, with_depth=return_depth)


def render_cameras_pallas(inputs: R.RenderInputs, height: int = 90,
                          width: int = 120, interpret: bool = False,
                          return_depth: bool = False) -> jax.Array:
    """Drop-in replacement for rasterizer.render_cameras (single world)."""
    geom = pack_geometry(inputs)
    planes = render_tile(geom, interpret=interpret, with_depth=return_depth)
    return tile_to_image(planes, out_h=height, out_w=width,
                         with_depth=return_depth)


def render_cameras_banked(town, world, weather: jax.Array, height: int = 90,
                          width: int = 120, interpret: bool = False,
                          return_depth: bool = False,
                          n_actors: int = K_ACTORS) -> jax.Array:
    """Fast production path: cell-table geometry pack (no top_k, fused
    bank gathers) + the same kernel.  `n_actors` statically bounds the
    unrolled actor loop to the slots this env config can populate."""
    geom = pack_geometry_banked(town, world, weather, n_actors=n_actors)
    planes = render_tile(geom, interpret=interpret, n_actors=n_actors,
                         with_depth=return_depth)
    return tile_to_image(planes, out_h=height, out_w=width,
                         with_depth=return_depth)
