"""Camera rasterizer: analytic ego-view RGB rendering — zero gathers.

TPU-native replacement for CARLA's UE4 camera sensors (reference
`rl/environments/carla/sensors.py`): three cameras at z=2.2 m, yaw offsets
+90/0/-90 deg, 90-degree FOV ('lateral-left', 'on-top2', 'lateral-right' —
`sensors.py:320-341`), concatenated side-by-side into (H, 3W, 3)
(`environment.py:1248-1264`; CARLAEnv uses RGB cameras,
`core/carla_env.py:111-126`).

Design note (why analytic): a texture-lookup renderer needs millions of
random gathers per step — the worst access pattern for the TPU memory
system. Instead every pixel's semantic class is COMPUTED from road geometry:

  * ground pass: ray x ground-plane intersection -> distance to the K nearest
    road centerline segments (pure broadcasted VPU math) -> road / lane
    marking / sidewalk / crossing / terrain classification by distance bands;
  * building pass: exact 2D slab-test ray intersection against the K nearest
    building boxes, with per-building heights (no ray-march, no texture);
  * actors: depth-tested billboards for the K nearest vehicles/pedestrians;
  * weather: sky color, light level, fog, wet-road tint from the preset
    vector (`envs/weather.py`).

Everything is dense vectorized arithmetic over (H, W) maps — exactly what
the VPU wants — and the only memory traffic is the O(K) nearest-entity
gather per world per step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

CAMERA_HEIGHT = 2.2
CAMERA_YAWS = (jnp.pi / 2.0, 0.0, -jnp.pi / 2.0)   # left, front, right
FOV_DEG = 90.0

LANE_W = 3.5                   # envs/town.py LANE_WIDTH
ROAD_HALF = LANE_W + 0.3       # single-lane road band half-width (default)
SIDE_OUT = ROAD_HALF + 2.0     # + sidewalk
JUNCTION_RADIUS = 9.0

K_EDGES = 24
K_BUILDINGS = 16
K_ACTORS = 12
MAX_DEPTH = 400.0

# quality presets: (k_edges, k_buildings, k_actors, supersample_divisor)
# 'fast' renders at half resolution with reduced K-budgets and upsamples 2x —
# ~8x cheaper; the 90x120 CNN input is visually near-identical.
QUALITY = dict(full=(24, 16, 12, 1), fast=(12, 8, 6, 2))

COLOR_TERRAIN = jnp.asarray([96.0, 128.0, 72.0])
COLOR_ROAD = jnp.asarray([88.0, 88.0, 94.0])
COLOR_MARKING = jnp.asarray([228.0, 228.0, 218.0])
COLOR_SIDEWALK = jnp.asarray([158.0, 152.0, 148.0])
COLOR_BUILDING = jnp.asarray([122.0, 102.0, 96.0])
COLOR_CROSSING = jnp.asarray([200.0, 200.0, 200.0])


class RenderInputs(NamedTuple):
    edges_xy: jax.Array       # (E, 4) road centerline segments of this town
    num_edges: jax.Array      # ()
    buildings: jax.Array      # (B, 5) cx, cy, hw, hh, height
    junctions: jax.Array      # (J, 2)
    num_junctions: jax.Array  # ()
    ego_xy: jax.Array         # (2,)
    ego_yaw: jax.Array        # ()
    veh_xy: jax.Array         # (V, 2)
    veh_yaw: jax.Array        # (V,)
    veh_active: jax.Array     # (V,)
    ped_xy: jax.Array         # (P, 2)
    ped_active: jax.Array     # (P,)
    weather: jax.Array        # (5,) sun, clouds, rain, wetness, fog
    # road band half-width of this world's town: multi-lane towns
    # (Town04/06) have wider roads + lane-divider dashes
    road_half: jax.Array = jnp.asarray(ROAD_HALF, jnp.float32)


def _pixel_rays(height: int, width: int):
    """Unit view rays in the camera frame (x fwd, y left, z up)."""
    fx = (width / 2.0) / jnp.tan(jnp.deg2rad(FOV_DEG) / 2.0)
    u = jnp.arange(width, dtype=jnp.float32) - (width - 1) / 2.0
    v = jnp.arange(height, dtype=jnp.float32) - (height - 1) / 2.0
    yy = -u / fx
    zz = -v / fx
    dy = jnp.broadcast_to(yy[None, :], (height, width))
    dz = jnp.broadcast_to(zz[:, None], (height, width))
    dx = jnp.ones((height, width), jnp.float32)
    norm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return dx / norm, dy / norm, dz / norm


def _nearest_k(xy: jax.Array, center: jax.Array, valid: jax.Array, k: int):
    d = jnp.linalg.norm(xy - center[None], axis=-1)
    d = jnp.where(valid, d, 1e9)
    _, idx = jax.lax.top_k(-d, min(k, xy.shape[0]))
    return idx


def _min_seg_distance(px, py, segs):
    """Min distance from pixel points to K segments + arclength at the min.

    Fused reduction over K via fori_loop so only (H, W) accumulators live in
    memory — materializing (K, H, W) intermediates costs GBs of HBM traffic
    per step at batch, which was measured to dominate render time.
    """
    def body(k, carry):
        d_min, t_min = carry
        x0, y0, x1, y1 = segs[k, 0], segs[k, 1], segs[k, 2], segs[k, 3]
        ex = x1 - x0
        ey = y1 - y0
        L2 = jnp.maximum(ex * ex + ey * ey, 1e-9)
        rx = px - x0
        ry = py - y0
        t = jnp.clip((rx * ex + ry * ey) / L2, 0.0, 1.0)
        dx = rx - t * ex
        dy = ry - t * ey
        d = dx * dx + dy * dy                      # squared; sqrt once at end
        closer = d < d_min
        return (jnp.where(closer, d, d_min),
                jnp.where(closer, t * jnp.sqrt(L2), t_min))

    d0 = jnp.full(px.shape, 1e12)
    t0 = jnp.zeros(px.shape)
    d2, t_at = jax.lax.fori_loop(0, segs.shape[0], body, (d0, t0))
    return jnp.sqrt(d2), t_at


def _sky_color(weather):
    sun, clouds, rain = weather[0], weather[1], weather[2]
    clear = jnp.asarray([135.0, 190.0, 235.0])
    sunset = jnp.asarray([240.0, 160.0, 110.0])
    overcast = jnp.asarray([150.0, 152.0, 158.0])
    sky = clear * (1 - sun) + sunset * sun
    sky = sky * (1 - clouds) + overcast * clouds
    return sky * (1.0 - 0.25 * rain)


def _shade_weather(rgb, depth, sky_rgb, weather, is_road):
    clouds, rain, wet, fog = weather[1], weather[2], weather[3], weather[4]
    sun = weather[0]
    light = 1.0 - 0.35 * clouds - 0.15 * rain
    warm = jnp.stack([1.0 + 0.25 * sun, jnp.ones(()), 1.0 - 0.2 * sun])
    rgb = rgb * light * warm[None, None, :]
    rgb = jnp.where(is_road[..., None],
                    rgb * (1.0 - 0.35 * wet) + sky_rgb[None, None, :] * 0.12 * wet,
                    rgb)
    fog_f = 1.0 - jnp.exp(-depth * (0.002 + 0.05 * fog))
    return rgb * (1 - fog_f[..., None]) + sky_rgb[None, None, :] * fog_f[..., None]


def depth_to_u8(depth: jax.Array) -> jax.Array:
    """Log-depth encoding as a [0, 255] channel.

    The reference decodes CARLA's 24-bit depth to meters/1000 and stores
    log1p(meters) (core/carla_env.py:271-288).  Deviation (documented): the
    channel here is additionally scaled by log1p(MAX_DEPTH) to fit the uint8
    stack, so after the /255 in CARLAEnv.observe it lands in [0, 1]."""
    import math
    d = jnp.clip(depth, 0.0, MAX_DEPTH)
    return jnp.log1p(d) * (255.0 / math.log1p(MAX_DEPTH))


def render_view(inputs: RenderInputs, cam_yaw_offset, height: int = 90,
                width: int = 120, k_edges: int = K_EDGES,
                k_buildings: int = K_BUILDINGS,
                k_actors: int = K_ACTORS, return_depth: bool = False):
    """Render one camera view -> (height, width, 3) float32 in [0, 255].
    With return_depth, also returns the per-pixel ray depth in meters
    (ground/building/actor composited, MAX_DEPTH at sky)."""
    dx_c, dy_c, dz = _pixel_rays(height, width)
    yaw = inputs.ego_yaw + cam_yaw_offset
    cos_y, sin_y = jnp.cos(yaw), jnp.sin(yaw)
    dx = dx_c * cos_y - dy_c * sin_y
    dy = dx_c * sin_y + dy_c * cos_y
    ex, ey = inputs.ego_xy[0], inputs.ego_xy[1]
    sky_rgb = _sky_color(inputs.weather)

    # ---- ground intersection ----
    below = dz < -1e-4
    t_ground = jnp.where(below, -CAMERA_HEIGHT / jnp.where(below, dz, -1.0), 1e6)
    t_ground = jnp.minimum(t_ground, MAX_DEPTH)
    gx = ex + t_ground * dx
    gy = ey + t_ground * dy

    # ---- K nearest road segments: distance bands -> classes ----
    e_idx = _nearest_k(
        0.5 * (inputs.edges_xy[:, :2] + inputs.edges_xy[:, 2:]),
        inputs.ego_xy,
        jnp.arange(inputs.edges_xy.shape[0]) < inputs.num_edges, k_edges)
    segs = inputs.edges_xy[e_idx]
    d_road, t_at = _min_seg_distance(gx, gy, segs)

    rh = inputs.road_half
    dashed = jnp.floor(t_at / 2.0) % 2 == 0
    is_center_marking = (d_road < 0.15) & dashed
    # lane-divider dashes between lanes of one direction (multi-lane towns)
    is_lane_div = (rh > LANE_W + 1.0) & (jnp.abs(d_road - LANE_W) < 0.12) & dashed
    is_edge_marking = (jnp.abs(d_road - (rh - 0.2)) < 0.12) | is_lane_div
    is_road = d_road < rh
    is_sidewalk = (d_road >= rh) & (d_road < rh + 2.0)

    # crossings near junctions (striped bands, envs/town.py semantics)
    j_idx = _nearest_k(inputs.junctions, inputs.ego_xy,
                       jnp.arange(inputs.junctions.shape[0]) < inputs.num_junctions, 4)
    jx = inputs.junctions[j_idx]

    def j_body(k, d_jmin):
        d = jnp.square(gx - jx[k, 0]) + jnp.square(gy - jx[k, 1])
        return jnp.minimum(d_jmin, d)

    d_jmin = jnp.sqrt(jax.lax.fori_loop(0, jx.shape[0], j_body,
                                        jnp.full(gx.shape, 1e12)))
    band = (d_jmin > JUNCTION_RADIUS * 0.85) & (d_jmin < JUNCTION_RADIUS * 0.85 + 2.0)
    stripes = jnp.floor((gx + gy) / 0.6) % 2 == 0
    is_crossing = band & stripes & is_road

    ground_rgb = jnp.where(
        is_crossing[..., None], COLOR_CROSSING,
        jnp.where((is_center_marking | is_edge_marking)[..., None], COLOR_MARKING,
                  jnp.where(is_road[..., None], COLOR_ROAD,
                            jnp.where(is_sidewalk[..., None], COLOR_SIDEWALK,
                                      COLOR_TERRAIN))))

    # ---- buildings: exact ray/box intersection (2D slabs + height) ----
    b_idx = _nearest_k(inputs.buildings[:, :2], inputs.ego_xy,
                       inputs.buildings[:, 4] > 0.5, k_buildings)
    bb = inputs.buildings[b_idx]                     # (K, 5)
    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < 1e-6, 1e-6, dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < 1e-6, 1e-6, dy)

    def b_body(k, t_build):
        cx, cy, hw, hh, bh = bb[k, 0], bb[k, 1], bb[k, 2], bb[k, 3], bb[k, 4]
        tx0 = (cx - hw - ex) * inv_dx
        tx1 = (cx + hw - ex) * inv_dx
        ty0 = (cy - hh - ey) * inv_dy
        ty1 = (cy + hh - ey) * inv_dy
        t_near = jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1))
        t_far = jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1))
        z_near = CAMERA_HEIGHT + t_near * dz
        hit = (t_near > 0.5) & (t_near <= t_far) & (z_near > 0.0) & (z_near < bh)
        return jnp.minimum(t_build, jnp.where(hit, t_near, 1e6))

    t_build = jax.lax.fori_loop(0, bb.shape[0], b_body, jnp.full(dx.shape, 1e6))
    shade = 1.0 - 0.5 * jnp.clip(t_build / 150.0, 0.0, 1.0)
    build_rgb = COLOR_BUILDING[None, None, :] * shade[..., None]

    # ---- compose ground / building / sky ----
    t_g = jnp.where(below & (t_ground < MAX_DEPTH), t_ground, 1e6)
    use_build = t_build < t_g
    depth = jnp.minimum(t_g, t_build)
    rgb = jnp.where(use_build[..., None], build_rgb,
                    jnp.where((t_g < 1e6)[..., None], ground_rgb, sky_rgb[None, None, :]))
    road_px = (t_g < 1e6) & is_road & ~use_build

    # ---- actor billboards ----
    rgb, depth = _composite_actors(rgb, depth, inputs, yaw, ex, ey, height, width,
                                   k_actors=k_actors)

    rgb = _shade_weather(rgb, depth, sky_rgb, inputs.weather, road_px)
    rgb = jnp.clip(rgb, 0.0, 255.0)
    if return_depth:
        return rgb, jnp.minimum(depth, MAX_DEPTH)
    return rgb


def _composite_actors(rgb, depth, inputs: RenderInputs, yaw, ex, ey, height, width,
                      k_actors: int = K_ACTORS):
    fx = (width / 2.0) / jnp.tan(jnp.deg2rad(FOV_DEG) / 2.0)
    cos_y, sin_y = jnp.cos(yaw), jnp.sin(yaw)

    v_idx = _nearest_k(inputs.veh_xy, inputs.ego_xy, inputs.veh_active > 0,
                       min(k_actors, inputs.veh_xy.shape[0]))
    p_idx = _nearest_k(inputs.ped_xy, inputs.ego_xy, inputs.ped_active > 0,
                       min(k_actors, inputs.ped_xy.shape[0]))
    v_ok = inputs.veh_active[v_idx] > 0
    p_ok = inputs.ped_active[p_idx] > 0

    veh_colors = jnp.asarray([[180, 30, 30], [30, 60, 180], [220, 220, 220],
                              [40, 40, 40], [200, 170, 40], [90, 140, 190]], jnp.float32)
    # actor table: (A, 7) = x, y, ok, half_w, h_top, color_r/g/b packed after
    a_xy = jnp.concatenate([inputs.veh_xy[v_idx], inputs.ped_xy[p_idx]], axis=0)
    a_ok = jnp.concatenate([v_ok, p_ok], axis=0)
    a_hw = jnp.concatenate([jnp.full(v_idx.shape, 1.0), jnp.full(p_idx.shape, 0.3)])
    a_ht = jnp.concatenate([jnp.full(v_idx.shape, 1.6), jnp.full(p_idx.shape, 1.8)])
    a_col = jnp.concatenate([veh_colors[v_idx % 6],
                             jnp.tile(jnp.asarray([[190, 120, 90]], jnp.float32),
                                      (p_idx.shape[0], 1))], axis=0)

    uu = jnp.arange(width, dtype=jnp.float32)[None, :]
    vv = jnp.arange(height, dtype=jnp.float32)[:, None]

    def a_body(k, carry):
        rgb, depth = carry
        rx = a_xy[k, 0] - ex
        ry = a_xy[k, 1] - ey
        cx = rx * cos_y + ry * sin_y
        cy = -rx * sin_y + ry * cos_y
        denom = jnp.maximum(cx, 0.1)
        u = (-cy / denom) * fx + (width - 1) / 2.0
        half_u = (a_hw[k] / denom) * fx
        v_bottom = (CAMERA_HEIGHT / denom) * fx + (height - 1) / 2.0
        v_top = ((CAMERA_HEIGHT - a_ht[k]) / denom) * fx + (height - 1) / 2.0
        cover = ((jnp.abs(uu - u) < half_u) & (vv >= v_top) & (vv <= v_bottom)
                 & (cx > 0.8) & a_ok[k])
        visible = cover & (cx < depth)
        rgb = jnp.where(visible[..., None], a_col[k][None, None, :], rgb)
        depth = jnp.where(visible, cx, depth)
        return rgb, depth

    rgb, depth = jax.lax.fori_loop(0, a_xy.shape[0], a_body, (rgb, depth))
    return rgb, depth


def render_cameras(inputs: RenderInputs, height: int = 90, width: int = 120,
                   quality: str = "full", return_depth: bool = False) -> jax.Array:
    """Render the three-camera concat image -> (H, 3W, 3) uint8
    (left | front | right, reference `environment.py:1259`).

    quality='fast' renders each view at half resolution with smaller
    nearest-K budgets and upsamples (nearest) — ~8x fewer FLOPs.

    With return_depth, a 4th log-depth channel is appended: front-view depth
    in the middle third, zeros left/right — mirroring the reference's single
    front depth camera padded to the 3-camera canvas
    (core/carla_env.py:285-287)."""
    ke, kb, ka, div = QUALITY[quality]
    h, w = height // div, width // div
    views = []
    depth_front = None
    for i, y in enumerate(CAMERA_YAWS):
        out = render_view(inputs, jnp.asarray(y), height=h, width=w,
                          k_edges=ke, k_buildings=kb, k_actors=ka,
                          return_depth=(return_depth and i == 1))
        if return_depth and i == 1:
            view, depth_front = out
        else:
            view = out
        views.append(view)
    img = jnp.concatenate(views, axis=1)
    if return_depth:
        zeros = jnp.zeros((h, w), jnp.float32)
        dchan = jnp.concatenate([zeros, depth_to_u8(depth_front), zeros], axis=1)
        img = jnp.concatenate([img, dchan[..., None]], axis=-1)
    if div > 1:
        img = jax.image.resize(img, (height, width * 3, img.shape[-1]),
                               method="nearest")
    return img.astype(jnp.uint8)
