"""Camera rasterizer: ego-view RGB rendering of the town on-device.

This is the TPU-native replacement for CARLA's UE4 camera sensors
(reference `rl/environments/carla/sensors.py`): three cameras mounted at
z=2.2 m with yaw offsets -90/0/+90 deg and 90-degree FOV
(`sensors.py:320-341`: 'lateral-left', 'on-top2', 'lateral-right'), whose
images are concatenated side-by-side into (H, 3W, 3)
(`environment.py:1248-1264`; CARLAEnv uses RGB cameras,
`core/carla_env.py:111-126`).

Method: per-pixel ground-plane ray casting. Every pixel's view ray either
hits the ground plane — where the town's semantic texture is sampled and
shaded — or the sky / a building (coarse 2D ray-march against the building
occupancy encoded in the same texture). Dynamic actors (NPC vehicles,
pedestrians) are composited as depth-tested billboards. Weather modulates sky
color, light level, fog density, and road wetness
(`envs/weather.py` presets; reference samples carla.WeatherParameters).

The pure-XLA implementation below is the semantics reference; a fused Pallas
kernel (`ops/rasterizer_pallas.py`) is used on TPU when enabled.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

CAMERA_HEIGHT = 2.2
CAMERA_YAWS = (jnp.pi / 2.0, 0.0, -jnp.pi / 2.0)   # left, front, right
FOV_DEG = 90.0

# semantic palette (classes from envs/town.py)
PALETTE = jnp.asarray([
    [96, 128, 72],     # 0 terrain
    [88, 88, 94],      # 1 road
    [228, 228, 218],   # 2 lane marking
    [158, 152, 148],   # 3 sidewalk
    [122, 102, 96],    # 4 building
    [200, 200, 200],   # 5 crossing
], jnp.float32)

BUILDING_CLASS = 4
N_MARCH = 24          # building ray-march steps
MAX_ACTORS = 12       # nearest actors composited per view


class RenderInputs(NamedTuple):
    texture: jax.Array        # (TH, TW) uint8 semantic map of this world's town
    ego_xy: jax.Array         # (2,)
    ego_yaw: jax.Array        # ()
    veh_xy: jax.Array         # (V, 2)
    veh_yaw: jax.Array        # (V,)
    veh_active: jax.Array     # (V,)
    ped_xy: jax.Array         # (P, 2)
    ped_active: jax.Array     # (P,)
    weather: jax.Array        # (5,) sun, clouds, rain, wetness, fog


def _pixel_rays(height: int, width: int):
    """Unit view rays in the camera frame (x fwd, y left, z up)."""
    fx = (width / 2.0) / jnp.tan(jnp.deg2rad(FOV_DEG) / 2.0)
    u = jnp.arange(width, dtype=jnp.float32) - (width - 1) / 2.0
    v = jnp.arange(height, dtype=jnp.float32) - (height - 1) / 2.0
    yy = -u / fx                      # left positive
    zz = -v / fx                      # up positive
    dy = jnp.broadcast_to(yy[None, :], (height, width))
    dz = jnp.broadcast_to(zz[:, None], (height, width))
    dx = jnp.ones((height, width), jnp.float32)
    norm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return dx / norm, dy / norm, dz / norm


def _sample_texture(texture, x, y, scale):
    th, tw = texture.shape
    xi = jnp.clip((x / scale).astype(jnp.int32), 0, tw - 1)
    yi = jnp.clip((y / scale).astype(jnp.int32), 0, th - 1)
    return texture[yi, xi].astype(jnp.int32)


def _shade_weather(rgb, depth, sky_rgb, weather, is_road):
    sun, clouds, rain, wet, fog = (weather[i] for i in range(5))
    light = 1.0 - 0.35 * clouds - 0.15 * rain
    warm = jnp.asarray([1.0 + 0.25 * sun, 1.0, 1.0 - 0.2 * sun])
    rgb = rgb * light * warm[None, None, :]
    # wet roads darken and reflect a bit of sky
    rgb = jnp.where(is_road[..., None] > 0,
                    rgb * (1.0 - 0.35 * wet) + sky_rgb[None, None, :] * 0.12 * wet,
                    rgb)
    # distance fog
    fog_f = 1.0 - jnp.exp(-depth * (0.002 + 0.05 * fog))
    return rgb * (1 - fog_f[..., None]) + sky_rgb[None, None, :] * fog_f[..., None]


def _sky_color(weather):
    sun, clouds, rain, _, _ = (weather[i] for i in range(5))
    clear = jnp.asarray([135.0, 190.0, 235.0])
    sunset = jnp.asarray([240.0, 160.0, 110.0])
    overcast = jnp.asarray([150.0, 152.0, 158.0])
    sky = clear * (1 - sun) + sunset * sun
    sky = sky * (1 - clouds) + overcast * clouds
    return sky * (1.0 - 0.25 * rain)


@partial(jax.jit, static_argnames=("height", "width", "tex_scale"))
def render_view(inputs: RenderInputs, cam_yaw_offset: jax.Array,
                height: int = 90, width: int = 120,
                tex_scale: float = 0.5) -> jax.Array:
    """Render one camera view -> (height, width, 3) float32 in [0, 255]."""
    dx_c, dy_c, dz = _pixel_rays(height, width)
    yaw = inputs.ego_yaw + cam_yaw_offset
    cos_y, sin_y = jnp.cos(yaw), jnp.sin(yaw)
    dx = dx_c * cos_y - dy_c * sin_y
    dy = dx_c * sin_y + dy_c * cos_y

    ex, ey = inputs.ego_xy[0], inputs.ego_xy[1]
    sky_rgb = _sky_color(inputs.weather)

    # ---- ground pass ----
    below = dz < -1e-4
    t_ground = jnp.where(below, -CAMERA_HEIGHT / jnp.where(below, dz, -1.0), 1e6)
    gx = ex + t_ground * dx
    gy = ey + t_ground * dy
    klass = _sample_texture(inputs.texture, gx, gy, tex_scale)
    ground_rgb = PALETTE[klass]
    ground_is_building = (klass == BUILDING_CLASS)

    # ---- building pass: coarse ray-march for pixels above the horizon ----
    # march along the ray at increasing ranges; hit if the texture cell is a
    # building whose height exceeds the ray's altitude at that range
    t_march = jnp.linspace(4.0, 120.0, N_MARCH)
    bx = ex + t_march[:, None, None] * dx[None]
    by = ey + t_march[:, None, None] * dy[None]
    bz = CAMERA_HEIGHT + t_march[:, None, None] * dz[None]
    k_m = _sample_texture(inputs.texture, bx, by, tex_scale)
    # buildings are ~14 m tall on average (heights vary per-building on host;
    # the render uses a single canopy height for speed)
    hit = (k_m == BUILDING_CLASS) & (bz > 0.2) & (bz < 14.0)
    any_hit = jnp.any(hit, axis=0)
    first = jnp.argmax(hit, axis=0)
    t_build = jnp.where(any_hit, t_march[first], 1e6)
    shade = 1.0 - 0.5 * jnp.clip(t_build / 120.0, 0.0, 1.0)
    build_rgb = PALETTE[BUILDING_CLASS][None, None, :] * shade[..., None]

    # combine ground/building/sky by nearest hit
    ground_ok = below & (t_ground < 400.0) & ~ground_is_building
    t_g = jnp.where(ground_ok, t_ground, 1e6)
    use_build = t_build < t_g
    depth = jnp.minimum(t_g, t_build)
    rgb = jnp.where(use_build[..., None], build_rgb,
                    jnp.where(ground_ok[..., None], ground_rgb, sky_rgb[None, None, :]))
    is_road = ground_ok & ((klass == 1) | (klass == 2) | (klass == 5)) & ~use_build

    # ---- actor billboards (depth-tested) ----
    rgb, depth = _composite_actors(rgb, depth, inputs, yaw, ex, ey, height, width)

    rgb = _shade_weather(rgb, depth, sky_rgb, inputs.weather, is_road)
    return jnp.clip(rgb, 0.0, 255.0)


def _composite_actors(rgb, depth, inputs: RenderInputs, yaw, ex, ey, height, width):
    fx = (width / 2.0) / jnp.tan(jnp.deg2rad(FOV_DEG) / 2.0)
    cos_y, sin_y = jnp.cos(yaw), jnp.sin(yaw)

    # gather nearest MAX_ACTORS vehicles and pedestrians
    def nearest(xy, active, k):
        d = jnp.linalg.norm(xy - jnp.stack([ex, ey])[None], axis=-1)
        d = jnp.where(active > 0, d, 1e9)
        idx = jnp.argsort(d)[:k]
        return idx, d[idx] < 1e8

    v_idx, v_ok = nearest(inputs.veh_xy, inputs.veh_active, MAX_ACTORS)
    p_idx, p_ok = nearest(inputs.ped_xy, inputs.ped_active, MAX_ACTORS)

    def billboard(axy, ok, half_w, h_top, color, a_yaw=None):
        # actor center in camera frame
        rx = axy[:, 0] - ex
        ry = axy[:, 1] - ey
        cx = rx * cos_y + ry * sin_y          # forward
        cy = -rx * sin_y + ry * cos_y         # left
        in_front = (cx > 0.8) & ok
        u = (-cy / jnp.maximum(cx, 0.1)) * fx + (width - 1) / 2.0
        half_u = (half_w / jnp.maximum(cx, 0.1)) * fx
        # vertical: rows for z in [0, h_top] above ground, camera at CAMERA_HEIGHT
        v_bottom = ((CAMERA_HEIGHT - 0.0) / jnp.maximum(cx, 0.1)) * fx + (height - 1) / 2.0
        v_top = ((CAMERA_HEIGHT - h_top) / jnp.maximum(cx, 0.1)) * fx + (height - 1) / 2.0
        uu = jnp.arange(width, dtype=jnp.float32)[None, :]       # (1, W)
        vv = jnp.arange(height, dtype=jnp.float32)[:, None]      # (H, 1)
        cover = ((jnp.abs(uu[None] - u[:, None, None]) < half_u[:, None, None])
                 & (vv[None] >= v_top[:, None, None]) & (vv[None] <= v_bottom[:, None, None])
                 & in_front[:, None, None])                       # (A, H, W)
        a_depth = jnp.where(cover, cx[:, None, None], 1e6)
        return cover, a_depth, color

    veh_colors = jnp.asarray([[180, 30, 30], [30, 60, 180], [220, 220, 220],
                              [40, 40, 40], [200, 170, 40], [90, 140, 190]], jnp.float32)
    v_col = veh_colors[v_idx % 6]
    v_cover, v_depth, _ = billboard(inputs.veh_xy[v_idx], v_ok, 1.0, 1.6, v_col)
    p_col = jnp.tile(jnp.asarray([[190, 120, 90]], jnp.float32), (MAX_ACTORS, 1))
    p_cover, p_depth, _ = billboard(inputs.ped_xy[p_idx], p_ok, 0.3, 1.8, p_col)

    cover = jnp.concatenate([v_cover, p_cover], axis=0)            # (2A, H, W)
    a_depth = jnp.concatenate([v_depth, p_depth], axis=0)
    colors = jnp.concatenate([v_col, p_col], axis=0)               # (2A, 3)

    a_depth_masked = jnp.where(cover, a_depth, 1e6)
    best = jnp.argmin(a_depth_masked, axis=0)                      # (H, W)
    best_depth = jnp.min(a_depth_masked, axis=0)
    visible = (best_depth < depth)
    actor_rgb = colors[best]
    rgb = jnp.where(visible[..., None], actor_rgb, rgb)
    depth = jnp.where(visible, best_depth, depth)
    return rgb, depth


def render_cameras(inputs: RenderInputs, height: int = 90, width: int = 120,
                   tex_scale: float = 0.5) -> jax.Array:
    """Render the three-camera concat image -> (H, 3W, 3) uint8
    (left | front | right, reference `environment.py:1259`)."""
    views = [render_view(inputs, jnp.asarray(y), height=height, width=width,
                         tex_scale=tex_scale) for y in CAMERA_YAWS]
    img = jnp.concatenate(views, axis=1)
    return img.astype(jnp.uint8)
