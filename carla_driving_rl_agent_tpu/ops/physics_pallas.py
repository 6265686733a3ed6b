"""Fused Pallas TPU kernel for the batched physics step.

The XLA path (envs/world.step_world + envs/carla_env.step_physics merge,
vmapped over worlds) is the semantics reference; this kernel is the
speed-of-light path for the zero-NPC configs (bench, stage s1).  Motivation
(round-4/5 bench_parts): at 1024 worlds each physics step is ~100 SMALL
elementwise XLA ops over (1024,) vectors — one 8x128 VPU tile each — so the
step is op-DISPATCH-bound (~7 ms elementwise + ~6 ms scan floor per 32-step
chunk), not compute-bound.  This module collapses the whole post-gather
step — route-window follow, off-road distance, collision typing, reward,
termination bookkeeping, and the auto-reset merge — into ONE kernel over
(N, B/128, 128) blocks with worlds across VPU lanes, leaving in XLA only
what must stay there: the control+bicycle prologue that produces the gather
indices, the bank gathers themselves (no per-lane gather hardware), and the
reset RNG draws (jax.random stream parity; world._reset_draws is shared
verbatim with reset_world).

Scope gate (`fused_step_supported`): zero configured NPCs, default reward
mode, batch a multiple of 128.  Everything else falls back to the vmapped
XLA path.  Numerics: identical operation order to step_world; cos/sqrt may
differ from XLA by ULPs (Mosaic transcendental implementations), pinned to
1e-5 by tests/test_physics_fused.py.

Reference behavior contracts preserved via step_world — see
envs/world.py's docstring for the file:line map (core/carla_env.py:141-202,
254-269; environment.py:946-950).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from carla_driving_rl_agent_tpu.envs import world as world_mod
from carla_driving_rl_agent_tpu.envs.dynamics import (DT, MS_TO_KMH,
                                                      actions_to_control,
                                                      step_bicycle, tgather)
from carla_driving_rl_agent_tpu.envs.town import CELL_RES

W = world_mod.ROUTE_WINDOW          # route-window GATHER width (16)
UPD_W = 10                          # update_index's monotone-descent window
                                    # (route.make_route_functions(window=10))

# scalar input slots (N_IN, SB, 128)
(_I_X, _I_Y, _I_YAW, _I_V, _I_THR, _I_BRK, _I_STR, _I_WP, _I_RLEN,
 _I_ENDX, _I_ENDY, _I_TS, _I_SIMT, _I_TOTR, _I_OFFTHR,
 _I_RSX, _I_RSY, _I_RSYAW, _I_RSSIMT) = range(19)
N_IN = 19

# output slots (N_OUT, SB, 128): merged state fields first, then the
# pre-merge step returns / info fields
(_O_X, _O_Y, _O_YAW, _O_V, _O_THR, _O_BRK, _O_STR, _O_WP, _O_SIM, _O_TS,
 _O_SIMT, _O_TOTR, _O_CP, _O_ST,
 _O_REWARD, _O_TERM, _O_TRUNC, _O_DONE, _O_SIMPRE, _O_DNEXT, _O_DDEST,
 _O_OFFROAD, _O_TSPRE, _O_TOTRPRE, _O_SPD) = range(25)
N_OUT = 25

# SMEM const slots
(_C_PEN, _C_PENDIV, _C_CAP, _C_OCP, _C_MAXTS, _C_DT) = range(6)
N_CONST = 6


def _step_kernel(const_ref, scal_ref, wrow_ref, seg_ref, out_ref, *,
                 k_segs: int, over_cap: bool):
    """One physics step for all worlds: (SB, 128) f32 blocks per quantity.

    Operation order mirrors step_world exactly (see module docstring)."""
    s = lambda i: scal_ref[i]
    c = lambda i: const_ref[0, i]

    x, y, yaw, v = s(_I_X), s(_I_Y), s(_I_YAW), s(_I_V)

    # --- route following (route.make_route_functions(window=10)
    # .update_index: monotone descent over the first UPD_W gathered
    # candidates; the gather window W=16 also feeds the navigation
    # feature's reach but the descent scans only 10) ---
    d = [None] * UPD_W
    for k in range(UPD_W):
        dx = wrow_ref[k, 0] - x
        dy = wrow_ref[k, 1] - y
        d[k] = jnp.sqrt(dx * dx + dy * dy)
    keep = jnp.ones_like(x)
    steps = jnp.zeros_like(x)
    for k in range(UPD_W - 1):
        keep = keep * (d[k + 1] < d[k]).astype(jnp.float32)
        steps = steps + keep
    r_len = s(_I_RLEN)
    rem = r_len - s(_I_WP)
    local = jnp.minimum(steps, rem - 1.0)   # update_index's clamp (idx=0 form)
    wp_new = s(_I_WP) + local
    # similarity / d_next at the (per-lane dynamic) local index via
    # one-hot selects over the unrolled window
    sim = jnp.zeros_like(x)
    d_next = jnp.zeros_like(x)
    for k in range(UPD_W):
        m = (local == float(k)).astype(jnp.float32)
        sim = sim + m * jnp.cos(yaw - wrow_ref[k, 2])
        d_next = d_next + m * d[k]
    d_dest = jnp.sqrt((s(_I_ENDX) - x) ** 2 + (s(_I_ENDY) - y) ** 2)

    # --- off-road distance (world._off_road_distance over the packed
    # candidate segments) ---
    best = jnp.full_like(x, 1e12)
    for k in range(k_segs):
        x0, y0 = seg_ref[k, 0], seg_ref[k, 1]
        ex, ey = seg_ref[k, 2] - x0, seg_ref[k, 3] - y0
        L2 = jnp.maximum(ex * ex + ey * ey, 1e-9)
        rx, ry = x - x0, y - y0
        t = jnp.clip((rx * ex + ry * ey) / L2, 0.0, 1.0)
        ddx, ddy = rx - t * ex, ry - t * ey
        best = jnp.minimum(best, ddx * ddx + ddy * ddy)
    off_road = jnp.sqrt(best)

    # --- collisions (zero-NPC: only the off-road 'other' type can fire;
    # core/carla_env.py:254-269) ---
    hit_other = (off_road > s(_I_OFFTHR)).astype(jnp.float32)
    cp = hit_other * (c(_C_PEN) / c(_C_PENDIV))

    # --- reward (CARLAEnv default: core/carla_env.py:182-202) ---
    spd = jnp.abs(v) * MS_TO_KMH
    r_drive = jnp.minimum(spd, c(_C_CAP)) * sim
    damp = jnp.maximum(1.0, (d_next * 0.5) ** 2)
    r_drive = jnp.where(r_drive != 0.0, r_drive / damp, r_drive)
    reward = jnp.where(cp > 0.0, -cp, r_drive)
    if over_cap:
        reward = reward - c(_C_OCP) * jnp.maximum(spd - c(_C_CAP), 0.0)

    # --- terminal / truncation / bookkeeping ---
    arrived = (d_dest <= 2.0).astype(jnp.float32)
    term = jnp.minimum(hit_other + arrived, 1.0)
    ts = s(_I_TS) + 1.0
    trunc = (ts >= c(_C_MAXTS)).astype(jnp.float32) * (1.0 - term)
    totr = s(_I_TOTR) + reward
    simt = s(_I_SIMT) + c(_C_DT)
    done = jnp.minimum(term + trunc, 1.0)
    live = 1.0 - done

    # --- auto-reset merge (carla_env.step_physics: where(done, fresh, new));
    # fresh scalar values per reset_world ---
    out_ref[_O_X] = done * s(_I_RSX) + live * x
    out_ref[_O_Y] = done * s(_I_RSY) + live * y
    out_ref[_O_YAW] = done * s(_I_RSYAW) + live * yaw
    out_ref[_O_V] = live * v
    out_ref[_O_THR] = live * s(_I_THR)
    out_ref[_O_BRK] = live * s(_I_BRK)
    out_ref[_O_STR] = live * s(_I_STR)
    out_ref[_O_WP] = done * 1.0 + live * wp_new
    out_ref[_O_SIM] = done * 1.0 + live * sim
    out_ref[_O_TS] = live * ts
    out_ref[_O_SIMT] = done * s(_I_RSSIMT) + live * simt
    out_ref[_O_TOTR] = live * totr
    out_ref[_O_CP] = live * cp
    out_ref[_O_ST] = live * hit_other
    # pre-merge step returns / info
    out_ref[_O_REWARD] = reward
    out_ref[_O_TERM] = term
    out_ref[_O_TRUNC] = trunc
    out_ref[_O_DONE] = done
    out_ref[_O_SIMPRE] = sim
    out_ref[_O_DNEXT] = d_next
    out_ref[_O_DDEST] = d_dest
    out_ref[_O_OFFROAD] = off_road
    out_ref[_O_TSPRE] = ts
    out_ref[_O_TOTRPRE] = totr
    out_ref[_O_SPD] = spd


def fused_step_supported(params, batch: int) -> bool:
    """Static gate for the fused path (see module docstring)."""
    return (params.num_vehicles == 0 and params.num_pedestrians == 0
            and params.reward_mode == "default" and batch >= 8)


def _lane_shape(batch: int):
    """(sublane, lane) layout for `batch` worlds.  Multiples of 128 fill
    whole VPU tiles; smaller batches run as one (1, B) block — Mosaic pads
    to (8, 128), wasting lanes, but the 32-world train-rollout geometry is
    op-count-bound, not work-bound (round-3: 11 ms/step at 32 worlds vs
    2.3 ms at 1024), so collapsing ~100 dispatches into one kernel wins
    regardless of lane fill."""
    if batch % 128 == 0:
        return (batch // 128, 128)
    return (1, batch)


def step_physics_batch_fused(env, states, actions: jax.Array):
    """Drop-in batched replacement for vmap(step_physics): same returns
    (EnvState', reward, term, trunc, info, was_reset), same RNG stream."""
    params, town, routes = env.params, env.town, env.routes
    world = states.world
    B = world.x.shape[0]
    lanes = _lane_shape(B)
    interpret = jax.default_backend() != "tpu"

    # --- XLA prologue: control + bicycle (elementwise, batched natively) ---
    control = actions_to_control(
        actions, world.v,
        throttle_as_desired_speed=params.throttle_as_desired_speed,
        disable_reverse=params.disable_reverse,
        range_throttle=params.range_controls[0],
        range_brake=params.range_controls[1],
        range_steer=params.range_controls[2])
    x, y, yaw, v = step_bicycle(world.x, world.y, world.yaw, world.v, control)

    # --- RNG stream parity: step_world splits state.key -> (key, k_npc);
    # step_physics splits the new key -> reset_key; reset draws come from
    # the SHARED world._reset_draws ---
    kk = jax.vmap(lambda k: jax.random.split(k))(world.key)
    key1 = kk[:, 0]
    reset_key = jax.vmap(lambda k: jax.random.split(k))(key1)[:, 0]
    town_select = env._town_select()
    (rs_town, rs_weather, rs_route, rs_xy, rs_yaw, rs_simt, _,
     rs_state_key) = jax.vmap(
        lambda k: world_mod._reset_draws(k, params, town, routes,
                                         town_select))(reset_key)

    # --- bank gathers (XLA: no per-lane gathers on TPU) ---
    gh, gw = town.cell_segs.shape[1], town.cell_segs.shape[2]
    cx = jnp.clip((x / CELL_RES).astype(jnp.int32), 0, gw - 1)
    cy = jnp.clip((y / CELL_RES).astype(jnp.int32), 0, gh - 1)
    cell = jax.vmap(lambda t, a, b: tgather(town.cell_segs, t, a, b))(
        world.town_id, cy, cx)                                # (B, K*4)
    k_segs = cell.shape[-1] // 4

    r_len = jax.vmap(lambda t, r: tgather(routes.length, t, r))(
        world.town_id, world.route_id).astype(jnp.float32)
    rem = r_len.astype(jnp.int32) - world.wp_idx
    offs = jnp.minimum(jnp.arange(W)[None, :], (rem - 1)[:, None])
    w_ids = world.wp_idx[:, None] + offs
    wrow = jax.vmap(lambda t, r, i: tgather(routes.xyy, t, r, i))(
        world.town_id, world.route_id, w_ids)                 # (B, W, 4)
    end_xy = jax.vmap(lambda t, r: tgather(routes.end_xy, t, r))(
        world.town_id, world.route_id)
    road_half = jax.vmap(lambda t: tgather(town.road_half, t))(world.town_id)
    off_thr = (params.off_road_threshold
               + (road_half - (world_mod.town_mod.LANE_WIDTH + 0.3)))

    # --- pack kernel operands (worlds across lanes) ---
    scal = jnp.stack([
        x, y, yaw, v, control.throttle, control.brake, control.steer,
        world.wp_idx.astype(jnp.float32), r_len, end_xy[:, 0], end_xy[:, 1],
        world.timestep.astype(jnp.float32), world.sim_time, world.total_reward,
        off_thr, rs_xy[:, 0], rs_xy[:, 1], rs_yaw, rs_simt,
    ]).reshape((N_IN,) + lanes)
    wrow_t = wrow.transpose(1, 2, 0).reshape((W, 4) + lanes)
    seg_t = cell.reshape(B, k_segs, 4).transpose(1, 2, 0).reshape(
        (k_segs, 4) + lanes)
    consts = jnp.asarray([[
        params.collision_penalty, params.off_road_penalty_divisor,
        params.reward_speed_cap, params.speed_over_cap_penalty,
        float(params.max_timesteps), DT]], jnp.float32)

    out = pl.pallas_call(
        functools.partial(_step_kernel, k_segs=k_segs,
                          over_cap=bool(params.speed_over_cap_penalty)),
        out_shape=jax.ShapeDtypeStruct((N_OUT,) + lanes, jnp.float32),
        in_specs=[
            pl.BlockSpec((1, N_CONST), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(consts, scal, wrow_t, seg_t).reshape(N_OUT, B)

    o = lambda i: out[i]
    done_f = o(_O_DONE)
    done = done_f > 0.5
    term = o(_O_TERM) > 0.5
    trunc = o(_O_TRUNC) > 0.5
    reward = o(_O_REWARD)

    # --- id / key merges (i32 + u32 stay in XLA) ---
    sel = lambda fresh, old: jnp.where(done, fresh, old)
    merged = world._replace(
        x=o(_O_X), y=o(_O_Y), yaw=o(_O_YAW), v=o(_O_V),
        throttle=o(_O_THR), brake=o(_O_BRK), steer=o(_O_STR),
        route_id=sel(rs_route, world.route_id),
        wp_idx=o(_O_WP).astype(jnp.int32),
        similarity=o(_O_SIM),
        town_id=sel(rs_town, world.town_id),
        weather_id=sel(rs_weather, world.weather_id),
        timestep=o(_O_TS).astype(jnp.int32),
        sim_time=o(_O_SIMT),
        episode=jnp.where(done, world.episode + 1, world.episode),
        total_reward=o(_O_TOTR),
        collision_penalty=o(_O_CP),
        should_terminate=o(_O_ST) > 0.5,
        key=jnp.where(done[:, None], rs_state_key, key1),
    )

    false_b = jnp.zeros((B,), bool)
    speed_limit = jax.vmap(lambda t: world_mod._speed_limit(town, t))(
        world.town_id)
    # PRE-merge collision flag (the kernel's _O_ST slot is the MERGED
    # should_terminate, zeroed on reset — recompute the threshold test from
    # the kernel's own off-road output: identical inputs, identical result)
    hit_other_pre = o(_O_OFFROAD) > off_thr
    info = dict(
        speed=o(_O_SPD), speed_limit=speed_limit,
        similarity=o(_O_SIMPRE),
        distance_to_next_waypoint=o(_O_DNEXT),
        distance_to_destination=o(_O_DDEST),
        episode=world.episode.astype(jnp.float32),
        timestep=o(_O_TSPRE),
        total_reward=o(_O_TOTRPRE), reward=reward,
        collision=hit_other_pre,
        hit_vehicle=false_b, hit_pedestrian=false_b,
        hit_other=hit_other_pre,
        off_road_distance=o(_O_OFFROAD),
    )
    return (states._replace(world=merged), reward, term, trunc, info, done)
