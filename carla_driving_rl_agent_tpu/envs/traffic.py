"""NPC traffic: waypoint-following vehicles and goal-walking pedestrians.

Replaces CARLA's TrafficManager autopilot fleet and walker AI controllers
(reference `rl/environments/carla/env_utils.py:195-336`) with vmapped
lane-graph followers.  The vehicle controller distills the reference's
privileged autopilot pipeline (`navigation/behavior_agent.py:363-432`):
pure-pursuit steering toward the next waypoint (PID controller role,
`navigation/controller.py:149-214`), speed tracking of the limit
(`local_planner` role), time-to-collision braking for actors ahead
(`behavior_agent.py:331-361`), and red-light stops (`agent.py:74-110`).

Traffic lights: each junction runs a fixed 24 s two-phase cycle (NS/EW) with
a per-junction phase offset; CARLA TrafficLightState encoding is preserved:
Red=0, Yellow=1, Green=2, Off=3, Unknown=4 (`tools/utils.py:90-132`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from carla_driving_rl_agent_tpu.envs.dynamics import DT, MS_TO_KMH, tgather

LIGHT_CYCLE = 24.0
GREEN_TIME = 10.0
YELLOW_TIME = 2.0

LIGHT_RED, LIGHT_YELLOW, LIGHT_GREEN, LIGHT_OFF, LIGHT_UNKNOWN = range(5)

VEHICLE_RADIUS = 1.1      # collision disc radius (two discs per vehicle)
VEHICLE_HALF_LEN = 1.4    # disc centers at +-half_len along heading
PED_RADIUS = 0.35
PED_SPEED_MIN, PED_SPEED_MAX = 0.8, 1.8
# CARLA walker blueprint recommended run speeds (env_utils.py:270-276)
PED_RUN_MIN, PED_RUN_MAX = 2.5, 3.5


# car-following constants (reference navigation/types_behavior.py:19-28,
# 'Normal' profile; behavior_agent.py:331-361)
SAFETY_TIME = 3.0          # s
SPEED_DECREASE = 10.0      # km/h below the lead when too close
MIN_FOLLOW_SPEED = 5.0     # km/h floor when matching the lead
BRAKING_DISTANCE = 5.0     # m, emergency stop band (behavior_agent.py:392-404)


def ttc_target_speed(own_v_ms, lead_v_ms, lead_d, cruise_kmh,
                     speed_decrease_kmh: float = SPEED_DECREASE,
                     safety_time: float = SAFETY_TIME,
                     braking_distance: float = BRAKING_DISTANCE):
    """Time-to-collision banded car-following target speed in km/h
    (reference behavior_agent.py:331-361): under `safety_time` slow below
    the lead; within 2x follow the lead's speed; otherwise cruise; emergency
    stop inside `braking_distance` (run_step's braking band).

    `own_v_ms`/`lead_v_ms` are m/s; the reference floors the closing speed
    at 1 m/s so TTC stays finite."""
    lead_kmh = lead_v_ms * MS_TO_KMH
    delta_v = jnp.maximum(own_v_ms - lead_v_ms, 1.0)
    ttc = lead_d / delta_v
    slow = jnp.maximum(lead_kmh - speed_decrease_kmh, 0.0)
    follow = jnp.maximum(MIN_FOLLOW_SPEED, lead_kmh)
    target = jnp.where(ttc < safety_time, jnp.minimum(slow, cruise_kmh),
                       jnp.where(ttc < 2.0 * safety_time,
                                 jnp.minimum(follow, cruise_kmh), cruise_kmh))
    return jnp.where(lead_d < braking_distance, 0.0, target)


class NPCState(NamedTuple):
    veh_xy: jax.Array      # (V, 2)
    veh_yaw: jax.Array     # (V,)
    veh_v: jax.Array       # (V,)
    veh_wp: jax.Array      # (V,) current target waypoint index in the town graph
    veh_active: jax.Array  # (V,) float mask
    ped_xy: jax.Array      # (P, 2)
    ped_goal: jax.Array    # (P, 2)
    ped_speed: jax.Array   # (P,)
    ped_active: jax.Array  # (P,)
    # 1.0 where this walker may take goals on the OPPOSITE sidewalk
    # (reference set_pedestrians_cross_factor, env_utils.py:326;
    # fraction = WorldParams.ped_crossing).  Non-crossers only ever sample
    # same-side goals.
    ped_cross: jax.Array   # (P,)


def light_phase_state(sim_time: jax.Array, phase_offset: jax.Array,
                      approach_yaw: jax.Array) -> jax.Array:
    """Traffic-light state for a given junction approach direction."""
    t = jnp.mod(sim_time + phase_offset, LIGHT_CYCLE)
    # EW axis gets the first green window, NS the second
    is_ew = jnp.abs(jnp.cos(approach_yaw)) >= jnp.abs(jnp.sin(approach_yaw))
    t_local = jnp.where(is_ew, t, jnp.mod(t + LIGHT_CYCLE / 2.0, LIGHT_CYCLE))
    state = jnp.where(t_local < GREEN_TIME, LIGHT_GREEN,
                      jnp.where(t_local < GREEN_TIME + YELLOW_TIME, LIGHT_YELLOW, LIGHT_RED))
    return state.astype(jnp.int32)


def zero_npcs(v_max: int, p_max: int) -> NPCState:
    """Constant all-zero NPC state for statically-NPC-free configs (bench,
    stage s1): with num_vehicles == num_pedestrians == 0 every slot's
    active mask is 0 forever, and inactive slot payloads are unobservable —
    collision_check masks them out, the render pack's actor rows carry
    ok=0 (and n_actors=0 skips them entirely), and step_npcs is statically
    skipped.  Skipping init_npcs' spawn sampling removes ~10 RNG/gather ops
    from EVERY merged auto-reset step; the sibling k_npc key is simply
    unused (other reset keys are unaffected — split keys are independent)."""
    return NPCState(
        veh_xy=jnp.zeros((v_max, 2)), veh_yaw=jnp.zeros(v_max),
        veh_v=jnp.zeros(v_max), veh_wp=jnp.zeros(v_max, jnp.int32),
        veh_active=jnp.zeros(v_max),
        ped_xy=jnp.zeros((p_max, 2)), ped_goal=jnp.zeros((p_max, 2)),
        ped_speed=jnp.zeros(p_max), ped_active=jnp.zeros(p_max),
        ped_cross=jnp.zeros(p_max))


def init_npcs(key: jax.Array, town, town_id: jax.Array,
              num_vehicles: int, num_pedestrians: int,
              ego_xy: jax.Array, v_max: int, p_max: int,
              min_ego_distance: float = 20.0,
              crossing: float = 0.0, running: float = 0.0) -> NPCState:
    """Spawn NPCs on spawn points / sidewalk offsets, masked to the stage's
    traffic preset (reference `env_utils.py:195-336`; spawn specs
    `core/learning.py:485-487`).

    `crossing`/`running` mirror spawn_pedestrians' percentage knobs
    (env_utils.py:233-241, both default 0.0 like every reference stage):
    a `crossing` fraction of walkers may sample goals on the opposite
    sidewalk; a `running` fraction moves at run speed (~2.5-3.5 m/s) instead
    of walk speed."""
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    n_spawn = tgather(town.num_spawn, town_id)

    # vehicles: random distinct-ish spawn points, not too close to ego
    s_idx = jax.random.randint(k1, (v_max,), 0, jnp.maximum(n_spawn, 1))
    sxy = tgather(town.spawn_xy, town_id, s_idx)
    syaw = tgather(town.spawn_yaw, town_id, s_idx)
    swp = tgather(town.spawn_wp, town_id, s_idx)
    far_from_ego = jnp.linalg.norm(sxy - ego_xy[None], axis=-1) > min_ego_distance
    slot_on = (jnp.arange(v_max) < num_vehicles) & far_from_ego
    # avoid stacking two NPCs on the same spawn: deactivate duplicates
    same = (s_idx[:, None] == s_idx[None, :]) & (jnp.arange(v_max)[:, None] > jnp.arange(v_max)[None, :])
    slot_on = slot_on & ~jnp.any(same, axis=1)

    veh = dict(
        veh_xy=sxy, veh_yaw=syaw,
        veh_v=jnp.zeros(v_max),
        veh_wp=swp.astype(jnp.int32),
        veh_active=slot_on.astype(jnp.float32),
    )

    # pedestrians: offset from random waypoints onto the sidewalk side
    n_wp = tgather(town.num_wp, town_id)
    w_idx = jax.random.randint(k2, (p_max,), 0, jnp.maximum(n_wp, 1))
    wxy = tgather(town.wp_xy, town_id, w_idx)
    wyaw = tgather(town.wp_yaw, town_id, w_idx)
    side = jnp.sign(jax.random.normal(k3, (p_max,)))
    offset = 4.5 + jax.random.uniform(k4, (p_max,)) * 1.5
    normal = jnp.stack([-jnp.sin(wyaw), jnp.cos(wyaw)], axis=-1)
    pxy = wxy + side[:, None] * offset[:, None] * normal
    ped_on = (jnp.arange(p_max) < num_pedestrians)
    can_cross = (jax.random.uniform(k6, (p_max,)) < crossing).astype(jnp.float32)
    goals = _sample_ped_goals(k5, town, town_id, p_max,
                              ped_xy=pxy, can_cross=can_cross)
    runs = jax.random.uniform(k7, (p_max,)) < running
    walk = PED_SPEED_MIN + jax.random.uniform(k5, (p_max,)) * (PED_SPEED_MAX - PED_SPEED_MIN)
    run = PED_RUN_MIN + jax.random.uniform(k7, (p_max,)) * (PED_RUN_MAX - PED_RUN_MIN)
    ped = dict(
        ped_xy=pxy, ped_goal=goals,
        ped_speed=jnp.where(runs, run, walk),
        ped_active=ped_on.astype(jnp.float32),
        ped_cross=can_cross,
    )
    return NPCState(**veh, **ped)


def _sample_ped_goals(key, town, town_id, p_max, ped_xy=None, can_cross=None):
    """Random sidewalk goal per walker.  With ped_xy/can_cross given,
    non-crossing walkers (can_cross=0) are pinned to the sidewalk side of
    the sampled waypoint they are currently on — only cross-factor walkers
    ever target the opposite side (reference WalkerAIController +
    set_pedestrians_cross_factor, env_utils.py:326)."""
    k1, k2, k3 = jax.random.split(key, 3)
    n_wp = tgather(town.num_wp, town_id)
    w_idx = jax.random.randint(k1, (p_max,), 0, jnp.maximum(n_wp, 1))
    wxy = tgather(town.wp_xy, town_id, w_idx)
    wyaw = tgather(town.wp_yaw, town_id, w_idx)
    normal = jnp.stack([-jnp.sin(wyaw), jnp.cos(wyaw)], axis=-1)
    side = jnp.sign(jax.random.normal(k2, (p_max,)))
    if ped_xy is not None and can_cross is not None:
        cur_side = jnp.sign(jnp.sum((ped_xy - wxy) * normal, axis=-1))
        cur_side = jnp.where(cur_side == 0.0, side, cur_side)
        side = jnp.where(can_cross > 0, side, cur_side)
    offset = 4.0 + jax.random.uniform(k3, (p_max,)) * 3.0
    return wxy + side[:, None] * offset[:, None] * normal


def step_npcs(key: jax.Array, npc: NPCState, town, town_id: jax.Array,
              sim_time: jax.Array, ego_xy: jax.Array, ego_v: jax.Array,
              ego_yaw: jax.Array, speed_factor: float = 0.8) -> NPCState:
    """Advance all NPC vehicles and pedestrians one tick."""
    # NOTE: all town-table lookups use fused two-level gathers
    # (arr[town_id, idx]) — materializing arr[town_id] first copies whole
    # padded waypoint tables per world under vmap.
    j_phase = tgather(town.junction_phase, town_id)

    # ---- vehicles ----
    target = tgather(town.wp_xy, town_id, npc.veh_wp)         # (V, 2)
    to_t = target - npc.veh_xy
    dist_t = jnp.linalg.norm(to_t, axis=-1)
    # advance waypoint when close; pick a successor branch randomly at lane ends
    k_branch, key = jax.random.split(key)
    branch = jax.random.randint(k_branch, npc.veh_wp.shape, 0, 3)
    branch = jnp.minimum(branch, jnp.maximum(
        tgather(town.wp_num_next, town_id, npc.veh_wp) - 1, 0))
    nxt = tgather(town.wp_next, town_id, npc.veh_wp, branch)
    nxt = jnp.where(nxt < 0, tgather(town.wp_next, town_id, npc.veh_wp, 0), nxt)
    nxt = jnp.where(nxt < 0, npc.veh_wp, nxt)
    reached = dist_t < 2.5
    new_wp = jnp.where(reached, nxt, npc.veh_wp).astype(jnp.int32)

    # hazard check: nearest actor in a forward cone (vehicles + ego + peds),
    # with the lead's speed for TTC car-following
    fwd = jnp.stack([jnp.cos(npc.veh_yaw), jnp.sin(npc.veh_yaw)], axis=-1)
    all_xy = jnp.concatenate([npc.veh_xy, ego_xy[None], npc.ped_xy], axis=0)
    all_active = jnp.concatenate([npc.veh_active, jnp.ones(1), npc.ped_active], axis=0)
    all_v = jnp.concatenate([npc.veh_v, ego_v[None],
                             jnp.zeros(npc.ped_xy.shape[0])], axis=0)
    rel = all_xy[None, :, :] - npc.veh_xy[:, None, :]          # (V, A, 2)
    d_all = jnp.linalg.norm(rel, axis=-1)
    ahead = jnp.einsum("vad,vd->va", rel, fwd) > 0.0
    cos_ang = jnp.einsum("vad,vd->va", rel, fwd) / jnp.maximum(d_all, 1e-3)
    in_cone = ahead & (cos_ang > 0.85) & (d_all > 0.1)
    d_masked = jnp.where(in_cone & (all_active > 0), d_all, 1e6)
    lead_idx = jnp.argmin(d_masked, axis=1)
    d_hazard = jnp.take_along_axis(d_masked, lead_idx[:, None], axis=1)[:, 0]
    lead_v = jnp.where(d_hazard < 1e5, all_v[lead_idx], 0.0)

    # overtake (TrafficManager-style lane change; reference expert's
    # behavior_agent.py:189-223): a blocked NPC on a multi-lane road hops its
    # target waypoint onto the adjacent lane when that lane is clear.
    # Prefer left (the reference overtakes left first), fall back to right.
    limit_kmh = tgather(town.wp_speed_limit, town_id, new_wp) * speed_factor
    blocked = (d_hazard < 18.0) & (lead_v < 0.5 * npc.veh_v + 1.0)

    n_veh = npc.veh_xy.shape[0]
    not_self = ~(jnp.arange(all_xy.shape[0])[None, :]
                 == jnp.arange(n_veh)[:, None])       # (V, A)

    def _clear(cand_wp):
        cand_xy = tgather(town.wp_xy, town_id, jnp.maximum(cand_wp, 0))
        d_cand = jnp.linalg.norm(all_xy[None, :, :] - cand_xy[:, None, :], axis=-1)
        return jnp.min(jnp.where((all_active[None, :] > 0) & not_self,
                                 d_cand, 1e6), axis=1) > 8.0

    # tailgating (behavior_agent.py:222-256): a faster vehicle close behind
    # -> yield to the right lane when it is free
    behind = jnp.einsum("vad,vd->va", rel, fwd) < 0.0
    cos_back = -jnp.einsum("vad,vd->va", rel, fwd) / jnp.maximum(d_all, 1e-3)
    in_back_cone = behind & (cos_back > 0.85) & (d_all > 0.1)
    d_back_masked = jnp.where(in_back_cone & (all_active > 0), d_all, 1e6)
    back_idx = jnp.argmin(d_back_masked, axis=1)
    d_back = jnp.take_along_axis(d_back_masked, back_idx[:, None], axis=1)[:, 0]
    back_v = jnp.where(d_back < 1e5, all_v[back_idx], 0.0)
    tailgated = (d_back < 12.0) & (back_v > npc.veh_v + 1.0)

    wp_l = tgather(town.wp_left, town_id, new_wp)
    wp_r = tgather(town.wp_right, town_id, new_wp)
    go_left = blocked & (wp_l >= 0) & _clear(wp_l)
    go_right = ((blocked | tailgated) & ~go_left & (wp_r >= 0)
                & _clear(wp_r))
    new_wp = jnp.where(go_left, wp_l, jnp.where(go_right, wp_r, new_wp))
    new_wp = new_wp.astype(jnp.int32)

    target = tgather(town.wp_xy, town_id, new_wp)
    to_t = target - npc.veh_xy
    desired_yaw = jnp.arctan2(to_t[:, 1], to_t[:, 0])
    yaw_err = jnp.arctan2(jnp.sin(desired_yaw - npc.veh_yaw),
                          jnp.cos(desired_yaw - npc.veh_yaw))

    # red light stop: approaching a junction with a red/yellow light
    my_jid = tgather(town.wp_junction_id, town_id, new_wp)
    my_dj = tgather(town.wp_dist_to_junction, town_id, new_wp)
    light = light_phase_state(sim_time, j_phase[jnp.maximum(my_jid, 0)], npc.veh_yaw)
    at_red = (my_jid >= 0) & (my_dj < 14.0) & (my_dj > 3.0) & (light != LIGHT_GREEN)

    # TTC-banded car-following (behavior_agent.py:331-361) replaces the old
    # linear distance ramp
    target_kmh = ttc_target_speed(npc.veh_v, lead_v, d_hazard, limit_kmh)
    target_speed = target_kmh / MS_TO_KMH
    target_speed = jnp.where(at_red, 0.0, jnp.maximum(target_speed, 0.0))

    accel = jnp.clip((target_speed - npc.veh_v) / DT, -8.0, 3.0)
    v_new = jnp.maximum(npc.veh_v + accel * DT, 0.0)
    yaw_rate = jnp.clip(2.2 * yaw_err, -1.6, 1.6) * jnp.minimum(v_new / 3.0, 1.0)
    yaw_new = npc.veh_yaw + yaw_rate * DT
    yaw_new = jnp.arctan2(jnp.sin(yaw_new), jnp.cos(yaw_new))
    xy_new = npc.veh_xy + v_new[:, None] * jnp.stack([jnp.cos(yaw_new), jnp.sin(yaw_new)], -1) * DT

    act = npc.veh_active[:, None]
    veh_xy = jnp.where(act > 0, xy_new, npc.veh_xy)
    veh_yaw = jnp.where(npc.veh_active > 0, yaw_new, npc.veh_yaw)
    veh_v = jnp.where(npc.veh_active > 0, v_new, npc.veh_v)

    # ---- pedestrians ----
    to_goal = npc.ped_goal - npc.ped_xy
    d_goal = jnp.linalg.norm(to_goal, axis=-1)
    dir_goal = to_goal / jnp.maximum(d_goal[:, None], 1e-3)
    ped_xy_new = npc.ped_xy + dir_goal * npc.ped_speed[:, None] * DT
    k_goal, key = jax.random.split(key)
    new_goals = _sample_ped_goals(k_goal, town, town_id, npc.ped_xy.shape[0],
                                  ped_xy=npc.ped_xy, can_cross=npc.ped_cross)
    reached_goal = d_goal < 1.0
    ped_goal = jnp.where(reached_goal[:, None], new_goals, npc.ped_goal)
    pact = npc.ped_active[:, None]
    ped_xy = jnp.where(pact > 0, ped_xy_new, npc.ped_xy)

    return NPCState(veh_xy=veh_xy, veh_yaw=veh_yaw, veh_v=veh_v,
                    veh_wp=new_wp, veh_active=npc.veh_active,
                    ped_xy=ped_xy, ped_goal=ped_goal,
                    ped_speed=npc.ped_speed, ped_active=npc.ped_active,
                    ped_cross=npc.ped_cross)


def collision_check(ego_xy: jax.Array, ego_yaw: jax.Array, npc: NPCState,
                    off_road_distance: jax.Array,
                    off_road_threshold: float = 7.0):
    """Collision flags for the ego against NPC vehicles, pedestrians, and
    static obstacles (off-road = hitting fences/poles/buildings).

    Returns (hit_vehicle, hit_pedestrian, hit_other) booleans.
    Reference collision typing: `core/carla_env.py:254-269`.
    """
    fwd = jnp.stack([jnp.cos(ego_yaw), jnp.sin(ego_yaw)], axis=-1)
    ego_discs = jnp.stack([ego_xy + VEHICLE_HALF_LEN * fwd,
                           ego_xy - VEHICLE_HALF_LEN * fwd])   # (2, 2)

    vfwd = jnp.stack([jnp.cos(npc.veh_yaw), jnp.sin(npc.veh_yaw)], axis=-1)
    veh_discs = jnp.stack([npc.veh_xy + VEHICLE_HALF_LEN * vfwd,
                           npc.veh_xy - VEHICLE_HALF_LEN * vfwd], axis=1)  # (V, 2, 2)
    d_veh = jnp.linalg.norm(ego_discs[None, :, None, :] - veh_discs[:, None, :, :], axis=-1)
    hit_vehicle = jnp.any((d_veh < 2 * VEHICLE_RADIUS) & (npc.veh_active[:, None, None] > 0))

    d_ped = jnp.linalg.norm(ego_discs[None, :, :] - npc.ped_xy[:, None, :], axis=-1)
    hit_ped = jnp.any((d_ped < VEHICLE_RADIUS + PED_RADIUS) & (npc.ped_active[:, None] > 0))

    hit_other = off_road_distance > off_road_threshold
    return hit_vehicle, hit_ped, hit_other
