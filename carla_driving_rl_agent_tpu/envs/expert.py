"""Privileged expert autopilot (vectorized BehaviorAgent).

Distills the reference's privileged navigation stack — `BehaviorAgent`
(`navigation/behavior_agent.py:363-432`: traffic-light manager -> pedestrian
avoidance -> car-following -> intersection slow-down -> cruise), its
`LocalPlanner` waypoint buffer, and the `VehiclePIDController`
(`navigation/controller.py:15-214`, steer cap 0.8, throttle cap 0.75) — into
a pure-JAX policy over the ego's planned route.  Used by the collect wrapper
to produce imitation traces (reference `CARLACollectWrapper`,
`rl/environments/carla/environment.py:667-825`).

Behaviour profiles (reference `navigation/types_behavior.py:7-40`):
cautious / normal / aggressive = speed factor + safety distances.

Overtake/tailgate (reference `behavior_agent.py:189-256`) — deviation
(documented): the reference re-plans its route from the neighbour lane via
`set_destination`; here lane changes already live in the PLANNED route
(the A* has zero-cost lateral edges, envs/route.py) and blocked-lead
safety comes from the shared TTC car-following band
(traffic.ttc_target_speed).  Dynamic mid-route lane hops are implemented
for NPC vehicles (traffic.step_npcs), which hold a town-graph waypoint the
hop can retarget; the expert tracks a fixed RouteBank polyline instead, so
a hop would desynchronise it from its own route features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from carla_driving_rl_agent_tpu.envs.world import WorldState, WorldParams, TownDev, RoutesDev
from carla_driving_rl_agent_tpu.envs import traffic
from carla_driving_rl_agent_tpu.envs.dynamics import tgather

# speed_decrease (km/h under the lead in the TTC band) mirrors the
# reference profiles' values (types_behavior.py: 12/10/8)
BEHAVIORS = dict(
    cautious=dict(speed_factor=0.6, hazard_distance=24.0, brake_gain=1.4,
                  speed_decrease=12.0),
    normal=dict(speed_factor=0.8, hazard_distance=18.0, brake_gain=1.0,
                speed_decrease=10.0),
    aggressive=dict(speed_factor=1.0, hazard_distance=12.0, brake_gain=0.8,
                    speed_decrease=8.0),
)

STEER_GAIN = 1.8
STEER_CAP = 0.8          # reference controller.py:22 max_steering=0.8
STEER_SLEW = 0.1         # reference controller.py:72-75 ±0.1/step slew limit
MAX_THROTTLE = 0.75      # reference controller.py:22 max_throttle
MAX_BRAKE = 0.3          # reference controller.py:22 max_brake
LOOKAHEAD = 3            # route waypoints ahead for the steering target

_PROFILE_KEYS = ("speed_factor", "hazard_distance", "brake_gain",
                 "speed_decrease")


def behaviour_profiles(behaviour_ids: jax.Array) -> dict:
    """Per-world behaviour profiles as TRACED arrays: gather each profile
    field from the (3,) cautious/normal/aggressive table by id.  Lets one
    compiled rollout mix behaviours across worlds (the reference cycles
    behaviours across collect runs, `core/learning.py:196-212`) instead of
    recompiling per behaviour string."""
    order = ("cautious", "normal", "aggressive")
    return {k: jnp.asarray([BEHAVIORS[b][k] for b in order])[behaviour_ids]
            for k in _PROFILE_KEYS}


def expert_action(state: WorldState, params: WorldParams, town: TownDev,
                  routes: RoutesDev, behaviour: str = "normal",
                  ignore_traffic_light: bool = True,
                  profile: dict | None = None) -> jax.Array:
    """Expert action in the env's [-1, 1]^2 action space (throttle-as-desired-
    speed encoding, so a0 = 2 * desired_kmh / 100 - 1).  `profile` (traced
    scalars, see behaviour_profiles) overrides the static `behaviour` table
    row when given."""
    prof = profile if profile is not None else BEHAVIORS[behaviour]
    pos = jnp.stack([state.x, state.y])

    # steering: pure pursuit of a look-ahead route waypoint (point gather —
    # full-route gathers at batch scale are the TPU poison, see world.py)
    r_len = tgather(routes.length, state.town_id, state.route_id)
    target_idx = jnp.minimum(state.wp_idx + LOOKAHEAD, r_len - 1)
    to_t = tgather(routes.xy, state.town_id, state.route_id, target_idx) - pos
    desired_yaw = jnp.arctan2(to_t[1], to_t[0])
    yaw_err = jnp.arctan2(jnp.sin(desired_yaw - state.yaw),
                          jnp.cos(desired_yaw - state.yaw))
    # VehiclePIDController steering regulation (controller.py:70-85): slew
    # the raw command to within ±0.1/step of the PREVIOUSLY APPLIED steering
    # (state.steer is last step's control, = past_steering), then cap at 0.8.
    raw_steer = STEER_GAIN * yaw_err
    steer = jnp.clip(raw_steer, state.steer - STEER_SLEW,
                     state.steer + STEER_SLEW)
    steer = jnp.clip(steer, -STEER_CAP, STEER_CAP)

    # desired speed: limit * behaviour factor
    limit = tgather(town.wp_speed_limit, state.town_id, 0)
    desired = limit * prof["speed_factor"]

    # hazard: nearest actor in a forward cone (behavior_agent.py:258-361)
    fwd = jnp.stack([jnp.cos(state.yaw), jnp.sin(state.yaw)])
    all_xy = jnp.concatenate([state.npc.veh_xy, state.npc.ped_xy], axis=0)
    all_on = jnp.concatenate([state.npc.veh_active, state.npc.ped_active], axis=0)
    all_v = jnp.concatenate([state.npc.veh_v,
                             jnp.zeros(state.npc.ped_xy.shape[0])], axis=0)
    rel = all_xy - pos[None]
    d = jnp.linalg.norm(rel, axis=-1)
    cos_a = (rel @ fwd) / jnp.maximum(d, 1e-3)
    in_cone = (cos_a > 0.8) & (d > 0.1) & (all_on > 0)
    d_masked = jnp.where(in_cone, d, 1e6)
    lead_idx = jnp.argmin(d_masked)
    d_hazard = d_masked[lead_idx]
    lead_v = jnp.where(d_hazard < 1e5, all_v[lead_idx], 0.0)
    # TTC-banded car-following (behavior_agent.py:331-361) combined with the
    # proportional hazard ramp (take the more cautious of the two)
    ttc_kmh = traffic.ttc_target_speed(
        state.v, lead_v, d_hazard, desired,
        speed_decrease_kmh=prof["speed_decrease"])
    hd = prof["hazard_distance"]
    slow = jnp.clip((d_hazard - 5.0) / hd, 0.0, 1.0)
    desired = jnp.minimum(desired * slow, ttc_kmh)

    # red light stop (agent.py:74-110), unless ignored (training collection
    # default — reference core/learning.py:196-212 ignore_traffic_light=True)
    if not ignore_traffic_light:
        j_xy = tgather(town.junction_xy, state.town_id)
        n_j = tgather(town.num_junctions, state.town_id)
        d_j = jnp.linalg.norm(j_xy - pos[None], axis=-1)
        d_j = jnp.where(jnp.arange(j_xy.shape[0]) < n_j, d_j, 1e9)
        jid = jnp.argmin(d_j)
        light = traffic.light_phase_state(
            state.sim_time, tgather(town.junction_phase, state.town_id, jid), state.yaw)
        at_red = (d_j[jid] < 14.0) & (d_j[jid] > 4.0) & (light != traffic.LIGHT_GREEN)
        desired = jnp.where(at_red, 0.0, desired)

    # slow down in junctions (intersection management, behavior_agent.py:363-432)
    near_j = jnp.linalg.norm(
        tgather(town.junction_xy, state.town_id) - pos[None], axis=-1).min() < 12.0
    desired = jnp.where(near_j, jnp.minimum(desired, limit * 0.5), desired)
    # slow for sharp turns
    desired = desired * (1.0 - 0.7 * jnp.clip(jnp.abs(yaw_err) / 0.8, 0.0, 1.0))

    # throttle/brake caps (controller.py:63-68, max_throttle=0.75
    # max_brake=0.3) mapped through the throttle-as-desired-speed encoding
    # (dynamics.actions_to_control: throttle=(desired-cur)/100,
    # brake=(cur-desired)/100): cap the commanded speed DELTA so the env's
    # derived control never exceeds the reference PID's output limits.
    cur_kmh = state.v * 3.6
    desired = jnp.clip(desired, cur_kmh - 100.0 * MAX_BRAKE,
                       cur_kmh + 100.0 * MAX_THROTTLE)
    a0 = jnp.clip(2.0 * desired / 100.0 - 1.0, -1.0, 1.0)
    return jnp.stack([a0, steer])
