"""The world core: a CARLA-equivalent driving world as pure JAX functions.

This module is the TPU-native replacement for the reference's process
boundary to the UE4 CARLA server (`rl/environments/carla/environment.py`):
`step(key, state, action) -> (state', reward, terminated, truncated, info)`
and `reset(key)` are pure, jittable, and vmapped over thousands of worlds.

Behavior contracts preserved (file:line cite the reference):
  * action space Box(-1,1,(2,)) = [throttle/brake, steer]  — core/carla_env.py:18
  * throttle-as-desired-speed control mapping               — core/carla_env.py:141-180
  * reward: -penalty on collision, else speed * similarity
    damped by max(1, (d_waypoint/2)^2)                      — core/carla_env.py:182-202
  * collision penalties 1000 (pedestrian) / 500 (vehicle) /
    10 (other), all terminal                                — core/carla_env.py:254-269
  * terminal when destination within 2 m                    — environment.py:946-950
  * vector features (road 9 / vehicle 4 / navigation N)     — core/carla_env.py:335-382
  * random weather / town resampling at reset               — core/carla_env.py:214-221
  * fixed_delta = 1/30 s                                    — environment.py:42-45,74-77
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from carla_driving_rl_agent_tpu.envs import dynamics, route as route_mod, traffic
from carla_driving_rl_agent_tpu.envs import town as town_mod
from carla_driving_rl_agent_tpu.envs.dynamics import DT, tgather


class TownDev(NamedTuple):
    """Device-resident stacked town arrays (see town.TownBank)."""
    wp_xy: jax.Array
    wp_yaw: jax.Array
    wp_speed_limit: jax.Array
    wp_next: jax.Array
    wp_num_next: jax.Array
    wp_junction_id: jax.Array
    wp_dist_to_junction: jax.Array
    wp_left: jax.Array
    wp_right: jax.Array
    num_wp: jax.Array
    junction_xy: jax.Array
    junction_phase: jax.Array
    num_junctions: jax.Array
    spawn_xy: jax.Array
    spawn_yaw: jax.Array
    spawn_wp: jax.Array
    num_spawn: jax.Array
    buildings: jax.Array
    num_buildings: jax.Array
    edges_xy: jax.Array
    num_edges: jax.Array
    extent: jax.Array
    road_half: jax.Array
    cell_segs: jax.Array   # (T, GH, GW, K*4) packed per-cell seg endpoints (physics)
    cell_geom: jax.Array   # (T, GH, GW, 96) packed per-cell render-geometry prefix


class RoutesDev(NamedTuple):
    """Device-resident stacked route banks: (T_towns, R, L, ...).

    `xyy` packs [x, y, yaw, 0] per waypoint so the per-step route-window
    lookup is ONE contiguous row gather (the separate xy + yaw gathers were
    a measured physics cost — TPU gathers run ~1 element/cycle).  `start`
    and `end_xy` materialize the per-route constants ([x0, y0, yaw0, 0] and
    the destination point) that reset_world and step_world otherwise
    re-gather point-wise from the polyline every auto-reset/step."""
    xy: jax.Array
    yaw: jax.Array
    option: jax.Array
    length: jax.Array
    xyy: jax.Array      # (T, R, L, 4) [x, y, yaw, 0]
    start: jax.Array    # (T, R, 4)    [x0, y0, yaw0, 0]
    end_xy: jax.Array   # (T, R, 2)    destination point


class WorldState(NamedTuple):
    """Complete per-world simulation state (a pytree; vmap over axis 0)."""
    # ego
    x: jax.Array
    y: jax.Array
    yaw: jax.Array
    v: jax.Array
    throttle: jax.Array
    brake: jax.Array
    steer: jax.Array
    # route following
    route_id: jax.Array
    wp_idx: jax.Array
    similarity: jax.Array
    # world config of this episode
    town_id: jax.Array
    weather_id: jax.Array
    # clocks / episode bookkeeping
    timestep: jax.Array
    sim_time: jax.Array
    episode: jax.Array
    total_reward: jax.Array
    # per-step collision bookkeeping
    collision_penalty: jax.Array
    should_terminate: jax.Array
    # NPCs
    npc: traffic.NPCState
    # RNG
    key: jax.Array


@dataclass(frozen=True)
class WorldParams:
    """Static configuration (python-level; changing it retraces)."""
    town_names: Tuple[str, ...] = ("Town03",)
    random_towns: bool = False
    num_vehicles: int = 0
    num_pedestrians: int = 0
    v_max: int = 1                      # static NPC slot counts
    p_max: int = 1
    # walker crossing/running fractions (reference spawn_pedestrians,
    # env_utils.py:233-241 + set_pedestrians_cross_factor :326; every
    # reference stage leaves both at 0.0 — parity defaults)
    ped_crossing: float = 0.0
    ped_running: float = 0.0
    weather_ids: Tuple[int, ...] = (0,)  # indices into weather.WEATHER_NAMES
    collision_penalty: float = 1000.0
    # Safety-shaping knobs (defaults = exact reference parity).  The parity
    # off-road exit costs penalty/100 = 10 (core/carla_env.py:254-269), which
    # barely prices death once the policy sharpens (diagnosed: ~0.9 collision
    # rate, all off-road mid-segment); the 'safe' fine-tune recipe lowers the
    # divisor (=> bigger off-road penalty) and caps the speed the reward can
    # pay for, trading cruise speed for staying on the road the way the
    # reference's own slow agents (8.5 km/h, 0.64 collisions) implicitly do.
    off_road_penalty_divisor: float = 100.0
    reward_speed_cap: float = 150.0     # km/h the reward credits at most
    # NOTE deviation (safety-shaping knob, parity no-op at 0): reward
    # penalty per km/h ABOVE reward_speed_cap. The cap alone only zeroes
    # the incentive beyond it — measured on hardware (safe-s5 v1) the
    # policy still cruises ~2 km/h over; this makes over-speed actively
    # negative so the equilibrium moves below the cap.
    speed_over_cap_penalty: float = 0.0
    throttle_as_desired_speed: bool = True
    disable_reverse: bool = True
    max_timesteps: int = 512
    num_waypoints_for_feature: int = 5
    # append a signed lateral-offset scalar to the navigation feature
    # (DEVIATION, opt-in: the reference obs has no explicit lateral cue —
    # core/carla_env.py:366-382.  Every published failure mode is an
    # UNCORRECTED mid-segment lateral drift at speed, evaluation/
    # diagnose.py; waypoint DISTANCES barely move as the car slides
    # sideways toward the road edge, so the policy cannot see the error it
    # must steer against.  Changes the navigation dim -> checkpoints are
    # not interchangeable across this flag.)
    lateral_obs: bool = False
    num_routes: int = 128
    max_route_len: int = 512
    origin_spawns: Optional[Tuple[int, ...]] = None   # fixed origin set (stage s1/s2)
    range_controls: Tuple[Tuple[float, float], ...] = ((0.0, 1.0), (0.0, 1.0), (-1.0, 1.0))
    off_road_threshold: float = 5.5   # just past the sidewalk = fences/walls
    force_green_lights: bool = True    # training hack (reference environment.py:420-424)
    # reward function: 'default' = CARLAEnv speed*similarity/d^2
    # (core/carla_env.py:182-202); 'shaped' = OneCamera time-cost/waypoint/
    # direction/speed-limit shaping (environment.py:905-923)
    reward_mode: str = "default"
    seed: int = 42


def build_world_data(params: WorldParams) -> Tuple[TownDev, RoutesDev]:
    """Host-side: build towns + route banks and upload to device."""
    bank = town_mod.build_town_bank(list(params.town_names))
    town = TownDev(
        wp_xy=jnp.asarray(bank.wp_xy),
        wp_yaw=jnp.asarray(bank.wp_yaw),
        wp_speed_limit=jnp.asarray(bank.wp_speed_limit),
        wp_next=jnp.asarray(bank.wp_next),
        wp_num_next=jnp.asarray(bank.wp_num_next),
        wp_junction_id=jnp.asarray(bank.wp_junction_id),
        wp_dist_to_junction=jnp.asarray(bank.wp_dist_to_junction),
        wp_left=jnp.asarray(bank.wp_left),
        wp_right=jnp.asarray(bank.wp_right),
        num_wp=jnp.asarray(bank.num_wp),
        junction_xy=jnp.asarray(bank.junction_xy),
        junction_phase=jnp.asarray(bank.junction_phase),
        num_junctions=jnp.asarray(bank.num_junctions),
        spawn_xy=jnp.asarray(bank.spawn_xy),
        spawn_yaw=jnp.asarray(bank.spawn_yaw),
        spawn_wp=jnp.asarray(bank.spawn_wp),
        num_spawn=jnp.asarray(bank.num_spawn),
        buildings=jnp.asarray(bank.buildings),
        num_buildings=jnp.asarray(bank.num_buildings),
        edges_xy=jnp.asarray(bank.edges_xy),
        num_edges=jnp.asarray(bank.num_edges),
        extent=jnp.asarray(bank.extent),
        road_half=jnp.asarray(bank.road_half),
        cell_segs=jnp.asarray(bank.cell_segs),
        cell_geom=jnp.asarray(bank.cell_geom),
    )
    banks = []
    for name in params.town_names:
        td = town_mod.get_town(name)
        rb = route_mod.build_route_bank(
            td, num_routes=params.num_routes, max_len=params.max_route_len,
            origin_spawns=list(params.origin_spawns) if params.origin_spawns else None,
            seed=params.seed)
        banks.append(rb)
    xy_s = np.stack([b.xy for b in banks])            # (T, R, L, 2)
    yaw_s = np.stack([b.yaw for b in banks])          # (T, R, L)
    len_s = np.stack([b.length for b in banks])       # (T, R)
    xyy = np.concatenate(
        [xy_s, yaw_s[..., None], np.zeros_like(yaw_s[..., None])],
        axis=-1).astype(np.float32)                   # (T, R, L, 4)
    end_idx = np.maximum(len_s.astype(np.int64) - 1, 0)
    end_xy = np.take_along_axis(
        xy_s, end_idx[..., None, None].repeat(2, -1), axis=2)[:, :, 0]
    routes = RoutesDev(
        xy=jnp.asarray(xy_s),
        yaw=jnp.asarray(yaw_s),
        option=jnp.asarray(np.stack([b.option for b in banks])),
        length=jnp.asarray(len_s),
        xyy=jnp.asarray(xyy),
        start=jnp.asarray(xyy[:, :, 0]),
        end_xy=jnp.asarray(end_xy.astype(np.float32)),
    )
    return town, routes


_route_fns = route_mod.make_route_functions(window=10)

# Forward route window gathered per physics step: must cover the
# update_index look-ahead (10) and the navigation feature's
# new_idx + amount - 1 <= 9 + 4 reach.
ROUTE_WINDOW = 16


def _reset_draws(key: jax.Array, params: WorldParams, town: TownDev,
                 routes: RoutesDev, town_select: jax.Array | int = -1):
    """The RNG draws + gathers of a fresh episode, shared verbatim between
    reset_world and the fused physics step so both produce bitwise-identical
    reset values.  Returns (town_id, weather_id, route_id, ego_xy, ego_yaw,
    sim_time, k_npc, k_state)."""
    k_town, k_weather, k_route, k_npc, k_time, k_state = jax.random.split(key, 6)

    n_towns = len(params.town_names)
    if params.random_towns and n_towns > 1:
        town_id = jax.random.randint(k_town, (), 0, n_towns)
    else:
        town_id = jnp.zeros((), jnp.int32)
    # traced override: lets one compiled program evaluate on any town in the
    # bank (the 48-scenario sweep compiles once instead of once per town)
    town_select = jnp.asarray(town_select, jnp.int32)
    town_id = jnp.where(town_select >= 0, town_select, town_id).astype(jnp.int32)

    w_ids = jnp.asarray(params.weather_ids, jnp.int32)
    weather_id = w_ids[jax.random.randint(k_weather, (), 0, len(params.weather_ids))]

    route_id = jax.random.randint(k_route, (), 0, routes.xy.shape[1])
    # ONE packed row gather, NOT routes.xy[town_id, route_id][0]: reset_world
    # runs merged into EVERY auto-reset step, and a full-route gather per
    # world per step is the dominant TPU cost (~1 gathered element/cycle)
    s_row = tgather(routes.start, town_id, route_id)   # [x0, y0, yaw0, 0]
    sim_time = jax.random.uniform(k_time, ()) * traffic.LIGHT_CYCLE
    return (town_id, weather_id, route_id.astype(jnp.int32),
            s_row[:2], s_row[2], sim_time, k_npc, k_state)


def reset_world(key: jax.Array, params: WorldParams, town: TownDev,
                routes: RoutesDev, episode: jax.Array | int = 0,
                town_select: jax.Array | int = -1) -> WorldState:
    """Fresh episode: sample town/weather/route, spawn ego + NPCs.

    Mirrors the reference's reset pipeline (`environment.py:226-242,487-529` +
    `core/carla_env.py:204-221`); the 30-frame physics settling skip
    (`environment.py:409-415`) has no analogue — kinematic spawns are at rest.
    """
    (town_id, weather_id, route_id, ego_xy, ego_yaw, sim_time, k_npc,
     k_state) = _reset_draws(key, params, town, routes, town_select)

    if params.num_vehicles == 0 and params.num_pedestrians == 0:
        # static skip (exact — see traffic.zero_npcs): reset_world runs
        # merged into EVERY auto-reset step, and the spawn sampling was
        # ~10 RNG/gather ops per step for permanently-inactive slots
        npc = traffic.zero_npcs(params.v_max, params.p_max)
    else:
        npc = traffic.init_npcs(k_npc, town, town_id, params.num_vehicles,
                                params.num_pedestrians, ego_xy,
                                v_max=params.v_max, p_max=params.p_max,
                                crossing=params.ped_crossing,
                                running=params.ped_running)

    return WorldState(
        x=ego_xy[0], y=ego_xy[1], yaw=ego_yaw, v=jnp.zeros(()),
        throttle=jnp.zeros(()), brake=jnp.zeros(()), steer=jnp.zeros(()),
        route_id=route_id.astype(jnp.int32), wp_idx=jnp.ones((), jnp.int32),
        similarity=jnp.ones(()),
        town_id=town_id.astype(jnp.int32), weather_id=weather_id,
        timestep=jnp.zeros((), jnp.int32), sim_time=sim_time,
        episode=jnp.asarray(episode, jnp.int32),
        total_reward=jnp.zeros(()),
        collision_penalty=jnp.zeros(()), should_terminate=jnp.zeros((), jnp.bool_),
        npc=npc, key=k_state,
    )


def _off_road_distance(town: TownDev, town_id, x, y):
    """Distance from the ego to the nearest road centerline (replaces UE4
    static-mesh collision).

    Uses the town's PACKED nearest-segment cell table (town.CELL_RES grid,
    24 candidate segments' endpoints materialized per cell at bank build)
    instead of scanning every segment: this runs EVERY physics step per
    world, and the candidate set provably contains the true nearest segment
    for any position within threshold distance of a road
    (tests/test_world.py pins equivalence).  Positions whose candidate
    distances all exceed ~CELL_RES are far off-road either way — the
    threshold comparison is unaffected.  The packed table turns the old
    dependent two-level gather (indices, then endpoints) into ONE contiguous
    row gather per world — TPU gathers run ~1 element/cycle, so the
    dependent form was a measured physics cost (round-4 bench_parts
    phys_offroad split)."""
    from carla_driving_rl_agent_tpu.envs.town import CELL_RES
    gh, gw = town.cell_segs.shape[1], town.cell_segs.shape[2]
    cx = jnp.clip((x / CELL_RES).astype(jnp.int32), 0, gw - 1)
    cy = jnp.clip((y / CELL_RES).astype(jnp.int32), 0, gh - 1)
    segs = tgather(town.cell_segs, town_id, cy, cx).reshape(-1, 4)  # (K, 4)
    ex = segs[:, 2] - segs[:, 0]
    ey = segs[:, 3] - segs[:, 1]
    L2 = jnp.maximum(ex * ex + ey * ey, 1e-9)
    rx = x - segs[:, 0]
    ry = y - segs[:, 1]
    t = jnp.clip((rx * ex + ry * ey) / L2, 0.0, 1.0)
    dx = rx - t * ex
    dy = ry - t * ey
    return jnp.sqrt(jnp.min(dx * dx + dy * dy))


def step_world(state: WorldState, action: jax.Array, params: WorldParams,
               town: TownDev, routes: RoutesDev):
    """One world tick. Returns (state', reward, terminated, truncated, info)."""
    key, k_npc = jax.random.split(state.key)

    # --- actions -> control -> dynamics (core/carla_env.py:141-180) ---
    rc = params.range_controls
    control = dynamics.actions_to_control(
        action, state.v,
        throttle_as_desired_speed=params.throttle_as_desired_speed,
        disable_reverse=params.disable_reverse,
        range_throttle=rc[0], range_brake=rc[1], range_steer=rc[2])
    x, y, yaw, v = dynamics.step_bicycle(state.x, state.y, state.yaw, state.v, control)

    # --- NPCs tick in lock-step (replaces TrafficManager autopilot fleet) ---
    # Static short-circuit at zero configured NPCs: the no-traffic configs
    # (bench, stage-s1) otherwise pay ~4 ms/32-step-chunk of pure op-count
    # overhead stepping permanently-inactive slots (round-4 bench_parts
    # phys_npc split).  Inactive slots never move or collide, so skipping
    # the tick is exact; the state arrays keep their static shapes.
    if params.num_vehicles == 0 and params.num_pedestrians == 0:
        npc = state.npc
    else:
        npc = traffic.step_npcs(k_npc, state.npc, town, state.town_id,
                                state.sim_time, jnp.stack([x, y]), v, yaw)

    # --- route following update (navigation/route.py:33-53) ---
    # Gather only a short forward WINDOW of the route, not the whole (L, 2)
    # polyline: TPU gathers run at ~1 element/cycle, so batch-scale
    # full-route gathers (1024 worlds x 512 waypoints, every step) were the
    # single largest physics cost, while the update only ever reads
    # `window` forward waypoints.  The route functions are index-shift
    # invariant: passing the window with a local idx of 0 and the remaining
    # length reproduces the full-route results exactly (pinned by
    # tests/test_route.py window-equivalence tests).
    r_len = tgather(routes.length, state.town_id, state.route_id)
    rem = r_len - state.wp_idx                  # >= 1: wp_idx <= r_len - 1
    offs = jnp.minimum(jnp.arange(ROUTE_WINDOW), rem - 1)
    w_ids = state.wp_idx + offs
    # ONE packed [x, y, yaw, 0] row gather for the window (xy + yaw used to
    # be two separate gathers), and the per-route destination comes from the
    # materialized end-point table instead of re-gathering the polyline
    w_row = tgather(routes.xyy, state.town_id, state.route_id, w_ids)
    w_xy = w_row[:, :2]
    w_yaw = w_row[:, 2]
    pos = jnp.stack([x, y])
    local_idx = _route_fns["update_index"](w_xy, rem,
                                           jnp.zeros((), jnp.int32), pos)
    wp_idx = (state.wp_idx + local_idx).astype(jnp.int32)
    similarity = _route_fns["similarity"](w_yaw, local_idx, yaw)
    d_next = _route_fns["distance_to_next"](w_xy, local_idx, pos)
    end_xy = tgather(routes.end_xy, state.town_id, state.route_id)
    d_dest = jnp.linalg.norm(end_xy - pos)

    # --- collisions (core/carla_env.py:254-269) ---
    off_road = _off_road_distance(town, state.town_id, x, y)
    # the configured threshold is calibrated for single-lane roads
    # (road_half = 3.8); wider (multi-lane) towns shift it by the extra width
    off_road_thr = (params.off_road_threshold
                    + (tgather(town.road_half, state.town_id) - (town_mod.LANE_WIDTH + 0.3)))
    hit_veh, hit_ped, hit_other = traffic.collision_check(
        pos, yaw, npc, off_road, off_road_threshold=off_road_thr)
    pen = params.collision_penalty
    collision_penalty = (jnp.where(hit_ped, pen, 0.0)
                         + jnp.where(hit_veh, pen / 2.0, 0.0)
                         + jnp.where(hit_other,
                                     pen / params.off_road_penalty_divisor,
                                     0.0))
    should_terminate = hit_veh | hit_ped | hit_other

    # --- reward ---
    spd_kmh = dynamics.speed_kmh(v)
    if params.reward_mode == "shaped":
        # OneCamera shaped reward (reference environment.py:905-923):
        # time_cost - collision + waypoint term + direction term + speed-limit
        speed_c = jnp.minimum(spd_kmh, params.reward_speed_cap)
        direction = jnp.where((similarity >= 0.75) & (similarity <= 1.0),
                              speed_c * similarity,
                              (speed_c + 1.0) * jnp.abs(similarity) * -2.0)
        wp_term = jnp.minimum(d_next, 100.0)
        wp_term = jnp.where(wp_term <= 5.0, -wp_term, wp_term * -3.0)
        limit = _speed_limit(town, state.town_id)
        speed_pen = jnp.where(spd_kmh > limit, 2.0 * (limit - spd_kmh), 0.0)
        reward = -1.0 - collision_penalty + wp_term + direction + speed_pen
    else:
        # CARLAEnv reward (core/carla_env.py:182-202); the cap is a no-op at
        # the parity default (150 km/h is unreachable)
        r_drive = jnp.minimum(spd_kmh, params.reward_speed_cap) * similarity
        damp = jnp.maximum(1.0, (d_next / 2.0) ** 2)
        r_drive = jnp.where(r_drive != 0.0, r_drive / damp, r_drive)
        reward = jnp.where(collision_penalty > 0.0, -collision_penalty, r_drive)

    if params.speed_over_cap_penalty:   # static: compiled out at parity 0.0
        reward = reward - params.speed_over_cap_penalty * jnp.maximum(
            spd_kmh - params.reward_speed_cap, 0.0)

    # --- terminal / truncation (environment.py:946-950; learn-loop cutoff) ---
    arrived = d_dest <= 2.0
    terminated = should_terminate | arrived
    timestep = state.timestep + 1
    truncated = (timestep >= params.max_timesteps) & ~terminated

    new_state = WorldState(
        x=x, y=y, yaw=yaw, v=v,
        throttle=control.throttle, brake=control.brake, steer=control.steer,
        route_id=state.route_id, wp_idx=wp_idx, similarity=similarity,
        town_id=state.town_id, weather_id=state.weather_id,
        timestep=timestep, sim_time=state.sim_time + DT,
        episode=state.episode,
        total_reward=state.total_reward + reward,
        collision_penalty=collision_penalty, should_terminate=should_terminate,
        npc=npc, key=key,
    )

    info = dict(
        speed=spd_kmh, speed_limit=_speed_limit(town, state.town_id),
        similarity=similarity, distance_to_next_waypoint=d_next,
        distance_to_destination=d_dest,
        episode=state.episode.astype(jnp.float32),
        timestep=timestep.astype(jnp.float32),
        total_reward=new_state.total_reward, reward=reward,
        collision=should_terminate,
        # collision typing + road offset for diagnostics (evaluation/diagnose.py)
        hit_vehicle=hit_veh, hit_pedestrian=hit_ped, hit_other=hit_other,
        off_road_distance=off_road,
    )
    return new_state, reward, terminated, truncated, info


def _speed_limit(town: TownDev, town_id) -> jax.Array:
    return tgather(town.wp_speed_limit, town_id, 0)


# ------------------------------------------------------------------
# Vector observation features (core/carla_env.py:335-382)
# ------------------------------------------------------------------

def road_features(state: WorldState, params: WorldParams, town: TownDev) -> jax.Array:
    """9 features: [is_intersection, is_junction, is_at_traffic_light,
    speed_limit/100, one-hot light-state(5)] — core/carla_env.py:335-351.
    (CARLA's is_intersection is a deprecated alias of is_junction.)"""
    pos = jnp.stack([state.x, state.y])
    j_xy = tgather(town.junction_xy, state.town_id)
    n_j = tgather(town.num_junctions, state.town_id)
    d_j = jnp.linalg.norm(j_xy - pos[None], axis=-1)
    d_j = jnp.where(jnp.arange(j_xy.shape[0]) < n_j, d_j, 1e9)
    jid = jnp.argmin(d_j)
    d_min = d_j[jid]
    is_junction = (d_min < town_mod.JUNCTION_RADIUS).astype(jnp.float32)

    light_state = traffic.light_phase_state(
        state.sim_time, tgather(town.junction_phase, state.town_id, jid), state.yaw)
    if params.force_green_lights:
        # training hack: ego's light is forced green (reference environment.py:420-424)
        light_state = jnp.full_like(light_state, traffic.LIGHT_GREEN)
    approaching = (d_min < 14.0) & (d_min > town_mod.JUNCTION_RADIUS * 0.5)
    is_at_light = (approaching & (light_state == traffic.LIGHT_RED)).astype(jnp.float32)
    light_for_onehot = jnp.where(approaching, light_state, traffic.LIGHT_UNKNOWN)
    light_onehot = jax.nn.one_hot(light_for_onehot, 5)

    speed_limit = _speed_limit(town, state.town_id) / 100.0
    return jnp.concatenate([
        jnp.stack([is_junction, is_junction, is_at_light, speed_limit]),
        light_onehot,
    ])


def vehicle_features(state: WorldState) -> jax.Array:
    """4 features: [similarity, speed/100, throttle, brake]
    — core/carla_env.py:353-364."""
    return jnp.stack([state.similarity,
                      dynamics.speed_kmh(state.v) / 100.0,
                      state.throttle, state.brake])


def navigation_features(state: WorldState, params: WorldParams,
                        routes: RoutesDev) -> jax.Array:
    """N distances to the next route waypoints / N — core/carla_env.py:366-382.

    Window-gathers only the `amount` forward waypoints (see the step_world
    route-window note: batch-scale full-route gathers are the TPU poison)."""
    amount = params.num_waypoints_for_feature
    r_len = tgather(routes.length, state.town_id, state.route_id)
    rem = r_len - state.wp_idx
    offs = jnp.minimum(jnp.arange(amount), rem - 1)
    w_xy = tgather(routes.xyy, state.town_id, state.route_id,
                   state.wp_idx + offs)[:, :2]
    pos = jnp.stack([state.x, state.y])
    dists = _route_fns["next_waypoint_distances"](
        w_xy, rem, jnp.zeros((), jnp.int32), pos, amount)
    if not params.lateral_obs:      # static: parity default unchanged
        return dists
    # signed lateral offset from the current route segment (w0 -> w1),
    # positive = LEFT of the direction of travel, normalized by a 3 m
    # half-road scale and clipped — see WorldParams.lateral_obs
    d = w_xy[1] - w_xy[0]
    rel = pos - w_xy[0]
    cross = d[0] * rel[1] - d[1] * rel[0]
    lat = cross / jnp.maximum(jnp.linalg.norm(d), 1e-6)
    lat = jnp.clip(lat / 3.0, -3.0, 3.0)
    return jnp.concatenate([dists, lat[None]])


def nav_feature_dim(params: WorldParams) -> int:
    """Static length of the navigation feature vector."""
    return params.num_waypoints_for_feature + (1 if params.lateral_obs else 0)


def vector_observation(state: WorldState, params: WorldParams, town: TownDev,
                       routes: RoutesDev) -> dict:
    obs = dict(road=road_features(state, params, town),
               vehicle=vehicle_features(state),
               navigation=navigation_features(state, params, routes))
    # NaN scrubbing (reference env_utils.py:433-439)
    return {k: jnp.nan_to_num(v) for k, v in obs.items()}
