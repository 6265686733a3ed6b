"""CARLAEnv: the complete driving environment as a batched functional facade.

TPU-native equivalent of the reference env stack (`core/carla_env.py` over
`rl/environments/carla/environment.py`): composes the pure-JAX world core
with the camera rasterizer and the time-horizon frame stacking into
`reset(key) -> (state, obs)` / `step(state, action) -> (state', obs, reward,
terminated, truncated, info)`, with auto-reset (episodes restart in place so
thousands of worlds stay in lock-step under vmap).

Observation contract (reference `core/carla_env.py:128-131`, §2.2 of the
survey): dict(image (T,90,360,C), road (T,9), vehicle (T,4), navigation
(T,N)) where T = time_horizon=4 frames sampled every past_obs_freq=4 steps
(`core/carla_env.py:76-81,290-325`); action Box(-1,1,(2,)).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from carla_driving_rl_agent_tpu.envs import spaces
from carla_driving_rl_agent_tpu.envs import world as world_mod
from carla_driving_rl_agent_tpu.envs.world import WorldParams, WorldState, tgather
from carla_driving_rl_agent_tpu.ops import rasterizer


class EnvConsts(NamedTuple):
    """Device-resident world data, passed as jit arguments (see
    CARLAEnv.consts)."""
    town: "world_mod.TownDev"
    routes: "world_mod.RoutesDev"
    weather: jax.Array
    town_select: jax.Array  # () int32; >=0 pins every episode to that town


class _Bind:
    def __init__(self, env: "CARLAEnv", consts: EnvConsts):
        self.env = env
        self.consts = consts

    def __enter__(self):
        self._old = (self.env.town, self.env.routes, self.env.weather_params,
                     getattr(self.env, "town_select", None))
        self.env.town = self.consts.town
        self.env.routes = self.consts.routes
        self.env.weather_params = self.consts.weather
        self.env.town_select = self.consts.town_select
        return self.env

    def __exit__(self, *exc):
        (self.env.town, self.env.routes, self.env.weather_params,
         self.env.town_select) = self._old
        return False


def planes_to_image(planar: jax.Array, ry: int, rx: int) -> jax.Array:
    """(..., C, SH, SW) uint8 planar frame storage -> (..., SH*ry, SW*rx, C)
    uint8 image (nearest upsample + channel-last interleave), any leading
    dims.  Inverse of the storage layout produced by
    rasterizer_pallas.tile_to_planes / CARLAEnv.render_frame."""
    x = jnp.moveaxis(planar, -3, -1)                   # (..., SH, SW, C)
    if ry > 1:
        x = jnp.repeat(x, ry, axis=-3)
    if rx > 1:
        x = jnp.repeat(x, rx, axis=-2)
    return x


def ordered_image_stack(stack: jax.Array, stack_ids: jax.Array,
                        stack_slot: jax.Array) -> jax.Array:
    """Materialize the oldest->newest view of a CIRCULAR image stack,
    zero-masking slots whose id is the zero-frame sentinel (< -T).

    Accepts a single world ((T, C, SH, SW) stack, (T,) ids, () slot) or any
    batched leading dims ((..., T, C, SH, SW) / (..., T) / (...)).  The
    result is byte-identical to the pre-round-4 rolled storage (stale bytes
    behind sentinel ids were true zeros there)."""
    T = stack.shape[-4]
    order = (stack_slot[..., None] + 1 + jnp.arange(T)) % T        # (..., T)
    ordered = jnp.take_along_axis(
        stack, order[..., None, None, None], axis=-4)
    valid = (stack_ids >= -T).astype(stack.dtype)
    return ordered * valid[..., None, None, None]


def newest_frame(stack: jax.Array, stack_slot: jax.Array) -> jax.Array:
    """(..., T, C, SH, SW) circular stack -> (..., C, SH, SW) newest frame
    (always a valid frame; no masking needed)."""
    idx = stack_slot[..., None, None, None, None]
    return jnp.take_along_axis(stack, idx, axis=-4).squeeze(-4)


class EnvState(NamedTuple):
    world: WorldState
    image_stack: jax.Array      # (T, C, SH, SW) uint8 PLANAR storage (circular)
    # Frames are stored channel-first at the renderer's native (half)
    # resolution; CARLAEnv.observe() upsamples + interleaves to the
    # (T, H, 3W, C) observation contract.  The image buffer is CIRCULAR:
    # `stack_slot` is the physical slot of the NEWEST frame, ordered
    # position k (oldest..newest, matching stack_ids/road_stack order)
    # lives at physical slot (stack_slot + 1 + k) % T.  The block push
    # writes ONE slot instead of rolling T-1 (the roll was 11 ms of the
    # 75 ms bench chunk — round-4 bench_parts; layout probes showed the
    # u8 move itself, not tile padding, is the cost).  Slots whose
    # stack_ids entry is the zero-frame sentinel (< -T) may hold STALE
    # bytes — every bulk reader masks by id (observe, rollout init
    # normalization); the newest slot is always valid.
    road_stack: jax.Array       # (T, 9) float32 (ordered oldest..newest)
    vehicle_stack: jax.Array    # (T, 4)
    nav_stack: jax.Array        # (T, N)
    stack_ids: jax.Array        # (T,) int32 rollout-local frame ids (-1 = pre-rollout)
    stack_slot: jax.Array       # () int32 physical slot of the newest frame
    last_action: jax.Array      # (num_actions,) most recent raw action in [0,1]


@dataclass(frozen=True)
class CARLAEnvConfig:
    world: WorldParams = field(default_factory=WorldParams)
    image_height: int = 90
    image_width: int = 120          # per camera; full image is 3x this
    stack_depth: bool = False       # +1 depth channel (core/carla_env.py:49-54,271-288)
    # OneCamera depth-modulated image: camera *= (1 - depth/255), the
    # reference's on_sensors_data fusion when a depth sensor is attached
    # (environment.py:1038-1049).  Exclusive with stack_depth (the reference
    # never both stacks and modulates).
    depth_modulate: bool = False
    render_mode: str = "rasterizer"  # 'rasterizer' | 'zeros' (vector-only configs)
    # pallas mode: worlds rendered per Pallas grid step in the batched
    # block-push path (render_tiles_grid).  1 = per-world vmap; >1 amortizes
    # the ~0.5-1 us/grid-step launch overhead.  Batches not divisible by it
    # fall back to the vmap path (identical numerics either way).
    pallas_world_block: int = 8
    render_quality: str = "fast"    # 'full' | 'fast' (half-res + reduced K)
    cameras: int = 3                # 3 = ThreeCamera concat; 1 = front only
    time_horizon: int = 4
    past_obs_freq: int = 4
    num_actions: int = 2            # 2 = CARLAEnv; 3 adds the reverse channel
    # lax.scan unroll factors for the hot stepping loops (numerically
    # identical; trades program size/compile time for per-iteration loop
    # overhead — the measured ~6 ms/32-step-chunk scan floor).  phys_unroll
    # applies to the inner per-block physics sub-step scan (length
    # past_obs_freq), block_unroll to the outer blocks scan.
    phys_unroll: int = 1
    block_unroll: int = 1
    # fused Pallas physics step (ops/physics_pallas.py): collapses the
    # ~100-small-op XLA physics step into one VPU kernel + a handful of
    # gathers.  Gated to zero-NPC/default-reward/batch%128 configs
    # (physics_pallas.fused_step_supported); other configs silently use the
    # vmapped XLA path.  Numerics match to ULPs (Mosaic transcendentals) —
    # see tests/test_physics_fused.py.
    fused_step: bool = False

    @property
    def image_shape(self) -> Tuple[int, int, int]:
        c = 3 + (1 if self.stack_depth else 0)
        return (self.image_height, self.image_width * self.cameras, c)

    @property
    def storage_shape(self) -> Tuple[int, int, int]:
        """(C, SH, SW) planar uint8 frame-STORAGE shape (see EnvState).

        The Pallas renderer natively produces half-res (45, 60) views, so
        pallas mode stores (C, 45, 180) and observe() upsamples 2x; the XLA
        renderer paths upsample internally and store full-res planes."""
        h, w, c = self.image_shape
        if self.render_mode == "pallas":
            from carla_driving_rl_agent_tpu.ops.rasterizer_pallas import (
                VIEW_H, VIEW_W)
            assert h % VIEW_H == 0 and w % (3 * VIEW_W) == 0, (h, w)
            return (c, VIEW_H, 3 * VIEW_W)
        return (c, h, w)

    @property
    def upsample(self) -> Tuple[int, int]:
        """(ry, rx) nearest-upsample factors from storage to observation."""
        h, w, _ = self.image_shape
        _, sh, sw = self.storage_shape
        return (h // sh, w // sw)


class CARLAEnv:
    """Batched functional environment. All methods are jit/vmap friendly;
    `self` holds only static config + device-resident constant arrays."""

    def __init__(self, config: CARLAEnvConfig):
        self.config = config
        self.params = config.world
        self.town, self.routes = world_mod.build_world_data(config.world)
        from carla_driving_rl_agent_tpu.envs.weather import WEATHER_PARAMS
        self.weather_params = jnp.asarray(WEATHER_PARAMS)

    # ---- constant binding --------------------------------------------
    # Town/route arrays must be passed to jitted programs as ARGUMENTS, not
    # captured as closure constants: constant-embedding bloats executables
    # and is pathologically slow to compile on remote-attached TPUs.
    @property
    def consts(self) -> "EnvConsts":
        ts = getattr(self, "town_select", None)
        if ts is None:
            ts = jnp.asarray(-1, jnp.int32)
        return EnvConsts(town=self.town, routes=self.routes,
                         weather=self.weather_params, town_select=ts)

    def _town_select(self):
        ts = getattr(self, "town_select", None)
        return jnp.asarray(-1, jnp.int32) if ts is None else ts

    def select_town(self, town) -> None:
        """Pin future episodes to one town of the bank (traced through
        consts — no recompilation). `town` is an index or a name; None/-1
        restores the config's default behavior.  Reference equivalent:
        `env.set_town(town)` (`environment.py:257-279`)."""
        if town is None:
            idx = -1
        elif isinstance(town, str):
            idx = list(self.params.town_names).index(town)
        else:
            idx = int(town)
        self.town_select = jnp.asarray(idx, jnp.int32)

    def bind(self, consts: "EnvConsts"):
        """Context manager swapping in traced constant arrays while tracing."""
        return _Bind(self, consts)

    # ---- spaces (reference core/carla_env.py:18-24,128-131) ----
    @property
    def action_space(self) -> spaces.Box:
        return spaces.Box(low=-1.0, high=1.0, shape=(self.config.num_actions,))

    @property
    def observation_space(self) -> spaces.Dict:
        n = world_mod.nav_feature_dim(self.params)
        nav_low = -3.0 if self.params.lateral_obs else 0.0
        extra = {}
        if self.config.cameras == 1:
            # OneCamera base-env keys (reference environment.py:840-859)
            extra = dict(past_control=spaces.Box(low=-1.0, high=1.0, shape=(4,)),
                         command=spaces.Box(low=0.0, high=1.0, shape=(7,)))
        return spaces.Dict(
            road=spaces.Box(low=0.0, high=1.0, shape=(9,)),
            vehicle=spaces.Box(low=0.0, high=1.0, shape=(4,)),
            image=spaces.Box(low=0.0, high=1.0, shape=self.config.image_shape),
            navigation=spaces.Box(low=nav_low, high=25.0, shape=(n,)),
            **extra,
        )

    @property
    def time_horizon(self) -> int:
        return self.config.time_horizon

    # ---- single-frame observation ----
    def render_frame(self, world: WorldState) -> jax.Array:
        """One rendered frame in planar STORAGE form (config.storage_shape,
        uint8 channel-first) — observe() reconstructs the (H, 3W, C) [0,1]
        observation contract.  Pallas mode stores the kernel's native
        half-res planes (no upsample on the push path)."""
        cfg = self.config
        if cfg.render_mode == "zeros":
            return jnp.zeros(cfg.storage_shape, jnp.uint8)
        if cfg.render_mode == "pallas":
            assert cfg.cameras == 3, "the Pallas kernel renders the 3-camera rig"
            return self._render_frame_pallas(world)
        inputs = rasterizer.RenderInputs(
            edges_xy=tgather(self.town.edges_xy, world.town_id),
            num_edges=tgather(self.town.num_edges, world.town_id),
            buildings=tgather(self.town.buildings, world.town_id),
            junctions=tgather(self.town.junction_xy, world.town_id),
            num_junctions=tgather(self.town.num_junctions, world.town_id),
            ego_xy=jnp.stack([world.x, world.y]),
            ego_yaw=world.yaw,
            veh_xy=world.npc.veh_xy, veh_yaw=world.npc.veh_yaw,
            veh_active=world.npc.veh_active,
            ped_xy=world.npc.ped_xy, ped_active=world.npc.ped_active,
            weather=self.weather_params[world.weather_id],
            road_half=tgather(self.town.road_half, world.town_id),
        )
        if cfg.cameras == 1:
            # OneCamera variant: front view only (reference environment.py:837)
            assert not (cfg.stack_depth and cfg.depth_modulate), \
                "stack_depth and depth_modulate are exclusive"
            ke, kb, ka, div = rasterizer.QUALITY[cfg.render_quality]
            out = rasterizer.render_view(
                inputs, jnp.asarray(0.0), height=cfg.image_height // div,
                width=cfg.image_width // div, k_edges=ke, k_buildings=kb,
                k_actors=ka,
                return_depth=cfg.stack_depth or cfg.depth_modulate)
            if cfg.stack_depth:
                # front-camera log-depth as channel 4
                # (reference core/carla_env.py:271-288)
                view, depth = out
                img = jnp.concatenate(
                    [view, rasterizer.depth_to_u8(depth)[..., None]], axis=-1)
            elif cfg.depth_modulate:
                # camera *= (1 - depth/255): nearer objects keep their color,
                # the far field fades to black (environment.py:1038-1049)
                view, depth = out
                d = rasterizer.depth_to_u8(depth).astype(jnp.float32)
                img = view.astype(jnp.float32) * (1.0 - d[..., None] / 255.0)
            else:
                img = out
            if div > 1:
                img = jnp.repeat(jnp.repeat(img, div, axis=0), div, axis=1)
            img = img.astype(jnp.uint8)
        else:
            img = rasterizer.render_cameras(inputs, height=cfg.image_height,
                                            width=cfg.image_width,
                                            quality=cfg.render_quality,
                                            return_depth=cfg.stack_depth)
        # XLA paths upsample internally -> full-res planar storage
        return jnp.transpose(img, (2, 0, 1))

    def _render_inputs(self, world: WorldState):
        return rasterizer.RenderInputs(
            edges_xy=tgather(self.town.edges_xy, world.town_id),
            num_edges=tgather(self.town.num_edges, world.town_id),
            buildings=tgather(self.town.buildings, world.town_id),
            junctions=tgather(self.town.junction_xy, world.town_id),
            num_junctions=tgather(self.town.num_junctions, world.town_id),
            ego_xy=jnp.stack([world.x, world.y]),
            ego_yaw=world.yaw,
            veh_xy=world.npc.veh_xy, veh_yaw=world.npc.veh_yaw,
            veh_active=world.npc.veh_active,
            ped_xy=world.npc.ped_xy, ped_active=world.npc.ped_active,
            weather=self.weather_params[world.weather_id],
            road_half=tgather(self.town.road_half, world.town_id),
        )

    def _render_frame_pallas(self, world: WorldState) -> jax.Array:
        """Fused Pallas render path (ops/rasterizer_pallas.py); interpret mode
        off-TPU so tests run on CPU.  Geometry selection uses the cell
        lookup tables (pack_geometry_banked) — no per-frame top_k."""
        from carla_driving_rl_agent_tpu.ops import rasterizer_pallas as RP
        cfg = self.config
        interpret = jax.default_backend() != "tpu"
        return RP.render_planes_banked(self.town, world,
                                       self.weather_params[world.weather_id],
                                       interpret=interpret,
                                       return_depth=cfg.stack_depth,
                                       n_actors=self._static_n_actors())

    def _static_n_actors(self) -> int:
        """Static bound on the actor slots this config can ever populate:
        the geometry pack lays out [vehicle rows, pedestrian rows, zero
        padding], so the kernel only unrolls the head of the slot list.
        Zero-NPC configs (bench, stage-s1) can never activate ANY slot —
        the kernel skips the actor loop and the pack's actor block is a
        constant (the NPC tick is already statically skipped in
        world.step_world for the same configs)."""
        from carla_driving_rl_agent_tpu.ops import rasterizer_pallas as RP
        if self.params.num_vehicles == 0 and self.params.num_pedestrians == 0:
            return 0
        return (min(RP.K_ACTORS // 2, self.params.v_max)
                + min(RP.K_ACTORS // 2, self.params.p_max))

    def frame_obs(self, world: WorldState):
        vec = world_mod.vector_observation(world, self.params, self.town, self.routes)
        return dict(image=self.render_frame(world), road=vec["road"],
                    vehicle=vec["vehicle"], navigation=vec["navigation"])

    # ---- reset / step (single world; vmap for batches) ----
    def _fresh_state(self, world, frame, frame_id) -> EnvState:
        """Episode-start EnvState: stack of default (zero) observations with
        the first real frame pushed last (reference core/carla_env.py:79-81,
        323-325)."""
        cfg = self.config
        T = cfg.time_horizon
        img_stack = jnp.zeros((T,) + cfg.storage_shape, jnp.uint8).at[-1].set(frame["image"])
        road_stack = jnp.zeros((T, 9)).at[-1].set(frame["road"])
        veh_stack = jnp.zeros((T, 4)).at[-1].set(frame["vehicle"])
        nav_stack = jnp.zeros((T, world_mod.nav_feature_dim(self.params))).at[-1].set(
            frame["navigation"])
        # zero-frame sentinel -(T+1): slots holding the default (zero)
        # observation of a fresh episode. ids in [-T, -1] are reserved for
        # the trainer's pre-rollout snapshot relabeling (agents/rollout.py).
        stack_ids = jnp.full((T,), -(T + 1), jnp.int32).at[-1].set(
            jnp.asarray(frame_id, jnp.int32))
        return EnvState(world=world, image_stack=img_stack, road_stack=road_stack,
                        vehicle_stack=veh_stack, nav_stack=nav_stack,
                        stack_ids=stack_ids,
                        stack_slot=jnp.asarray(T - 1, jnp.int32),
                        last_action=jnp.full((cfg.num_actions,), 0.5))

    def reset(self, key: jax.Array, episode=0, frame_id=-1) -> Tuple[EnvState, dict]:
        world = world_mod.reset_world(key, self.params, self.town, self.routes,
                                      episode=episode,
                                      town_select=self._town_select())
        frame = self.frame_obs(world)
        state = self._fresh_state(world, frame, frame_id)
        return state, self.observe(state)

    def observe(self, state: EnvState) -> dict:
        """Stacked observation dict, image scaled to [0,1]
        (reference core/carla_env.py:301-321).

        The OneCamera (cameras=1) variant additionally exposes the base-env
        keys `past_control` (throttle, brake, steer, reverse — reference
        environment.py:1103-1104) and `command` (current RoadOption one-hot,
        environment.py:1092-1093); both are current-frame vectors derived
        from the world state, no extra stacks.

        The image stack is stored as half-res uint8 planes in a CIRCULAR
        buffer (EnvState); reconstruction (order + sentinel mask + upsample
        + channel interleave) happens HERE, once per observation use,
        byte-identical to the former push-time rolled storage."""
        ry, rx = self.config.upsample
        ordered = ordered_image_stack(state.image_stack, state.stack_ids,
                                      state.stack_slot)
        img = planes_to_image(ordered, ry, rx)             # (T, H, 3W, C)
        obs = dict(image=img.astype(jnp.float32) / 255.0,
                   road=state.road_stack, vehicle=state.vehicle_stack,
                   navigation=state.nav_stack)
        if self.config.cameras == 1:
            w = state.world
            obs["past_control"] = jnp.stack(
                [w.throttle, w.brake, w.steer, jnp.zeros(())])
            opt = tgather(self.routes.option, w.town_id, w.route_id, w.wp_idx)
            obs["command"] = jax.nn.one_hot(opt, 7)
        return obs

    def step(self, state: EnvState, action: jax.Array,
             frame_id: jax.Array | int = -1):
        """One env step with auto-reset.

        `action` is the converted env action in [-1, 1]^2; `frame_id` is an
        optional rollout-local id recorded when a new frame is pushed (used
        by the trainer's frame-dedup rollout buffer).
        Returns (state', obs, reward, terminated, truncated, info).
        """
        cfg = self.config
        world, reward, term, trunc, info = world_mod.step_world(
            state.world, action, self.params, self.town, self.routes)

        # auto-reset the WORLD first, then render exactly once from the
        # merged state (rendering is the expensive part of a step)
        done = term | trunc
        reset_key, _ = jax.random.split(world.key)
        fresh_world = world_mod.reset_world(
            reset_key, self.params, self.town, self.routes,
            episode=world.episode + 1,
            town_select=self._town_select())
        merged_world = jax.tree_util.tree_map(
            lambda a, b: jnp.where(_expand(done, a), a, b), fresh_world, world)

        frame = self.frame_obs(merged_world)

        # push every past_obs_freq steps (reference core/carla_env.py:290-299)
        t_pre = state.world.timestep
        push = (t_pre % cfg.past_obs_freq) == 0

        def push_stack(stack, item):
            rolled = jnp.concatenate([stack[1:], item[None]], axis=0)
            return jnp.where(push, rolled, stack)

        # per-step path: operate on the ORDERED view and emit an ordered
        # (slot = T-1) state — this path is eval/play-scale, not the hot
        # block push, so the ordering gather is cheap and keeps a single
        # invariant for mixed-provenance states
        img_ordered = ordered_image_stack(state.image_stack, state.stack_ids,
                                          state.stack_slot)
        img_stack = push_stack(img_ordered, frame["image"])
        road_stack = push_stack(state.road_stack, frame["road"])
        veh_stack = push_stack(state.vehicle_stack, frame["vehicle"])
        nav_stack = push_stack(state.nav_stack, frame["navigation"])
        stack_ids = jnp.where(
            push,
            jnp.concatenate([state.stack_ids[1:], jnp.asarray(frame_id, jnp.int32)[None]]),
            state.stack_ids)

        stepped = EnvState(world=merged_world, image_stack=img_stack,
                           road_stack=road_stack, vehicle_stack=veh_stack,
                           nav_stack=nav_stack, stack_ids=stack_ids,
                           stack_slot=jnp.asarray(cfg.time_horizon - 1,
                                                  jnp.int32),
                           last_action=state.last_action)
        fresh_state = self._fresh_state(merged_world, frame, frame_id)
        new_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(_expand(done, a), a, b), fresh_state, stepped)
        return new_state, self.observe(new_state), reward, term, trunc, info

    # ---- block-rollout fast path ----------------------------------------
    # The reference's policy input (the past-obs stack) only refreshes every
    # past_obs_freq steps (core/carla_env.py:290-299), so rendering every
    # step is dead work 3/4 of the time.  The block path advances physics
    # for `block` steps without touching the observation stacks, then
    # renders exactly ONCE and pushes the frame for all worlds.  Deviation
    # (documented): the push schedule is block-aligned (global phase)
    # instead of per-episode phase, and a world that auto-resets mid-block
    # gets its first frame at the block boundary, <=block-1 steps after
    # spawn, with all-zero stacks until then — mirroring the reference's
    # zero-filled `_init_past_obs` episode start (core/carla_env.py:323-325).

    def step_physics(self, state: EnvState, action: jax.Array):
        """World-only step with auto-reset; stacks pass through untouched.
        Returns (state', reward, term, trunc, info, was_reset)."""
        world, reward, term, trunc, info = world_mod.step_world(
            state.world, action, self.params, self.town, self.routes)
        done = term | trunc
        reset_key, _ = jax.random.split(world.key)
        fresh_world = world_mod.reset_world(
            reset_key, self.params, self.town, self.routes,
            episode=world.episode + 1,
            town_select=self._town_select())
        merged_world = jax.tree_util.tree_map(
            lambda a, b: jnp.where(_expand(done, a), a, b), fresh_world, world)
        return (state._replace(world=merged_world), reward, term, trunc,
                info, done)

    def push_block_frame(self, state: EnvState, was_reset: jax.Array,
                         frame_id: jax.Array | int = -1, image=None):
        """Single-world block push (ordered-output compatibility path —
        the batched hot path is push_block_frame_batch's circular write).
        Renders once (unless `image` is given) and pushes onto the ordered
        view of the stacks; worlds flagged `was_reset` restart as
        [0, ..., 0, frame]."""
        cfg = self.config
        T = cfg.time_horizon
        if image is None:
            frame = self.frame_obs(state.world)
        else:
            vec = world_mod.vector_observation(state.world, self.params,
                                               self.town, self.routes)
            frame = dict(image=image, road=vec["road"],
                         vehicle=vec["vehicle"], navigation=vec["navigation"])
        fid = jnp.asarray(frame_id, jnp.int32)

        def push(stack, item):
            # fresh == [0, ..., 0, item] and rolled == [s1, ..., s_{T-1}, item]
            # share the last slot, so the reset select reduces to masking the
            # shifted slots by ~was_reset — one fused multiply instead of
            # materializing a second full stack + select
            keep = (~was_reset).astype(stack.dtype)
            shifted = stack[1:] * keep
            return jnp.concatenate([shifted, item[None]], axis=0)

        img_ordered = ordered_image_stack(state.image_stack, state.stack_ids,
                                          state.stack_slot)
        ids_rolled = jnp.concatenate([state.stack_ids[1:], fid[None]])
        ids_fresh = jnp.full((T,), -(T + 1), jnp.int32).at[-1].set(fid)
        return state._replace(
            image_stack=push(img_ordered, frame["image"]),
            road_stack=push(state.road_stack, frame["road"]),
            vehicle_stack=push(state.vehicle_stack, frame["vehicle"]),
            nav_stack=push(state.nav_stack, frame["navigation"]),
            stack_ids=jnp.where(was_reset, ids_fresh, ids_rolled),
            stack_slot=jnp.asarray(T - 1, jnp.int32))

    def step_physics_batch(self, states: EnvState, actions: jax.Array):
        if self.config.fused_step:
            from carla_driving_rl_agent_tpu.ops import physics_pallas as PP
            if PP.fused_step_supported(self.params, states.world.x.shape[0]):
                return PP.step_physics_batch_fused(self, states, actions)
        return jax.vmap(self.step_physics)(states, actions)

    def _push_block_vectors(self, state: EnvState, was_reset: jax.Array,
                            frame_id: jax.Array, road, vehicle, navigation):
        """Per-world vector/ids part of the block push (vmapped): the
        vector stacks stay in ordered rolled form (tiny), the image slot
        write happens batch-level in push_block_frame_batch."""
        T = self.config.time_horizon
        fid = jnp.asarray(frame_id, jnp.int32)

        def push(stack, item):
            keep = (~was_reset).astype(stack.dtype)
            shifted = stack[1:] * keep
            return jnp.concatenate([shifted, item[None]], axis=0)

        ids_rolled = jnp.concatenate([state.stack_ids[1:], fid[None]])
        ids_fresh = jnp.full((T,), -(T + 1), jnp.int32).at[-1].set(fid)
        return state._replace(
            road_stack=push(state.road_stack, road),
            vehicle_stack=push(state.vehicle_stack, vehicle),
            nav_stack=push(state.nav_stack, navigation),
            stack_ids=jnp.where(was_reset, ids_fresh, ids_rolled))

    def push_block_frame_batch(self, states: EnvState, was_reset: jax.Array,
                               frame_ids: jax.Array | int = -1):
        """Batched block push, circular image write: renders all worlds
        (grid-batched Pallas kernel when available), pushes the vector
        stacks/ids per world, then writes the new frames into ONE physical
        slot of the circular image buffer via a statically-indexed
        lax.switch (slot uniformity across worlds is an invariant of the
        block path: rollouts normalize to slot T-1 at entry and every push
        advances all worlds together).  Replaces the former per-world roll
        of T-1 uint8 slots (~11 ms per 8-push chunk at 1024 worlds —
        round-4 bench_parts).  Reset worlds keep stale bytes behind
        sentinel ids; readers mask (see EnvState)."""
        if isinstance(frame_ids, int):
            frame_ids = jnp.full((was_reset.shape[0],), frame_ids, jnp.int32)
        cfg = self.config
        B = was_reset.shape[0]
        G = cfg.pallas_world_block
        if cfg.render_mode == "pallas" and G > 1 and B % G == 0:
            # grid-batched render: one kernel program over the whole batch,
            # G worlds per grid step (amortizes per-step launch overhead;
            # see rasterizer_pallas.render_tiles_grid)
            from carla_driving_rl_agent_tpu.ops import rasterizer_pallas as RP
            interpret = jax.default_backend() != "tpu"
            n_actors = self._static_n_actors()
            geoms = jax.vmap(
                lambda w: RP.pack_geometry_banked(
                    self.town, w, self.weather_params[w.weather_id],
                    n_actors=n_actors)
            )(states.world)
            planes = RP.render_tiles_grid(geoms, g_block=G,
                                          interpret=interpret,
                                          n_actors=n_actors,
                                          with_depth=cfg.stack_depth)
            images = jax.vmap(
                lambda p: RP.tile_to_planes(p, with_depth=cfg.stack_depth)
            )(planes)
            vec = jax.vmap(
                lambda w: world_mod.vector_observation(
                    w, self.params, self.town, self.routes))(states.world)
        else:
            frames = jax.vmap(self.frame_obs)(states.world)
            images = frames["image"]
            vec = {k: frames[k] for k in ("road", "vehicle", "navigation")}

        states = jax.vmap(self._push_block_vectors)(
            states, was_reset, frame_ids,
            vec["road"], vec["vehicle"], vec["navigation"])

        T = cfg.time_horizon
        uniform = jnp.all(states.stack_slot == states.stack_slot[0])

        def write_uniform(stack):
            # fast path (the rollout/step invariant): every world shares a
            # slot, so the write is a statically-indexed switch
            slot_new = ((states.stack_slot[0] + 1) % T).astype(jnp.int32)
            img = jax.lax.switch(
                slot_new,
                [(lambda st, k=k: st.at[:, k].set(images)) for k in range(T)],
                stack)
            return img, jnp.full_like(states.stack_slot, slot_new)

        def write_general(stack):
            # states assembled OUTSIDE the rollout/step paths may carry
            # non-uniform slots; a world-0-derived static write would then
            # silently corrupt every other world's frame history — fall
            # back to a per-world one-hot write (cond picks the branch at
            # runtime; the fast path pays only the jnp.all reduce)
            slot_new = ((states.stack_slot + 1) % T).astype(jnp.int32)
            onehot = jnp.arange(T)[None, :] == slot_new[:, None]
            img = jnp.where(onehot[..., None, None, None],
                            images[:, None], stack)
            return img, slot_new

        img, slot_vec = jax.lax.cond(uniform, write_uniform, write_general,
                                     states.image_stack)
        return states._replace(image_stack=img, stack_slot=slot_vec)

    # ---- batched conveniences ----
    def reset_batch(self, key: jax.Array, num_envs: int):
        keys = jax.random.split(key, num_envs)
        return jax.vmap(self.reset)(keys, jnp.zeros((num_envs,), jnp.int32))

    def step_batch(self, states: EnvState, actions: jax.Array,
                   frame_ids: jax.Array | int = -1):
        if isinstance(frame_ids, int):
            frame_ids = jnp.full((actions.shape[0],), frame_ids, jnp.int32)
        return jax.vmap(self.step)(states, actions, frame_ids)


def _expand(flag: jax.Array, like: jax.Array) -> jax.Array:
    """Broadcast a scalar bool against an arbitrary-rank leaf."""
    return flag.reshape((1,) * like.ndim).astype(bool) if like.ndim else flag


def convert_action(action01: jax.Array, low: float = -1.0, high: float = 1.0) -> jax.Array:
    """Beta samples in [0,1] -> env action range
    (reference `rl/agents/ppo.py:158-163`)."""
    return action01 * (high - low) + low


class CARLAEnvDiscrete:
    """Discrete-action wrapper (reference ThreeCameraCARLAEnvironmentDiscrete,
    `environment.py:1267-1301`): Box actions quantized into `bins` per
    dimension; `to_continuous`/`to_discrete` map between the spaces."""

    def __init__(self, env: CARLAEnv, bins: int = 4):
        assert bins >= 2 and bins % 2 == 0, "bins must be even and >= 2"
        self.env = env
        self.bins = bins
        box = env.action_space
        self._low = jnp.asarray(box.low)
        self._delta = jnp.asarray((box.high - box.low) / bins)

    @property
    def action_space(self) -> spaces.MultiDiscrete:
        return spaces.MultiDiscrete(nvec=[self.bins] * self.env.config.num_actions)

    @property
    def observation_space(self):
        return self.env.observation_space

    @property
    def time_horizon(self):
        return self.env.time_horizon

    def to_continuous(self, discrete_actions: jax.Array) -> jax.Array:
        return self._delta * discrete_actions.astype(jnp.float32) + self._low

    def to_discrete(self, continuous_actions: jax.Array) -> jax.Array:
        return ((continuous_actions - self._low) / self._delta).astype(jnp.int32)

    def reset(self, key, **kw):
        return self.env.reset(key, **kw)

    def observe(self, state):
        return self.env.observe(state)

    def step(self, state, action, frame_id=-1):
        return self.env.step(state, self.to_continuous(action), frame_id)

    def reset_batch(self, key, num_envs):
        return self.env.reset_batch(key, num_envs)

    def step_batch(self, states, actions, frame_ids=-1):
        return self.env.step_batch(states, self.to_continuous(actions), frame_ids)
