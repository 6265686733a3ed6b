"""Fine-grained cost breakdown of the rendered env-step chunk.

bench_profile.py splits the chunk into physics vs render; this script
splits each half further, each part as its own jitted chunk over the same
1024-world state, so the numbers are directly comparable ms-per-chunk:

  physics parts:
    phys_full     — step_physics_batch incl. auto-reset merge + bench RNG
    phys_fixedact — same, but a constant action array (no per-step threefry
                    split/uniform in the bench body)
    phys_noreset  — step_world only: no reset_world/merge on the done mask
                    (isolates the every-step auto-reset cost)
    phys_vecobs   — vector_observation over the batch at the push rate
                    (route/junction feature gathers)
  render parts (per push, run past_obs_freq-aligned like the bench):
    rend_pack     — pack_geometry_banked only (cell-table gathers)
    rend_kernel   — render_tile only (the Pallas kernel, geometry fixed)
    rend_tile     — tile_to_image only (transpose + 2x upsample, planes fixed)
    rend_roll     — the frame-stack roll only (frame fixed)

Usage: python scripts/bench_parts.py [--worlds 1024] [--scaling]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

NUM_WORLDS = 1024
STEPS_PER_CALL = 32
WARMUP = 2
TIMED = 5


def make_env():
    from carla_driving_rl_agent_tpu.envs.carla_env import CARLAEnv, CARLAEnvConfig
    from carla_driving_rl_agent_tpu.envs.world import WorldParams

    return CARLAEnv(CARLAEnvConfig(
        world=WorldParams(town_names=("Town03",), num_routes=64,
                          max_route_len=512, max_timesteps=512,
                          num_vehicles=0, num_pedestrians=0, v_max=1, p_max=1),
        image_height=90, image_width=120, render_mode="pallas",
        time_horizon=4, past_obs_freq=4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=NUM_WORLDS)
    ap.add_argument("--scaling", action="store_true",
                    help="also run phys_full/rend-all at 2048 and 4096 worlds")
    ap.add_argument("--only", default="",
                    help="substring filter on variant names (saves TPU time "
                         "when probing one subsystem)")
    args = ap.parse_args()
    n = args.worlds

    env = make_env()
    consts = env.consts
    block = env.config.past_obs_freq
    n_push = STEPS_PER_CALL // block

    from carla_driving_rl_agent_tpu.envs import world as world_mod
    from carla_driving_rl_agent_tpu.ops import rasterizer_pallas as RP

    def reset_all(key, consts, n):
        with env.bind(consts):
            return env.reset_batch(key, n)

    def fixed_actions(n):
        return jnp.tile(jnp.asarray([[0.4, 0.05]]), (n, 1))

    # ---------------- physics variants ----------------
    def phys_full(states, key, consts):
        with env.bind(consts):
            def sub(carry, _):
                states, key = carry
                key, k = jax.random.split(key)
                a = jax.random.uniform(k, (n, 2),
                                       minval=jnp.asarray([-0.2, -0.5]),
                                       maxval=jnp.asarray([0.8, 0.5]))
                states, reward, *_ = env.step_physics_batch(states, a)
                return (states, key), reward[0]
            (states, key), rewards = jax.lax.scan(
                sub, (states, key), None, length=STEPS_PER_CALL)
            return states, key, jnp.sum(rewards) + states.world.x[0]

    def phys_fixedact(states, key, consts):
        with env.bind(consts):
            a = fixed_actions(n)
            def sub(carry, _):
                states, key = carry
                states, reward, *_ = env.step_physics_batch(states, a)
                return (states, key), reward[0]
            (states, key), rewards = jax.lax.scan(
                sub, (states, key), None, length=STEPS_PER_CALL)
            return states, key, jnp.sum(rewards) + states.world.x[0]

    def phys_noreset(states, key, consts):
        with env.bind(consts):
            a = fixed_actions(n)
            step1 = jax.vmap(lambda w, act: world_mod.step_world(
                w, act, env.params, env.town, env.routes))
            def sub(carry, _):
                states, key = carry
                world, reward, *_ = step1(states.world, a)
                return (states._replace(world=world), key), reward[0]
            (states, key), rewards = jax.lax.scan(
                sub, (states, key), None, length=STEPS_PER_CALL)
            return states, key, jnp.sum(rewards) + states.world.x[0]

    def phys_vecobs(states, key, consts):
        with env.bind(consts):
            vec = jax.vmap(lambda w: world_mod.vector_observation(
                w, env.params, env.town, env.routes))
            def body(carry, _):
                states, key = carry
                o = vec(states.world)
                return (states, key), o["navigation"][0, 0] + o["road"][0, 0]
            (states, key), probes = jax.lax.scan(
                body, (states, key), None, length=n_push)
            return states, key, jnp.sum(probes)

    # ---------------- render variants (n_push iterations/chunk) -------
    n_actors = (min(RP.K_ACTORS // 2, env.params.v_max)
                + min(RP.K_ACTORS // 2, env.params.p_max))

    def rend_pack(states, key, consts):
        with env.bind(consts):
            pack = jax.vmap(lambda w: RP.pack_geometry_banked(
                env.town, w, env.weather_params[w.weather_id]))
            def body(carry, i):
                states, key = carry
                g = pack(states.world)
                return (states, key), g[0, 0] + g[-1, 1] + i * 0.0
            (states, key), probes = jax.lax.scan(
                body, (states, key), jnp.arange(n_push, dtype=jnp.float32))
            return states, key, jnp.sum(probes)

    def rend_kernel(states, key, consts):
        with env.bind(consts):
            pack = jax.vmap(lambda w: RP.pack_geometry_banked(
                env.town, w, env.weather_params[w.weather_id]))
            g = pack(states.world)
            rt = jax.vmap(lambda gg: RP.render_tile(
                gg, n_actors=n_actors, with_depth=False))
            def body(carry, i):
                states, key = carry
                planes = rt(g + i * 1e-6)   # vary input so nothing is hoisted
                return (states, key), planes[0].sum()
            (states, key), probes = jax.lax.scan(
                body, (states, key), jnp.arange(n_push, dtype=jnp.float32))
            return states, key, jnp.sum(probes)

    def rend_tile(states, key, consts):
        with env.bind(consts):
            planes0 = jnp.zeros((n, 3) + RP.TILE, jnp.float32)
            tti = jax.vmap(lambda p: RP.tile_to_image(p, 90, 120))
            def body(carry, i):
                states, key = carry
                img = tti(planes0 + i)
                return (states, key), img[0].astype(jnp.float32).mean()
            (states, key), probes = jax.lax.scan(
                body, (states, key), jnp.arange(n_push, dtype=jnp.float32))
            return states, key, jnp.sum(probes)

    def rend_roll(states, key, consts):
        with env.bind(consts):
            frame0 = jnp.zeros((n,) + env.config.storage_shape, jnp.uint8)
            no_reset = jnp.zeros((n,), bool)
            def body(carry, i):
                states, key = carry
                def push1(state, frame, was_reset):
                    rolled = jnp.concatenate(
                        [state.image_stack[1:], frame[None]], axis=0)
                    fresh = jnp.zeros_like(state.image_stack).at[-1].set(frame)
                    new = jnp.where(
                        was_reset.reshape((1, 1, 1, 1)).astype(bool),
                        fresh, rolled)
                    return state._replace(image_stack=new)
                states = jax.vmap(push1)(states, frame0 + i, no_reset)
                return (states, key), states.image_stack[0, -1, 0, 0].astype(jnp.float32)
            (states, key), probes = jax.lax.scan(
                body, (states, key), jnp.arange(n_push, dtype=jnp.uint8))
            return states, key, jnp.sum(probes)

    def rend_roll_prod(states, key, consts):
        # the SHIPPED roll form (carla_env.push_block_frame): multiply-mask
        # the shifted slots, concat the new frame
        with env.bind(consts):
            frame0 = jnp.zeros((n,) + env.config.storage_shape, jnp.uint8)
            no_reset = jnp.zeros((n,), bool)
            def body(carry, i):
                states, key = carry
                def push1(state, frame, was_reset):
                    keep = (~was_reset).astype(state.image_stack.dtype)
                    shifted = state.image_stack[1:] * keep
                    new = jnp.concatenate([shifted, frame[None]], axis=0)
                    return state._replace(image_stack=new)
                states = jax.vmap(push1)(states, frame0 + i, no_reset)
                return (states, key), states.image_stack[0, -1, 0, 0].astype(jnp.float32)
            (states, key), probes = jax.lax.scan(
                body, (states, key), jnp.arange(n_push, dtype=jnp.uint8))
            return states, key, jnp.sum(probes)

    def rend_roll_flat(states, key, consts):
        # layout probe: the same multiply-mask roll on a (T, C*SH*SW) FLAT
        # uint8 stack — u8 minor dims (45, 180) tile-pad to (64, 256) (~2x
        # waste) while a flat minor dim pads ~0.1%; if this variant is much
        # faster the EnvState storage should go flat
        S = 1
        for d in env.config.storage_shape:
            S *= d
        with env.bind(consts):
            flat0 = jnp.zeros((n, env.config.time_horizon, S), jnp.uint8)
            frame0 = jnp.zeros((n, S), jnp.uint8)
            no_reset = jnp.zeros((n,), bool)
            def body(carry, i):
                flat, key = carry
                def push1(stack, frame, was_reset):
                    keep = (~was_reset).astype(stack.dtype)
                    shifted = stack[1:] * keep
                    return jnp.concatenate([shifted, frame[None]], axis=0)
                flat = jax.vmap(push1)(flat, frame0 + i, no_reset)
                return (flat, key), flat[0, -1, 0].astype(jnp.float32)
            (flat, key), probes = jax.lax.scan(
                body, (flat0, key), jnp.arange(n_push, dtype=jnp.uint8))
            return states, key, jnp.sum(probes) + flat[0, 0, 0]

    def rend_all(states, key, consts):
        with env.bind(consts):
            no_reset = jnp.zeros((n,), bool)
            def body(carry, i):
                states, key = carry
                states = env.push_block_frame_batch(states, no_reset)
                return (states, key), states.image_stack[0, -1, 0, 0].astype(jnp.float32)
            (states, key), probes = jax.lax.scan(
                body, (states, key), jnp.arange(n_push))
            return states, key, jnp.sum(probes)

    # ---- physics-internal splits (each x STEPS_PER_CALL like a step) ----
    from carla_driving_rl_agent_tpu.envs import dynamics as dyn_mod
    from carla_driving_rl_agent_tpu.envs import traffic as traffic_mod
    from carla_driving_rl_agent_tpu.envs.world import (
        _off_road_distance, _route_fns, ROUTE_WINDOW, tgather)

    def phys_npc(states, key, consts):
        with env.bind(consts):
            def body(carry, _):
                states, key = carry
                key, k = jax.random.split(key)
                ks = jax.random.split(k, n)
                npc = jax.vmap(
                    lambda kk, w: traffic_mod.step_npcs(
                        kk, w.npc, env.town, w.town_id, w.sim_time,
                        jnp.stack([w.x, w.y]), w.v, w.yaw)
                )(ks, states.world)
                states = states._replace(
                    world=states.world._replace(npc=npc))
                return (states, key), npc.veh_xy[0, 0, 0]
            (states, key), probes = jax.lax.scan(
                body, (states, key), None, length=STEPS_PER_CALL)
            return states, key, jnp.sum(probes)

    def phys_offroad(states, key, consts):
        with env.bind(consts):
            def body(carry, i):
                states, key = carry
                d = jax.vmap(lambda w: _off_road_distance(
                    env.town, w.town_id, w.x + i * 1e-3, w.y))(states.world)
                return (states, key), d[0]
            (states, key), probes = jax.lax.scan(
                body, (states, key), jnp.arange(STEPS_PER_CALL, dtype=jnp.float32))
            return states, key, jnp.sum(probes)

    def phys_routewin(states, key, consts):
        with env.bind(consts):
            def one(w, i):
                r_len = tgather(env.routes.length, w.town_id, w.route_id)
                rem = r_len - w.wp_idx
                offs = jnp.minimum(jnp.arange(ROUTE_WINDOW), rem - 1)
                w_ids = w.wp_idx + offs
                w_xy = tgather(env.routes.xy, w.town_id, w.route_id, w_ids)
                w_yaw = tgather(env.routes.yaw, w.town_id, w.route_id, w_ids)
                pos = jnp.stack([w.x + i * 1e-3, w.y])
                li = _route_fns["update_index"](w_xy, rem,
                                                jnp.zeros((), jnp.int32), pos)
                sim = _route_fns["similarity"](w_yaw, li, w.yaw)
                dn = _route_fns["distance_to_next"](w_xy, li, pos)
                end = tgather(env.routes.xy, w.town_id, w.route_id, r_len - 1)
                return sim + dn + end[0] + li
            def body(carry, i):
                states, key = carry
                p = jax.vmap(lambda w: one(w, i))(states.world)
                return (states, key), p[0]
            (states, key), probes = jax.lax.scan(
                body, (states, key), jnp.arange(STEPS_PER_CALL, dtype=jnp.float32))
            return states, key, jnp.sum(probes)

    def phys_dyn(states, key, consts):
        with env.bind(consts):
            a = fixed_actions(n)
            def body(carry, i):
                states, key = carry
                def one(w, act):
                    c = dyn_mod.actions_to_control(
                        act, w.v, throttle_as_desired_speed=True,
                        disable_reverse=True)
                    return dyn_mod.step_bicycle(w.x, w.y, w.yaw, w.v, c)
                x, y, yaw, v = jax.vmap(one)(states.world, a + i * 1e-4)
                states = states._replace(world=states.world._replace(
                    x=x, y=y, yaw=yaw, v=v))
                return (states, key), x[0]
            (states, key), probes = jax.lax.scan(
                body, (states, key), jnp.arange(STEPS_PER_CALL, dtype=jnp.float32))
            return states, key, jnp.sum(probes)

    def phys_dyn_lean(states, key, consts):
        # same bicycle-only body as phys_dyn but the scan carries ONLY the
        # four ego arrays, not the full EnvState pytree — isolates whether
        # the ~6 ms per-chunk variant floor is carry threading of the big
        # (1024, T, C, SH, SW) u8 stacks vs per-iteration dispatch overhead
        with env.bind(consts):
            a = fixed_actions(n)
            def body(carry, i):
                x, y, yaw, v = carry
                def one(x, y, yaw, v, act):
                    c = dyn_mod.actions_to_control(
                        act, v, throttle_as_desired_speed=True,
                        disable_reverse=True)
                    return dyn_mod.step_bicycle(x, y, yaw, v, c)
                x, y, yaw, v = jax.vmap(one)(x, y, yaw, v, a + i * 1e-4)
                return (x, y, yaw, v), x[0]
            w = states.world
            (x, y, yaw, v), probes = jax.lax.scan(
                body, (w.x, w.y, w.yaw, w.v),
                jnp.arange(STEPS_PER_CALL, dtype=jnp.float32))
            states = states._replace(world=w._replace(x=x, y=y, yaw=yaw, v=v))
            return states, key, jnp.sum(probes)

    def phys_rng(states, key, consts):
        def body(carry, _):
            states, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (n, 2))
            ks = jax.random.split(k, n)
            return (states, key), a[0, 0] + ks[0, 0].astype(jnp.float32)
        (states, key), probes = jax.lax.scan(
            body, (states, key), None, length=STEPS_PER_CALL)
        return states, key, jnp.sum(probes)

    variants = dict(
        phys_full=phys_full, phys_fixedact=phys_fixedact,
        phys_noreset=phys_noreset, phys_vecobs=phys_vecobs,
        phys_npc=phys_npc, phys_offroad=phys_offroad,
        phys_routewin=phys_routewin, phys_dyn=phys_dyn,
        phys_dyn_lean=phys_dyn_lean, phys_rng=phys_rng,
        rend_pack=rend_pack, rend_kernel=rend_kernel,
        rend_tile=rend_tile, rend_roll=rend_roll,
        rend_roll_prod=rend_roll_prod, rend_roll_flat=rend_roll_flat,
        rend_all=rend_all,
    )

    if args.only:
        variants = {k: v for k, v in variants.items() if args.only in k}
    results = {}
    for name, fn in variants.items():
        step_fn = jax.jit(fn, donate_argnums=(0,))
        states_v, _ = jax.jit(reset_all, static_argnums=(2,))(
            jax.random.PRNGKey(0), consts, n)
        k = jax.random.PRNGKey(1)
        try:
            for _ in range(WARMUP):
                states_v, k, probe = step_fn(states_v, k, consts)
            float(probe)
            # single end-of-run fetch (device stream is in-order, so the last
            # probe's arrival implies every chunk executed) — per-call fetches
            # add a ~25 ms axon round-trip to every variant
            t0 = time.perf_counter()
            for _ in range(TIMED):
                states_v, k, probe = step_fn(states_v, k, consts)
            float(probe)
            dt = time.perf_counter() - t0
            results[name] = round(1e3 * dt / TIMED, 2)
            print(json.dumps({"part": name,
                              "ms_per_chunk": results[name]}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"part": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
    print(json.dumps({"summary": results, "worlds": n,
                      "pushes_per_chunk": n_push,
                      "steps_per_chunk": STEPS_PER_CALL}), flush=True)


if __name__ == "__main__":
    main()
