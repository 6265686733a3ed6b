"""Bench ablation + profiler trace for the rendered env-step path.

Runs the exact bench.py chunk three ways on the attached chip and prints a
JSON line per variant:
  * full     — physics + render push every past_obs_freq steps (the bench)
  * physics  — physics only, no render/push (upper bound without rendering)
  * render   — render+push only, at the bench's push rate (isolated cost)

Optionally (--trace) wraps the timed full run in a jax.profiler trace written
to /tmp/jaxtrace for TensorBoard/xprof inspection.

Usage: python scripts/bench_profile.py [--trace] [--worlds 1024]
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
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--worlds", type=int, default=NUM_WORLDS)
    args = ap.parse_args()
    n = args.worlds

    env = make_env()
    consts = env.consts
    block = env.config.past_obs_freq

    def reset_all(key, consts):
        with env.bind(consts):
            return env.reset_batch(key, n)

    states, _ = jax.jit(reset_all)(jax.random.PRNGKey(0), consts)

    def physics_block(states, key, consts, do_push: bool, do_physics: bool):
        with env.bind(consts):
            def body(carry, _):
                states, key = carry
                if do_physics:
                    def sub(inner, _):
                        states, key, was_reset = inner
                        key, k = jax.random.split(key)
                        a = jax.random.uniform(k, (n, 2),
                                               minval=jnp.asarray([-0.2, -0.5]),
                                               maxval=jnp.asarray([0.8, 0.5]))
                        states, reward, term, trunc, info, did_reset = \
                            env.step_physics_batch(states, a)
                        return (states, key, was_reset | did_reset), reward[0]
                    (states, key, was_reset), rewards = jax.lax.scan(
                        sub, (states, key, jnp.zeros((n,), bool)),
                        None, length=block)
                else:
                    was_reset = jnp.zeros((n,), bool)
                    rewards = jnp.zeros((block,))
                if do_push:
                    states = env.push_block_frame_batch(states, was_reset)
                return (states, key), rewards.sum()
            (states, key), rewards = jax.lax.scan(
                body, (states, key), jnp.arange(STEPS_PER_CALL // block))
            from carla_driving_rl_agent_tpu.envs.carla_env import newest_frame
            probe = jnp.sum(rewards) + jnp.mean(
                newest_frame(states.image_stack, states.stack_slot)[0]
                .astype(jnp.float32))
            return states, key, probe

    import functools
    variants = dict(
        full=functools.partial(physics_block, do_push=True, do_physics=True),
        physics=functools.partial(physics_block, do_push=False, do_physics=True),
        render=functools.partial(physics_block, do_push=True, do_physics=False),
    )

    results = {}
    for name, fn in variants.items():
        step_fn = jax.jit(fn, donate_argnums=(0,))
        states_v, _ = jax.jit(reset_all)(jax.random.PRNGKey(0), consts)
        k = jax.random.PRNGKey(1)
        for _ in range(WARMUP):
            states_v, k, probe = step_fn(states_v, k, consts)
        float(probe)
        ctx = (jax.profiler.trace("/tmp/jaxtrace")
               if (args.trace and name == "full") else _null())
        with ctx:
            # single end-of-chain fetch (see bench.py): per-call scalar
            # fetches pay the ~25 ms axon round-trip per chunk
            t0 = time.perf_counter()
            for _ in range(TIMED):
                states_v, k, probe = step_fn(states_v, k, consts)
            float(probe)
            dt = time.perf_counter() - t0
        sps = n * STEPS_PER_CALL * TIMED / dt
        results[name] = round(sps, 1)
        print(json.dumps({"variant": name, "steps_per_sec": round(sps, 1),
                          "ms_per_chunk": round(1e3 * dt / TIMED, 2)}))
    print(json.dumps({"summary": results}))


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
