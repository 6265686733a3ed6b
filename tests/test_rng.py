"""RNG-implementation invariance: the env behavior contract must hold under
jax's `unsafe_rbg` keys (the TPU-fast mode enabled by CDRL_PRNG=unsafe_rbg —
cheap splits via RngBitGenerator instead of threefry hashing).

The reference draws env randomness from numpy/TF RNGs (e.g.
core/carla_env.py:204-221 random weather/route at reset), so the RNG stream
is not part of the behavior contract — only the distributional behavior is:
resets sample valid routes/weathers, episodes progress, different seeds
diverge, same key reproduces.
"""

import jax
import jax.numpy as jnp
import pytest

from carla_driving_rl_agent_tpu.envs.carla_env import CARLAEnv, CARLAEnvConfig
from carla_driving_rl_agent_tpu.envs.world import WorldParams


@pytest.fixture
def rbg_impl():
    prev = jax.config.jax_default_prng_impl
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    try:
        yield
    finally:
        jax.config.update("jax_default_prng_impl", prev)


def _make_env():
    return CARLAEnv(CARLAEnvConfig(
        world=WorldParams(town_names=("Town02",), num_routes=8,
                          max_route_len=128, max_timesteps=16,
                          num_vehicles=2, num_pedestrians=2, v_max=2, p_max=2,
                          weather_ids=(0, 1, 2)),
        image_height=48, image_width=32, render_mode="zeros",
        time_horizon=4, past_obs_freq=4))


def test_env_rollout_under_unsafe_rbg(rbg_impl):
    env = _make_env()
    n = 8

    def run(key, consts):
        with env.bind(consts):
            states, _ = env.reset_batch(key, n)

            def body(carry, _):
                states, key = carry
                key, k = jax.random.split(key)
                a = jax.random.uniform(k, (n, 2), minval=-1.0, maxval=1.0)
                states, reward, term, trunc, info, _ = \
                    env.step_physics_batch(states, a)
                return (states, key), (reward, term | trunc)

            (states, _), (rewards, dones) = jax.lax.scan(
                body, (states, key), None, length=24)
            return states, rewards, dones

    key = jax.random.PRNGKey(0)
    assert key.shape != (2,)  # proves the impl switch is active
    states, rewards, dones = jax.jit(run)(key, env.consts)

    # behavior contract: finite rewards, episodes progress and terminate
    # (max_timesteps=16 < 24 steps forces at least one reset per world)
    assert bool(jnp.all(jnp.isfinite(rewards)))
    assert bool(jnp.any(dones))
    assert bool(jnp.all(states.world.timestep <= 16))
    # route/weather sampling stays in range
    assert bool(jnp.all((states.world.weather_id >= 0)
                        & (states.world.weather_id < 3)))
    assert bool(jnp.all((states.world.route_id >= 0)
                        & (states.world.route_id < 8)))

    # same key reproduces; different key diverges (ego positions)
    states2, rewards2, _ = jax.jit(run)(key, env.consts)
    assert bool(jnp.all(rewards == rewards2))
    states3, _, _ = jax.jit(run)(jax.random.PRNGKey(7), env.consts)
    assert not bool(jnp.all(states.world.x == states3.world.x))


@pytest.mark.slow
def test_expert_and_network_paths_under_unsafe_rbg(rbg_impl):
    """The fused expert-rollout path (keys thread through rollout + update
    sampling) stays finite under rbg keys."""
    from carla_driving_rl_agent_tpu.agents.carla_agent import (
        CARLAgent, CARLAgentConfig)

    env = _make_env()
    agent = CARLAgent(env, CARLAgentConfig(
        num_envs=4, rollout_steps=8, batch_size=8, seed=0,
        expert_rollout=True), log_mode=None)
    _, hist = agent.learn(num_updates=1)
    for k in ("loss_policy", "loss_value"):
        assert jnp.isfinite(hist[-1][k]), (k, hist[-1][k])
