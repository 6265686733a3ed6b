"""Fused Pallas physics step (ops/physics_pallas.py) vs the vmapped XLA
step_physics path: same RNG stream, same state evolution, same step
returns, across multi-step rollouts that include auto-resets.

Tolerances: integer/bool/RNG fields must be EXACT (index math, merges and
key plumbing are bit-identical by construction); float fields are pinned to
1e-5 — Mosaic's cos/sqrt can differ from XLA's by ULPs (in interpret mode
on CPU they usually agree bitwise, but the pin is written for the
guarantee the hardware path actually makes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_driving_rl_agent_tpu.envs.carla_env import CARLAEnv, CARLAEnvConfig
from carla_driving_rl_agent_tpu.envs.world import WorldParams


B = 128   # minimum fused batch


def _mk_env(fused: bool, **world_kw):
    wp = dict(town_names=("Town02",), num_routes=8, max_route_len=128,
              max_timesteps=24, num_vehicles=0, num_pedestrians=0,
              v_max=1, p_max=1)
    wp.update(world_kw)
    return CARLAEnv(CARLAEnvConfig(
        world=WorldParams(**wp), render_mode="zeros",
        time_horizon=4, past_obs_freq=4, fused_step=fused))


@pytest.fixture(scope="module")
def envs():
    return _mk_env(False), _mk_env(True)


def _rollout(env, steps=30, seed=3):
    """Jitted multi-step rollout through step_physics_batch; constant
    forward-ish actions so worlds drive off the road and reset."""
    consts = env.consts

    def run(key, consts):
        with env.bind(consts):
            states, _ = env.reset_batch(key, B)

            def body(carry, i):
                states, key = carry
                key, k = jax.random.split(key)
                a = jax.random.uniform(k, (B, 2), minval=jnp.asarray([0.1, -0.6]),
                                       maxval=jnp.asarray([0.9, 0.6]))
                states, reward, term, trunc, info, was_reset = \
                    env.step_physics_batch(states, a)
                rec = dict(reward=reward, term=term, trunc=trunc,
                           was_reset=was_reset,
                           speed=info["speed"], sim=info["similarity"],
                           d_next=info["distance_to_next_waypoint"],
                           off=info["off_road_distance"],
                           coll=info["collision"])
                return (states, key), rec
            (states, _), recs = jax.lax.scan(body, (states, key),
                                             jnp.arange(steps))
            return states, recs

    return jax.jit(run)(jax.random.PRNGKey(seed), consts)


def test_fused_gate_and_fallback(envs):
    ref_env, fz_env = envs
    from carla_driving_rl_agent_tpu.ops.physics_pallas import (
        _lane_shape, fused_step_supported)
    assert fused_step_supported(fz_env.params, 128)
    assert fused_step_supported(fz_env.params, 32)           # train geometry
    assert not fused_step_supported(
        _mk_env(True, num_vehicles=2, v_max=2).params, 128)  # NPC gate
    assert not fused_step_supported(
        _mk_env(True, reward_mode="shaped").params, 128)     # reward gate
    assert _lane_shape(1024) == (8, 128)
    assert _lane_shape(32) == (1, 32)


def test_fused_small_batch_matches_xla(envs):
    """The (1, B) lane layout (train's 32-world geometry) must match too."""
    ref_env, fz_env = envs
    global B
    b_saved = B
    B = 32
    try:
        s_ref, r_ref = _rollout(ref_env, steps=24, seed=7)
        s_fz, r_fz = _rollout(fz_env, steps=24, seed=7)
    finally:
        B = b_saved
    np.testing.assert_array_equal(np.asarray(r_ref["was_reset"]),
                                  np.asarray(r_fz["was_reset"]))
    np.testing.assert_allclose(np.asarray(r_ref["reward"]),
                               np.asarray(r_fz["reward"]), rtol=0, atol=1e-5)


def test_fused_rollout_matches_xla(envs):
    ref_env, fz_env = envs
    s_ref, r_ref = _rollout(ref_env)
    s_fz, r_fz = _rollout(fz_env)

    # resets must have happened for the merge path to be exercised
    n_resets = float(np.sum(np.asarray(r_ref["was_reset"])))
    assert n_resets > 0, "rollout exercised no auto-resets"

    # exact: bools, ints, RNG keys
    for k in ("term", "trunc", "was_reset", "coll"):
        np.testing.assert_array_equal(np.asarray(r_ref[k]), np.asarray(r_fz[k]), k)
    wr, wf = s_ref.world, s_fz.world
    for name in ("route_id", "town_id", "weather_id", "timestep", "episode",
                 "wp_idx", "should_terminate"):
        np.testing.assert_array_equal(
            np.asarray(getattr(wr, name)), np.asarray(getattr(wf, name)), name)
    np.testing.assert_array_equal(np.asarray(wr.key), np.asarray(wf.key), "key")

    # floats to 1e-5 (ULP headroom for Mosaic transcendentals)
    for k in ("reward", "speed", "sim", "d_next", "off"):
        np.testing.assert_allclose(np.asarray(r_ref[k]), np.asarray(r_fz[k]),
                                   rtol=0, atol=1e-5, err_msg=k)
    for name in ("x", "y", "yaw", "v", "throttle", "brake", "steer",
                 "similarity", "sim_time", "total_reward",
                 "collision_penalty"):
        np.testing.assert_allclose(
            np.asarray(getattr(wr, name)), np.asarray(getattr(wf, name)),
            rtol=0, atol=1e-4, err_msg=name)


def test_fused_multi_town(envs):
    """The fused path's gathers keep the town axis: a 2-town random bank
    must still match the XLA path exactly on ids."""
    ref = _mk_env(False, town_names=("Town01", "Town02"), random_towns=True)
    fz = _mk_env(True, town_names=("Town01", "Town02"), random_towns=True)
    s_ref, r_ref = _rollout(ref, steps=20, seed=5)
    s_fz, r_fz = _rollout(fz, steps=20, seed=5)
    np.testing.assert_array_equal(np.asarray(s_ref.world.town_id),
                                  np.asarray(s_fz.world.town_id))
    np.testing.assert_array_equal(np.asarray(r_ref["was_reset"]),
                                  np.asarray(r_fz["was_reset"]))
    np.testing.assert_allclose(np.asarray(r_ref["reward"]),
                               np.asarray(r_fz["reward"]), rtol=0, atol=1e-5)
