"""Env variant tests: shaped reward, one-camera, discrete actions, reverse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_driving_rl_agent_tpu.envs.carla_env import (
    CARLAEnv, CARLAEnvConfig, CARLAEnvDiscrete)
from carla_driving_rl_agent_tpu.envs.world import WorldParams


def make_env(**over):
    cfg = dict(world=WorldParams(town_names=("Town02",), num_routes=8,
                                 max_route_len=256, max_timesteps=32,
                                 **over.pop("world_over", {})),
               image_height=48, image_width=32, render_mode="zeros")
    cfg.update(over)
    return CARLAEnv(CARLAEnvConfig(**cfg))


class TestShapedReward:
    def test_shaped_reward_formula(self):
        env = make_env(world_over=dict(reward_mode="shaped"))
        state, _ = env.reset(jax.random.PRNGKey(0))
        state, _, reward, *_ = env.step(state, jnp.array([1.0, 0.0]))
        # near-zero speed, aligned, close to waypoint: r ~ time_cost - d + dir
        w = state.world
        spd = float(w.v) * 3.6
        d = float(jnp.linalg.norm(
            env.routes.xy[w.town_id, w.route_id, w.wp_idx] - jnp.stack([w.x, w.y])))
        sim = float(w.similarity)
        direction = spd * sim if 0.75 <= sim <= 1.0 else -(spd + 1) * abs(sim) * 2
        wp = -d if d <= 5.0 else -3 * d
        assert float(reward) == pytest.approx(-1.0 + wp + direction, rel=1e-3, abs=1e-3)


class TestOneCamera:
    def test_single_camera_image_shape(self):
        env = make_env(cameras=1)
        assert env.config.image_shape == (48, 32, 3)
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs["image"].shape == (4, 48, 32, 3)


class TestDiscrete:
    def test_bins_roundtrip_and_step(self):
        env = CARLAEnvDiscrete(make_env(), bins=4)
        assert tuple(env.action_space.nvec) == (4, 4)
        cont = env.to_continuous(jnp.array([0, 3]))
        np.testing.assert_allclose(np.asarray(cont), [-1.0, 0.5])
        back = env.to_discrete(cont)
        np.testing.assert_array_equal(np.asarray(back), [0, 3])
        state, _ = env.reset(jax.random.PRNGKey(0))
        state, obs, reward, term, trunc, info = env.step(state, jnp.array([3, 2]))
        assert jnp.isfinite(reward)


class TestReverse:
    def test_reverse_moves_backward(self):
        from carla_driving_rl_agent_tpu.envs import dynamics as dyn
        control = dyn.actions_to_control(jnp.array([0.5, 0.0, 1.0]),
                                         jnp.zeros(()),
                                         throttle_as_desired_speed=False,
                                         disable_reverse=False)
        assert float(control.reverse) == 1.0
        x, y, yaw, v = dyn.step_bicycle(jnp.zeros(()), jnp.zeros(()),
                                        jnp.zeros(()), jnp.asarray(5.0), control)
        assert float(x) < 0.0, "reverse gear should move backward"

    def test_disable_reverse_ignores_channel(self):
        from carla_driving_rl_agent_tpu.envs import dynamics as dyn
        control = dyn.actions_to_control(jnp.array([0.5, 0.0, 1.0]),
                                         jnp.zeros(()),
                                         throttle_as_desired_speed=False,
                                         disable_reverse=True)
        assert float(control.reverse) == 0.0
