"""Frame-dedup rollout buffer: stack reconstruction correctness, incl. the
zero-frame sentinel after mid-rollout auto-resets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_driving_rl_agent_tpu.agents import rollout as rmod
from carla_driving_rl_agent_tpu.envs.carla_env import CARLAEnv, CARLAEnvConfig
from carla_driving_rl_agent_tpu.envs.world import WorldParams


@pytest.fixture(scope="module")
def env():
    return CARLAEnv(CARLAEnvConfig(
        world=WorldParams(town_names=("Town02",), num_routes=4,
                          max_route_len=128, max_timesteps=10),  # fast resets
        image_height=16, image_width=8, render_mode="zeros",
        time_horizon=4, past_obs_freq=4))


class TestStackReconstruction:
    def test_reconstructed_stacks_match_live_stacks(self, env):
        """For every (step, world), gathering frames via stack_ids must equal
        the env's actual live stack at that step."""
        B, S = 4, 12
        key = jax.random.PRNGKey(0)
        states, _ = env.reset_batch(key, B)

        # instrumented rollout: record the live image stacks per step too
        init_stack = jnp.swapaxes(states.image_stack, 0, 1)
        start_ids = jnp.tile(jnp.arange(-4, 0, dtype=jnp.int32)[None], (B, 1))
        states = states._replace(stack_ids=start_ids)

        live_stacks, recs = [], []
        for s in range(S):
            live_stacks.append(np.asarray(states.image_stack))  # (B, T, ...)
            rec = dict(stack_ids=np.asarray(states.stack_ids))
            actions = jnp.tile(jnp.asarray([0.5, 0.0]), (B, 1))
            states, *_ = env.step_batch(states, actions,
                                        jnp.full((B,), s, jnp.int32))
            rec["frame"] = np.asarray(states.image_stack[:, -1])
            recs.append(rec)

        traj = rmod.Trajectory(
            road=None, vehicle=None, navigation=None,
            stack_ids=jnp.asarray(np.stack([r["stack_ids"] for r in recs])),
            frames=jnp.asarray(np.stack([r["frame"] for r in recs])),
            init_stack=init_stack, action=None, log_prob=None, value=None,
            reward=None, terminated=None, truncated=None, speed=None,
            similarity=None)

        steps = jnp.asarray(np.repeat(np.arange(S), B))
        envs = jnp.asarray(np.tile(np.arange(B), S))
        rebuilt = np.asarray(rmod.gather_image_stacks(traj, steps, envs))
        want = np.stack(live_stacks).reshape(S * B, *live_stacks[0].shape[1:])
        np.testing.assert_array_equal(rebuilt, want)

    def test_sentinel_gives_zero_frames(self, env):
        """Post-reset zero slots must reconstruct as zeros, not stale frames."""
        B = 2
        state, _ = env.reset(jax.random.PRNGKey(1))
        T = env.config.time_horizon
        assert int(state.stack_ids[0]) == -(T + 1)  # sentinel
        # simulate a trajectory record with sentinel ids and NONZERO buffers
        C, SH, SW = env.config.storage_shape
        frames = jnp.full((3, B, C, SH, SW), 7, jnp.uint8)
        init = jnp.full((T, B, C, SH, SW), 9, jnp.uint8)
        ids = jnp.full((3, B, T), -(T + 1), jnp.int32)
        traj = rmod.Trajectory(road=None, vehicle=None, navigation=None,
                               stack_ids=ids, frames=frames, init_stack=init,
                               action=None, log_prob=None, value=None,
                               reward=None, terminated=None, truncated=None,
                               speed=None, similarity=None)
        out = np.asarray(rmod.gather_image_stacks(
            traj, jnp.asarray([0, 1]), jnp.asarray([0, 1])))
        assert (out == 0).all(), "sentinel slots must be zero frames"
