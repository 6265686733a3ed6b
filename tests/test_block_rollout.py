"""Block rollout path: one forward pass + one rendered frame per
past_obs_freq steps (rollout.run_rollout_blocks, CARLAEnv.step_physics /
push_block_frame).  Exactness argument in the module docstrings; these tests
pin the physics equivalence and the stack/frame-id bookkeeping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from carla_driving_rl_agent_tpu.agents import rollout as rollout_mod
from carla_driving_rl_agent_tpu.agents.carla_agent import CARLAgent, CARLAgentConfig
from carla_driving_rl_agent_tpu.envs.carla_env import CARLAEnv, CARLAEnvConfig
from carla_driving_rl_agent_tpu.envs.world import WorldParams
from carla_driving_rl_agent_tpu.models.distributions import Beta

from tests.test_agent import TINY_NET


@pytest.fixture(scope="module")
def env():
    cfg = CARLAEnvConfig(
        world=WorldParams(town_names=("Town02",), num_routes=8,
                          max_route_len=256, max_timesteps=24),
        image_height=48, image_width=32, render_mode="zeros",
        time_horizon=4, past_obs_freq=4)
    return CARLAEnv(cfg)


class TestBetaSampleN:
    def test_shape_and_logprob_broadcast(self):
        dist = Beta(jnp.full((3, 2), 2.0), jnp.full((3, 2), 3.0))
        x = dist.sample_n(jax.random.PRNGKey(0), 5)
        assert x.shape == (5, 3, 2)
        lp = dist.log_prob(dist.clip(x))
        assert lp.shape == (5, 3, 2)
        assert bool(jnp.all(jnp.isfinite(lp)))

    def test_samples_iid_not_repeated(self):
        dist = Beta(jnp.full((4,), 2.0), jnp.full((4,), 2.0))
        x = np.asarray(dist.sample_n(jax.random.PRNGKey(1), 3))
        assert not np.allclose(x[0], x[1])


class TestStepPhysics:
    def test_matches_full_step_world(self, env):
        """Given identical actions, step_physics and step advance the WORLD
        identically (same rewards/term/trunc); only the obs stacks differ."""
        states, _ = jax.jit(lambda k: env.reset_batch(k, 4))(
            jax.random.PRNGKey(0))
        action = jnp.tile(jnp.asarray([[0.5, 0.0]]), (4, 1))

        s_full = states
        s_phys = states
        for _ in range(6):
            s_full, _, r_full, te_full, tr_full, _ = env.step_batch(
                s_full, action)
            s_phys, r_phys, te_phys, tr_phys, _, _ = env.step_physics_batch(
                s_phys, action)
            np.testing.assert_allclose(np.asarray(r_full), np.asarray(r_phys),
                                       rtol=1e-6)
            np.testing.assert_array_equal(np.asarray(te_full),
                                          np.asarray(te_phys))
        np.testing.assert_allclose(
            np.asarray(s_full.world.ego_xy if hasattr(s_full.world, "ego_xy")
                       else jax.tree_util.tree_leaves(s_full.world)[0]),
            np.asarray(s_phys.world.ego_xy if hasattr(s_phys.world, "ego_xy")
                       else jax.tree_util.tree_leaves(s_phys.world)[0]),
            rtol=1e-6)

    def test_push_rolls_stack_and_records_id(self, env):
        from carla_driving_rl_agent_tpu.envs.carla_env import (
            ordered_image_stack)
        states, _ = jax.jit(lambda k: env.reset_batch(k, 2))(
            jax.random.PRNGKey(1))
        ids0 = np.asarray(states.stack_ids)
        no_reset = jnp.zeros((2,), bool)
        pushed = env.push_block_frame_batch(states, no_reset, 7)
        ids1 = np.asarray(pushed.stack_ids)
        np.testing.assert_array_equal(ids1[:, :-1], ids0[:, 1:])
        assert (ids1[:, -1] == 7).all()
        # ordered-view contract: old slots shift left (the physical buffer
        # is circular — one slot written per push; the ORDERED view must
        # behave exactly like the old rolled storage)
        ord0 = np.asarray(ordered_image_stack(
            states.image_stack, states.stack_ids, states.stack_slot))
        ord1 = np.asarray(ordered_image_stack(
            pushed.image_stack, pushed.stack_ids, pushed.stack_slot))
        np.testing.assert_array_equal(ord1[:, :-1], ord0[:, 1:])

    def test_push_with_reset_zeroes_stack(self, env):
        from carla_driving_rl_agent_tpu.envs.carla_env import (
            ordered_image_stack)
        states, _ = jax.jit(lambda k: env.reset_batch(k, 2))(
            jax.random.PRNGKey(2))
        was_reset = jnp.asarray([True, False])
        pushed = env.push_block_frame_batch(states, was_reset, 3)
        ids = np.asarray(pushed.stack_ids)
        T = env.config.time_horizon
        assert (ids[0, :-1] == -(T + 1)).all() and ids[0, -1] == 3
        assert (np.asarray(pushed.road_stack[0, :-1]) == 0).all()
        ord0 = np.asarray(ordered_image_stack(
            states.image_stack, states.stack_ids, states.stack_slot))
        ord1 = np.asarray(ordered_image_stack(
            pushed.image_stack, pushed.stack_ids, pushed.stack_slot))
        # reset world: pre-frame slots read as zeros through the view
        assert (ord1[0, :-1] == 0).all()
        # non-reset world keeps its history
        np.testing.assert_array_equal(ord1[1, :-1], ord0[1, 1:])


class TestBlockRollout:
    def _deterministic_predict(self, action_value):
        def predict_step(net_in, k):
            B = net_in["state_road"].shape[0]
            a = jnp.full((B, 2), action_value)
            return dict(action=a, log_prob=jnp.zeros((B, 2)),
                        value=jnp.zeros((B, 2)))

        def predict_block(net_in, k, n):
            B = net_in["state_road"].shape[0]
            a = jnp.full((n, B, 2), action_value)
            return dict(action=a, log_prob=jnp.zeros((n, B, 2)),
                        value=jnp.zeros((B, 2)))

        return predict_step, predict_block

    def test_rewards_match_per_step_rollout(self, env):
        """Same (deterministic) actions => identical physics: the block
        rollout's per-step rewards/flags equal the per-step rollout's."""
        p_step, p_block = self._deterministic_predict(0.6)
        states, _ = jax.jit(lambda k: env.reset_batch(k, 4))(
            jax.random.PRNGKey(3))
        _, traj_a, _ = jax.jit(
            lambda s, k: rollout_mod.run_rollout(env, p_step, s, k, 16))(
                states, jax.random.PRNGKey(4))
        _, traj_b, _ = jax.jit(
            lambda s, k: rollout_mod.run_rollout_blocks(env, p_block, s, k, 16))(
                states, jax.random.PRNGKey(5))
        np.testing.assert_allclose(np.asarray(traj_a.reward),
                                   np.asarray(traj_b.reward), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(traj_a.terminated),
                                      np.asarray(traj_b.terminated))
        np.testing.assert_allclose(np.asarray(traj_a.speed),
                                   np.asarray(traj_b.speed), rtol=1e-5)

    def test_trajectory_shapes_and_frame_dedup(self, env):
        p_step, p_block = self._deterministic_predict(0.5)
        states, _ = jax.jit(lambda k: env.reset_batch(k, 3))(
            jax.random.PRNGKey(6))
        _, traj, _ = jax.jit(
            lambda s, k: rollout_mod.run_rollout_blocks(env, p_block, s, k, 16))(
                states, jax.random.PRNGKey(7))
        S, B = 16, 3
        assert traj.action.shape == (S, B, 2)
        assert traj.value.shape == (S, B, 2)
        assert traj.reward.shape == (S, B)
        # one frame per BLOCK, not per step
        assert traj.frames.shape[0] == S // env.config.past_obs_freq
        # gather must resolve every recorded stack id
        img = rollout_mod.gather_image_stacks(
            traj, jnp.arange(S).repeat(B), jnp.tile(jnp.arange(B), S))
        # planar storage form (C, SH, SW); planes_to_image rebuilds HWC
        assert img.shape == (S * B, env.config.time_horizon) + \
            env.config.storage_shape

    def test_block_ids_reference_pushed_frames(self, env):
        """After block b completes, live stacks' newest id is b; recorded
        per-step ids within block b are the ids observed at block start."""
        p_step, p_block = self._deterministic_predict(0.4)
        states, _ = jax.jit(lambda k: env.reset_batch(k, 2))(
            jax.random.PRNGKey(8))
        new_states, traj, _ = jax.jit(
            lambda s, k: rollout_mod.run_rollout_blocks(env, p_block, s, k, 8))(
                states, jax.random.PRNGKey(9))
        ids = np.asarray(traj.stack_ids)          # (8, 2, T)
        assert (ids[0, :, -1] == -1).all()        # block 0 saw the init stack
        assert (ids[4, :, -1] == 0).all()         # block 1 saw frame 0
        assert (np.asarray(new_states.stack_ids)[:, -1] == 1).all()


class TestBlockAgent:
    @pytest.mark.slow
    def test_learn_and_eval_with_block_rollout(self, env, tmp_path):
        cfg = CARLAgentConfig(num_envs=4, rollout_steps=8, batch_size=8,
                              network=TINY_NET, seed=11, rollout_block=True)
        agent = CARLAgent(env, cfg, name="block-agent",
                          weights_dir=str(tmp_path))
        _, history = agent.learn(num_updates=1)
        assert np.isfinite(history[0]["loss_policy"])
        assert np.isfinite(history[0]["loss_value"])
        res = agent.evaluate(name="block-eval", timesteps=8, trials=4,
                             initial_seed=0,
                             evaluation_dir=str(tmp_path / "eval"))
        assert len(res["total_reward"]) > 0


class TestPostResetMask:
    def test_post_reset_flags_follow_mid_block_resets(self):
        """post_reset[s] must be 1 exactly when a done fired at an EARLIER
        sub-step of the same block (the mismatch window), 0 otherwise."""
        env_cfg = CARLAEnvConfig(
            world=WorldParams(town_names=("Town02",), num_routes=8,
                              max_route_len=256, max_timesteps=6),
            image_height=48, image_width=32, render_mode="zeros",
            time_horizon=4, past_obs_freq=4)
        env = CARLAEnv(env_cfg)

        def p_block(net_in, k, n):
            B = net_in["state_road"].shape[0]
            return dict(action=jnp.full((n, B, 2), 0.6),
                        log_prob=jnp.zeros((n, B, 2)),
                        value=jnp.zeros((B, 2)))

        states, _ = jax.jit(lambda k: env.reset_batch(k, 4))(
            jax.random.PRNGKey(12))
        _, traj, _ = jax.jit(
            lambda s, k: rollout_mod.run_rollout_blocks(env, p_block, s, k, 16))(
                states, jax.random.PRNGKey(13))

        done = np.asarray(traj.terminated + traj.truncated) > 0    # (S, B)
        post = np.asarray(traj.post_reset)                          # (S, B)
        block = env.config.past_obs_freq
        S, B = done.shape
        for b in range(B):
            for s in range(S):
                start = (s // block) * block
                expected = 1.0 if done[start:s, b].any() else 0.0
                assert post[s, b] == expected, (s, b, post[:, b], done[:, b])
        # max_timesteps=6 with block=4 guarantees mid-block truncations exist
        assert post.sum() > 0, "no mid-block reset exercised the flag"

    def test_per_step_rollout_has_zero_flags(self, env):
        def p_step(net_in, k):
            B = net_in["state_road"].shape[0]
            return dict(action=jnp.full((B, 2), 0.5),
                        log_prob=jnp.zeros((B, 2)), value=jnp.zeros((B, 2)))

        states, _ = jax.jit(lambda k: env.reset_batch(k, 2))(
            jax.random.PRNGKey(14))
        _, traj, _ = jax.jit(
            lambda s, k: rollout_mod.run_rollout(env, p_step, s, k, 8))(
                states, jax.random.PRNGKey(15))
        assert (np.asarray(traj.post_reset) == 0).all()
