"""Generic PPO agent: it must actually LEARN the toy control task
(the learning-dynamics sanity check the reference lacks entirely)."""

import numpy as np
import pytest

from carla_driving_rl_agent_tpu.agents.base import RandomAgent
from carla_driving_rl_agent_tpu.agents.ppo import PPOAgent, PPOConfig
from carla_driving_rl_agent_tpu.envs.toy import PointNavEnv


class TestGenericPPO:
    def test_learns_point_nav(self, tmp_path):
        env = PointNavEnv(max_steps=80)
        agent = PPOAgent(env, PPOConfig(
            num_envs=32, rollout_steps=64, batch_size=256,
            policy_lr=1e-3, value_lr=1e-3, gamma=0.99, lambda_=0.95,
            entropy_regularization=0.01, seed=1,
            network=dict(policy=dict(units=64, num_layers=2),
                         value=dict(units=64, num_layers=2))),
            weights_dir=str(tmp_path), log_mode=None)
        _, hist = agent.learn(num_updates=1)
        first = hist[0]["reward_mean"]
        _, hist = agent.learn(num_updates=20)
        last = np.mean([h["reward_mean"] for h in hist[-3:]])
        assert last > first + 0.1, f"no learning progress: {first:.3f} -> {last:.3f}"
        assert all(np.isfinite(h["loss_policy"]) for h in hist)

    def test_random_agent_baseline(self, tmp_path):
        env = PointNavEnv(max_steps=50)
        agent = RandomAgent(env, weights_dir=str(tmp_path), log_mode=None)
        res = agent.evaluate(episodes=8, timesteps=50)
        assert len(res["episode_rewards"]) == 8
        assert np.isfinite(res["mean"])

    def test_save_load(self, tmp_path):
        env = PointNavEnv()
        agent = PPOAgent(env, PPOConfig(num_envs=4, rollout_steps=8,
                                        batch_size=16, seed=3),
                         weights_dir=str(tmp_path), log_mode=None)
        agent.learn(num_updates=1)
        agent.save()
        agent.load()

    def test_discrete_action_space(self, tmp_path):
        # exercise the categorical adapter via a discretized toy env
        from carla_driving_rl_agent_tpu.envs import spaces
        import jax.numpy as jnp

        class DiscretePointNav(PointNavEnv):
            def __init__(self, bins=4, **kw):
                super().__init__(**kw)
                self.bins = bins
                self.action_space = spaces.MultiDiscrete(nvec=[bins, bins])

            def step(self, state, action):
                cont = action.astype(jnp.float32) / (self.bins - 1) * 2.0 - 1.0
                return super().step(state, cont)

        env = DiscretePointNav()
        agent = PPOAgent(env, PPOConfig(num_envs=4, rollout_steps=8,
                                        batch_size=16, seed=5),
                         weights_dir=str(tmp_path), log_mode=None)
        _, hist = agent.learn(num_updates=1)
        assert np.isfinite(hist[0]["loss_policy"])
