"""Agent base + RandomAgent baseline.

Reference: `rl/agents/agents.py` — `Agent` (seeding `:61-72`, spec
extraction `:31-32`, config persistence `:181-203`, generic evaluate
`:90-139`, `test()` rapid harness `:144-153`) and `RandomAgent` (`:218-298`),
the untrained statistical baseline of the paper's evaluation.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from carla_driving_rl_agent_tpu.envs import spaces
from carla_driving_rl_agent_tpu.utils.summary import Summary


class Agent:
    """Host-side base: owns seeding, spaces/specs, paths, and the Summary."""

    def __init__(self, env, name: str = "agent", batch_size: int = 64,
                 seed: Optional[int] = None, weights_dir: str = "weights",
                 log_mode: str = "summary", summary_keys=None, **kwargs):
        self.env = env
        self.name = name
        self.batch_size = batch_size
        self.base_path = os.path.join(weights_dir, name)
        self.evaluation_path = os.path.join(self.base_path, "evaluation")
        self.config_path = os.path.join(self.base_path, "config.json")
        self.config_data: dict = {}  # persisted config.json contents
        self.summary = Summary(mode=log_mode, name=name, summary_keys=summary_keys)
        self.seed = None
        self.set_random_seed(seed if seed is not None else 42)

        self.state_spec = spaces.space_to_flat_spec(env.observation_space, "state")
        self.action_spec = spaces.space_to_flat_spec(env.action_space, "action")

    def set_random_seed(self, seed: int):
        """Global seeding (reference `rl/agents/agents.py:61-72`): in the
        all-JAX design one PRNG key determines everything."""
        self.seed = int(seed) % (2 ** 32)
        self._key = jax.random.PRNGKey(self.seed)

    def next_key(self) -> jax.Array:
        self._key, k = jax.random.split(self._key)
        return k

    def log(self, **kwargs):
        self.summary.log(**kwargs)

    def write_summaries(self):
        self.summary.write_summaries()

    def update_config(self, **kwargs):
        self.config_data.update(kwargs)

    def save_config(self):
        os.makedirs(self.base_path, exist_ok=True)
        with open(self.config_path, "w") as f:
            json.dump(self.config_data, f, indent=2)

    def load_config(self):
        if os.path.exists(self.config_path):
            with open(self.config_path) as f:
                self.config_data = json.load(f)

    @classmethod
    def test(cls, args: dict, network_summary: bool = False, **kwargs):
        """Rapid testing harness (reference `rl/agents/agents.py:144-153`)."""
        agent = cls(**args)
        if network_summary and hasattr(agent, "summary_str"):
            print(agent.summary_str())
        agent.learn(**kwargs)
        return agent


class RandomAgent(Agent):
    """Uniform-random baseline (reference `rl/agents/agents.py:218-298`) —
    the 'untrained' control agent in the paper's evaluation tables."""

    def __init__(self, env, name: str = "random-agent", **kwargs):
        super().__init__(env, name=name, **kwargs)

    def act(self, key: jax.Array, batch: int = 1) -> jax.Array:
        space = self.env.action_space
        return jax.random.uniform(key, (batch,) + tuple(space.shape),
                                  minval=jnp.asarray(space.low),
                                  maxval=jnp.asarray(space.high))

    def evaluate(self, episodes: int = 10, timesteps: int = 200,
                 seed: int = 42) -> dict:
        """Batched random rollouts; returns per-episode total rewards."""
        env = self.env
        key = jax.random.PRNGKey(seed)
        k_reset, key = jax.random.split(key)
        keys = jax.random.split(k_reset, episodes)
        states, _ = jax.vmap(env.reset)(keys)

        def step_fn(carry, _):
            states, key, total, active = carry
            key, k = jax.random.split(key)
            actions = self.act(k, episodes)
            states, _, reward, term, trunc, _ = jax.vmap(env.step)(states, actions)
            done = (term | trunc).astype(jnp.float32)
            total = total + reward * active
            active = active * (1.0 - done)
            return (states, key, total, active), None

        init = (states, key, jnp.zeros(episodes), jnp.ones(episodes))
        (states, key, total, active), _ = jax.lax.scan(
            jax.jit(step_fn), init, None, length=timesteps)
        rewards = np.asarray(total)
        return dict(episode_rewards=rewards.tolist(),
                    mean=float(rewards.mean()), std=float(rewards.std()))
