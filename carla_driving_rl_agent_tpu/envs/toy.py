"""A tiny functional control env for the generic (non-CARLA) agents.

Plays the role of the gym environments the reference's generic PPOAgent
trains on (`rl/agents/agents.py:22-25` does `gym.make(...)`): a 2D point
mass must reach a goal.  Same functional protocol as the CARLA world:
reset(key) -> (state, obs); step(state, action) -> (state, obs, r, term,
trunc, info).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from carla_driving_rl_agent_tpu.envs import spaces


class PointNavState(NamedTuple):
    pos: jax.Array
    vel: jax.Array
    goal: jax.Array
    t: jax.Array
    key: jax.Array


class PointNavEnv:
    """Point mass with velocity control; reward = progress toward the goal."""

    def __init__(self, max_steps: int = 100, arena: float = 5.0):
        self.max_steps = max_steps
        self.arena = arena
        self.action_space = spaces.Box(low=-1.0, high=1.0, shape=(2,))
        self.observation_space = spaces.Box(low=-arena, high=arena, shape=(6,))

    def _obs(self, s: PointNavState) -> jax.Array:
        return jnp.concatenate([s.pos, s.goal - s.pos, s.vel])

    def reset(self, key: jax.Array):
        k1, k2, k3 = jax.random.split(key, 3)
        state = PointNavState(
            pos=jax.random.uniform(k1, (2,), minval=-self.arena, maxval=self.arena),
            vel=jnp.zeros(2),
            goal=jax.random.uniform(k2, (2,), minval=-self.arena, maxval=self.arena),
            t=jnp.zeros((), jnp.int32), key=k3)
        return state, self._obs(state)

    def step(self, state: PointNavState, action: jax.Array):
        vel = 0.8 * state.vel + 0.2 * jnp.clip(action, -1, 1)
        pos = jnp.clip(state.pos + vel * 0.5, -self.arena, self.arena)
        d_old = jnp.linalg.norm(state.goal - state.pos)
        d_new = jnp.linalg.norm(state.goal - pos)
        reward = (d_old - d_new) * 10.0
        arrived = d_new < 0.3
        reward = reward + jnp.where(arrived, 10.0, 0.0)
        t = state.t + 1
        term = arrived
        trunc = (t >= self.max_steps) & ~term

        # auto-reset
        k_next, k_reset = jax.random.split(state.key)
        stepped = PointNavState(pos=pos, vel=vel, goal=state.goal, t=t, key=k_next)
        fresh, _ = self.reset(k_reset)
        done = term | trunc
        new_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), fresh, stepped)
        return new_state, self._obs(new_state), reward, term, trunc, dict(distance=d_new)
