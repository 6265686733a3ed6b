"""FakeCARLAEnvironment: build/summarize agents without any simulation.

Reference `core/carla_agent.py:26-52`: a gym.Env exposing the exact CARLA
observation/action spaces with no-op step/reset, used to construct networks
without a running simulator (reference README.md:56-62).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from carla_driving_rl_agent_tpu.envs import spaces


class FakeCARLAEnvironment:
    """Same spaces as CARLAEnv; no-op dynamics."""

    def __init__(self, time_horizon: int = 4, image_shape=(90, 360, 3),
                 num_waypoints: int = 5):
        self.time_horizon = time_horizon
        self.num_waypoints = num_waypoints
        self.action_space = spaces.Box(low=-1.0, high=1.0, shape=(2,))
        # past_control (throttle, brake, steer, reverse) + command (RoadOption
        # one-hot) mirror the reference fake env's extra keys
        # (core/carla_agent.py:36-43); the network indexes only the keys it
        # consumes, so the extra entries are inert for the flagship spec.
        self.observation_space = spaces.Dict(
            road=spaces.Box(low=0.0, high=1.0, shape=(9,)),
            vehicle=spaces.Box(low=0.0, high=1.0, shape=(4,)),
            past_control=spaces.Box(low=-1.0, high=1.0, shape=(4,)),
            command=spaces.Box(low=0.0, high=1.0, shape=(7,)),
            image=spaces.Box(low=-1.0, high=1.0, shape=image_shape),
            navigation=spaces.Box(low=0.0, high=25.0, shape=(num_waypoints,)),
        )

    def sample_stacked_obs(self, batch: int = 1) -> dict:
        """A zeros observation dict with the (B, T, ...) layout the agent
        network consumes — state_-prefixed like the reference's batches."""
        T = self.time_horizon
        out = {}
        for name, space in self.observation_space.items():
            out[f"state_{name}"] = jnp.zeros((batch, T) + tuple(space.shape))
        out["action"] = jnp.zeros((batch,) + tuple(self.action_space.shape))
        return out

    def step(self, action):
        pass

    def reset(self):
        pass

    def render(self, mode="human"):
        pass
