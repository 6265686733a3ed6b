"""carla_driving_rl_agent_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the
CARLA driving RL framework (reference: Luca96/carla-driving-rl-agent).

The reference wraps a single PPO agent around an external UE4 simulator over
TCP RPC (reference `rl/environments/carla/environment.py`).  This framework
inverts that design: the driving world (vehicle dynamics, towns, routes, NPC
traffic, camera rendering) is a pure-JAX program `step(state, action) ->
(state', obs, reward, done, info)` vmapped over thousands of worlds, fused
with the ShuffleNetV2+GRU PPO learner into a single XLA program, so rollout
and learning never leave HBM.

Layout (mirrors the reference's layer map, SURVEY.md §1):
  envs/       — the TPU-native simulator (replaces CARLA server + gym layer)
  models/     — ShuffleNetV2 + feature nets + GRUs + Beta policy (core/networks.py)
  agents/     — PPO learner + CARLA agent specialization (rl/agents/, core/carla_agent.py)
  curriculum/ — stage presets s1..s5 + evaluation protocol (core/learning.py)
  augment/    — image augmentation library (rl/augmentations/)
  ops/        — Pallas kernels (camera rasterizer) and compute ops
  parallel/   — device-mesh sharding (new capability; reference has none)
  utils/      — math, schedules, optimizers, summaries, checkpointing (rl/utils.py)
  native/     — C++ host-side route planner (A* over town graphs)
"""

__version__ = "0.1.0"

from carla_driving_rl_agent_tpu.utils import math as math_utils  # noqa: F401
