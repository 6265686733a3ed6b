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

import os as _os

# Persistent XLA compilation cache: the fused train program is large and
# remote-attached TPU compiles are minutes — cache across processes.
try:
    import jax as _jax

    _cache_dir = _os.environ.get("CDRL_JAX_CACHE",
                                 _os.path.expanduser("~/.cache/cdrl_jax"))
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

# RNG implementation knob. The env step splits keys several times per world
# per tick (step_world, NPC tick, and the reset branch merged into every
# auto-reset step), and threefry splits are a large share of the physics
# cost at 1024 worlds. CDRL_PRNG=unsafe_rbg switches key derivation to the
# TPU-native RngBitGenerator path (cheap splits; the right impl under pjit
# too). Not a parity concern: the reference draws env randomness from
# numpy/TF RNGs, so only the stream differs, never the behavior contract.
try:
    _prng = _os.environ.get("CDRL_PRNG", "")
    if _prng in ("rbg", "unsafe_rbg", "threefry2x32"):
        _jax.config.update("jax_default_prng_impl", _prng)
except Exception:  # pragma: no cover - knob is best-effort
    pass

from carla_driving_rl_agent_tpu.utils import math as math_utils  # noqa: F401


def __getattr__(name):
    """Lazy top-level exports (mirrors the reference's `rl`/`core` exports,
    `rl/__init__.py:1-5`, `core/__init__.py:2-4`) without import-time cost."""
    lazy = {
        "CARLAgent": "carla_driving_rl_agent_tpu.agents.carla_agent",
        "CARLAgentConfig": "carla_driving_rl_agent_tpu.agents.carla_agent",
        "PPOAgent": "carla_driving_rl_agent_tpu.agents.ppo",
        "PPOConfig": "carla_driving_rl_agent_tpu.agents.ppo",
        "RandomAgent": "carla_driving_rl_agent_tpu.agents.base",
        "Agent": "carla_driving_rl_agent_tpu.agents.base",
        "CARLAEnv": "carla_driving_rl_agent_tpu.envs.carla_env",
        "CARLAEnvConfig": "carla_driving_rl_agent_tpu.envs.carla_env",
        "FakeCARLAEnvironment": "carla_driving_rl_agent_tpu.envs.fake",
        "CARLACollectWrapper": "carla_driving_rl_agent_tpu.envs.wrappers",
        "CARLAPlayWrapper": "carla_driving_rl_agent_tpu.envs.wrappers",
        "CARLABenchmark": "carla_driving_rl_agent_tpu.envs.wrappers",
        "CARLANetwork": "carla_driving_rl_agent_tpu.models.carla_network",
        "PPONetwork": "carla_driving_rl_agent_tpu.models.networks",
        "Stage": "carla_driving_rl_agent_tpu.curriculum.stages",
        "DynamicParameter": "carla_driving_rl_agent_tpu.utils.schedules",
    }
    if name in lazy:
        import importlib
        return getattr(importlib.import_module(lazy[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
