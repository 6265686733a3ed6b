"""Imitation-learning utilities (reference `core/learning.py:196-304`)."""

from __future__ import annotations

import os
import numpy as np

from carla_driving_rl_agent_tpu.curriculum.stages import build_env, define_env
from carla_driving_rl_agent_tpu.envs.wrappers import CARLACollectWrapper
from carla_driving_rl_agent_tpu.utils import traces as trace_io


def collect_experience(episodes: int, timesteps: int, threshold: float = 0.0,
                       ignore_traffic_light: bool = True,
                       traces_dir: str = "traces", behaviour: str = "normal",
                       name: str = "collect", num_envs: int = 8,
                       **env_kwargs) -> int:
    """Collect privileged-expert traces (reference `core/learning.py:196-212`):
    the expert drives `episodes` episodes; traces below
    `timesteps * threshold` total reward are discarded."""
    assert behaviour in ("cautious", "normal", "aggressive")
    assert 0.0 <= threshold <= 1.0
    env = build_env(**define_env(**env_kwargs))
    wrapper = CARLACollectWrapper(env, ignore_traffic_light=ignore_traffic_light,
                                  traces_dir=traces_dir, name=name,
                                  behaviour=behaviour, num_envs=num_envs)
    return wrapper.collect(episodes, timesteps,
                           episode_reward_threshold=threshold)


def imitation_learning(batch_size: int = 64, lr: float = 1e-3, epochs: int = 1,
                       load: bool = False, name: str = "imitation",
                       time_horizon: int = 4, traces_dir: str = "traces",
                       weights_dir: str = "weights", **kwargs) -> list:
    """Train an agent from recorded traces (reference `core/learning.py:215-227`)."""
    from carla_driving_rl_agent_tpu.agents.carla_agent import CARLAgent, CARLAgentConfig
    env = build_env(**define_env(time_horizon=time_horizon))
    cfg = CARLAgentConfig(batch_size=batch_size, policy_lr=lr, value_lr=lr,
                          dynamics_lr=lr, **{k: v for k, v in kwargs.items()
                                             if k in CARLAgentConfig.__dataclass_fields__})
    agent = CARLAgent(env, cfg, name=name, weights_dir=weights_dir)
    if load:
        agent.load()
    losses = agent.imitate(epochs=epochs, batch_size=batch_size,
                           traces_dir=os.path.join(traces_dir, name))
    agent.save()
    return losses


def explore_traces(traces_dir: str, amount: int = 64, seed=None,
                   steering_threshold: float = 0.1) -> dict:
    """Balance recorded transitions by steering direction
    (reference `core/learning.py:230-304`): collect up to `amount` samples
    each of left / center / right steering with positive throttle.
    Returns dict(state=..., action=..., reward=...) with balanced classes."""
    rng = np.random.default_rng(seed)
    amounts = dict(left=amount, right=amount, center=amount)
    buckets = {k: dict(state={}, action=[], reward=[]) for k in amounts}

    for trace in trace_io.load_traces(traces_dir, shuffle=True, seed=seed):
        if all(v <= 0 for v in amounts.values()):
            break
        actions = np.asarray(trace["action"])
        rewards = np.asarray(trace["reward"])
        state = {k: np.asarray(v) for k, v in trace.items()
                 if k.startswith("state_")}
        # keep only positive-throttle samples (filter_throttle, :235-240)
        fwd = actions[:, 0] >= 0.0
        idx_all = np.nonzero(fwd)[0]
        rng.shuffle(idx_all)
        t = steering_threshold
        masks = dict(left=actions[:, 1] <= -t,
                     right=actions[:, 1] >= t,
                     center=(actions[:, 1] > -t) & (actions[:, 1] < t))
        for k, mask in masks.items():
            take = [i for i in idx_all if mask[i]][:max(amounts[k], 0)]
            if not take:
                continue
            amounts[k] -= len(take)
            b = buckets[k]
            for sk, sv in state.items():
                b["state"].setdefault(sk, []).append(sv[take])
            b["action"].append(actions[take])
            b["reward"].append(rewards[take])

    out = dict(state={}, action=[], reward=[])
    for k, b in buckets.items():
        if not b["action"]:
            continue
        for sk, chunks in b["state"].items():
            out["state"].setdefault(sk, []).append(np.concatenate(chunks))
        out["action"].append(np.concatenate(b["action"]))
        out["reward"].append(np.concatenate(b["reward"]))
    out["state"] = {k: np.concatenate(v) for k, v in out["state"].items()}
    out["action"] = np.concatenate(out["action"]) if out["action"] else np.zeros((0, 2))
    out["reward"] = np.concatenate(out["reward"]) if out["reward"] else np.zeros(0)
    return out
