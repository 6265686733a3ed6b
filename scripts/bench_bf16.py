"""bf16 train-step A/B: the driver-measurable train bench (bench.py
train_bench geometry: 32 worlds x 512 steps, batch 64, full-size net) run
with compute_dtype float32 vs bfloat16.

compute_dtype (CARLAgentConfig -> CARLANetwork dtype) puts the ShuffleNet /
FeatureNet / heads' matmuls+convs in bf16 on the MXU while params, BN
statistics and the PPO loss math stay float32 (flax promotes norm stats).
The reference is fp32 keras (core/networks.py); bf16 is the TPU-native
choice for the wall-clock target (BASELINE.md <1h curriculum).

Prints one JSON line per variant plus a summary with the speedup and the
max |Δ| of the first-update scalar metrics vs f32 (sanity: same data, same
seed — bf16 noise must stay O(1e-2) on normalized losses, not NaN).

Usage: python scripts/bench_bf16.py [--tiny]
  --tiny: CPU smoke (4 envs, 16 steps, virtual mesh) — numerics only.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(dtype: str, tiny: bool) -> dict:
    from carla_driving_rl_agent_tpu.agents.carla_agent import (
        CARLAgent, CARLAgentConfig)
    from carla_driving_rl_agent_tpu.envs.carla_env import CARLAEnv, CARLAEnvConfig
    from carla_driving_rl_agent_tpu.envs.world import WorldParams

    num_envs, steps = (4, 16) if tiny else (32, 512)
    env = CARLAEnv(CARLAEnvConfig(
        world=WorldParams(town_names=("Town03",), num_routes=64,
                          max_route_len=512, max_timesteps=512,
                          num_vehicles=0, num_pedestrians=0, v_max=1, p_max=1),
        image_height=90, image_width=120, render_mode="pallas",
        time_horizon=4, past_obs_freq=4))
    agent = CARLAgent(env, CARLAgentConfig(
        num_envs=num_envs, rollout_steps=steps,
        batch_size=8 if tiny else 64, seed=0, compute_dtype=dtype),
        log_mode=None)

    env_states, hist = agent.learn(num_updates=1)      # compile + warmup
    first = {k: float(v) for k, v in hist[-1].items()
             if k in ("loss_policy", "loss_value", "entropy", "reward_mean")}
    timed_updates = 1 if tiny else 2
    t0 = time.perf_counter()
    env_states, _ = agent.learn(num_updates=timed_updates,
                                env_states=env_states)
    dt = time.perf_counter() - t0
    sps = timed_updates * num_envs * steps / dt
    out = dict(variant=dtype, train_env_steps_per_sec=round(sps, 1),
               first_update=first)
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    if args.tiny:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 1)

    f32 = run_variant("float32", args.tiny)
    bf16 = run_variant("bfloat16", args.tiny)
    diffs = {k: abs(f32["first_update"][k] - bf16["first_update"][k])
             for k in f32["first_update"]}
    bad = any(v != v for v in bf16["first_update"].values())  # NaN check
    print(json.dumps(dict(
        summary=dict(speedup=round(bf16["train_env_steps_per_sec"]
                                   / max(f32["train_env_steps_per_sec"], 1e-9), 3),
                     metric_max_abs_diff=round(max(diffs.values()), 5),
                     bf16_nan=bad))), flush=True)


if __name__ == "__main__":
    main()
