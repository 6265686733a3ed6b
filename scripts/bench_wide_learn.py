"""Learning-parity A/B for the WIDE rollout geometry (round-3 train lever).

The 32-world rollout is op-count-bound on TPU (CLAUDE.md: ~11 ms/step at 32
worlds vs ~2.3 ms/step at 1024 — per-op fixed cost dominates, so the same
rollout program runs many more worlds nearly free).  Widening worlds and
shortening the per-update segment keeps the SGD sample budget identical
(same samples/update, same batch size, same minibatch count); the only
semantic change is the GAE segment length — truncation bootstraps from
V(s_t) (agents/rollout.py), so short segments stay unbiased up to value
error.  This script answers: does the wide geometry LEARN like the narrow
one on the real stage-s1 task (sharp recipe), and how much faster is it?

Arms (same seed, same env distribution, same 4096 samples/update):
  narrow  32 worlds x 128 steps   (the shipped stage geometry)
  wide   256 worlds x  16 steps
Each runs --updates updates of the real stage-s1 sharp config and reports
reward_mean / entropy / kl trajectories + env-steps/s.

Usage: python scripts/bench_wide_learn.py [--updates 60] [--tiny]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mark(msg):
    print(f"[wide {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def run_arm(name, num_envs, rollout_steps, updates, tiny):
    from carla_driving_rl_agent_tpu.agents.carla_agent import (
        CARLAgent, CARLAgentConfig)
    from carla_driving_rl_agent_tpu.curriculum.stages import (
        build_env, sample_origins)
    from carla_driving_rl_agent_tpu.utils.schedules import ExponentialDecay

    town = "Town03"
    env = build_env(town=town,
                    origins=sample_origins(town, amount=10, seed=42),
                    throttle_as_desired_speed=True, disable_reverse=True,
                    max_timesteps=128 if tiny else 512, seed=42)
    # stage-s1 sharp hypers (main.py sharp_recipe), wide/narrow only differ
    # in rollout geometry
    agent = CARLAgent(env, CARLAgentConfig(
        num_envs=num_envs, rollout_steps=rollout_steps, batch_size=64,
        seed=42, fused_update=True, compute_dtype="bfloat16",
        gamma=0.999, lambda_=0.95,
        entropy_regularization=ExponentialDecay(
            initial_value=0.02, decay_steps=30, decay_rate=0.5,
            min_value=1e-4),
        network={"control_policy": {"preact_floor": -3.0}}),
        log_mode=None)

    # Warm up the EXACT chunk sizes the timed call will dispatch: learn()
    # compiles one jitted program per distinct chunk size
    # (updates_per_dispatch=8 default + one tail chunk), so a 2-update
    # warmup would leave the timed region paying the 15-25 min size-8/size-4
    # compiles (advisor round-3 finding).  Round `updates` down to a chunk
    # multiple and warm up with one full chunk.
    chunk = max(1, int(agent.config.updates_per_dispatch))
    updates = max(chunk, (updates // chunk) * chunk)
    _mark(f"{name}: compiling ({num_envs}w x {rollout_steps}s, "
          f"warmup chunk={chunk})")
    env_states, hist0 = agent.learn(num_updates=chunk)
    t0 = time.perf_counter()
    env_states, hist = agent.learn(num_updates=updates,
                                   env_states=env_states)
    dt = time.perf_counter() - t0
    sps = updates * num_envs * rollout_steps / dt
    # prepend the warmup history so reward_first5 reports the actual first
    # updates of training, not updates chunk+1..chunk+5
    traj = [{k: round(float(h[k]), 4)
             for k in ("reward_mean", "entropy", "kl", "loss_policy",
                       "loss_value") if k in h}
            for h in hist0 + hist]
    tail = traj[-5:]
    out = dict(arm=name, num_envs=num_envs, rollout_steps=rollout_steps,
               updates=updates, train_env_steps_per_sec=round(sps, 1),
               reward_first5=[t["reward_mean"] for t in traj[:5]],
               reward_last5=[t["reward_mean"] for t in tail],
               entropy_last=tail[-1].get("entropy"),
               kl_last=tail[-1].get("kl"),
               every5=traj[::5])
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=60)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--arms", default="narrow,wide")
    args = ap.parse_args()
    if args.tiny:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    arms = dict(narrow=(8, 16) if args.tiny else (32, 128),
                wide=(32, 4) if args.tiny else (256, 16))
    results = {}
    for arm in args.arms.split(","):
        n, r = arms[arm]
        results[arm] = run_arm(arm, n, r, 2 if args.tiny else args.updates,
                               args.tiny)
    if len(results) == 2:
        nr, wr = results["narrow"], results["wide"]
        print(json.dumps(dict(
            speedup=round(wr["train_env_steps_per_sec"]
                          / nr["train_env_steps_per_sec"], 3),
            narrow_reward_last5=nr["reward_last5"],
            wide_reward_last5=wr["reward_last5"])), flush=True)


if __name__ == "__main__":
    main()
