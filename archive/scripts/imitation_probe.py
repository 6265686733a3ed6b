"""Imitation warm-start probe (the VERDICT's third collision-gap lever) —
device-resident version.

The diagnosed failure of every RL agent so far is residual Beta steering
noise walking the car off the road; the privileged expert (envs/expert.py)
drives Town03 with ~0 collisions solo and <0.2 in dense traffic.  This
probe measures how far imitation gets on the Town03 gate before any RL
fine-tuning.

Round-2 rework: the first attempt used the reference-parity pipeline
(collect npz traces -> imitate from files, `core/learning.py:196-227`) at
full scale on the remote TPU — and stalled in `jax.device_get`: each
collect config pulls the full stacked image tensor (~3 GB at T=4) through
the tunnel and zlib-compresses it on the single host vCPU.  The fused path
(`CARLAgentConfig.expert_rollout=True`) keeps everything on device: expert
actions drive the rollout (behaviours mixed across worlds), the current
nets supply log-probs/values, and the standard fused PPO update consumes
the trajectory.  No host transfer, no trace files.  The file-based parity
pipeline remains in `curriculum/imitation.py` (used by tests and small
CPU-scale collections).

  1. imitation-train a sharp-recipe agent from scratch with expert rollouts
     (Town03, regular traffic 50v+50p, the 7 light training weathers),
  2. gate-evaluate (Town03, train weathers, no + dense, 50 trials).

Usage: python scripts/imitation_probe.py [--tiny] [--updates N] [--skip-train]
  --tiny: CPU smoke sizes (4 envs, 8 steps, 2 updates, 4 trials).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAME = "imitation-probe"


def fused_train(tiny: bool, updates: int, name: str = NAME,
                mix: tuple = ("cautious", "normal", "aggressive")):
    from main import sharp_recipe, acquire_run_lock
    from carla_driving_rl_agent_tpu.agents.carla_agent import (
        CARLAgent, CARLAgentConfig)
    from carla_driving_rl_agent_tpu.curriculum.stages import (
        TRAIN_WEATHERS, build_env, define_env)

    os.makedirs(os.path.join("weights", name), exist_ok=True)
    acquire_run_lock(os.path.join("weights", name))

    env = build_env(**define_env(
        town="Town03",
        spawn=None if tiny else dict(vehicles=50, pedestrians=50),
        random_weathers=list(TRAIN_WEATHERS),
        max_timesteps=24 if tiny else 512))
    cfg = CARLAgentConfig(
        num_envs=4 if tiny else 32,
        rollout_steps=8 if tiny else 128,
        batch_size=8 if tiny else 64,
        policy_lr=3e-4, value_lr=3e-4, dynamics_lr=3e-4,
        expert_rollout=True, expert_behaviour_mix=tuple(mix),
        ratio_clamp=20.0,   # see CARLAgentConfig.ratio_clamp / _policy_loss
        seed=0, **sharp_recipe())
    agent = CARLAgent(env, cfg, name=name)
    _, history = agent.learn(num_updates=updates)
    agent.save()
    tail = {k: round(float(v), 4)
            for k, v in history[-1].items()
            if k in ("reward_mean", "loss_policy", "loss_value", "entropy",
                     "collision_rate", "similarity_mean")}
    print(f"[imitate-fused] {updates} updates "
          f"({updates * cfg.num_envs * cfg.rollout_steps} expert "
          f"transitions), last-update metrics: {tail}", flush=True)


def gate(tiny: bool, name: str = NAME):
    from carla_driving_rl_agent_tpu.curriculum import stages as learning

    trials = 4 if tiny else 50
    steps = 24 if tiny else 512
    out = {}
    for traffic in ("no",) if tiny else ("no", "dense"):
        learning.evaluate(mode="train", town="Town03", seeds=[42],
                          traffic=traffic, steps=steps, trials=trials,
                          weights=name, num_envs=max(8, trials))
        f = (f"weights/{name}/evaluation/{name}-train-{steps}-{trials}-"
             f"Town03-{traffic}-42.json")
        d = json.load(open(f))
        out[traffic] = {k: round(d[k], 3) for k in
                        ("collision_rate_mean", "total_reward_mean",
                         "speed_mean", "similarity_mean", "timesteps_mean")
                        if k in d}
        print(f"[gate {traffic}] {out[traffic]}", flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--updates", type=int, default=40)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--name", default=NAME)
    ap.add_argument("--mix", default="cautious,normal,aggressive",
                    help="comma list of expert behaviours cycled across "
                         "worlds (v2 probe: lean aggressive for a faster "
                         "imitation target)")
    args = ap.parse_args()
    if args.tiny:
        # CPU smoke must not attach the (possibly busy) remote TPU; env vars
        # don't work here — jax is pre-imported by the platform plugin
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    if not args.skip_train:
        fused_train(args.tiny, 2 if args.tiny else args.updates,
                    name=args.name,
                    mix=tuple(args.mix.split(",")))
    print(json.dumps({"gate": gate(args.tiny, name=args.name)}), flush=True)
