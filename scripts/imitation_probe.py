"""Imitation warm-start probe (the VERDICT's third collision-gap lever).

The diagnosed failure of every RL agent so far is residual Beta steering
noise walking the car off the road; the privileged expert (envs/expert.py)
drives Town03 with ~0 collisions solo and <0.2 in dense traffic.  This
probe measures how far pure imitation (reference-parity PPO-on-traces,
`core/learning.py:196-227` / `rl/agents/ppo.py:415-462`) gets on the
Town03 gate before any RL fine-tuning:

  1. collect expert traces (3 behaviours x {no, regular} traffic, Town03,
     the 7 light training weathers),
  2. imitation-train a sharp-recipe agent (decaying entropy + Beta head
     guard + gamma/lambda fix) from scratch on the traces,
  3. gate-evaluate (Town03, train weathers, no + dense, 50 trials).

Usage: python scripts/imitation_probe.py [--tiny] [--skip-collect]
  --tiny: CPU smoke sizes (4 envs, 24 steps, 1 behaviour, 4 trials).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAME = "imitation-probe"


def collect(tiny: bool):
    from carla_driving_rl_agent_tpu.curriculum.imitation import collect_experience
    from carla_driving_rl_agent_tpu.curriculum.stages import TRAIN_WEATHERS

    behaviours = ("normal",) if tiny else ("cautious", "normal", "aggressive")
    presets = ({"no": None} if tiny
               else {"no": None,
                     "regular": dict(vehicles=50, pedestrians=50)})
    episodes = 4 if tiny else 16
    timesteps = 24 if tiny else 512
    total = 0
    for behaviour in behaviours:
        for preset, spawn in presets.items():
            n = collect_experience(
                episodes=episodes, timesteps=timesteps, threshold=0.0,
                traces_dir="traces", name=NAME, behaviour=behaviour,
                num_envs=4 if tiny else 16,
                town="Town03", random_weathers=list(TRAIN_WEATHERS),
                spawn=spawn, max_timesteps=timesteps)
            print(f"[collect] {behaviour}/{preset}: {n} traces", flush=True)
            total += n
    return total


def imitate(tiny: bool):
    from main import sharp_recipe
    from carla_driving_rl_agent_tpu.curriculum.imitation import imitation_learning

    losses = imitation_learning(
        batch_size=8 if tiny else 64, lr=3e-4,
        epochs=1 if tiny else 3, load=False, name=NAME,
        time_horizon=4, traces_dir="traces", **sharp_recipe())
    tail = [(round(float(p), 4), round(float(v), 4)) for p, v in losses[-5:]]
    print(f"[imitate] {len(losses)} minibatch updates, last-5 (policy, value) "
          f"losses: {tail}", flush=True)


def gate(tiny: bool):
    from carla_driving_rl_agent_tpu.curriculum import stages as learning

    trials = 4 if tiny else 50
    steps = 24 if tiny else 512
    out = {}
    for traffic in ("no",) if tiny else ("no", "dense"):
        learning.evaluate(mode="train", town="Town03", seeds=[42],
                          traffic=traffic, steps=steps, trials=trials,
                          weights=NAME, num_envs=max(8, trials))
        f = (f"weights/{NAME}/evaluation/{NAME}-train-{steps}-{trials}-"
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
    ap.add_argument("--skip-collect", action="store_true")
    args = ap.parse_args()
    if args.tiny:
        # CPU smoke must not attach the (possibly busy) remote TPU; env vars
        # don't work here — jax is pre-imported by the platform plugin
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    if not args.skip_collect:
        collect(args.tiny)
    imitate(args.tiny)
    print(json.dumps({"gate": gate(args.tiny)}), flush=True)
