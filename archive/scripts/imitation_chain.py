"""Imitation -> RL fine-tune chain (runs only if the imitation probe gates).

Continuation of scripts/imitation_probe.py: take the imitation-warm-started
checkpoint (weights/imitation-probe, trained by PPO-on-traces from the
privileged expert — reference `core/learning.py:196-227`), fine-tune it with
sharp-recipe PPO in the stage-s5 setting (Town03, dense traffic — the same
setting the standard-sharp control trains in), and gate on Town03 no+dense.

The probe measures what pure imitation buys; this measures whether RL on top
keeps the expert's low collision rate while recovering reward.  Usage:

  python scripts/imitation_chain.py [--epochs 16] [--tiny] [--skip-train]
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "imitation-probe"
NAME = "imitation-rl"


def train(epochs: int, tiny: bool):
    from main import sharp_recipe, EPISODES, TIMESTEPS, BATCH, acquire_run_lock
    from carla_driving_rl_agent_tpu.curriculum import stages as learning

    src, dst = os.path.join("weights", SRC), os.path.join("weights", NAME)
    if not os.path.isdir(src):
        sys.exit(f"ERROR: {src} missing — run scripts/imitation_probe.py first")
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
    acquire_run_lock(dst)

    stage = learning.stage_s5(
        episodes=2 if tiny else EPISODES,
        timesteps=24 if tiny else TIMESTEPS,
        batch_size=8 if tiny else BATCH,
        num_envs=4 if tiny else 32,
        town="Town03", traffic="no" if tiny else "dense",
        stage_name=NAME, save_every="end", **sharp_recipe())
    stage.run2(epochs=1 if tiny else epochs, copy_weights=False)


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
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()
    if args.tiny:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    if not args.skip_train:
        train(args.epochs, args.tiny)
    print(json.dumps({"gate": gate(args.tiny)}), flush=True)
