"""Imitation -> RL fine-tune with per-epoch snapshot gating.

Successor of scripts/imitation_chain.py for the round-2 collision-gap
endgame.  The first fine-tune (imitation-rl: 16 epochs of sharp PPO in
DENSE traffic on top of imitation-probe) collapsed into the slow-safe
basin (Town03/no gate: 0.06 collision but 0.9 km/h, reward 256 — under
dense-traffic hazard pressure, crawling is genuinely near-optimal).  The
useful agent lives BETWEEN the imitation init (fast, mid collision) and
that attractor, so this script:

  1. copies weights/<src> -> weights/<name> and fine-tunes with the sharp
     recipe in --traffic (default regular, the probe's own training
     traffic — dense is what manufactured the crawl) with PER-EPOCH
     snapshots (weights/<name>-<epoch>),
  2. gate-evaluates EVERY snapshot on Town03/no (50 trials) — the
     collapse trajectory becomes visible instead of only its endpoint,
  3. picks the best snapshot: among collision_rate <= --coll-gate (0.64,
     the reference curriculum mean) the one with max total_reward, else
     the one with min collision_rate; copies it to weights/<final-name>
     and gate-evaluates that on Town03/dense as well.

Usage:
  python scripts/imitation_finetune.py [--src imitation-probe-v2]
      [--name imitation-ft] [--final-name imitation-final]
      [--epochs 10] [--traffic regular] [--coll-gate 0.64] [--tiny]
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train(args):
    from main import sharp_recipe, EPISODES, TIMESTEPS, BATCH, acquire_run_lock
    from carla_driving_rl_agent_tpu.curriculum import stages as learning

    src = os.path.join("weights", args.src)
    dst = os.path.join("weights", args.name)
    if not os.path.isdir(src):
        sys.exit(f"ERROR: {src} missing — train the imitation probe first")
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
    acquire_run_lock(dst)

    tiny = args.tiny
    stage = learning.stage_s5(
        episodes=2 if tiny else EPISODES,
        timesteps=24 if tiny else TIMESTEPS,
        batch_size=8 if tiny else BATCH,
        num_envs=4 if tiny else 32,
        town="Town03", traffic="no" if tiny else args.traffic,
        stage_name=args.name, save_every="end", **sharp_recipe())
    stage.run2(epochs=1 if tiny else args.epochs, copy_weights=True)


def gate_one(name, traffic, trials, steps):
    from carla_driving_rl_agent_tpu.curriculum import stages as learning
    learning.evaluate(mode="train", town="Town03", seeds=[42],
                      traffic=traffic, steps=steps, trials=trials,
                      weights=name, num_envs=max(8, trials))
    f = (f"weights/{name}/evaluation/{name}-train-{steps}-{trials}-"
         f"Town03-{traffic}-42.json")
    d = json.load(open(f))
    out = {k: round(d[k], 3) for k in
           ("collision_rate_mean", "total_reward_mean", "speed_mean",
            "similarity_mean", "timesteps_mean") if k in d}
    print(f"[gate {name} {traffic}] {out}", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="imitation-probe-v2")
    ap.add_argument("--name", default="imitation-ft")
    ap.add_argument("--final-name", default="imitation-final")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--traffic", default="regular")
    ap.add_argument("--coll-gate", type=float, default=0.64)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    if args.tiny:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    if not args.skip_train:
        train(args)

    trials = 4 if args.tiny else 50
    steps = 24 if args.tiny else 512
    epochs = 1 if args.tiny else args.epochs

    # gate every snapshot (one compiled eval program, reused across loads)
    gates = {}
    candidates = [f"{args.name}-{e}" for e in range(epochs)]
    for cand in candidates:
        if not os.path.isdir(os.path.join("weights", cand)):
            print(f"[gate] {cand} missing, skipped", flush=True)
            continue
        gates[cand] = gate_one(cand, "no", trials, steps)

    if not gates:
        sys.exit("ERROR: no snapshots to gate")

    ok = {c: g for c, g in gates.items()
          if g["collision_rate_mean"] <= args.coll_gate}
    if ok:
        pick = max(ok, key=lambda c: ok[c]["total_reward_mean"])
    else:
        pick = min(gates, key=lambda c: gates[c]["collision_rate_mean"])
    print(f"[pick] {pick} (of {len(gates)} snapshots, "
          f"{len(ok)} under the {args.coll_gate} collision gate)", flush=True)

    final = os.path.join("weights", args.final_name)
    if os.path.isdir(final):
        shutil.rmtree(final)
    shutil.copytree(os.path.join("weights", pick), final)
    # keep the picked no-traffic gate JSON under the final name too
    dense = gate_one(args.final_name, "dense", trials, steps)
    no = gate_one(args.final_name, "no", trials, steps)
    print(json.dumps({"pick": pick, "final": args.final_name,
                      "gate": {"no": no, "dense": dense},
                      "snapshots": gates}), flush=True)


if __name__ == "__main__":
    main()
