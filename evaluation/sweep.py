"""48-scenario evaluation sweep driver (reference `main.py:94-101`).

Runs the full 8-town x 3-traffic x {train,test}-weather protocol for one
weights directory.  Each (mode, traffic) group runs in a FRESH subprocess:
one group = one multi-town env bank + one compiled eval program (the towns
are swept via the traced `select_town`, so the 8 towns inside a group cost
one compile).  Subprocess isolation exists because the remote TPU worker
has crashed on dense multi-town programs before (see CLAUDE.md) — a crash
loses one group, not the sweep; the driver cools down and retries, and
already-written scenario JSONs are skipped, so the sweep is restartable.

Usage:
  python evaluation/sweep.py --weights stage-s5            # 48 scenarios
  python evaluation/sweep.py --weights untrained-control   # random-net control
  python evaluation/sweep.py --aggregate                   # rebuild evaluation.json
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TOWNS = ["Town01", "Town02", "Town03", "Town04", "Town05", "Town06",
         "Town07", "Town10"]
MODES = ["train", "test"]
TRAFFICS = ["no", "regular", "dense"]

CHILD = """\
import sys
from carla_driving_rl_agent_tpu.curriculum import stages as learning
weights, mode, traffic, steps, trials = (
    sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5]))
for town in sys.argv[6].split(","):
    print(f"=== {weights} {mode}/{town}/{traffic} ===", flush=True)
    learning.evaluate(mode=mode, town=town, seeds=[42], traffic=traffic,
                      steps=steps, trials=trials, weights=weights)
"""


def scenario_path(weights: str, mode: str, town: str, traffic: str,
                  steps: int, trials: int, seed: int = 42) -> str:
    return os.path.join(
        REPO, "weights", weights, "evaluation",
        f"{weights}-{mode}-{steps}-{trials}-{town}-{traffic}-{seed}.json")


def run_group(weights: str, mode: str, traffic: str, steps: int, trials: int,
              cooldown: float = 300.0, retries: int = 1) -> bool:
    towns = [t for t in TOWNS
             if not os.path.exists(scenario_path(weights, mode, t, traffic,
                                                 steps, trials))]
    if not towns:
        print(f"[sweep] {mode}/{traffic}: all towns done, skipping")
        return True
    for attempt in range(retries + 1):
        print(f"[sweep] {mode}/{traffic}: towns {towns} (attempt {attempt + 1})")
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", CHILD, weights, mode, traffic,
             str(steps), str(trials), ",".join(towns)],
            cwd=REPO)
        print(f"[sweep] {mode}/{traffic}: exit {proc.returncode} "
              f"in {time.time() - t0:.0f}s")
        towns = [t for t in towns
                 if not os.path.exists(scenario_path(weights, mode, t, traffic,
                                                     steps, trials))]
        if not towns:
            return True
        if attempt < retries:
            print(f"[sweep] {mode}/{traffic}: {towns} missing; cooling down "
                  f"{cooldown:.0f}s before retry (TPU worker recovery)")
            time.sleep(cooldown)
    return False


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="stage-s5")
    p.add_argument("--steps", type=int, default=512)
    p.add_argument("--trials", type=int, default=50)
    p.add_argument("--aggregate", action="store_true",
                   help="only rebuild evaluation.json from existing files")
    args = p.parse_args()

    if not args.aggregate:
        failed = []
        for mode in MODES:
            for traffic in TRAFFICS:
                ok = run_group(args.weights, mode, traffic, args.steps,
                               args.trials)
                if not ok:
                    failed.append((mode, traffic))
        if failed:
            print(f"[sweep] INCOMPLETE groups: {failed}")

    from aggregate import aggregate
    eval_dir = os.path.join(REPO, "weights", args.weights, "evaluation")
    out = aggregate(eval_dir, weights=args.weights)
    import json
    out_path = os.path.join(REPO, "evaluation", f"{args.weights}.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[sweep] wrote {out_path} ({len(out) - 1} scenarios)")


if __name__ == "__main__":
    main()
