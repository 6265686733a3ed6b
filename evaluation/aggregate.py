"""Aggregate per-scenario evaluation JSONs into evaluation.json.

Script equivalent of the reference's `evaluation/Evaluation.ipynb`: reads
the scenario files written by `CARLAgent.evaluate`
(named `{weights}-{mode}-{steps}-{trials}-{town}-{traffic}-{seed}.json`),
groups them `{traffic}-{town}-{mode}` like the reference's evaluation.json
keys, and emits per-scenario + global mean/std/median for the six metrics,
with the same outlier clipping (total_reward at -1000).

Usage:
  python evaluation/aggregate.py weights/stage-s5/evaluation -o evaluation/evaluation.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
from collections import defaultdict

import numpy as np

METRICS = ["collision_rate", "similarity", "waypoint_distance", "speed",
           "total_reward", "timesteps"]

NAME_RE = re.compile(
    r"(?P<weights>.+)-(?P<mode>train|test)-(?P<steps>\d+)-(?P<trials>\d+)"
    r"-(?P<town>Town\d+\w*)-(?P<traffic>no|regular|dense)-(?P<seed>\d+)\.json")


def aggregate(eval_dir: str, weights: str = None) -> dict:
    """Aggregate scenario JSONs under eval_dir.  Pass `weights` (the owning
    stage name) to filter out files copied in by the curriculum weight
    hand-off, which clones whole stage dirs including old evaluation JSONs
    (see main.py hand_off); None aggregates everything."""
    scenarios = defaultdict(lambda: defaultdict(list))
    for fname in sorted(os.listdir(eval_dir)):
        m = NAME_RE.match(fname)
        if not m:
            continue
        if weights and m["weights"] != weights:
            continue
        with open(os.path.join(eval_dir, fname)) as f:
            record = json.load(f)
        key = f"{m['traffic']}-{m['town']}-{m['mode']}"
        for metric in METRICS:
            vals = np.asarray(record.get(metric, []), np.float64)
            if metric == "total_reward":
                vals = np.maximum(vals, -1000.0)
            scenarios[key][metric].extend(vals.tolist())

    out = {}
    global_acc = defaultdict(list)
    for key, metrics in sorted(scenarios.items()):
        entry = {}
        for metric, vals in metrics.items():
            v = np.asarray(vals)
            entry[metric] = dict(mean=float(v.mean()), std=float(v.std()),
                                 median=float(np.median(v)))
            global_acc[metric].append(float(v.mean()))
        out[key] = entry
    out["__global__"] = {
        m: dict(mean=float(np.mean(v)), std=float(np.std(v)))
        for m, v in global_acc.items()
    }
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("eval_dir")
    p.add_argument("-o", "--output", default="evaluation/evaluation.json")
    p.add_argument("--weights", default=None,
                   help="only aggregate files for this stage name; default: "
                        "derived from the eval dir's parent (weights/<name>/"
                        "evaluation layout)")
    p.add_argument("--no-filter", action="store_true",
                   help="aggregate every scenario JSON in the directory")
    args = p.parse_args()
    weights = None if args.no_filter else (
        args.weights
        or os.path.basename(os.path.dirname(os.path.normpath(args.eval_dir))))
    result = aggregate(args.eval_dir, weights=weights)
    if len(result) <= 1:
        print(f"WARNING: filter weights={weights!r} matched zero scenario "
              f"files in {args.eval_dir}; pass --weights/--no-filter "
              f"if the directory is not laid out as weights/<name>/evaluation")
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {args.output} ({len(result) - 1} scenarios)")
