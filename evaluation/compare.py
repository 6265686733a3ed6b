"""Compare this framework's 48-scenario results against the reference's.

Reads our aggregated per-agent files (written by `evaluation/sweep.py` as
`evaluation/<weights>.json`) and the reference's machine-readable results
(`/root/reference/evaluation/evaluation.json`, agents curriculum/standard/
untrained), and prints the six-metric table side by side: global means and
the per-traffic-level breakdown.

Usage:
  python evaluation/compare.py --agents stage-s5 untrained-control
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_EVAL = "/root/reference/evaluation/evaluation.json"

METRICS = ["collision_rate", "similarity", "waypoint_distance", "speed",
           "total_reward", "timesteps"]
ARROW = dict(collision_rate="v", similarity="^", waypoint_distance="v",
             speed="^", total_reward="^", timesteps="^")


def load_ours(weights: str) -> dict:
    """-> {scenario_key: {metric: mean}} from evaluation/<weights>.json,
    falling back to aggregating weights/<weights>/evaluation/ in place."""
    path = os.path.join(REPO, "evaluation", f"{weights}.json")
    if os.path.exists(path):
        data = json.load(open(path))
    else:
        eval_dir = os.path.join(REPO, "weights", weights, "evaluation")
        if not os.path.isdir(eval_dir):
            return {}
        from aggregate import aggregate
        data = aggregate(eval_dir, weights=weights)
    return {k: {m: v[m]["mean"] for m in METRICS}
            for k, v in data.items() if k != "__global__"}


def load_reference(agent: str) -> dict:
    if not os.path.exists(REFERENCE_EVAL):
        return {}
    data = json.load(open(REFERENCE_EVAL))[agent]
    return {k: {m: v[m]["mean"] for m in METRICS} for k, v in data.items()}


def summarize(scenarios: dict, prefix: str = "") -> dict:
    keys = [k for k in scenarios if k.startswith(prefix)] if prefix \
        else list(scenarios)
    if not keys:
        return {}
    return {m: float(np.mean([scenarios[k][m] for k in keys]))
            for m in METRICS}


def fmt_row(name: str, s: dict) -> str:
    if not s:
        return f"{name:<28} (no data)"
    return (f"{name:<28} {s['collision_rate']:>7.3f} {s['similarity']:>7.3f} "
            f"{s['waypoint_distance']:>8.2f} {s['speed']:>7.2f} "
            f"{s['total_reward']:>9.0f} {s['timesteps']:>7.0f}")


def main() -> None:
    p = argparse.ArgumentParser()
    # default to the PUBLISHED headline set (README table): the shipping
    # curriculum-safe agent first, its recipe-consistent no-curriculum
    # control, the parity-objective curriculum, and the untrained control —
    # not just the parity agent (advisor/VERDICT r3 item 7)
    p.add_argument("--agents", nargs="+",
                   default=["safe-s5", "safe-standard", "stage-s5",
                            "untrained-control"])
    args = p.parse_args()

    header = (f"{'agent':<28} {'coll v':>7} {'simil ^':>7} {'wp_d v':>8} "
              f"{'speed ^':>7} {'reward ^':>9} {'steps ^':>7}")

    groups = [("ALL (48 scenarios)", ""), ("no traffic", "no-"),
              ("regular traffic", "regular-"), ("dense traffic", "dense-")]
    ref = {a: load_reference(a) for a in ["curriculum", "standard", "untrained"]}
    ours = {a: load_ours(a) for a in args.agents}

    for title, prefix in groups:
        print(f"\n== {title} ==")
        print(header)
        for a, sc in ours.items():
            print(fmt_row(f"ours/{a} [{len([k for k in sc if k.startswith(prefix)]) if prefix else len(sc)}]",
                          summarize(sc, prefix)))
        for a, sc in ref.items():
            print(fmt_row(f"ref/{a}", summarize(sc, prefix)))


if __name__ == "__main__":
    main()
