"""Compare training curves (utils/summary.py events.jsonl) across runs.

Round-6 diagnosis tool (CLAUDE.md round-5 notes): every round-5 chain's
endpoint drives 15-19 km/h and resists the 14-epoch slowing fine-tune,
while the round-3 sequential chain's safe-s5 drives ~7.4 — find where the
curves diverge.  Also the early dead-policy detector: the round-4 fused
chains showed ratio~1.0 / kl~0 from update 0 (policy-head starvation); a
chain showing that signature in stage s1 can be killed hours early.

Usage:
    python scripts/curve_diff.py runA.jsonl runB.jsonl [...]
    python scripts/curve_diff.py --health run.jsonl     # signature check
"""

import argparse
import json
import sys

import numpy as np

METRICS = ("ratio", "kl", "entropy", "speed_mean", "reward_mean",
           "collision_rate", "similarity_mean", "value_mean", "loss_value")


def load(path):
    rows = [json.loads(line) for line in open(path)]
    return {k: np.asarray([r.get(k, np.nan) for r in rows])
            for k in METRICS + ("step",)}


def window_stats(c, lo, hi):
    sel = slice(lo, hi if hi > 0 else None)
    return {k: float(np.nanmean(c[k][sel])) for k in METRICS}


def health(path):
    """Dead-policy signature over the FIRST updates.  Calibrated on the
    recorded chains: the healthy r3 sequential s1 shows mean |ratio-1| =
    0.31 over updates 0-10; the r4 fused (policy-starved) s1 shows 0.0105
    (its kl is NOT near zero — 0.08 — the ratio excursion is the
    discriminator).  Threshold 0.05 sits 3x above dead, 6x below healthy."""
    c = load(path)
    n = len(c["step"])
    hi = min(10, n)
    r_dev = float(np.nanmean(np.abs(c["ratio"][:hi] - 1.0)))
    kl = float(np.nanmean(c["kl"][:hi]))
    verdict = ("DEAD (early ratio pinned at 1 - policy head starved, "
               "kill the chain)") if (n >= 5 and r_dev < 0.05) else "alive"
    print(json.dumps(dict(path=path, updates=n,
                          mean_abs_ratio_dev=round(r_dev, 5),
                          mean_kl=round(kl, 5), verdict=verdict)))
    return verdict == "alive"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--health", action="store_true",
                    help="dead-policy signature check on each run")
    ap.add_argument("--windows", default="0:10,10:50,50:0",
                    help="update windows to average, lo:hi (hi=0 -> end)")
    args = ap.parse_args()

    if args.health:
        ok = all([health(p) for p in args.runs])
        sys.exit(0 if ok else 1)

    wins = [tuple(int(x) for x in w.split(":")) for w in args.windows.split(",")]
    curves = {p: load(p) for p in args.runs}
    for lo, hi in wins:
        print(f"\n=== updates [{lo}:{hi if hi else 'end'}] ===")
        hdr = "metric".ljust(16) + "".join(
            p.split("/")[-2][:20].rjust(22) for p in args.runs)
        print(hdr)
        for m in METRICS:
            row = m.ljust(16)
            for p in args.runs:
                row += f"{window_stats(curves[p], lo, hi)[m]:22.4f}"
            print(row)


if __name__ == "__main__":
    main()
