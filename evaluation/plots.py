"""Render the six-metric comparison charts from evaluation.json.

The reference ships `evaluation/Evaluation.ipynb`, whose cells aggregate the
per-scenario JSONs into per-town and global tables and plot them; this is the
script counterpart working from the already-aggregated
`evaluation/evaluation.json` (ours) and the reference's file of the same
shape.  Outputs PNGs under `evaluation/plots/`:

  metrics.png      — 2x3 grid, one panel per metric; grouped bars per agent
                     (curriculum / standard / untrained), ours vs reference
  collisions.png   — collision rate per town for the curriculum agent,
                     ours vs reference (the headline safety metric)

Usage: python evaluation/plots.py [--ours PATH] [--ref PATH] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

# Validated 2-series categorical palette (adjacent-pair CVD dE >= 8):
# slot 1 (blue) = this framework, slot 2 (orange) = reference.
C_OURS = "#2a78d6"
C_REF = "#eb6834"
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e5e4e0"

METRICS = ("collision_rate", "total_reward", "similarity",
           "speed", "waypoint_distance", "timesteps")
AGENTS = ("curriculum", "standard", "untrained")


def global_means(data: dict, agent: str) -> dict:
    """Mean over all scenario means for one agent (matches the README's
    '48-scenario means')."""
    if agent not in data:
        return {}
    rows = data[agent].values()
    return {m: float(np.mean([r[m]["mean"] for r in rows if m in r]))
            for m in METRICS}


def town_means(data: dict, agent: str, metric: str) -> dict:
    """Mean per town over that town's scenarios for one agent."""
    out: dict = {}
    if agent not in data:
        return out
    for key, row in data[agent].items():
        town = key.split("-")[1]
        out.setdefault(town, []).append(row[metric]["mean"])
    return {t: float(np.mean(v)) for t, v in sorted(out.items())}


def _style(ax):
    ax.set_facecolor(SURFACE)
    ax.grid(axis="y", color=GRID, linewidth=0.8, zorder=0)
    for side in ("top", "right", "left"):
        ax.spines[side].set_visible(False)
    ax.spines["bottom"].set_color(GRID)
    ax.tick_params(colors=INK2, labelsize=9, length=0)


def _bars(ax, labels, ours, ref, fmt="{:.2f}"):
    x = np.arange(len(labels))
    w = 0.36
    for off, vals, color, name in ((-w / 2, ours, C_OURS, "this framework"),
                                   (w / 2, ref, C_REF, "reference")):
        v = [np.nan if vals.get(k) is None else vals[k] for k in labels]
        bars = ax.bar(x + off, v, width=w - 0.04, color=color, zorder=3,
                      label=name)
        for b, val in zip(bars, v):
            if np.isfinite(val):
                ax.annotate(fmt.format(val), (b.get_x() + b.get_width() / 2,
                                              b.get_height()),
                            ha="center", va="bottom", fontsize=7.5,
                            color=INK2)
    ax.set_xticks(x, labels)
    _style(ax)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", default=os.path.join(repo, "evaluation",
                                                   "evaluation.json"))
    ap.add_argument("--ref", default="/root/reference/evaluation/evaluation.json")
    ap.add_argument("--out", default=os.path.join(repo, "evaluation", "plots"))
    args = ap.parse_args()

    ours = json.load(open(args.ours))
    ref = json.load(open(args.ref)) if os.path.exists(args.ref) else {}
    os.makedirs(args.out, exist_ok=True)

    # --- metrics.png: 2x3 grid of per-agent global means -------------------
    fig, axes = plt.subplots(2, 3, figsize=(11, 6.2), facecolor=SURFACE)
    for ax, metric in zip(axes.flat, METRICS):
        o = {a: global_means(ours, a).get(metric) for a in AGENTS}
        r = {a: global_means(ref, a).get(metric) for a in AGENTS}
        fmt = "{:.0f}" if metric in ("total_reward", "timesteps") else "{:.2f}"
        _bars(ax, AGENTS, o, r, fmt=fmt)
        ax.set_title(metric.replace("_", " "), fontsize=10.5, color=INK,
                     pad=8)
    handles, names = axes.flat[0].get_legend_handles_labels()
    fig.legend(handles, names, loc="upper right", frameon=False,
               fontsize=9, labelcolor=INK2, bbox_to_anchor=(0.995, 1.0))
    fig.suptitle("48-scenario global means per agent — this framework vs "
                 "reference", fontsize=12, color=INK, x=0.02, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.95))
    path = os.path.join(args.out, "metrics.png")
    fig.savefig(path, dpi=150)
    print(f"[plots] wrote {path}")

    # --- collisions.png: curriculum collision rate per town ----------------
    o = town_means(ours, "curriculum", "collision_rate")
    r = town_means(ref, "curriculum", "collision_rate")
    towns = sorted(set(o) | set(r))
    if towns:
        fig2, ax = plt.subplots(figsize=(9, 3.6), facecolor=SURFACE)
        _bars(ax, towns, o, r)
        ax.set_ylim(0, 1.12)
        ax.set_title("curriculum agent collision rate by town (lower is "
                     "better)", fontsize=11, color=INK, loc="left", pad=10)
        ax.legend(frameon=False, fontsize=9, labelcolor=INK2,
                  loc="lower right")
        fig2.tight_layout()
        path = os.path.join(args.out, "collisions.png")
        fig2.savefig(path, dpi=150)
        print(f"[plots] wrote {path}")


if __name__ == "__main__":
    main()
