"""Collision diagnostics: WHERE and WHY do evaluation episodes end?

Runs a batch of evaluation worlds with a trained agent on one
(town, traffic, weather-mode) scenario, records the per-step state, and
breaks down every episode ending: cause (vehicle / pedestrian / off-road /
arrival / timeout), speed at exit, junction proximity at exit, and the
lateral road offset in the steps leading up to an off-road exit.

The reference has no such tool (its collisions come from UE4 physics); this
exists to direct training improvements on the one baseline metric where the
TPU agent trails the reference: collision_rate (see BASELINE.md).

Usage:
  python evaluation/diagnose.py --weights stage-s5 --town Town03 \
      --traffic dense --trials 64 --steps 512
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_diagnosis(weights: str, town: str, traffic: str, mode: str,
                  trials: int, steps: int, seed: int = 42) -> dict:
    import jax
    import jax.numpy as jnp
    from carla_driving_rl_agent_tpu.curriculum import stages as learning
    from carla_driving_rl_agent_tpu.envs.carla_env import convert_action

    stage = learning._eval_stage(mode, traffic, steps, trials, weights,
                                 num_envs=trials)
    stage.env.select_town(town if town in stage.env.params.town_names else None)
    agent, env, net = stage.agent, stage.env, stage.agent.network

    def rollout(params, stats, key, consts):
        with env.bind(consts):
            k_reset, key = jax.random.split(key)
            states, _ = env.reset_batch(k_reset, trials)

            def step_fn(carry, _):
                states, key = carry
                key, k = jax.random.split(key)
                obs = env.observe(states)
                net_in = {f"state_{k2}": v for k2, v in obs.items()}
                net_in["action"] = states.last_action
                pred = net.predict(params, stats, net_in, k)
                states, _, reward, term, trunc, info = env.step_batch(
                    states, convert_action(pred["action"]))
                rec = dict(
                    x=states.world.x, y=states.world.y,
                    speed=info["speed"], similarity=info["similarity"],
                    d_next=info["distance_to_next_waypoint"],
                    off_road=info["off_road_distance"],
                    hit_vehicle=info["hit_vehicle"],
                    hit_pedestrian=info["hit_pedestrian"],
                    hit_other=info["hit_other"],
                    term=term, trunc=trunc,
                    timestep=info["timestep"])
                return (states, key), rec

            (states, key), recs = jax.lax.scan(
                step_fn, (states, key), None, length=steps)
            return recs

    key = jax.random.PRNGKey(seed)
    recs = jax.device_get(jax.jit(rollout)(
        agent.params, agent.stats, key, env.consts))

    # junction bank of the pinned town (host-side; for exit-site context)
    town_idx = (list(env.params.town_names).index(town)
                if town in env.params.town_names else 0)
    consts = env.consts
    j_xy = np.asarray(consts.town.junction_xy[town_idx])
    n_j = int(consts.town.num_junctions[town_idx])
    j_xy = j_xy[:n_j]

    causes = dict(vehicle=0, pedestrian=0, off_road=0, arrival=0, timeout=0)
    exit_speed, exit_junction_d, exit_step, offroad_drift = [], [], [], []
    for b in range(trials):
        # first episode ending of world b (auto-reset may start a second one;
        # only the first is a clean, independently-seeded episode)
        done = recs["term"][:, b] | recs["trunc"][:, b]
        if not done.any():
            causes["timeout"] += 1
            continue
        t = int(np.argmax(done))
        if recs["hit_pedestrian"][t, b]:
            causes["pedestrian"] += 1
        elif recs["hit_vehicle"][t, b]:
            causes["vehicle"] += 1
        elif recs["hit_other"][t, b]:
            causes["off_road"] += 1
            # road-offset build-up over the last 3 s (90 steps)
            lo = max(0, t - 90)
            offroad_drift.append(np.asarray(recs["off_road"][lo:t + 1, b]))
        elif recs["trunc"][t, b]:
            causes["timeout"] += 1
        else:
            causes["arrival"] += 1
        exit_speed.append(float(recs["speed"][t, b]))
        if len(j_xy):
            p = np.array([recs["x"][t, b], recs["y"][t, b]])
            exit_junction_d.append(float(np.min(
                np.linalg.norm(j_xy - p[None], axis=-1))))
        exit_step.append(t + 1)

    report = dict(
        scenario=f"{weights} {mode}/{town}/{traffic} x{trials}",
        causes=causes,
        exit_speed_kmh=dict(mean=float(np.mean(exit_speed or [0])),
                            p90=float(np.percentile(exit_speed, 90)
                                      if exit_speed else 0)),
        exit_junction_distance_m=dict(
            mean=float(np.mean(exit_junction_d or [0])),
            median=float(np.median(exit_junction_d or [0])),
            frac_in_junction=float(np.mean(
                [d < 9.0 for d in exit_junction_d]) if exit_junction_d else 0)),
        exit_step=dict(mean=float(np.mean(exit_step or [0])),
                       median=float(np.median(exit_step or [0]))),
    )
    if offroad_drift:
        # how fast the agent leaves the road: average offset 3 s / 1 s before
        at = lambda k: float(np.mean([d[-min(k, len(d))] for d in offroad_drift]))
        report["offroad_buildup_m"] = {
            "t-3s": at(90), "t-1s": at(30), "t-0.25s": at(8), "t": at(1)}
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="stage-s5")
    ap.add_argument("--town", default="Town03")
    ap.add_argument("--traffic", default="dense", choices=["no", "regular", "dense"])
    ap.add_argument("--mode", default="train", choices=["train", "test"])
    ap.add_argument("--trials", type=int, default=64)
    ap.add_argument("--steps", type=int, default=512)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    import json
    print(json.dumps(run_diagnosis(args.weights, args.town, args.traffic,
                                   args.mode, args.trials, args.steps,
                                   args.seed), indent=2))


if __name__ == "__main__":
    main()
