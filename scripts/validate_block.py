"""On-chip A/B validation of the block rollout path (rollout_block=True).

Run from anywhere: `python scripts/validate_block.py [--train]`.

Eval A/B (default): one scenario (train/Town03/dense, 50 trials) with
rollout_block=True on stage-s5 weights; compares the six metrics against the
recorded per-step run (weights/stage-s5/evaluation/...Town03-dense-42.json)
and times warm evals both ways.

Train A/B (--train): short stage-s1 runs (fresh weights, identical seed)
with rollout_block False vs True into throwaway weight dirs; prints the
per-update reward trajectory of each so the curves can be compared, plus
wall-clock per update.  Parity here justifies flipping the config default
(VERDICT round-1 item 4).
"""
import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def eval_ab():
    from carla_driving_rl_agent_tpu.curriculum.stages import (
        Stage, define_agent, define_env, _stage_common, TRAFFIC_SPECS,
        EVAL_TOWNS, TRAIN_WEATHERS)

    hp = _stage_common({})
    agent = define_agent(batch_size=64, num_envs=58, rollout_steps=8,
                         name="stage-s5", load=True, load_full=True, seed=42,
                         aug_intensity=0.0, log_mode=None,
                         rollout_block=True, **hp)
    env = define_env(town="Town03", random_towns=list(EVAL_TOWNS),
                     random_weathers=list(TRAIN_WEATHERS),
                     spawn=TRAFFIC_SPECS["dense"],
                     throttle_as_desired_speed=True, disable_reverse=True,
                     max_timesteps=512, seed=42)
    stage = Stage(agent=agent, environment=env, name="stage-s5",
                  learning=dict(agent=dict(episodes=1, timesteps=512)))
    stage.init()
    stage.env.select_town("Town03")

    t0 = time.time()
    stage.agent.evaluate(name="_block_val", timesteps=512, trials=50,
                         initial_seed=42, evaluation_dir="/tmp/block_eval")
    t_first = time.time() - t0
    t0 = time.time()
    res = stage.agent.evaluate(name="_block_val_warm", timesteps=512,
                               trials=50, initial_seed=43,
                               evaluation_dir="/tmp/block_eval")
    t_warm = time.time() - t0
    means = {k: round(float(sum(v) / max(len(v), 1)), 3)
             for k, v in res.items()}
    print(f"[block eval] warm={t_warm:.1f}s (first {t_first:.1f}s) {means}",
          flush=True)
    ref = json.load(open("weights/stage-s5/evaluation/"
                         "stage-s5-train-512-50-Town03-dense-42.json"))
    print("[per-step recorded]",
          {k: round(v, 3) for k, v in ref.items() if k.endswith("_mean")},
          flush=True)


def train_ab(updates: int = 25):
    from carla_driving_rl_agent_tpu.curriculum import stages as learning

    out = {}
    for block in (False, True):
        name = f"_blockab_{int(block)}"
        wdir = os.path.join("weights", name)
        shutil.rmtree(wdir, ignore_errors=True)
        stage = learning.stage_s1(episodes=5, timesteps=512, batch_size=64,
                                  seed=42, stage_name=name,
                                  rollout_block=block, log_mode=None)
        stage.init()
        # warmup update (compile) outside the timed window
        env_states, _ = stage.agent.learn(num_updates=1)
        t0 = time.time()
        env_states, history = stage.agent.learn(num_updates=updates,
                                                env_states=env_states)
        dt = time.time() - t0
        rews = [round(h.get("reward_mean", float("nan")), 3) for h in history]
        colls = [round(h.get("collision_rate", float("nan")), 3)
                 for h in history]
        out[str(block)] = dict(sec_per_update=round(dt / updates, 2),
                               rewards=rews, collisions=colls)
        print(f"[block train block={block}] {dt / updates:.2f}s/update "
              f"rew[-5:]={rews[-5:]} coll[-5:]={colls[-5:]}", flush=True)
        stage.cleanup()
        shutil.rmtree(wdir, ignore_errors=True)
    print(json.dumps({"train_ab": out}), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--epochs", type=int, default=4)
    args = ap.parse_args()
    if args.train:
        train_ab(args.epochs)
    else:
        eval_ab()
