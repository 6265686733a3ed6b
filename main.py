"""Experiment driver: the 5-stage curriculum + the 48-scenario evaluation.

Mirror of the reference `main.py`: stages s1..s5 run sequentially (each
`run2(epochs)` with per-epoch weight snapshots), weights handed off between
stages via `load=True, load_full=True`, then the full evaluation sweep over
8 towns x 3 traffic levels x {train, test} weather modes
(reference `main.py:49-101`).

Usage:
  python main.py --stage s1 --epochs 10           # train one stage
  python main.py --curriculum --epochs 10         # s1 -> s5 sequentially
  python main.py --evaluate --weights stage-s5    # the 48-scenario sweep
  python main.py --record --weights stage-s5      # save driving videos
"""

import argparse
import atexit
import shutil
import os
import sys

from carla_driving_rl_agent_tpu.curriculum import stages as learning


def acquire_run_lock(weights_dir: str):
    """Pid-file lock: refuse to start a second trainer against the same
    weights dir (round-1 postmortem: a failed `kill` left two trainers racing
    whole-file checkpoint writes to one dir). Stale locks (dead pid) are
    reclaimed; the lock is released atexit."""
    os.makedirs(weights_dir, exist_ok=True)
    lock_path = os.path.join(weights_dir, ".train.lock")
    if os.path.exists(lock_path):
        try:
            old_pid = int(open(lock_path).read().strip())
            os.kill(old_pid, 0)  # raises if dead
            sys.exit(f"ERROR: {lock_path} held by live pid {old_pid}; "
                     f"refusing to race it. Kill that process (and confirm "
                     f"with ps) or remove the lock file.")
        except (ValueError, ProcessLookupError, PermissionError):
            pass  # stale or unreadable -> reclaim
    with open(lock_path, "w") as f:
        f.write(str(os.getpid()))
    atexit.register(lambda: os.path.exists(lock_path) and os.remove(lock_path))

# reference training configuration (main.py:49-91): 5 episodes x 512 steps
# per epoch, batch 64, gamma/lambda in the agent defaults, 100 epochs/stage
EPISODES = 5
TIMESTEPS = 512
BATCH = 64
NUM_ENVS = 32          # TPU-new: lock-step parallel worlds per update

STAGE_ORDER = ["s1", "s2", "s3", "s4", "s5"]


def sharp_recipe() -> dict:
    """The 'sharp' training recipe (TPU-new, opt-in via --sharp).

    Fixes the uniform-policy trap the reference's constant entropy bonus
    (0.1) creates with the softplus+1.01 Beta head: the bonus drives the
    concentrations to the 1.01 floor within ~8 updates, where the softplus
    gradient vanishes and the policy freezes at near-uniform forever
    (measured on stage-s5: alpha,beta in [1.01, 1.13], PPO ratio pinned at
    1.0, KL = 0 from update ~100 on; driving comes only from tiny biases in
    the Beta mean — hence the high off-road collision rate).

      * entropy coefficient DECAYS (0.02, x0.5 every 30 updates, floor 1e-4)
        so early exploration survives but the policy can sharpen;
      * the Beta head gets a leaky pre-activation floor (see
        models/carla_network.PolicyHead) so gradients stay alive even if
        the head is pushed toward the concentration floor;
      * gamma=0.999, lambda=0.95 instead of the reference's 0.9999/0.999:
        with gamma*lambda ~ 1 GAE degenerates to Monte-Carlo — every action
        in a collision episode receives the SAME advantage, so there is no
        within-episode contrast to learn steering from (measured: a
        sharpened policy trained under parity gamma/lambda confidently
        drives off-road; training reward flat). lambda=0.95 localizes blame
        to the actions near the off-road drift; gamma=0.999 keeps the value
        horizon at full-episode length (~512 steps) so crashing still costs
        the whole remaining episode — gamma=0.99 (a ~100-step horizon) was
        measured to leave the agent myopically speed-greedy: it matches the
        frozen-policy baseline's collision rate instead of beating it.
    """
    from carla_driving_rl_agent_tpu.utils.schedules import ExponentialDecay
    return dict(
        entropy_regularization=ExponentialDecay(
            initial_value=0.02, decay_steps=30, decay_rate=0.5, min_value=1e-4),
        gamma=0.999, lambda_=0.95,
        network={"control_policy": {"preact_floor": -3.0}})


# The shipped training configuration.  Round-4 hardware gates REJECTED both
# candidate speed levers from the round-3 measurement campaign:
#
# * bfloat16 (+10%): the bisection (logs/r4-ft-probe-*.log) showed bf16
#   training quantizes away the Beta policy's tiny logit shifts — 14-epoch
#   fine-tunes gate at collision 0.94/0.94/0.98 (bf16) vs 0.26/0.48 (f32).
# * fused_update (1.85x in-update): SHORT fine-tunes gate near-clean
#   (0.36/0.44/0.54 vs 0.26/0.48 sequential), but BOTH full 78-epoch
#   curriculum chains trained with it produced untrainable policies —
#   Town03 gate after the safety fine-tune 0.90/1.0/1.0 (fused+bf16,
#   logs/r4-fast-*-bf16.log) and 0.94/1.0/1.0 (fused f32,
#   logs/r4-fast-curriculum.log + r4-fast-finetune.log), with the
#   ratio~1.0 / kl~0 frozen-policy curve signature from update 0
#   (logs/stage-s1/20260820-081227).  Mechanism: the sequential algorithm
#   gives the SHARED dynamics backbone two separately-clipped Adam steps
#   per minibatch (policy-phase grad, then value-phase grad); the fused
#   path folds them into ONE step on the summed gradient, so the larger
#   value gradient dominates the backbone's direction and the policy head's
#   learning signal starves — mild at 14 epochs, fatal compounded over 78.
#
# Both remain available as config/bench levers (fused_update=True,
# compute_dtype="bfloat16"; scripts/bench_train_ab.py holds the matrix).
# The default chunked dispatch (updates_per_dispatch=8, numerics identical,
# tested) stays on.
#
# ROUND-5 REJECTED LEVER — two_step_update (see CARLAgentConfig): one
# backbone forward per minibatch (jax.vjp) pulled back twice, two
# separately-clipped Adam steps on the shared backbone.  Measured 951.4
# vs 722.3 steps/s (1.32x) with first-update metrics matching sequential
# to <1e-3 (logs/r5-ab-bisect.log) and provably identical policy updates
# at single-minibatch geometry — but the FULL-CHAIN Town03 gate failed:
# 0.80/0.90/0.88 collision after the safety fine-tune vs the sequential
# chain's 0.26/0.48 (logs/r5-fast2-finetune.log).  Suspected mechanism:
# interleaving the small policy-phase and large value-phase gradients
# through ONE shared backbone Adam state keeps the second moment pinned
# at value-grad scale, muting every policy step — sequential's
# phase-ordered stream lets the moments adapt down during the policy
# phase.  A per-phase-Adam-state variant (two_step_split_adam) is the
# candidate fix; it must pass a FULL-CHAIN gate before FAST_TRAIN flips.
# The fused Pallas ShuffleUnit backbone (fused_units) is also NOT
# shipped: the halo-tiled kernels fault the TPU worker inside the real
# train program despite passing every standalone shape probe
# (logs/r5-punit-real.log vs r5-knob-bisect.log), and the
# sample-mode-only config measures 602.9 < the 722.3 flax baseline.
FAST_TRAIN = dict()

# Safety-shaped env pricing (--safe): the round-3/4 "safe" recipe's two
# env knobs (scripts/safety_finetune.py) applied FROM STAGE-1 instead of as
# an endpoint fine-tune.  Round-4 diagnosis: every failure is an
# uncorrected off-road drift at 17-25 km/h; the parity off-road cost (10)
# is too cheap a death once the policy actually achieves speed, and the
# safe-s5 endpoint fine-tune sits at a fragile optimum (further tuning
# regresses — logs/r4-ft-no-traffic.log).  Pricing it from s1 lets the
# whole curriculum learn under the true cost (VERDICT r4 item 4).
SAFE_ENV = dict(off_road_penalty_divisor=5.0,   # off-road exit costs 200
                reward_speed_cap=15.0)          # km/h the reward credits


def make_stage(which: str, epochs: int, num_envs: int = NUM_ENVS,
               block: bool = False, weights_dir: str = "weights",
               sharp: bool = False, aug_intensity: float = None,
               fast: bool = True, safe: bool = False, lateral: bool = False,
               probe_cfg: dict = None):
    common = dict(episodes=EPISODES, timesteps=TIMESTEPS, batch_size=BATCH,
                  num_envs=num_envs, save_every="end",
                  rollout_block=block, weights_dir=weights_dir)
    if fast:
        common.update(FAST_TRAIN)
    if probe_cfg:
        # candidate trainer config under full-chain gate (NOT shipped —
        # FAST_TRAIN flips only after the gate passes)
        common.update(probe_cfg)
    if safe:
        common["env_overrides"] = dict(SAFE_ENV)
    if lateral:
        common.setdefault("env_overrides", {})["lateral_obs"] = True
    if sharp:
        common.update(sharp_recipe())
        # measured on the v3 chain (round 2): full-strength update-time
        # augmentation collapses a SHARPENED policy (s3 gate 0.86 collision
        # -> s4 1.0 with aug=1.0 as the only delta): the PPO ratio evaluates
        # the policy on augmented images while the rollout log-probs came
        # from clean ones — harmless while the parity policy is frozen
        # near-uniform (ratio pins at 1), destabilizing once it sharpens.
        # Sharp runs therefore default augmentation OFF.
        common.setdefault("aug_intensity", 0.0)
    if aug_intensity is not None:
        common["aug_intensity"] = aug_intensity
    if which == "s1":
        return learning.stage_s1(**common)
    if which == "s2":
        return learning.stage_s2(**common)
    if which == "s3":
        return learning.stage_s3(**common)
    if which == "s4":
        return learning.stage_s4(**common)
    if which == "s5":
        return learning.stage_s5(town="Town03", traffic="dense", **common)
    raise ValueError(which)


def hand_off(src_stage: str, dst_stage: str, weights_dir: str = "weights"):
    """Copy a stage's weights to the next stage's directory (the reference
    does this manually — README.md:86)."""
    src = os.path.join(weights_dir, f"stage-{src_stage}")
    dst = os.path.join(weights_dir, f"stage-{dst_stage}")
    if os.path.exists(src):
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)


def run_curriculum(epochs, num_envs: int = NUM_ENVS,
                   block: bool = False, weights_dir: str = "weights",
                   sharp: bool = False, fast: bool = True,
                   safe: bool = False, lateral: bool = False,
                   probe_cfg: dict = None):
    """epochs: an int (same for every stage) or a per-stage list
    "e1,e2,e3,e4,e5" (the original on-TPU curriculum used 30,16,12,10,10)."""
    if isinstance(epochs, str) and "," in epochs:
        per_stage = [int(e) for e in epochs.split(",")]
        assert len(per_stage) == len(STAGE_ORDER)
    else:
        per_stage = [int(epochs)] * len(STAGE_ORDER)
    for i, which in enumerate(STAGE_ORDER):
        if i > 0:
            hand_off(STAGE_ORDER[i - 1], which, weights_dir=weights_dir)
        print(f"=== stage-{which} ({per_stage[i]} epochs) ===", flush=True)
        import time as _time
        t0 = _time.perf_counter()
        stage = make_stage(which, per_stage[i], num_envs, block=block,
                           weights_dir=weights_dir, sharp=sharp, fast=fast,
                           safe=safe, lateral=lateral, probe_cfg=probe_cfg)
        stage.run2(epochs=per_stage[i], copy_weights=False)
        print(f"=== stage-{which} done in {_time.perf_counter() - t0:.1f} s ===",
              flush=True)


def run_evaluation(weights: str = "stage-s5", steps: int = 512, trials: int = 50):
    """The full sweep (reference main.py:94-101): 8 towns x 3 traffic x
    2 weather modes, seed 42."""
    towns = ["Town01", "Town02", "Town03", "Town04", "Town05", "Town06",
             "Town07", "Town10"]
    for mode in ["train", "test"]:
        for town in towns:
            for traffic in ["no", "regular", "dense"]:
                print(f"=== evaluate {mode}/{town}/{traffic} ===")
                learning.evaluate(mode=mode, town=town, seeds=[42],
                                  traffic=traffic, steps=steps, trials=trials,
                                  weights=weights)


def run_standard(epochs: int, num_envs: int = NUM_ENVS, sharp: bool = False,
                 stage_name: str = "stage-standard", fast: bool = True):
    """The no-curriculum control agent (reference README.md:130's "standard"
    column): PPO trained from scratch directly in the stage-s5 setting, with
    the same total update budget the curriculum spends across s1->s5.

    --sharp trains it with the sharp recipe minus the curriculum (decaying
    entropy + Beta-head guard + gamma/lambda fix) so the standard-vs-
    curriculum comparison is against a baseline whose objective actually
    learns (round-1 finding: the parity entropy bonus freezes the policy
    near-uniform; the standard agent scored below the untrained control)."""
    extra = sharp_recipe() if sharp else {}
    if fast:
        extra.update(FAST_TRAIN)
    stage = learning.stage_s5(episodes=EPISODES, timesteps=TIMESTEPS,
                              batch_size=BATCH, num_envs=num_envs,
                              town="Town03", traffic="dense",
                              stage_name=stage_name, load=False,
                              save_every="end", **extra)
    stage.run2(epochs=epochs, copy_weights=False)


def run_record(weights: str = "stage-s5", timesteps: int = 512, trials: int = 3):
    stage = learning.stage_s5(episodes=1, timesteps=timesteps, batch_size=1,
                              town="Town03", stage_name=weights, traffic="regular",
                              aug_intensity=0.0, num_envs=4)
    stage.record(name="demo", timesteps=timesteps, trials=trials)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--stage", choices=STAGE_ORDER)
    parser.add_argument("--curriculum", action="store_true")
    parser.add_argument("--evaluate", action="store_true")
    parser.add_argument("--standard", action="store_true",
                        help="train the no-curriculum control agent")
    parser.add_argument("--record", action="store_true")
    parser.add_argument("--epochs", default="10",
                        help="int, or per-stage list 'e1,...,e5' for --curriculum")
    parser.add_argument("--num-envs", type=int, default=NUM_ENVS)
    parser.add_argument("--weights", default="stage-s5")
    parser.add_argument("--block", action="store_true",
                        help="block rollout (one forward/render per 4 steps)")
    parser.add_argument("--sharp", action="store_true",
                        help="sharp recipe: decaying entropy + Beta-head "
                             "saturation guard (see sharp_recipe)")
    parser.add_argument("--safe", action="store_true",
                        help="safety-shaped env pricing from stage-1 "
                             "(off-road x20, 15 km/h reward cap — SAFE_ENV)")
    parser.add_argument("--probe-cfg", default=None,
                        help="JSON dict of CARLAgentConfig overrides for a "
                             "full-chain gate of a NON-shipped candidate "
                             "(e.g. '{\"two_step_split_adam\": true}')")
    parser.add_argument("--lateral", action="store_true",
                        help="append the signed lateral-offset scalar to the "
                             "navigation obs (WorldParams.lateral_obs; "
                             "checkpoints are NOT interchangeable across "
                             "this flag)")
    parser.add_argument("--slow", action="store_true",
                        help="reference-shaped sequential two-phase trainer "
                             "(disables the fused update — FAST_TRAIN)")
    parser.add_argument("--weights-dir", default="weights")
    parser.add_argument("--aug-intensity", type=float, default=None,
                        help="override stage augmentation intensity")
    parser.add_argument("--trials", type=int, default=50)
    args = parser.parse_args()

    if args.curriculum or args.standard or args.stage:
        acquire_run_lock(args.weights_dir)

    import json as _json
    probe_cfg = _json.loads(args.probe_cfg) if args.probe_cfg else None

    if args.curriculum:
        run_curriculum(args.epochs, args.num_envs, block=args.block,
                       weights_dir=args.weights_dir, sharp=args.sharp,
                       fast=not args.slow, safe=args.safe,
                       lateral=args.lateral, probe_cfg=probe_cfg)
    elif args.standard:
        run_standard(int(args.epochs), args.num_envs, sharp=args.sharp,
                     stage_name=("stage-standard-sharp" if args.sharp
                                 else "stage-standard"),
                     fast=not args.slow)
    elif args.stage:
        make_stage(args.stage, int(args.epochs), args.num_envs, block=args.block,
                   weights_dir=args.weights_dir, sharp=args.sharp,
                   aug_intensity=args.aug_intensity,
                   fast=not args.slow, safe=args.safe,
                   lateral=args.lateral).run2(epochs=int(args.epochs))
    elif args.evaluate:
        run_evaluation(weights=args.weights, trials=args.trials)
    elif args.record:
        run_record(weights=args.weights)
    else:
        parser.print_help()
