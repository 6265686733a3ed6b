"""Train-step throughput A/B over the round-3 levers, one process so the
persistent compile cache (~/.cache/cdrl_jax) is shared across variants.

Geometry = bench.py train_bench (the driver-measurable counterpart of the
<1h-curriculum wall-clock target, BASELINE.md): 32 worlds x 512 steps per
update, batch 64, full-size network, Town03 stage-s1-like world.

Variants (cumulative TPU-first levers on top of the reference-parity
sequential update, rl/agents/ppo.py:190-226):
  seq-f32          two sequential phases, each re-running the backbone
  fused-f32        CARLAgentConfig.fused_update: ONE backbone pass shared
                   by the policy+value objectives (carla_agent.py)
  fused-bf16       + compute_dtype=bfloat16 (MXU-native convs/matmuls)
  fused-blk-f32    + rollout_block: physics in blocks of past_obs_freq,
                   one policy query per block (3-4x rollout speedup),
                   post-reset advantage masking on
  fused-blk-bf16   all three

Prints one JSON line per variant and a final summary line with speedups
vs seq-f32 and each variant's first-update metric deltas (same seed, same
env stream: losses must stay O(1e-2) close for the non-block variants;
block variants change rollout semantics so only finiteness is asserted).

Usage: python scripts/bench_train_ab.py [--tiny] [--variants a,b,...]
  --tiny: CPU smoke (4 envs, 16 steps, 8 virtual devices) — numerics only.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


VARIANTS = {
    "seq-f32": dict(),
    "fused-f32": dict(fused_update=True),
    "fused-bf16": dict(fused_update=True, compute_dtype="bfloat16"),
    "fused-blk-f32": dict(fused_update=True, rollout_block=True),
    "fused-blk-bf16": dict(fused_update=True, rollout_block=True,
                           compute_dtype="bfloat16"),
    # diagnostics (NOT candidate defaults — batch size changes SGD
    # semantics): same 16384 samples/update in 4x larger minibatches.
    # If the update is per-minibatch-overhead-bound these scale ~4x;
    # if activation-bandwidth-bound they stay ~flat.
    "fused-bf16-b256": dict(fused_update=True, compute_dtype="bfloat16",
                            batch_size=256),
    "fused-f32-b256": dict(fused_update=True, batch_size=256),
    # bisection probes: skip the minibatch scans entirely (rollout + GAE
    # prologue only) / halve the scan length — locates where the in-program
    # wall time lives (scripts/bench_train_parts.py measures the same body
    # at ~4.4 s standalone vs ~14 s inside the real program)
    "fused-bf16-noopt": dict(fused_update=True, compute_dtype="bfloat16",
                             optimization_steps=(0, 0)),
    "fused-bf16-b128": dict(fused_update=True, compute_dtype="bfloat16",
                            batch_size=128),
    "fused-blk-bf16-noopt": dict(fused_update=True, compute_dtype="bfloat16",
                                 rollout_block=True,
                                 optimization_steps=(0, 0)),
    "fused-blk-bf16-r2": dict(fused_update=True, compute_dtype="bfloat16",
                              rollout_block=True),
    # WIDE-GEOMETRY recipe variants (round-3 lever, CLAUDE.md: the 32-world
    # rollout is op-count-bound — 11 ms/step at 32 worlds vs 2.3 ms/step at
    # 1024 worlds, so the same rollout program runs many more worlds nearly
    # free).  All keep 16384 samples/update (same minibatch count, same SGD
    # sample budget); only the GAE segment length changes (a documented
    # recipe lever, like sharp — truncation bootstraps from V(s_t), so short
    # segments remain unbiased up to value-function error).
    "fused-bf16-w128": dict(fused_update=True, compute_dtype="bfloat16",
                            num_envs=128, rollout_steps=128),
    "fused-bf16-w256": dict(fused_update=True, compute_dtype="bfloat16",
                            num_envs=256, rollout_steps=64),
    "fused-bf16-w512": dict(fused_update=True, compute_dtype="bfloat16",
                            num_envs=512, rollout_steps=32),
    "fused-bf16-w1024": dict(fused_update=True, compute_dtype="bfloat16",
                             num_envs=1024, rollout_steps=16),
    # FLAT-OPTIMIZER lever (CARLAgentConfig.flat_optimizer, default False):
    # optax.flatten collapses the per-leaf adam/clip op storm to vector ops.
    # -flat/-noflat variants pin both sides regardless of the default.
    "fused-bf16-flat": dict(fused_update=True, compute_dtype="bfloat16",
                            flat_optimizer=True),
    "fused-bf16-noflat": dict(fused_update=True, compute_dtype="bfloat16",
                              flat_optimizer=False),
    "fused-bf16-w256-flat": dict(fused_update=True, compute_dtype="bfloat16",
                                 num_envs=256, rollout_steps=64,
                                 flat_optimizer=True),
    "fused-bf16-w512-flat": dict(fused_update=True, compute_dtype="bfloat16",
                                 num_envs=512, rollout_steps=32,
                                 flat_optimizer=True),
    # FUSED-PALLAS-UNIT lever (round-4, CARLAgentConfig.fused_units): the
    # backbone's 13 stride-1 ShuffleNet units each collapse ~10 XLA ops to
    # one pallas_call (ops/shuffle_unit_pallas.py) — attacks the
    # activation-bandwidth-bound minibatch phase (~1-2% MFU measured r3).
    "fused-bf16-punit": dict(fused_update=True, compute_dtype="bfloat16",
                             fused_units=True),
    "fused-f32-punit": dict(fused_update=True, fused_units=True),
    # the SHIPPING-relevant punit arm: sequential f32 (the round-4 chain
    # gate rejected fused_update for full curricula — see main.FAST_TRAIN)
    # with only the backbone units swapped for the Pallas kernel.
    "seq-f32-punit": dict(fused_units=True),
    # round-5 candidates: the halo-tiled + bf16-pass punit kernel now
    # covers stage-2 (no flax fallback), and two_step_update is the
    # semantics-preserving shared-forward update (one backbone fwd per
    # minibatch, TWO separately-clipped Adam steps — removes the rejected
    # fused_update's summed-gradient policy-starvation mechanism)
    "twostep-f32": dict(two_step_update=True),
    "twostep-f32-punit": dict(two_step_update=True, fused_units=True),
    # per-phase backbone Adam states — the chain-gate-failure fix candidate
    "twostep-split-f32": dict(two_step_split_adam=True),
    # round-6 ENV-side levers inside the real train program (env_ keys
    # route to CARLAEnvConfig): the fused Pallas physics step collapses the
    # op-count-bound 32-world rollout's ~100 dispatches/step into one
    # kernel; the unrolls attack the scan floor.  Rollout semantics
    # unchanged (tests/test_physics_fused.py: exact ids, 1e-5 floats).
    "seq-f32-fusedstep": dict(env_fused_step=True),
    "seq-f32-fusedstep-unroll": dict(env_fused_step=True, env_phys_unroll=4,
                                     env_block_unroll=2),
}


def _mark(msg):
    print(f"[ab {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def run_variant(name: str, overrides: dict, tiny: bool) -> dict:
    from carla_driving_rl_agent_tpu.agents.carla_agent import (
        CARLAgent, CARLAgentConfig)
    from carla_driving_rl_agent_tpu.envs.carla_env import CARLAEnv, CARLAEnvConfig
    from carla_driving_rl_agent_tpu.envs.world import WorldParams

    num_envs, steps = (4, 16) if tiny else (32, 512)
    overrides = dict(overrides)
    env_kwargs = {k[4:]: overrides.pop(k)
                  for k in list(overrides) if k.startswith("env_")}
    env = CARLAEnv(CARLAEnvConfig(
        world=WorldParams(town_names=("Town03",), num_routes=64,
                          max_route_len=512, max_timesteps=512,
                          num_vehicles=0, num_pedestrians=0, v_max=1, p_max=1),
        image_height=90, image_width=120, render_mode="pallas",
        time_horizon=4, past_obs_freq=4, **env_kwargs))
    cfg_kwargs = dict(num_envs=num_envs, rollout_steps=steps,
                      batch_size=8 if tiny else 64, seed=0)
    cfg_kwargs.update(overrides)
    if tiny:   # wide variants shrink to CPU scale, keeping the w/r ratio
        cfg_kwargs["num_envs"] = min(cfg_kwargs["num_envs"], 8)
        cfg_kwargs["rollout_steps"] = min(cfg_kwargs["rollout_steps"], 16)
    agent = CARLAgent(env, CARLAgentConfig(**cfg_kwargs), log_mode=None)
    num_envs, steps = agent.config.num_envs, agent.config.rollout_steps

    _mark(f"{name}: compiling/warmup")
    timed_updates = 1 if tiny else 3
    # warmup with the SAME update count as the timed call: learn() batches
    # updates into one jitted chunk program per distinct size
    # (updates_per_dispatch), so a different warmup size would leave the
    # timed size uncompiled
    env_states, hist = agent.learn(num_updates=timed_updates)
    first = {k: float(v) for k, v in hist[0].items()
             if k in ("loss_policy", "loss_value", "entropy", "reward_mean",
                      "kl", "ratio")}
    t0 = time.perf_counter()
    env_states, _ = agent.learn(num_updates=timed_updates,
                                env_states=env_states)
    dt = time.perf_counter() - t0
    sps = timed_updates * num_envs * steps / dt
    out = dict(variant=name, train_env_steps_per_sec=round(sps, 1),
               first_update=first)
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()
    if args.tiny:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    results = {}
    for name in args.variants.split(","):
        results[name] = run_variant(name, VARIANTS[name], args.tiny)

    base = results.get("seq-f32")
    summary = {}
    for name, r in results.items():
        entry = dict(steps_per_sec=r["train_env_steps_per_sec"])
        if base and name != "seq-f32":
            entry["speedup"] = round(r["train_env_steps_per_sec"]
                                     / base["train_env_steps_per_sec"], 3)
            entry["max_metric_delta"] = round(max(
                abs(r["first_update"][k] - base["first_update"][k])
                for k in ("loss_policy", "loss_value", "entropy")), 5)
        summary[name] = entry
    print(json.dumps(dict(summary=summary)), flush=True)


if __name__ == "__main__":
    main()
