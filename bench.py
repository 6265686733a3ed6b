"""Benchmark: aggregate environment steps/sec with rendered 3-camera obs.

Headline metric from BASELINE.json: env steps/sec/chip at 1024 parallel
worlds with 90x120x3-per-camera rendered observations (stage-s1-like world).
The reference has no throughput baseline (single CARLA env, wall-clock bound
by UE4); vs_baseline is measured against the 1M steps/s north-star target.

Prints the JSON metric line {"metric", "value", "unit", "vs_baseline"} as
soon as the env measurement completes, then (if the secondary train bench
finishes inside its wall-clock bound) an enriched copy of the SAME line
with train_env_steps_per_sec added — first and last stdout lines carry the
same headline value, whichever the driver parses.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def _mark(msg):
    """Progress marker on stderr (stdout stays one JSON line): lets a
    timed-out run show whether it died in town build, compile, or execute."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)

NUM_WORLDS = 1024
STEPS_PER_CALL = 32      # divisible by past_obs_freq=4 (block stepping)
WARMUP_CALLS = 2
TIMED_CALLS = 10

# Peak dense-matmul throughput (bf16) and HBM bandwidth per chip, by
# device_kind — the denominators for the MFU / roofline numbers the TPU
# build treats as first-class (no reference counterpart; VERDICT r3 item 4).
PEAK_BY_KIND = {
    "TPU v4": (275e12, 1228e9),
    "TPU v5 lite": (197e12, 819e9),     # v5e
    "TPU v5": (459e12, 2765e9),         # v5p
    "TPU v6 lite": (918e12, 1640e9),    # v6e
}


def _peaks():
    kind = jax.devices()[0].device_kind
    return PEAK_BY_KIND.get(kind, (None, None))


def _parse_ca(ca):
    if isinstance(ca, (list, tuple)):
        ca = ca[0] or {}
    ca = ca or {}
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _cost(lowered):
    """flops + bytes from XLA's HLO cost analysis.  The pre-optimization
    analysis returns 0.0 on the remote-attached ("axon") backend in every
    recorded run (VERDICT r4 item 3), so fall through to the COMPILED
    executable's analysis — the compile hits the persistent cache (the
    program just ran), making this a cheap lookup.  Callers still need an
    analytic fallback: returns (0.0, 0.0) when both fail."""
    fl = by = 0.0
    try:
        fl, by = _parse_ca(lowered.cost_analysis())
    except Exception:
        pass
    if not fl:
        try:
            fl2, by2 = _parse_ca(lowered.compile().cost_analysis())
            fl, by = fl2 or fl, by or by2
        except Exception:
            pass
    return fl, by


def main():
    from carla_driving_rl_agent_tpu.envs.carla_env import CARLAEnv, CARLAEnvConfig
    from carla_driving_rl_agent_tpu.envs.world import WorldParams

    import os
    env = CARLAEnv(CARLAEnvConfig(
        world=WorldParams(town_names=("Town03",), num_routes=64, max_route_len=512,
                          max_timesteps=512, num_vehicles=0, num_pedestrians=0,
                          v_max=1, p_max=1),
        image_height=90, image_width=120, render_mode="pallas",
        time_horizon=4, past_obs_freq=4,
        phys_unroll=int(os.environ.get("CDRL_PHYS_UNROLL", "1")),
        block_unroll=int(os.environ.get("CDRL_BLOCK_UNROLL", "1")),
        fused_step=bool(int(os.environ.get("CDRL_FUSED_STEP", "0")))))
    _mark("env built (town bank on host)")

    consts = env.consts

    def reset_all(key, consts):
        with env.bind(consts):
            return env.reset_batch(key, NUM_WORLDS)

    states, _ = jax.jit(reset_all)(jax.random.PRNGKey(0), consts)
    _mark("reset_batch compiled + dispatched")

    block = env.config.past_obs_freq

    def rollout_chunk(states, key, consts):
        """Block-structured stepping (the production rollout path,
        agents/rollout.run_rollout_blocks): `block` physics steps per
        rendered frame push — the obs stack only refreshes every
        past_obs_freq steps, so this is the true per-env-step cost."""
        with env.bind(consts):
            # ONE RNG call for the whole chunk's random driving actions
            # (throttle biased forward): per-step split+uniform was ~3-4 ms
            # of the 6.4 ms phys_rng baseline (round-4 bench_parts) — pure
            # harness overhead, not env cost; a real rollout's actions come
            # from the policy
            key, k_a = jax.random.split(key)
            a_all = jax.random.uniform(
                k_a, (STEPS_PER_CALL // block, block, NUM_WORLDS, 2),
                minval=jnp.asarray([-0.2, -0.5]),
                maxval=jnp.asarray([0.8, 0.5]))

            def body(carry, a_block):
                states, key = carry

                def sub(inner, a):
                    states, was_reset = inner
                    states, reward, term, trunc, info, did_reset = \
                        env.step_physics_batch(states, a)
                    return (states, was_reset | did_reset), reward[0]

                (states, was_reset), rewards = jax.lax.scan(
                    sub, (states, jnp.zeros((NUM_WORLDS,), bool)), a_block,
                    unroll=env.config.phys_unroll)
                states = env.push_block_frame_batch(states, was_reset)
                return (states, key), rewards.sum()
            (states, key), rewards = jax.lax.scan(body, (states, key), a_all,
                                                  unroll=env.config.block_unroll)
            # scalar probe depending on BOTH rewards and rendered stacks, so
            # fetching it forces the full computation (remote-attached
            # backends have unreliable block_until_ready semantics).
            # newest_frame resolves the circular buffer's write slot — a
            # fixed physical slot is the last-pushed frame only by
            # coincidence of STEPS_PER_CALL/block/time_horizon
            from carla_driving_rl_agent_tpu.envs.carla_env import newest_frame
            probe = jnp.sum(rewards) + jnp.mean(
                newest_frame(states.image_stack, states.stack_slot)[0]
                .astype(jnp.float32))
            return states, key, probe

    step_fn = jax.jit(rollout_chunk, donate_argnums=(0,))

    k = jax.random.PRNGKey(1)
    for i in range(WARMUP_CALLS):
        states, k, probe = step_fn(states, k, consts)
        _mark(f"warmup call {i} dispatched")
    float(probe)
    _mark("warmup probe fetched (rollout chunk compiled + executed)")

    # Dispatch the whole timed sequence, then fetch ONE scalar at the end:
    # each chunk consumes the previous chunk's (donated) states, so the final
    # probe's value forces every chunk to execute on-device in order, while
    # the ~25 ms host<->TPU round-trip of a scalar fetch (remote-attached
    # "axon" backend) is paid once instead of once per call — per-call
    # fetches were inflating the measurement by ~25 ms/chunk (~27%%),
    # measured via scripts/bench_parts.py fixed-cost analysis.
    t0 = time.perf_counter()
    for i in range(TIMED_CALLS):
        states, k, probe = step_fn(states, k, consts)
    float(probe)   # one scalar fetch: forces the full chunk chain
    dt = time.perf_counter() - t0
    _mark(f"{TIMED_CALLS} timed calls done (single end-of-chain fetch)")

    total_steps = NUM_WORLDS * STEPS_PER_CALL * TIMED_CALLS
    sps = total_steps / dt

    env_extra = {}   # populated by the roofline pass below; emit() reads
                     # the dict's contents at call time

    def emit(**extra):
        print(json.dumps(dict(metric="env_steps_per_sec_rendered_1024w",
                              value=round(sps, 1), unit="steps/s",
                              vs_baseline=round(sps / 1_000_000.0, 4),
                              **env_extra, **extra)), flush=True)

    # the headline metric is already measured — emit it NOW so a wedged
    # worker during the (secondary) train bench can't lose it, then emit an
    # enriched copy of the same line if the train bench completes
    emit()

    # roofline estimate for the env chunk: XLA cost analysis (flops + bytes)
    # of one chunk x measured chunks/s vs the chip's peaks.  Runs AFTER the
    # headline emit — the re-lowering is trace-only but must not gate it.
    peak_fl, peak_bw = _peaks()
    try:
        fl, by = _cost(step_fn.lower(states, k, consts))
        if by and peak_bw:
            env_extra["env_hbm_util_est"] = round(
                by * TIMED_CALLS / dt / peak_bw, 4)
        if fl and peak_fl:
            env_extra["env_flops_util"] = round(
                fl * TIMED_CALLS / dt / peak_fl, 5)
        _mark(f"env cost analysis: {fl / 1e9:.2f} GFLOP, "
              f"{by / 1e9:.2f} GB per {STEPS_PER_CALL}-step chunk")
    except Exception as e:
        _mark(f"env cost analysis failed: {type(e).__name__}: {e}")
    # Guaranteed-emit utilization FLOOR from arithmetic the bench already
    # knows: the rendered image-stack traffic alone (one u8 (H, 3W, 3)
    # frame written per world per past_obs_freq steps; the kernel's plane
    # write + the stack-slot store make that x2).  The env's true HBM use
    # is higher (physics state, geometry reads) — this bounds it from
    # below even when XLA's cost analysis returns nothing (axon backend).
    if peak_bw:
        img_bytes = (TIMED_CALLS * (STEPS_PER_CALL // block) * NUM_WORLDS
                     * env.config.image_height * env.config.image_width * 3
                     * 3 * 2)
        env_extra["env_hbm_util_floor_img"] = round(img_bytes / dt / peak_bw, 4)

    # Env-only A/B mode (scripts/run_r6_env_ab.sh): skip the secondary train
    # bench entirely — each skipped run avoids a fresh 15-25 min train
    # compile AND the worker-wedging hazard of abandoning that compile at
    # the 900 s bound (killing a TPU client mid-compile wedges the worker,
    # CLAUDE.md round-4 escalation).  The driver's round-end bench runs
    # without this knob and still reports the train numbers.
    import os as _os
    if _os.environ.get("CDRL_SKIP_TRAIN_BENCH"):
        _mark("train bench skipped (CDRL_SKIP_TRAIN_BENCH)")
        return

    # The remote worker can wedge between programs (observed: device ops
    # hang forever at ~0%% CPU); a hung train bench must not block the
    # process, so it runs on a daemon thread with a hard wall-clock bound.
    import threading
    result = {}

    def run_train_bench():
        try:
            result.update(train_bench())
        except Exception as e:          # never let the train bench kill the
            result["train_bench_error"] = f"{type(e).__name__}: {e}"[:200]

    t = threading.Thread(target=run_train_bench, daemon=True)
    t.start()
    t.join(timeout=900)
    if t.is_alive():
        _mark("train_bench still running at 900 s — abandoning (wedged "
              "worker); env metric already emitted")
        emit(train_bench_error="timeout after 900s (worker wedge?)")
        import os
        os._exit(0)                     # daemon thread blocks a clean exit
    emit(**result)


def train_bench() -> dict:
    """Trained-env-steps/s + MFU for FULL train updates (fused rollout +
    PPO/aux SGD, full-size network) at the stage-s1 geometry: 32 worlds x
    512 steps per update, batch 64 — the driver-measurable counterpart of
    the curriculum wall-clock target (BASELINE.md).  train_mfu =
    XLA-counted flops of the timed 3-update chunk / elapsed / chip peak."""
    import time as _time

    import jax as _jax

    from carla_driving_rl_agent_tpu.agents.carla_agent import (
        CARLAgent, CARLAgentConfig)
    from carla_driving_rl_agent_tpu.envs.carla_env import CARLAEnv, CARLAEnvConfig
    from carla_driving_rl_agent_tpu.envs.world import WorldParams

    num_envs, steps = 32, 512
    env = CARLAEnv(CARLAEnvConfig(
        world=WorldParams(town_names=("Town03",), num_routes=64,
                          max_route_len=512, max_timesteps=512,
                          num_vehicles=0, num_pedestrians=0, v_max=1, p_max=1),
        image_height=90, image_width=120, render_mode="pallas",
        time_horizon=4, past_obs_freq=4))
    # The SHIPPED training configuration, imported from main.FAST_TRAIN so
    # the bench can never advertise a config the trainer doesn't ship
    # (VERDICT r3 item 2).  Round-4 hardware gates rejected both bf16
    # (quantizes the Beta-logit learning signal) and fused_update (full
    # 78-epoch chains produce untrainable policies) — see main.FAST_TRAIN;
    # the measured-faster-but-rejected configs live in
    # scripts/bench_train_ab.py's matrix, deliberately not reported here.
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from main import FAST_TRAIN
    agent = CARLAgent(env, CARLAgentConfig(
        num_envs=num_envs, rollout_steps=steps, batch_size=64, seed=0,
        **FAST_TRAIN),
        log_mode=None)

    _mark("train_bench: agent built, compiling train step")
    # warmup with the SAME update count as the timed call (learn() compiles
    # one chunk program per distinct chunk size).  3 timed updates: the
    # 2-update timing of BENCH_r02 (580.3) still carried ~1 update of
    # first-dispatch boundary cost; at 3 updates the reading matches the
    # steady-state A/B (scripts/bench_train_ab.py: 1073-1207 steps/s for
    # this exact config across processes).
    n_upd = 3
    env_states, _ = agent.learn(num_updates=n_upd)    # compile + warmup
    _mark("train_bench: warmup updates done")
    t0 = _time.perf_counter()
    env_states, history = agent.learn(num_updates=n_upd,
                                      env_states=env_states)
    dt = _time.perf_counter() - t0                    # learn() fetches host
    out = {"train_env_steps_per_sec": round(n_upd * num_envs * steps / dt, 1)}

    # MFU of the timed chunk: re-lower the exact 3-update program learn()
    # dispatched (the jit cache makes this trace-only) and read XLA's flop
    # count for it
    peak_fl, peak_bw = _peaks()
    try:
        import jax.numpy as jnp
        c = n_upd
        keys_arr = jnp.zeros((c, 2), jnp.uint32)
        hyp = {n: jnp.zeros((c,), jnp.float32)
               for n in ("clip_ratio", "entropy", "adv_scale")}
        lrs = {g: jnp.zeros((c,), jnp.float32)
               for g in ("policy", "value", "dynamics")}
        fn = agent._train_chunk_fns[c]
        fl, by = _cost(fn.lower(agent.params, agent.stats, agent.opt_state,
                                env_states, keys_arr, hyp, lrs,
                                agent.env.consts))
        src = "xla"
        # the closed-form MAC walk (utils/flops.py, pinned against XLA's
        # CPU analysis by tests/test_flops.py).  Two failure modes make it
        # the arbiter: the axon backend returns 0.0 from the pre-opt
        # analysis, and the COMPILED analysis counts while/scan bodies
        # ONCE (measured 0.371 TFLOP vs ~266 analytic for the 3-update
        # chunk — the rollout/minibatch scans hide ~99.9% of the FLOPs).
        # Use whichever is larger so train_mfu always emits and never
        # reflects a loop-body undercount (VERDICT r4 item 3).
        from carla_driving_rl_agent_tpu.utils.flops import train_chunk_flops
        fl_an = train_chunk_flops(
            c, steps, num_envs,
            opt_steps=tuple(agent.config.optimization_steps),
            fused_update=bool(agent.config.fused_update),
            two_step=bool(agent.config.two_step_update
                          or agent.config.two_step_split_adam))
        if fl_an > fl:
            fl, src = fl_an, "analytic"
        _mark(f"train cost analysis ({src}): {fl / 1e12:.3f} TFLOP, "
              f"{by / 1e9:.2f} GB per {c}-update chunk")
        if fl and peak_fl:
            out["train_mfu"] = round(fl / dt / peak_fl, 5)
            out["train_mfu_source"] = src
        if by and peak_bw:
            out["train_hbm_util_est"] = round(by / dt / peak_bw, 4)
    except Exception as e:
        _mark(f"train cost analysis failed: {type(e).__name__}: {e}")
    return out


if __name__ == "__main__":
    main()
