"""Round-6 halo/punit fault probe (CLAUDE.md kickoff item 2).

Round-5 status: every standalone rung passes on-chip (single kernels, the
full 13-unit backbone fwd/bwd, 3-iteration lax.scan, n=64 and n=256 —
logs/r5-punit-backbone.log), but the REAL train program crashed the worker
with halo stages enabled, and a tiny learn() repro was still COMPILING at
25 min when its own too-short timeout killed it (rc=124, which then wedged
the worker).  Leading theory: the full train program's compile with the
fused kernels is pathologically long, and the round-5 A/B "worker crash"
was a compiler-side resource blowup, not an execution fault.

This probe re-runs the tiny learn() — 4 envs, REAL 90x360 obs (the halo
backbone shapes), fused_units=True — and must be given a >=75 MIN outer
timeout: killing a TPU client mid-compile wedges the worker for 20-70 min
(round-4 escalation note).  Outcomes:
  * completes -> record the compile time; the fault is compile-cost, try
    caching the compile before any future A/B.
  * crashes the worker -> in-program fault confirmed beyond compile cost.
"""

import time

import jax


def mark(m):
    print(f"[tiny-learn {time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    from carla_driving_rl_agent_tpu.agents.carla_agent import (
        CARLAgent, CARLAgentConfig)
    from carla_driving_rl_agent_tpu.envs.carla_env import (
        CARLAEnv, CARLAEnvConfig)
    from carla_driving_rl_agent_tpu.envs.world import WorldParams

    mark(f"backend={jax.default_backend()}")
    env = CARLAEnv(CARLAEnvConfig(
        world=WorldParams(town_names=("Town03",), num_routes=64,
                          max_route_len=512, max_timesteps=512,
                          num_vehicles=0, num_pedestrians=0, v_max=1, p_max=1),
        image_height=90, image_width=120, render_mode="pallas",
        time_horizon=4, past_obs_freq=4))
    mark("env built (REAL 90x360 obs -> halo backbone shapes)")
    agent = CARLAgent(env, CARLAgentConfig(
        num_envs=4, rollout_steps=32, batch_size=16, seed=0,
        fused_units=True), log_mode=None)
    mark("agent built; learn(1) compiling (expect LONG - possibly >40 min)")
    t0 = time.time()
    agent.learn(num_updates=1)
    mark(f"learn(1) DONE in {time.time() - t0:.1f}s - compile completed; "
         "the r5 A/B crash was most likely compile-resource, not execution")


if __name__ == "__main__":
    main()
