"""Piece-wise timing of the fused train update at the bench geometry
(32 worlds x 512 steps, batch 64) — finds where the 56 ms/minibatch goes.

Each part is its own jitted program scanning n_minibatches iterations with
a donated carry and ONE probe fetch at the end (axon methodology: per-call
scalar fetches cost ~25 ms each and device streams are in-order).

Parts (cumulative pipeline prefixes):
  rollout     run_rollout alone (512 steps, 32 worlds, pallas render)
  gather      minibatch scan: data-dict gather + image-stack gather +
              planes_to_image upsample to the (64,4,90,360,3) input
  fwd         + dynamics_apply forward (training=True)
  fwdbwd      + backward through the backbone (grad wrt dynamics params)
  heads       + policy/value head objectives fwd+bwd (full loss graph,
              no optimizer) — difference vs fwdbwd = head cost
  full        reference point: agent.learn(1 update) wall time

Usage: python scripts/bench_train_parts.py [--dtype bfloat16] [--batch 64]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mark(msg):
    print(f"[parts {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2,
                    help="timed repetitions of each part's full scan")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from carla_driving_rl_agent_tpu.agents import rollout as rollout_mod
    from carla_driving_rl_agent_tpu.agents.carla_agent import (
        CARLAgent, CARLAgentConfig)
    from carla_driving_rl_agent_tpu.envs.carla_env import (
        CARLAEnv, CARLAEnvConfig, planes_to_image)
    from carla_driving_rl_agent_tpu.envs.world import WorldParams

    num_envs, steps = 32, 512
    env = CARLAEnv(CARLAEnvConfig(
        world=WorldParams(town_names=("Town03",), num_routes=64,
                          max_route_len=512, max_timesteps=512,
                          num_vehicles=0, num_pedestrians=0, v_max=1, p_max=1),
        image_height=90, image_width=120, render_mode="pallas",
        time_horizon=4, past_obs_freq=4))
    agent = CARLAgent(env, CARLAgentConfig(
        num_envs=num_envs, rollout_steps=steps, batch_size=args.batch,
        seed=0, fused_update=True, compute_dtype=args.dtype), log_mode=None)
    consts = env.consts
    net = agent.network
    S, B = steps, num_envs
    n_mb = (S * B) // args.batch

    # ---- one real rollout to get a trajectory (also times the rollout) ----
    def do_rollout(states, key, consts):
        with env.bind(consts):
            return rollout_mod.run_rollout(
                env, agent._predict_fn(agent.params, agent.stats),
                states, key, steps)

    states = jax.jit(
        lambda k, c: _reset(env, k, c, B))(jax.random.PRNGKey(0), consts)

    roll = jax.jit(do_rollout)
    t0 = time.perf_counter()
    new_states, traj, key_out = roll(states, jax.random.PRNGKey(1), consts)
    jax.block_until_ready(jax.tree_util.tree_leaves(traj)[0])
    float(jnp.sum(traj.reward))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.reps):
        _, traj, _ = roll(states, jax.random.PRNGKey(2), consts)
    float(jnp.sum(traj.reward))
    rollout_s = (time.perf_counter() - t0) / args.reps
    _mark(f"rollout: {rollout_s*1e3:.1f} ms (compile+first {compile_s:.1f}s)")

    # ---- shared minibatch scaffolding (mirrors carla_agent.update) ----
    # NOTE: traj/params/stats are passed as ARGUMENTS to every jitted
    # program — closure constants serialize into the remote compile request
    # (HTTP 413) and compile ~30x slower over the tunnel (CLAUDE.md).
    ry, rx = env.config.upsample

    def gather_obs(traj, perm, mb_idx):
        S_, B_ = traj.reward.shape
        flat_step = jnp.repeat(jnp.arange(S_), B_)
        flat_env = jnp.tile(jnp.arange(B_), S_)
        idx = jax.lax.dynamic_slice_in_dim(perm, mb_idx * args.batch,
                                           args.batch)

        def flat(x):
            return x.reshape((S_ * B_,) + x.shape[2:])

        mb = dict(road=flat(traj.road)[idx], vehicle=flat(traj.vehicle)[idx],
                  navigation=flat(traj.navigation)[idx],
                  action=flat(traj.action)[idx],
                  speed=flat(traj.speed)[idx] / 100.0,
                  similarity=flat(traj.similarity)[idx])
        img = rollout_mod.gather_image_stacks(traj, flat_step[idx],
                                              flat_env[idx])
        img = planes_to_image(img, ry, rx).astype(jnp.float32) / 255.0
        obs = dict(state_image=img, state_road=mb["road"],
                   state_vehicle=mb["vehicle"],
                   state_navigation=mb["navigation"], action=mb["action"])
        return obs, mb

    def timed_scan(name, body):
        """body(carry_scalar, traj, params, stats, perm, mb_idx) -> scalar;
        scans n_mb steps inside one jitted program."""
        def prog(seed, traj, params, stats, perm):
            def step(c, i):
                return body(c, traj, params, stats, perm, i), ()
            c, _ = jax.lax.scan(step, seed * 0.0, jnp.arange(n_mb))
            return c
        f = jax.jit(prog)
        perm = jax.random.permutation(jax.random.PRNGKey(3), S * B)
        float(f(jnp.float32(0.0), traj, agent.params, agent.stats, perm))
        t0 = time.perf_counter()
        for r in range(args.reps):
            out = f(jnp.float32(r), traj, agent.params, agent.stats, perm)
        float(out)
        dt = (time.perf_counter() - t0) / args.reps
        _mark(f"{name}: {dt*1e3:.1f} ms total, {dt/n_mb*1e3:.2f} ms/minibatch")
        return dt

    results = dict(rollout_ms=round(rollout_s * 1e3, 1), n_minibatches=n_mb)

    def gather_body(c, traj, params, stats, perm, i):
        obs, mb = gather_obs(traj, perm, i)
        return c + jnp.sum(obs["state_image"][0, 0, 0, :8, 0]) + mb["speed"][0]

    results["gather_ms"] = round(timed_scan("gather", gather_body) * 1e3, 1)

    def fwd_body(c, traj, params, stats, perm, i):
        obs, mb = gather_obs(traj, perm, i)
        feat, _ = net.dynamics_apply(params, stats, obs, training=True)
        return c + jnp.sum(feat[0].astype(jnp.float32))

    results["fwd_ms"] = round(timed_scan("fwd", fwd_body) * 1e3, 1)

    def _consume(c, g):
        """Fold EVERY gradient leaf into the carry — a single-leaf probe
        lets XLA dead-code-eliminate most of the backward pass."""
        return c + sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(g))

    def fwdbwd_body(c, traj, params, stats, perm, i):
        obs, mb = gather_obs(traj, perm, i)

        def loss(p):
            feat, _ = net.dynamics_apply(dict(params, dynamics=p), stats,
                                         obs, training=True)
            return jnp.sum(jnp.square(feat.astype(jnp.float32)))

        g = jax.grad(loss)(params["dynamics"])
        return _consume(c, g)

    results["fwdbwd_ms"] = round(timed_scan("fwdbwd", fwdbwd_body) * 1e3, 1)

    hyper = agent._hyper()

    def joint_body(c, traj, params, stats, perm, i):
        obs, mb = gather_obs(traj, perm, i)
        batch = dict(obs=obs, action=mb["action"],
                     log_prob=jnp.zeros((args.batch, 2)),
                     advantages=jnp.ones((args.batch,)),
                     returns=jnp.zeros((args.batch, 2)),
                     speed=mb["speed"], similarity=mb["similarity"])

        def loss_fn(pvd):
            feat, d_stats = net.dynamics_apply(pvd, stats, obs, training=True)
            p_total, _ = agent._policy_objective(pvd, stats, feat, batch,
                                                 hyper, jax.random.PRNGKey(0))
            v_total, _ = agent._value_objective(pvd, stats, feat, batch)
            return p_total + v_total

        g = jax.grad(loss_fn)(dict(policy=params["policy"],
                                   value=params["value"],
                                   dynamics=params["dynamics"]))
        return _consume(c, g)

    results["joint_ms"] = round(timed_scan("joint", joint_body) * 1e3, 1)

    # ---- the full fused minibatch body incl. optimizer applies + carry ----
    import optax
    from carla_driving_rl_agent_tpu.utils import math as um
    cfg = agent.config

    def optstep_prog(traj, params, stats, opt_state, perm):
        def step(carry, i):
            params, stats, opt_state = carry
            obs, mb = gather_obs(traj, perm, i)
            batch = dict(obs=obs, action=mb["action"],
                         log_prob=jnp.zeros((args.batch, 2)),
                         advantages=jnp.ones((args.batch,)),
                         returns=jnp.zeros((args.batch, 2)),
                         speed=mb["speed"], similarity=mb["similarity"])

            def loss_fn(pvd):
                feat, d_stats = net.dynamics_apply(pvd, stats, obs,
                                                   training=True)
                p_total, p_aux = agent._policy_objective(
                    pvd, stats, feat, batch, hyper, jax.random.PRNGKey(0))
                v_total, v_aux = agent._value_objective(pvd, stats, feat,
                                                        batch)
                return p_total + v_total, dict(p_aux, **v_aux,
                                               d_stats=d_stats)

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(dict(policy=params["policy"],
                                            value=params["value"],
                                            dynamics=params["dynamics"]))
            g_pol = um.clip_gradients(grads["policy"], cfg.clip_norm[0])
            g_val = um.clip_gradients(grads["value"], cfg.clip_norm[1])
            g_dyn = um.clip_gradients(grads["dynamics"], cfg.clip_norm[2])
            new_params = dict(params, old_policy=params["policy"])
            up, opt_p = agent.policy_opt.update(g_pol, opt_state["policy"],
                                                params["policy"])
            new_params["policy"] = optax.apply_updates(params["policy"], up)
            uv, opt_v = agent.value_opt.update(g_val, opt_state["value"],
                                               params["value"])
            new_params["value"] = optax.apply_updates(params["value"], uv)
            ud, opt_d = agent.dynamics_opt.update(g_dyn,
                                                  opt_state["dynamics"],
                                                  params["dynamics"])
            new_params["dynamics"] = optax.apply_updates(params["dynamics"],
                                                         ud)
            new_stats = dict(stats, dynamics=aux["d_stats"],
                             policy=aux["p_stats"], value=aux["v_stats"])
            return (new_params, new_stats,
                    dict(policy=opt_p, value=opt_v, dynamics=opt_d)), loss

        (params, stats, opt_state), losses = jax.lax.scan(
            step, (params, stats, opt_state), jnp.arange(n_mb))
        return jnp.sum(losses) + jax.tree_util.tree_leaves(
            params["dynamics"])[0].astype(jnp.float32).ravel()[0]

    f = jax.jit(optstep_prog)
    perm = jax.random.permutation(jax.random.PRNGKey(3), S * B)
    float(f(traj, agent.params, agent.stats, agent.opt_state, perm))
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = f(traj, agent.params, agent.stats, agent.opt_state, perm)
    float(out)
    dt = (time.perf_counter() - t0) / args.reps
    _mark(f"optstep: {dt*1e3:.1f} ms total, {dt/n_mb*1e3:.2f} ms/minibatch")
    results["optstep_ms"] = round(dt * 1e3, 1)

    print(json.dumps(results), flush=True)


def _reset(env, key, consts, B):
    with env.bind(consts):
        states, _ = env.reset_batch(key, B)
        return states


if __name__ == "__main__":
    main()
