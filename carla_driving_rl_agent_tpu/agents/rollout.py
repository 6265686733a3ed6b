"""Rollout machinery: fixed-shape on-device trajectory collection.

TPU-native replacement for the reference's append-based PPOMemory
(`rl/agents/ppo.py:629-754`, which tf.concat-appends every step — O(n^2) —
and its CARLAMemory time-axis variant `core/carla_agent.py:586-597`):
here a `lax.scan` writes into fixed-shape arrays.

Image frames are deduplicated: the observation stack only changes every
`past_obs_freq` steps, so the buffer stores each rendered frame ONCE plus
per-step stack indices; minibatch assembly gathers the 4 frames per sample.
This cuts rollout image memory by ~time_horizon x.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from carla_driving_rl_agent_tpu.envs.carla_env import CARLAEnv, EnvState, convert_action


class Trajectory(NamedTuple):
    """Per-step rollout records, shapes (S, B, ...)."""
    road: jax.Array          # (S, B, T, 9)
    vehicle: jax.Array       # (S, B, T, 4)
    navigation: jax.Array    # (S, B, T, N)
    stack_ids: jax.Array     # (S, B, T) frame ids (-T..S)
    frames: jax.Array        # (S, B, C, SH, SW) uint8 planar — frame rendered at step s
    init_stack: jax.Array    # (T, B, C, SH, SW) uint8 planar — stack at rollout start
    action: jax.Array        # (S, B, A) raw Beta samples in [0,1]
    log_prob: jax.Array      # (S, B, A)
    value: jax.Array         # (S, B, 2) (base, exp)
    reward: jax.Array        # (S, B)
    terminated: jax.Array    # (S, B)
    truncated: jax.Array     # (S, B)
    speed: jax.Array         # (S, B) km/h (aux target, env info)
    similarity: jax.Array    # (S, B) (aux target, env info)
    # 1.0 where the sub-step's recorded obs predate a mid-block auto-reset
    # (block rollout only; all-zero for the per-step path).  These <=block-1
    # transitions per episode boundary pair the PRE-reset episode's obs with
    # the POST-reset episode's rewards; the trainer zeroes their advantage
    # (CARLAgentConfig.mask_post_reset) so they contribute no policy
    # gradient.
    post_reset: jax.Array = None  # (S, B)


def run_rollout(env: CARLAEnv, predict_fn: Callable, env_states: EnvState,
                key: jax.Array, num_steps: int, repeat_action: int = 1,
                expert_fn: Callable = None):
    """Collect `num_steps` lock-step transitions from all worlds.

    predict_fn(obs_prefixed, key) -> dict(action, log_prob, value, ...), the
    inference path of the network (old policy — reference
    `core/networks.py:181-193`).
    Returns (new_env_states, Trajectory, final_obs).

    With `expert_fn` (device-resident imitation: the TPU-native replacement
    for the reference's collect-to-npz-then-imitate round trip,
    `core/learning.py:196-227`), actions come from the privileged expert —
    expert_fn(env_states) -> (B, 2) env actions in [-1, 1] — and predict_fn
    takes (obs_prefixed, action01) and returns the OLD policy's log_prob of
    that action plus the value head outputs.  The Trajectory is
    shape/semantics-identical, so the whole fused update path consumes it
    unchanged (PPO-on-expert-actions, the reference's `imitate`
    `rl/agents/ppo.py:415-462` with real value baselines instead of zeros).
    """
    time_h = env.config.time_horizon

    # snapshot the image stacks (normalized to the ordered masked view —
    # the env's circular buffer may hold stale bytes behind sentinel ids)
    # and relabel their slots -T..-1 so stored stack indices are
    # rollout-local.  Writing the ordered view back into env_states resets
    # the circular slot to T-1, which also restores the sentinel->zero
    # byte invariant the relabeled ids would otherwise erase.
    from carla_driving_rl_agent_tpu.envs.carla_env import (
        newest_frame, ordered_image_stack)
    ordered = ordered_image_stack(env_states.image_stack,
                                  env_states.stack_ids,
                                  env_states.stack_slot)
    init_stack = jnp.swapaxes(ordered, 0, 1)                 # (T, B, C, SH, SW)
    batch = init_stack.shape[1]
    start_ids = jnp.tile(jnp.arange(-time_h, 0, dtype=jnp.int32)[None], (batch, 1))
    env_states = env_states._replace(
        image_stack=ordered, stack_ids=start_ids,
        stack_slot=jnp.full((batch,), time_h - 1, jnp.int32))

    def step_fn(carry, step_idx):
        states, key = carry
        key, k_act = jax.random.split(key)
        obs = env.observe(states)
        net_in = {f"state_{k}": v for k, v in obs.items()}
        net_in["action"] = states.last_action
        if expert_fn is None:
            pred = predict_fn(net_in, k_act)
            action01 = pred["action"]
        else:
            action01 = (expert_fn(states) + 1.0) / 2.0
            pred = predict_fn(net_in, action01)
        action_env = convert_action(action01)

        def do_step(s):
            return env.step_batch(s, action_env,
                                  jnp.full((batch,), step_idx, jnp.int32))

        new_states, _, reward, term, trunc, info = do_step(states)
        if repeat_action > 1:
            for _ in range(repeat_action - 1):
                # further repeats are skipped for already-done worlds
                ns2, _, r2, t2, tr2, info2 = do_step(new_states)
                done = term | trunc
                new_states = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(done.reshape((-1,) + (1,) * (a.ndim - 1)), a, b),
                    new_states, ns2)
                reward = jnp.where(done, reward, reward + r2)
                term, trunc = term | t2, trunc | tr2
                info = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(done, a, b), info, info2)

        new_states = new_states._replace(last_action=action01)
        record = dict(
            road=obs["road"], vehicle=obs["vehicle"], navigation=obs["navigation"],
            stack_ids=states.stack_ids,
            frames=newest_frame(new_states.image_stack, new_states.stack_slot),
            action=action01, log_prob=pred["log_prob"], value=pred["value"],
            reward=reward, terminated=term.astype(jnp.float32),
            truncated=trunc.astype(jnp.float32),
            speed=info["speed"], similarity=info["similarity"],
            post_reset=jnp.zeros_like(reward),
        )
        return (new_states, key), record

    (env_states, _), records = jax.lax.scan(
        step_fn, (env_states, key), jnp.arange(num_steps))

    traj = Trajectory(init_stack=init_stack, **records)
    final_obs = env.observe(env_states)
    return env_states, traj, final_obs


def run_rollout_blocks(env: CARLAEnv, predict_fn: Callable,
                       env_states: EnvState, key: jax.Array, num_steps: int,
                       block_size: int = None):
    """Block-structured rollout: ONE network forward pass and ONE rendered
    frame per `block_size` consecutive steps.

    Exactness: the policy input (the past-obs stack) is constant between
    frame pushes (reference core/carla_env.py:290-299 refreshes it every
    past_obs_freq steps; the per-step `action` input is never wired into the
    reference's dynamics graph, core/networks.py:38-56), so sampling
    block_size iid actions from one forward pass matches the reference's
    per-step predicts in distribution.  Deviations (documented in
    CARLAEnv.step_physics): block-aligned push phase; worlds auto-reset
    mid-block see zero stacks until the block boundary.

    predict_fn(net_in, key, num_samples) must return action/log_prob with a
    leading (num_samples,) axis.  Returns (new_env_states, Trajectory,
    final_obs) with the same (S, B) per-step record shapes as run_rollout;
    Trajectory.frames has one entry per BLOCK (ids stay consistent because
    stack_ids index into init_stack ++ frames).

    Sub-steps following a mid-block auto-reset record the PRE-reset
    episode's stack_ids/obs together with the POST-reset episode's
    rewards/term flags — an obs/reward mismatch bounded to <=(block-1)
    transitions per episode boundary (<0.6% at block=4, 512-step episodes).
    These sub-steps are flagged in Trajectory.post_reset and the trainer
    zeroes their advantage (CARLAgentConfig.mask_post_reset, default on),
    so they contribute value/aux signal on real (if stale) observations but
    no policy gradient.
    """
    block = block_size or env.config.past_obs_freq
    assert num_steps % block == 0, (num_steps, block)
    num_blocks = num_steps // block
    time_h = env.config.time_horizon

    from carla_driving_rl_agent_tpu.envs.carla_env import (
        newest_frame, ordered_image_stack)
    # normalize the circular stacks to the ordered masked view (see
    # run_rollout) before relabeling ids to the rollout-local -T..-1 range
    ordered = ordered_image_stack(env_states.image_stack,
                                  env_states.stack_ids,
                                  env_states.stack_slot)
    init_stack = jnp.swapaxes(ordered, 0, 1)                 # (T, B, C, SH, SW)
    batch = init_stack.shape[1]
    start_ids = jnp.tile(jnp.arange(-time_h, 0, dtype=jnp.int32)[None], (batch, 1))
    env_states = env_states._replace(
        image_stack=ordered, stack_ids=start_ids,
        stack_slot=jnp.full((batch,), time_h - 1, jnp.int32))

    def block_fn(carry, block_idx):
        states, key = carry
        obs_ids = states.stack_ids          # ids of the stacks observed below
        key, k_act = jax.random.split(key)
        obs = env.observe(states)
        net_in = {f"state_{k}": v for k, v in obs.items()}
        net_in["action"] = states.last_action
        pred = predict_fn(net_in, k_act, block)      # action: (block, B, A)

        def sub_step(inner, i):
            states, was_reset = inner
            action01 = pred["action"][i]
            # a sub-step is obs/reward-mismatched iff a reset happened at an
            # EARLIER sub-step of this block (the reset step itself observed
            # the world that produced its reward) — flag the entry state
            post_reset = was_reset.astype(jnp.float32)
            states, reward, term, trunc, info, did_reset = \
                env.step_physics_batch(states, convert_action(action01))
            states = states._replace(last_action=action01)
            rec = dict(action=action01, log_prob=pred["log_prob"][i],
                       reward=reward, terminated=term.astype(jnp.float32),
                       truncated=trunc.astype(jnp.float32),
                       speed=info["speed"], similarity=info["similarity"],
                       post_reset=post_reset)
            return (states, was_reset | did_reset), rec

        (states, was_reset), sub = jax.lax.scan(
            sub_step, (states, jnp.zeros((batch,), bool)), jnp.arange(block),
            unroll=env.config.phys_unroll)

        states = env.push_block_frame_batch(
            states, was_reset, jnp.full((batch,), block_idx, jnp.int32))

        # per-sub-step records; block-constant fields broadcast over `block`
        rep = lambda x: jnp.broadcast_to(x[None], (block,) + x.shape)
        record = dict(road=rep(obs["road"]), vehicle=rep(obs["vehicle"]),
                      navigation=rep(obs["navigation"]),
                      stack_ids=rep(obs_ids),
                      frames=newest_frame(states.image_stack, states.stack_slot),
                      value=rep(pred["value"]), **sub)
        return (states, key), record

    (env_states, _), records = jax.lax.scan(
        block_fn, (env_states, key), jnp.arange(num_blocks),
        unroll=env.config.block_unroll)

    # (num_blocks, block, B, ...) -> (S, B, ...) for per-step fields;
    # frames stays (num_blocks, B, ...)
    frames = records.pop("frames")

    def merge(x):
        return x.reshape((num_blocks * block,) + x.shape[2:])

    records = {k: merge(v) for k, v in records.items()}
    traj = Trajectory(init_stack=init_stack, frames=frames, **records)
    final_obs = env.observe(env_states)
    return env_states, traj, final_obs


def gather_image_stacks(traj: Trajectory, sample_step: jax.Array,
                        sample_env: jax.Array) -> jax.Array:
    """Reassemble (mb, T, C, SH, SW) planar image stacks for the given flat
    samples (storage form; envs.carla_env.planes_to_image reconstructs the
    network's (mb, T, H, 3W, C) input).

    frames timeline: ids -T..-1 live in init_stack, 0..S-1 in frames; ids
    < -T are the zero-frame sentinel of episodes freshly reset mid-rollout
    (their stack slots hold the default zero observation).
    """
    time_h = traj.init_stack.shape[0]
    all_frames = jnp.concatenate([traj.init_stack, traj.frames], axis=0)  # (T+S, B, ...)
    ids = traj.stack_ids[sample_step, sample_env]          # (mb, T)
    is_zero = ids < -time_h
    idx = jnp.clip(ids + time_h, 0, all_frames.shape[0] - 1)
    frames = all_frames[idx, sample_env[:, None]]          # (mb, T, C, SH, SW)
    return jnp.where(is_zero[..., None, None, None], jnp.zeros_like(frames), frames)
