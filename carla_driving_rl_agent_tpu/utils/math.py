"""Core RL math, rebuilt as vectorizable JAX ops.

Reference parity (formulas, not code):
  - discount_cumsum / gae / rewards_to_go : reference `rl/utils.py:57-84`
    (there: scipy.signal.lfilter on host; here: O(log n) associative scan on TPU)
  - decompose_number                      : reference `rl/utils.py:140-151`
    (there: a python while-loop per scalar; here: closed-form, vectorized)
  - sp_norm (sign-preserving max-norm)    : reference `rl/utils.py:344-349`
  - kl_divergence                         : reference `rl/utils.py:459-464`
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = 1e-7  # reference rl/utils.py uses np.finfo(np.float32).eps-scale clip bound


def discount_cumsum(x: jax.Array, discount: float | jax.Array) -> jax.Array:
    """Reverse discounted cumulative sum along axis 0.

    y[t] = x[t] + discount * y[t+1]

    Implemented with `jax.lax.associative_scan` (depth O(log n)), which maps
    far better onto the TPU VPU than a sequential scan.  Matches
    `scipy.signal.lfilter([1], [1, -discount], x[::-1])[::-1]`
    (reference `rl/utils.py:57-59`).
    """
    x = jnp.asarray(x, dtype=jnp.float32)

    def combine(a, b):
        # elements are affine maps y -> d*y + v composed left-to-right:
        # a = earlier prefix, b = later element; (b ∘ a)(y) = db*(da*y+va)+vb
        va, da = a
        vb, db = b
        return vb + db * va, da * db

    d = jnp.full_like(x, discount)
    rev = jnp.flip(x, axis=0)
    out, _ = jax.lax.associative_scan(combine, (rev, jnp.flip(d, axis=0)), axis=0)
    return jnp.flip(out, axis=0)


def rewards_to_go(rewards: jax.Array, discount: float) -> jax.Array:
    """Discounted returns, dropping the bootstrap element.

    The reference appends the bootstrap value to `rewards` before calling
    this, then drops the last element (reference `rl/utils.py:75-84`,
    `rl/agents/ppo.py:692-712`).
    """
    return discount_cumsum(rewards, discount)[:-1]


def gae(rewards: jax.Array, values: jax.Array, gamma: float, lambda_: float,
        normalize: bool = False) -> jax.Array:
    """Generalized Advantage Estimation over a single trajectory.

    `rewards` has length T+1 (bootstrap appended), `values` length T+1.
    Matches reference `rl/utils.py:62-72`.
    """
    deltas = rewards[:-1] + gamma * values[1:] - values[:-1]
    if lambda_ == 0.0:
        advantages = deltas
    else:
        advantages = discount_cumsum(deltas, gamma * lambda_)
    if normalize:
        advantages = normalize_tensor(advantages)
    return advantages


def batched_gae(rewards: jax.Array, values: jax.Array, dones: jax.Array,
                bootstrap_value: jax.Array,
                gamma: float | jax.Array, lambda_: float | jax.Array) -> tuple[jax.Array, jax.Array]:
    """Masked GAE + lambda-returns for fixed-length vmapped rollouts.

    TPU-native generalization of the reference's per-episode GAE
    (`rl/agents/ppo.py:714-727`): many worlds run in lock-step and episodes
    end mid-rollout (auto-reset), so bootstrapping is masked per step:

      delta_t = r_t + gamma * (1 - done_t) * V_{t+1} - V_t
      A_t     = delta_t + gamma * lambda * (1 - done_t) * A_{t+1}

    Truncated (not terminated) episodes should have gamma * V(s_final) folded
    into r_t by the caller before this is invoked — the scan then treats every
    episode boundary uniformly.

    Args:
      rewards, dones: (T, B)
      values: (T, B) value estimates for each rollout state
      bootstrap_value: (B,) value of the state after the last step
    Returns:
      (advantages, returns), both (T, B); returns = advantages + values
      (the lambda-return target used for the value loss).
    """
    rewards = jnp.asarray(rewards, jnp.float32)
    values = jnp.asarray(values, jnp.float32)
    done = jnp.asarray(dones, jnp.float32)

    next_values = jnp.concatenate([values[1:], bootstrap_value[None]], axis=0)
    deltas = rewards + gamma * next_values * (1.0 - done) - values

    def step(carry, xs):
        delta, d = xs
        adv = delta + gamma * lambda_ * (1.0 - d) * carry
        return adv, adv

    _, advantages = jax.lax.scan(step, jnp.zeros_like(deltas[0]), (deltas, done), reverse=True)
    returns = advantages + values
    return advantages, returns


def normalize_tensor(x: jax.Array, eps: float = EPSILON) -> jax.Array:
    """0-mean 1-std normalization (reference `rl/utils.py:338-341`)."""
    x = jnp.asarray(x, jnp.float32)
    return (x - jnp.mean(x)) / (jnp.std(x) + eps)


def sp_norm(x: jax.Array, eps: float = 1e-3) -> jax.Array:
    """Sign-preserving max-normalization (reference `tf_sp_norm`,
    `rl/utils.py:344-349`): positives are divided by max(x)+eps, negatives by
    -(min(x)-eps), so the result lies in (-1, 1) with zero fixed.
    """
    x = jnp.asarray(x, jnp.float32)
    positives = x * (x > 0.0)
    negatives = x * (x < 0.0)
    return positives / (jnp.max(x) + eps) + negatives / -(jnp.min(x) - eps)


def decompose_number(num: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Scientific-like decomposition n = base * 10^exp with |base| <= 1.

    Vectorized closed form of the reference's per-scalar while-loop
    (`rl/utils.py:140-151`): exponent = #divisions by 10 until |n| <= 1,
    i.e. exp = max(0, ceil(log10(|n|))).
    """
    num = jnp.asarray(num, jnp.float32)
    mag = jnp.abs(num)
    # guard log10(0); where mag <= 1 the exponent is 0 anyway
    safe = jnp.maximum(mag, 1e-30)
    exp = jnp.where(mag > 1.0, jnp.ceil(jnp.log10(safe)), 0.0)
    # float fuzz: log10(1000.) can be 2.9999997 -> ceil 3 (fine) but log10(10.)
    # returning 1.0000001 -> ceil 2 would be wrong; snap near-integers down.
    exp_floor = jnp.floor(jnp.log10(safe))
    near_int = jnp.abs(jnp.log10(safe) - jnp.round(jnp.log10(safe))) < 1e-6
    exp = jnp.where(mag > 1.0, jnp.where(near_int, jnp.round(jnp.log10(safe)), exp), 0.0)
    del exp_floor
    base = num / jnp.power(10.0, exp)
    return base.astype(jnp.float32), exp.astype(jnp.float32)


def compose_number(base: jax.Array, exp: jax.Array) -> jax.Array:
    """Inverse of :func:`decompose_number`: n = base * 10^exp
    (reference `rl/agents/ppo.py:694,717`)."""
    return base * jnp.power(10.0, exp)


def kl_divergence(log_a: jax.Array, log_b: jax.Array) -> jax.Array:
    """Pointwise KL surrogate used by the reference (`rl/utils.py:459-464`)."""
    return log_a * (log_a - log_b)


def clip_by_norm(x: jax.Array, norm: float) -> jax.Array:
    """Per-tensor norm clipping, like tf.clip_by_norm
    (used via `rl/utils.py:120-121`)."""
    n = jnp.linalg.norm(x.astype(jnp.float32))
    scale = jnp.minimum(1.0, norm / jnp.maximum(n, 1e-12))
    return x * scale


def clip_gradients(grads, norm: float):
    """Clip every leaf tensor to `norm` (reference `rl/utils.py:120-121`
    clips each gradient tensor independently, NOT the global norm).

    Non-finite entries are scrubbed to 0 first: degenerate batches (e.g. a
    constant image stream through 16 BatchNorm layers) can overflow the
    backward pass, and inf * 0 clipping would otherwise poison the params —
    the moral equivalent of the reference's NaN scrubbing of observations
    (`env_utils.py:433-439`), applied at the gradient boundary.
    """
    def clean(g):
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        return clip_by_norm(g, norm)

    return jax.tree_util.tree_map(clean, grads)


def polyak_average(new_params, old_params, alpha: float):
    """w = alpha * w_new + (1 - alpha) * w_old (reference `rl/utils.py:105-117`,
    note the RL-flavoured convention documented there)."""
    return jax.tree_util.tree_map(lambda n, o: alpha * n + (1.0 - alpha) * o,
                                  new_params, old_params)


def cosine_similarity(a: jax.Array, b: jax.Array, axis: int = -1,
                      eps: float = 1e-8) -> jax.Array:
    """cos(a, b) (reference `rl/environments/carla/tools/utils.py:30-67`)."""
    na = jnp.linalg.norm(a, axis=axis)
    nb = jnp.linalg.norm(b, axis=axis)
    return jnp.sum(a * b, axis=axis) / jnp.maximum(na * nb, eps)
