"""Activation functions (reference `rl/utils.py:411-456`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swish6(x: jax.Array) -> jax.Array:
    """min(swish(x), 6) — the control-branch activation
    (reference `rl/utils.py:420-421`, used by `core/carla_agent.py:61-62`)."""
    return jnp.minimum(jax.nn.swish(x), 6.0)


def relu6(x: jax.Array) -> jax.Array:
    return jnp.clip(x, 0.0, 6.0)


def leaky_relu6(x: jax.Array, leak: float = 0.0) -> jax.Array:
    """ReLU(max_value=6, negative_slope=leak) as used in the ShuffleNet blocks
    (reference `core/architectures.py:46-48`)."""
    return jnp.minimum(jnp.where(x >= 0.0, x, leak * x), 6.0)


def dsilu(x: jax.Array) -> jax.Array:
    """Derivative of SiLU (reference `rl/utils.py:424-429`)."""
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def lisht(x: jax.Array) -> jax.Array:
    """x * tanh(x) (reference `rl/utils.py:440-447`)."""
    return x * jnp.tanh(x)


def mish(x: jax.Array) -> jax.Array:
    """x * tanh(softplus(x)) (reference `rl/utils.py:450-456`)."""
    return x * jnp.tanh(jax.nn.softplus(x))


def softplus(value: float = 1.0):
    """softplus(x) + value — used for the Beta distribution's (alpha, beta)
    heads with value = 1 + 1e-2 so both concentrations stay > 1 and the
    distribution is unimodal (reference `rl/utils.py:411-416`,
    `core/networks.py:128-137`)."""

    def activation(x: jax.Array) -> jax.Array:
        return jax.nn.softplus(x) + value

    return activation


ACTIVATIONS = dict(
    swish6=swish6,
    relu6=relu6,
    relu=jax.nn.relu,
    tanh=jnp.tanh,
    sigmoid=jax.nn.sigmoid,
    swish=jax.nn.swish,
    silu=jax.nn.silu,
    dsilu=dsilu,
    lisht=lisht,
    mish=mish,
    linear=lambda x: x,
)


def get_activation(name_or_fn):
    if callable(name_or_fn):
        return name_or_fn
    try:
        return ACTIVATIONS[name_or_fn]
    except KeyError:
        raise ValueError(f"Unknown activation {name_or_fn!r}; one of {sorted(ACTIVATIONS)}")
