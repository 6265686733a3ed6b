"""Optimizer registry (reference `rl/utils.py:29-46`).

All eight optimizers the reference exposes are available, built on optax.
Each is wrapped in `optax.inject_hyperparams` so the learning rate is a leaf
of the optimizer state: DynamicParameter schedules update it from the host
every update without retracing the jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _ftrl(learning_rate: float = 1e-3, learning_rate_power: float = -0.5,
          initial_accumulator_value: float = 0.1,
          l1_regularization_strength: float = 0.0,
          l2_regularization_strength: float = 0.0) -> optax.GradientTransformation:
    """Minimal FTRL-Proximal (per-coordinate), matching tf.keras.optimizers.Ftrl
    semantics for the default hyper-parameters."""

    def init_fn(params):
        accum = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, initial_accumulator_value), params)
        linear = jax.tree_util.tree_map(jnp.zeros_like, params)
        return dict(accum=accum, linear=linear)

    def update_fn(grads, state, params):
        assert params is not None, "ftrl requires params"
        lr = learning_rate
        lr_power = learning_rate_power
        l1 = l1_regularization_strength
        l2 = l2_regularization_strength

        def per_leaf(g, a, lin, p):
            new_a = a + g * g
            sigma = (new_a ** -lr_power - a ** -lr_power) / lr
            new_lin = lin + g - sigma * p
            quad = new_a ** -lr_power / lr + 2.0 * l2
            pre = jnp.clip(new_lin, -l1, l1) - new_lin if l1 > 0 else -new_lin
            new_p = pre / quad
            return new_p - p, new_a, new_lin

        flat_g, tdef = jax.tree_util.tree_flatten(grads)
        flat_a = tdef.flatten_up_to(state["accum"])
        flat_l = tdef.flatten_up_to(state["linear"])
        flat_p = tdef.flatten_up_to(params)
        out = [per_leaf(g, a, lin, p) for g, a, lin, p in zip(flat_g, flat_a, flat_l, flat_p)]
        updates = tdef.unflatten([o[0] for o in out])
        new_state = dict(accum=tdef.unflatten([o[1] for o in out]),
                         linear=tdef.unflatten([o[2] for o in out]))
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


OPTIMIZERS = dict(
    adadelta=optax.adadelta,
    adagrad=optax.adagrad,
    adam=optax.adam,
    adamax=optax.adamax,
    ftrl=_ftrl,
    nadam=optax.nadam,
    rmsprop=optax.rmsprop,
    sgd=optax.sgd,
)


def get_optimizer_by_name(name: str, learning_rate: float = 1e-3,
                          flat: bool = False, **kwargs) -> optax.GradientTransformation:
    """Build an optimizer by name with an injectable learning rate
    (reference `rl/utils.py:39-46`).

    flat=True wraps the optimizer in `optax.flatten`: the moment/update math
    runs on ONE concatenated vector per optimizer instead of one op per
    parameter tensor.  Numerically identical for every optimizer here (all
    are element-wise), but collapses the per-leaf op storm (~8 ops x ~100
    leaves x 3 optimizers per minibatch) that dominates the small-minibatch
    update on TPU, where each op pays a fixed dispatch cost.  The injected
    learning-rate leaf is unaffected (`optax.flatten` preserves the inner
    state, so set_learning_rate/with_learning_rate still find .hyperparams)."""
    opt_class = OPTIMIZERS.get(name.lower())
    if opt_class is None:
        raise ValueError(f"Cannot find optimizer {name}. Select one of {sorted(OPTIMIZERS)}.")
    opt = optax.inject_hyperparams(opt_class)(learning_rate=learning_rate, **kwargs)
    return optax.flatten(opt) if flat else opt


def set_learning_rate(opt_state, learning_rate: float):
    """Update the injected learning rate in an optimizer state (host-side)."""
    if hasattr(opt_state, "hyperparams"):
        opt_state.hyperparams["learning_rate"] = jnp.asarray(learning_rate, jnp.float32)
    return opt_state


def with_learning_rate(opt_state, learning_rate):
    """Functional (trace-safe) variant of set_learning_rate: returns a new
    optimizer state with the injected learning rate replaced.  Used inside
    the chunked train program, where the per-update lr arrives as a traced
    scalar (agents/carla_agent._build_train_chunk_fn)."""
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "hyperparams") \
            and not hasattr(opt_state, "_fields"):
        # per-phase split states (CARLAgentConfig.two_step_split_adam):
        # inject the lr into every member
        return tuple(with_learning_rate(s, learning_rate) for s in opt_state)
    if hasattr(opt_state, "hyperparams"):
        return opt_state._replace(
            hyperparams=dict(opt_state.hyperparams,
                             learning_rate=jnp.asarray(learning_rate, jnp.float32)))
    return opt_state
