"""Generic policy/value networks for simple (non-CARLA) environments.

Reference: `rl/networks/networks.py` — `Network` base (input layers from the
state spec, distribution factory `:72-109`) and `PPONetwork` (MLP with
LayerNorm blocks `:179-209`, (base, exp) value head `:228-247`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from carla_driving_rl_agent_tpu.models.distributions import Beta, Categorical, Gaussian
from carla_driving_rl_agent_tpu.utils.activations import get_activation


class MLPTorso(nn.Module):
    """Dense -> LayerNorm -> [Dense, Dense, LayerNorm] x (num_layers/2)
    (reference `policy_layers`, `rl/networks/networks.py:179-209`)."""
    units: int = 32
    num_layers: int = 2
    activation: Any = "swish"
    dropout: float = 0.0
    linear_units: int = 0

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = get_activation(self.activation)
        glorot = nn.initializers.glorot_uniform()
        x = act(nn.Dense(self.units, kernel_init=glorot)(x))
        x = nn.LayerNorm()(x)
        for _ in range(0, self.num_layers, 2):
            x = act(nn.Dense(self.units, kernel_init=glorot)(x))
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
            x = act(nn.Dense(self.units, kernel_init=glorot)(x))
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
            x = nn.LayerNorm()(x)
        if self.linear_units > 0:
            x = nn.Dense(self.linear_units, kernel_init=glorot)(x)
        return x


class PolicyMLP(nn.Module):
    """MLP torso + distribution head (beta / gaussian / categorical —
    reference `rl/networks/networks.py:72-109`)."""
    num_actions: int
    distribution: str = "beta"
    num_classes: int = 2
    spec: Dict[str, Any] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        torso = MLPTorso(**(self.spec or {}))(x, training)
        glorot = nn.initializers.glorot_uniform()
        if self.distribution == "beta":
            alpha = jax.nn.softplus(nn.Dense(self.num_actions, kernel_init=glorot,
                                             name="alpha")(torso)) + 1.01
            beta = jax.nn.softplus(nn.Dense(self.num_actions, kernel_init=glorot,
                                            name="beta")(torso)) + 1.01
            return Beta(alpha=alpha, beta=beta)
        if self.distribution == "gaussian":
            mu = nn.Dense(self.num_actions, kernel_init=glorot, name="mu")(torso)
            log_std = self.param("log_std", nn.initializers.zeros,
                                 (self.num_actions,))
            return Gaussian(mu=mu, log_std=jnp.broadcast_to(log_std, mu.shape))
        logits = nn.Dense(self.num_actions * self.num_classes, kernel_init=glorot,
                          name="logits")(torso)
        return Categorical(logits=logits.reshape(
            logits.shape[:-1] + (self.num_actions, self.num_classes)))


class ValueMLP(nn.Module):
    """MLP torso + (base, exp) value head (reference
    `rl/networks/networks.py:228-247`; `components > 1` mixes several heads
    with softmax weights, `:232-244`)."""
    spec: Dict[str, Any] = None
    exponent_scale: float = 6.0
    components: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        torso = MLPTorso(**(self.spec or {}))(x, training)
        glorot = nn.initializers.glorot_uniform()
        if self.components == 1:
            base = jnp.tanh(nn.Dense(1, kernel_init=glorot, name="v_base")(torso))
            exp = self.exponent_scale * jax.nn.sigmoid(
                nn.Dense(1, kernel_init=glorot, name="v_exp")(torso))
        else:
            wb = jax.nn.softmax(nn.Dense(self.components, kernel_init=glorot,
                                         name="w_base")(torso), axis=-1)
            we = jax.nn.softmax(nn.Dense(self.components, kernel_init=glorot,
                                         name="w_exp")(torso), axis=-1)
            bases = jnp.tanh(nn.Dense(self.components, kernel_init=glorot,
                                      name="v_base")(torso))
            exps = self.exponent_scale * jax.nn.sigmoid(
                nn.Dense(self.components, kernel_init=glorot, name="v_exp")(torso))
            base = jnp.sum(bases * wb, axis=-1, keepdims=True)
            exp = jnp.sum(exps * we, axis=-1, keepdims=True)
        return jnp.concatenate([base, exp], axis=-1)


class PPONetwork:
    """Parameter manager mirroring the reference PPONetwork: policy +
    old_policy + value with the (base, exp) head."""

    def __init__(self, num_actions: int, distribution: str = "beta",
                 num_classes: int = 2, policy: Optional[dict] = None,
                 value: Optional[dict] = None, exponent_scale: float = 6.0,
                 components: int = 1):
        self.exp_scale = exponent_scale
        self.policy_model = PolicyMLP(num_actions=num_actions,
                                      distribution=distribution,
                                      num_classes=num_classes, spec=policy or {})
        self.value_model = ValueMLP(spec=value or {}, exponent_scale=exponent_scale,
                                    components=components)

    def init(self, key: jax.Array, sample_state: jax.Array):
        kp, kv = jax.random.split(key)
        p = self.policy_model.init(kp, sample_state)["params"]
        v = self.value_model.init(kv, sample_state)["params"]
        return dict(policy=p, old_policy=jax.tree_util.tree_map(lambda x: x, p),
                    value=v)

    def policy_dist(self, params, state, old: bool = False):
        which = "old_policy" if old else "policy"
        return self.policy_model.apply({"params": params[which]}, state)

    def value(self, params, state):
        return self.value_model.apply({"params": params["value"]}, state)

    def predict(self, params, state, key: jax.Array):
        """(action, mean, std, log_prob, value) — reference
        `rl/networks/networks.py:130-144`."""
        dist = self.policy_dist(params, state, old=True)
        action = dist.clip(dist.sample(key))
        return dict(action=action, mean=dist.mean(), std=dist.stddev(),
                    log_prob=dist.log_prob(action), value=self.value(params, state))

    @staticmethod
    def update_old_policy(params):
        return dict(params, old_policy=jax.tree_util.tree_map(
            lambda x: x, params["policy"]))
