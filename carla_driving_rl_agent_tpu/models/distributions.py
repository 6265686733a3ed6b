"""Policy distributions (Beta / Gaussian / Categorical).

The reference builds these through tensorflow-probability DistributionLambda
layers (`rl/networks/networks.py:72-109`, `core/networks.py:128-137`); here
they are small pure-JAX structs so they can live inside jitted rollout scans.

The Beta distribution is the CARLA agent's action head: concentrations are
produced with softplus(x) + 1.01 so alpha, beta > 1 (unimodal, concave — see
reference `core/networks.py:129-137` and the Chou et al. 2017 pointer there).
Samples are clipped to [eps, 1-eps] before computing log-probabilities
(reference `core/networks.py:139-144`, `rl/agents/ppo.py:322-325`).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln

from carla_driving_rl_agent_tpu.utils.math import EPSILON


def _log_beta_fn(a: jax.Array, b: jax.Array) -> jax.Array:
    return gammaln(a) + gammaln(b) - gammaln(a + b)


@jax.tree_util.register_pytree_node_class
@dataclass
class Beta:
    """Beta(alpha, beta) over [0, 1], elementwise over the action dimension."""

    alpha: jax.Array
    beta: jax.Array

    def tree_flatten(self):
        return (self.alpha, self.beta), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def sample(self, key: jax.Array) -> jax.Array:
        return jax.random.beta(key, self.alpha, self.beta)

    def sample_n(self, key: jax.Array, n: int) -> jax.Array:
        """n iid samples, shape (n,) + batch shape (for the block rollout:
        the observation stack is constant between pushes, so one forward
        pass serves `past_obs_freq` consecutive action draws)."""
        return jax.random.beta(key, self.alpha, self.beta,
                               shape=(n,) + jnp.shape(self.alpha))

    def clip(self, x: jax.Array) -> jax.Array:
        """Clip actions away from {0, 1} for numerical stability
        (reference `core/networks.py:139-144`)."""
        return jnp.clip(x, EPSILON, 1.0 - EPSILON)

    def log_prob(self, x: jax.Array) -> jax.Array:
        x = self.clip(x)
        return ((self.alpha - 1.0) * jnp.log(x)
                + (self.beta - 1.0) * jnp.log1p(-x)
                - _log_beta_fn(self.alpha, self.beta))

    def entropy(self) -> jax.Array:
        a, b = self.alpha, self.beta
        return (_log_beta_fn(a, b)
                - (a - 1.0) * digamma(a)
                - (b - 1.0) * digamma(b)
                + (a + b - 2.0) * digamma(a + b))

    def mean(self) -> jax.Array:
        return self.alpha / (self.alpha + self.beta)

    def stddev(self) -> jax.Array:
        a, b = self.alpha, self.beta
        s = a + b
        return jnp.sqrt(a * b / (s * s * (s + 1.0)))


@jax.tree_util.register_pytree_node_class
@dataclass
class Gaussian:
    """Diagonal Gaussian for unbounded Box spaces
    (reference `rl/networks/networks.py:93-100`)."""

    mu: jax.Array
    log_std: jax.Array

    def tree_flatten(self):
        return (self.mu, self.log_std), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def sample(self, key: jax.Array) -> jax.Array:
        return self.mu + jnp.exp(self.log_std) * jax.random.normal(key, self.mu.shape)

    def clip(self, x: jax.Array) -> jax.Array:
        return x

    def log_prob(self, x: jax.Array) -> jax.Array:
        var = jnp.exp(2.0 * self.log_std)
        return -0.5 * (jnp.square(x - self.mu) / var
                       + 2.0 * self.log_std + jnp.log(2.0 * jnp.pi))

    def entropy(self) -> jax.Array:
        return 0.5 * (1.0 + jnp.log(2.0 * jnp.pi)) + self.log_std

    def mean(self) -> jax.Array:
        return self.mu

    def stddev(self) -> jax.Array:
        return jnp.exp(self.log_std)


@jax.tree_util.register_pytree_node_class
@dataclass
class Categorical:
    """Categorical over `num_classes`, possibly factored over multiple action
    components (reference `rl/networks/networks.py:74-88`)."""

    logits: jax.Array  # (..., num_actions, num_classes)

    def tree_flatten(self):
        return (self.logits,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def sample(self, key: jax.Array) -> jax.Array:
        return jax.random.categorical(key, self.logits, axis=-1).astype(jnp.float32)

    def clip(self, x: jax.Array) -> jax.Array:
        return x

    def log_prob(self, x: jax.Array) -> jax.Array:
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        x = x.astype(jnp.int32)
        return jnp.take_along_axis(logp, x[..., None], axis=-1)[..., 0]

    def entropy(self) -> jax.Array:
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        return -jnp.sum(jnp.exp(logp) * logp, axis=-1)

    def mean(self) -> jax.Array:
        p = jax.nn.softmax(self.logits, axis=-1)
        classes = jnp.arange(self.logits.shape[-1], dtype=jnp.float32)
        return jnp.sum(p * classes, axis=-1)

    def stddev(self) -> jax.Array:
        p = jax.nn.softmax(self.logits, axis=-1)
        classes = jnp.arange(self.logits.shape[-1], dtype=jnp.float32)
        m = jnp.sum(p * classes, axis=-1, keepdims=True)
        return jnp.sqrt(jnp.sum(p * jnp.square(classes - m), axis=-1))
