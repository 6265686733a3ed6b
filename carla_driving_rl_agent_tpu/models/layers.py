"""Shared building blocks: time-distributed feature nets and control branches.

Reference: `core/architectures.py:9-27` (feature_net), `core/networks.py:24-30`
(linear_combination), `core/networks.py:59-66` (control_branch).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

BN_EPS = 1e-3  # keras BatchNormalization default (parity with the reference's TF nets)

from carla_driving_rl_agent_tpu.utils.activations import get_activation


class FeatureNet(nn.Module):
    """Per-timestep shared Dense+BatchNorm stack over (B, T, D) inputs.

    Weight sharing across the T axis is implicit (Dense applies to the last
    axis); BatchNorm pools statistics over (B, T) — the reference shares the
    BN layer object across timesteps (`core/architectures.py:14-26`).
    """
    units: int = 32
    num_layers: int = 2
    activation: str | Callable = "relu"
    normalization: Optional[str] = None   # 'batch' applies an input BN first
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = get_activation(self.activation)
        x = x.astype(self.dtype)
        if self.normalization == "batch":
            x = nn.BatchNorm(use_running_average=not training, epsilon=BN_EPS, dtype=self.dtype)(x)
        for _ in range(self.num_layers):
            x = nn.Dense(self.units, dtype=self.dtype,
                         kernel_init=nn.initializers.glorot_uniform())(x)
            x = act(x)
            x = nn.BatchNorm(use_running_average=not training, epsilon=BN_EPS, dtype=self.dtype)(x)
        return x


class ControlBranch(nn.Module):
    """num_layers x [BatchNorm -> Dense(units, swish6)] over the dynamics
    feature (reference `core/networks.py:59-66`)."""
    units: int = 320
    num_layers: int = 2
    activation: str | Callable = "swish6"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = get_activation(self.activation)
        x = x.astype(self.dtype)
        for _ in range(self.num_layers):
            x = nn.BatchNorm(use_running_average=not training, epsilon=BN_EPS, dtype=self.dtype)(x)
            x = nn.Dense(self.units, dtype=self.dtype,
                         kernel_init=nn.initializers.glorot_uniform())(x)
            x = act(x)
        return x


class LinearCombination(nn.Module):
    """BatchNorm -> Dense(units, linear) (reference `core/networks.py:24-30`)."""
    units: int = 32
    normalization: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = x.astype(self.dtype)
        if self.normalization == "batch":
            x = nn.BatchNorm(use_running_average=not training, epsilon=BN_EPS, dtype=self.dtype)(x)
        return nn.Dense(self.units, dtype=self.dtype,
                        kernel_init=nn.initializers.glorot_uniform())(x)
