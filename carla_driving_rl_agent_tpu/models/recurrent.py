"""GRU aggregation over the time_horizon axis.

The reference aggregates each observation stream over T=4 frames with a
keras GRU (`unroll=True`, `core/networks.py:45-50`); T is small and static,
so an unrolled python loop maps to straight-line XLA — no scan overhead.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class GRU(nn.Module):
    """Returns the final hidden state of a GRU run over (B, T, D)."""
    units: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        cell = nn.GRUCell(features=self.units, dtype=self.dtype,
                          kernel_init=nn.initializers.glorot_uniform())
        carry = jnp.zeros((x.shape[0], self.units), self.dtype)
        for t in range(x.shape[1]):  # static unroll (reference uses unroll=True)
            carry, _ = cell(carry, x[:, t])
        return carry
