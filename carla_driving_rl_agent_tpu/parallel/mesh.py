"""Device-mesh scale-out: worlds sharded over chips, params replicated.

The reference has NO parallelism of any kind (single env, single process —
`main.py:3`, `rl/agents/ppo.py:497`); this module is new TPU capability.

Design (scaling-book recipe): a 1-D mesh over the `world` axis. Environment
states (leading axis = world/batch) are sharded; parameters, optimizer
states, and RNG are replicated. The entire fused train iteration is jitted
with these shardings and GSPMD partitions it: rollout physics and rendering
run fully parallel per shard; minibatch gradient reductions become
all-reduces over ICI. Multi-slice (DCN) scale-out stacks a second mesh axis
the same way.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

WORLD_AXIS = "world"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = WORLD_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def world_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (world) axis of every leaf."""
    return NamedSharding(mesh, P(WORLD_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_states(env_states, mesh: Mesh):
    return jax.device_put(env_states, world_sharding(mesh))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
