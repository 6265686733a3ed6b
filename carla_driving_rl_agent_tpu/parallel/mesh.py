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
SLICE_AXIS = "slice"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = WORLD_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_multislice_mesh(n_slices: int,
                         devices_per_slice: Optional[int] = None) -> Mesh:
    """2-D (slice, world) mesh for multi-slice (DCN) scale-out.

    Worlds are data-parallel over BOTH axes; the axis split exists so that
    XLA's collective scheduler can keep the hot gradient all-reduce
    hierarchical: reduce-scatter/all-gather over the fast `world` (ICI)
    axis inside each slice, then the small cross-slice reduction over the
    `slice` (DCN) axis — the scaling-book multi-pod recipe.  On a single
    host the same shape runs over virtual devices, which is how
    tests/test_parallel.py exercises it."""
    devices = jax.devices()
    if devices_per_slice is None:
        devices_per_slice = len(devices) // n_slices
    n = n_slices * devices_per_slice
    assert len(devices) >= n, (len(devices), n_slices, devices_per_slice)
    arr = np.asarray(devices[:n]).reshape(n_slices, devices_per_slice)
    return Mesh(arr, (SLICE_AXIS, WORLD_AXIS))


def world_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (world) axis of every leaf over every mesh axis
    (1-D mesh: the world axis; multi-slice mesh: slice x world)."""
    if SLICE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P((SLICE_AXIS, WORLD_AXIS)))
    return NamedSharding(mesh, P(WORLD_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_states(env_states, mesh: Mesh):
    return jax.device_put(env_states, world_sharding(mesh))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
