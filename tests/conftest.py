"""Test configuration: force a virtual 8-device CPU mesh, so multi-chip
sharding paths are exercised without TPU hardware.

NOTE: the environment pre-imports jax at interpreter startup (axon platform
plugin), so setting JAX_PLATFORMS via os.environ here is too late — use
jax.config.update, which works after import but before backend init.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # for subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # backend already initialized (e.g. when running a single test after jax use)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
