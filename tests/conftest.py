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


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-tier-only test (deep equivalence / long compile); "
        "skipped by default, run with --full or CDRL_FULL_TESTS=1")


def pytest_addoption(parser):
    parser.addoption(
        "--full", action="store_true", default=False,
        help="run the FULL tier including slow-marked tests (~50 min cold "
             "on the 1-vCPU host; the default fast tier is ~20 min and "
             "keeps at least one pin per subsystem)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--full") or os.environ.get("CDRL_FULL_TESTS"):
        return
    skip = pytest.mark.skip(reason="slow tier — run with pytest --full")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
