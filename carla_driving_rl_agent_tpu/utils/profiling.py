"""Profiling utilities.

The reference's only tracing is an ad-hoc wall-clock `@profile` decorator
(`rl/environments/carla/tools/utils.py:135-148`) plus per-episode prints.
Here profiling is first-class: the same decorator, plus jax.profiler trace
contexts that capture real device timelines viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Optional

import jax


def profile(fn):
    """Wall-clock decorator (reference `tools/utils.py:135-148`)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        print(f"[profile] {fn.__name__} took {time.perf_counter() - t0:.3f}s")
        return out

    return wrapper


@contextlib.contextmanager
def device_trace(log_dir: str = "logs/profile", name: Optional[str] = None):
    """Capture a device profile around a code block:

        with device_trace("logs/profile"):
            agent.learn(num_updates=3)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device trace (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def block_and_time(tree) -> float:
    """Synchronize on a pytree of arrays and return elapsed seconds —
    with a real value readback (remote-attached backends can report
    readiness early; see bench.py)."""
    import jax.numpy as jnp
    t0 = time.perf_counter()
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32)))
    return time.perf_counter() - t0
