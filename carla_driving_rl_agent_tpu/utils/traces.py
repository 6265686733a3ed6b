"""Experience-trace IO (reference `rl/utils.py:502-565`): npz traces written
by PPO collection (`rl/agents/ppo.py:735-754`) or the collect wrapper."""

from __future__ import annotations

import os
import random as py_random
from typing import Iterator, Optional

import numpy as np


def count_traces(traces_dir: str) -> int:
    if not os.path.isdir(traces_dir):
        return 0
    return len([f for f in os.listdir(traces_dir) if f.endswith(".npz")])


def load_traces(traces_dir: str, max_amount: Optional[int] = None,
                shuffle: bool = False, seed=None) -> Iterator[dict]:
    files = sorted(f for f in os.listdir(traces_dir) if f.endswith(".npz"))
    if shuffle:
        py_random.Random(seed).shuffle(files)
    if max_amount is not None:
        files = files[:max_amount]
    for fname in files:
        with np.load(os.path.join(traces_dir, fname)) as data:
            yield {k: data[k] for k in data.files}


def unpack_trace(trace: dict, unpack: bool = True):
    """Split a trace into (state, action, reward, done) like the reference's
    `unpack_trace` (`rl/utils.py:529-545`)."""
    if not unpack:
        return trace
    state = {k: v for k, v in trace.items() if k.startswith("state_")}
    return state, trace.get("action"), trace.get("reward"), trace.get("done")
