"""Metrics logging (reference `Summary`, `rl/utils.py:577-673`, and
`IncrementalStatistics`, `rl/utils.py:676-720`).

Modes (matching the reference):
  'summary' — buffered scalars flushed to JSONL event files under
              logs/<name>/<timestamp>/ (TensorBoard is not a dependency of
              this framework; the JSONL schema is trivially convertible, and
              a tensorboard writer is used when the package is importable)
  'log'     — kept in memory (self.history)
  None      — disabled (used by evaluation, reference core/learning.py:509)
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Iterable, Optional

import numpy as np


class Summary:
    def __init__(self, mode: str = "summary", name: Optional[str] = None,
                 log_dir: str = "logs", summary_keys: Optional[Iterable[str]] = None):
        self.mode = mode
        self.buffer = defaultdict(list)
        self.history = defaultdict(list)
        self.keys = set(summary_keys) if summary_keys else None
        self.step = 0
        self._writer = None
        self._tb = None
        if mode == "summary":
            stamp = time.strftime("%Y%m%d-%H%M%S")
            self.dir = os.path.join(log_dir, name or "run", stamp)
            os.makedirs(self.dir, exist_ok=True)
            self._path = os.path.join(self.dir, "events.jsonl")
            try:  # optional tensorboard (torch.utils.tensorboard if present)
                from torch.utils.tensorboard import SummaryWriter  # type: ignore
                self._tb = SummaryWriter(self.dir)
            except Exception:
                self._tb = None

    def should_log(self, key: str) -> bool:
        return self.keys is None or key in self.keys

    def log(self, **kwargs):
        """Buffer values (reference `Summary.add` semantics)."""
        if self.mode is None:
            return
        for k, v in kwargs.items():
            if not self.should_log(k):
                continue
            v = np.asarray(v)
            if self.mode == "log":
                self.history[k].append(v.tolist())
            else:
                self.buffer[k].append(v)

    def write_summaries(self):
        """Flush buffered values as scalar means (+ histograms for array
        values) — reference `rl/utils.py:631-659`."""
        if self.mode != "summary" or not self.buffer:
            self.buffer.clear()
            return
        record = {"step": self.step, "time": time.time()}
        for k, vals in self.buffer.items():
            flat = np.concatenate([np.ravel(np.asarray(v, np.float64)) for v in vals])
            record[k] = float(np.mean(flat))
            if flat.size > 1:
                record[f"{k}_std"] = float(np.std(flat))
            if self._tb is not None:
                self._tb.add_scalar(k, record[k], self.step)
        with open(self._path, "a") as f:
            f.write(json.dumps(record) + "\n")
        self.buffer.clear()
        self.step += 1


class IncrementalStatistics:
    """Running mean/variance/std via Welford updates
    (reference `rl/utils.py:676-720`)."""

    def __init__(self, epsilon: float = 1e-8):
        self.mean = 0.0
        self.variance = 0.0
        self.std = 0.0
        self.count = 0
        self.eps = epsilon

    def update(self, value):
        values = np.ravel(np.asarray(value, np.float64))
        for v in values:
            self.count += 1
            delta = v - self.mean
            self.mean += delta / self.count
            self.variance += delta * (v - self.mean)
        self.std = float(np.sqrt(self.variance / max(self.count, 1)) + self.eps)

    def normalize(self, value):
        return (np.asarray(value) - self.mean) / (self.std + self.eps)

    def set(self, mean: float, std: float, count: int = 1):
        self.mean, self.std, self.count = mean, std, count

    def as_dict(self) -> dict:
        return dict(mean=float(self.mean), std=float(self.std),
                    variance=float(self.variance), count=int(self.count))
