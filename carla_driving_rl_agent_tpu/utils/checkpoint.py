"""Checkpointing: params + optimizer states + schedule steps.

Reference: three TF checkpoints (policy_net / value_net / dynamics_model)
plus a config.json persisting DynamicParameter step counters
(`core/networks.py:297-310`, `rl/agents/ppo.py:601-616`,
`rl/agents/agents.py:181-203`).  Here one msgpack file per component (flax
serialization) + config.json; the `full` vs backbone-only restore switch
lives in the agent (`CARLAgent.load`).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

from flax import serialization


def _write(path: str, tree) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


def _read(path: str, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_agent(base_path: str, params: Dict[str, Any], stats: Dict[str, Any],
               opt_state=None, config: Optional[dict] = None) -> None:
    os.makedirs(base_path, exist_ok=True)
    _write(os.path.join(base_path, "params.msgpack"), params)
    _write(os.path.join(base_path, "batch_stats.msgpack"), stats)
    if opt_state is not None:
        _write(os.path.join(base_path, "opt_state.msgpack"), opt_state)
    if config is not None:
        with open(os.path.join(base_path, "config.json"), "w") as f:
            json.dump(config, f, indent=2)


def load_agent(base_path: str, params, stats, opt_state=None) -> Dict[str, Any]:
    """Load into the given templates (shapes/treedefs must match)."""
    out: Dict[str, Any] = {}
    out["params"] = _read(os.path.join(base_path, "params.msgpack"), params)
    out["stats"] = _read(os.path.join(base_path, "batch_stats.msgpack"), stats)
    opt_path = os.path.join(base_path, "opt_state.msgpack")
    out["opt_state"] = None
    if opt_state is not None and os.path.exists(opt_path):
        try:
            out["opt_state"] = _read(opt_path, opt_state)
        except Exception:
            out["opt_state"] = None
    cfg_path = os.path.join(base_path, "config.json")
    out["config"] = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            out["config"] = json.load(f)
    return out


def copy_folder(src: str, dst: str) -> None:
    """Per-epoch weight snapshots (reference `rl/utils.py:568-570`,
    used by Stage.run2 `core/learning.py:157-158`)."""
    import shutil
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
