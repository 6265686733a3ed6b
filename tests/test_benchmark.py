"""NoCrash/CoRL2017 benchmark fidelity tests.

Pins the reference CARLABenchmark semantics
(`rl/environments/carla/environment.py:1309-1451`): Town01/Town02 task
specs with per-town actor counts, default TEST weathers, and the per-route
time budget `route_length / avg_speed * 3.6` seconds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_driving_rl_agent_tpu.envs.carla_env import CARLAEnv, CARLAEnvConfig
from carla_driving_rl_agent_tpu.envs.world import WorldParams
from carla_driving_rl_agent_tpu.envs.dynamics import DT
from carla_driving_rl_agent_tpu.envs.wrappers import (
    CARLABenchmark, nocrash_success)


class _StubNet:
    """Deterministic constant-action policy (raw [0,1] space)."""

    def __init__(self, action01):
        self.action01 = jnp.asarray(action01)

    def predict(self, params, stats, net_in, key, num_samples=1):
        b = net_in["state_road"].shape[0]
        return dict(action=jnp.broadcast_to(self.action01, (b, 2)))


class _StubAgent:
    def __init__(self, env, action01=(0.62, 0.5)):
        self.env = env
        self.network = _StubNet(action01)
        self.params = None
        self.stats = None


def _tiny_env():
    return CARLAEnv(CARLAEnvConfig(
        world=WorldParams(town_names=("Town02",), num_routes=8,
                          max_route_len=256, max_timesteps=64),
        image_height=48, image_width=32, render_mode="zeros"))


class TestSuccessPredicate:
    def test_budget_formula(self):
        # 100 m at 10 km/h -> 36 s -> 1080 steps at dt = 1/30
        s, in_time, budget = nocrash_success(
            steps=[1000.0, 1200.0], collided=[False, False],
            arrived=[True, True], route_length_m=[100.0, 100.0])
        assert budget == pytest.approx([100.0 / 10.0 * 3.6 / DT] * 2)
        assert budget[0] == pytest.approx(1080.0)
        assert list(in_time) == [True, False]
        assert list(s) == [True, False]

    def test_collision_and_arrival_gates(self):
        s, _, _ = nocrash_success(
            steps=[10.0, 10.0, 10.0], collided=[True, False, False],
            arrived=[True, False, True], route_length_m=[500.0] * 3)
        assert list(s) == [False, False, True]


class TestTaskSpecs:
    def test_reference_task_table(self):
        # reference environment.py:1352-1362
        spec = CARLABenchmark.TASKS_SPEC
        assert spec["empty"]["Town01"] == dict(vehicles=0, pedestrians=0)
        assert spec["regular"]["Town01"] == dict(vehicles=20, pedestrians=50)
        assert spec["regular"]["Town02"] == dict(vehicles=15, pedestrians=50)
        assert spec["dense"]["Town01"] == dict(vehicles=100, pedestrians=250)
        assert spec["dense"]["Town02"] == dict(vehicles=70, pedestrians=150)

    def test_preset_selects_town_and_spec(self):
        env = _tiny_env()
        b = CARLABenchmark(_StubAgent(env), task="regular", preset="train")
        assert b.town == "Town01"
        assert b.task_spec == dict(vehicles=20, pedestrians=50)
        b = CARLABenchmark(_StubAgent(env), task="dense", preset="test")
        assert b.town == "Town02"
        assert b.task_spec == dict(vehicles=70, pedestrians=150)

    def test_default_weathers_are_test_set(self):
        # reference quirk `:1391-1392`: None -> TEST_WEATHERS even for train
        env = _tiny_env()
        b = CARLABenchmark(_StubAgent(env), preset="train")
        assert b.weathers == CARLABenchmark.TEST_WEATHERS


class TestBenchmarkRun:
    def test_run_end_to_end(self):
        env = _tiny_env()
        bench = CARLABenchmark(_StubAgent(env), task="empty", preset="test",
                               render_mode="zeros")
        out = bench.run(timesteps=32, trials=4, initial_seed=0)
        assert out["town"] == "Town02"
        assert 0.0 <= out["success_rate"] <= 1.0
        assert out["success_rate_pct"] == pytest.approx(
            out["success_rate"] * 100.0)
        assert out["avg_route_length_m"] > 0.0
        # budget follows the formula from the measured route lengths (mean
        # of ratios == ratio of means only because avg_speed is constant)
        assert out["avg_budget_steps"] == pytest.approx(
            out["avg_route_length_m"] / 10.0 * 3.6 / DT, rel=1e-5)
        assert out["avg_timesteps"] <= 32.0
