"""Native C++ route planner: builds, and agrees with the python planner."""

import numpy as np
import pytest

from carla_driving_rl_agent_tpu import native
from carla_driving_rl_agent_tpu.envs import route as route_mod
from carla_driving_rl_agent_tpu.envs import town as town_mod


@pytest.fixture(scope="module")
def town():
    return town_mod.get_town("Town02")


class TestNativePlanner:
    def test_builds_and_loads(self):
        assert native.is_available(), "native route planner failed to build"

    def test_bank_properties(self, town):
        bank = native.build_route_bank_native(town, num_routes=16, max_len=300,
                                              seed=9)
        assert bank is not None
        assert bank.xy.shape == (16, 300, 2)
        assert np.all(bank.length >= 40)
        for r in range(16):
            L = int(bank.length[r])
            steps = np.linalg.norm(np.diff(bank.xy[r, :L], axis=0), axis=1)
            assert steps.max() < 6.0, f"route {r} jumps {steps.max():.1f} m"
            # tail padded with the final waypoint
            assert np.abs(bank.xy[r, L:] - bank.xy[r, L - 1]).max() == 0.0

    def test_respects_fixed_origins(self, town):
        bank = native.build_route_bank_native(town, num_routes=12, max_len=300,
                                              origin_spawns=[0, 1, 2], seed=5)
        assert set(bank.origin_spawn.tolist()) <= {0, 1, 2}

    def test_routes_reach_spawn_destinations(self, town):
        """Native A* produces routes that start at an origin spawn point."""
        bank = native.build_route_bank_native(town, num_routes=8, max_len=300,
                                              seed=3)
        for r in range(8):
            o_wp = int(town.spawn_wp[int(bank.origin_spawn[r])])
            np.testing.assert_allclose(bank.xy[r, 0], town.wp_xy[o_wp], atol=1e-4)

    def test_python_fallback_used_when_disabled(self, town):
        bank = route_mod.build_route_bank(town, num_routes=4, max_len=300,
                                          seed=3, use_native=False)
        assert bank.num_routes == 4
