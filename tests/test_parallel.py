"""Multi-chip sharding: the full train step jitted over an 8-device mesh
(virtual CPU devices; the driver's dryrun_multichip does the same)."""

import jax
import numpy as np
import pytest


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
class TestMeshTraining:
    def test_dryrun_multichip(self):
        import importlib.util
        import os
        spec = importlib.util.spec_from_file_location(
            "graft_entry", os.path.join(os.path.dirname(__file__), "..",
                                        "__graft_entry__.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)

    def test_sharded_env_states_layout(self):
        from carla_driving_rl_agent_tpu.parallel.mesh import (
            make_mesh, shard_env_states, world_sharding)
        from carla_driving_rl_agent_tpu.envs.carla_env import CARLAEnv, CARLAEnvConfig
        from carla_driving_rl_agent_tpu.envs.world import WorldParams

        mesh = make_mesh(8)
        env = CARLAEnv(CARLAEnvConfig(
            world=WorldParams(town_names=("Town02",), num_routes=8,
                              max_route_len=128, max_timesteps=16),
            image_height=48, image_width=32, render_mode="zeros"))
        states, _ = env.reset_batch(jax.random.PRNGKey(0), 16)
        sharded = shard_env_states(states, mesh)
        # every leaf's leading axis is split over the 8 devices
        leaf = sharded.world.x
        assert len(leaf.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(states.world.x))
