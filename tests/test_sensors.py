"""Analytic sensor suite tests (reference rl/environments/carla/sensors.py:
the full Sensor.create type registry, here as pure functions of WorldState)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_driving_rl_agent_tpu.envs import sensors
from carla_driving_rl_agent_tpu.envs.carla_env import CARLAEnv, CARLAEnvConfig
from carla_driving_rl_agent_tpu.envs.world import WorldParams


@pytest.fixture(scope="module")
def env():
    return CARLAEnv(CARLAEnvConfig(
        world=WorldParams(town_names=("Town02",), num_routes=8,
                          max_route_len=128, max_timesteps=64,
                          num_vehicles=2, num_pedestrians=2, v_max=2, p_max=2),
        image_height=48, image_width=32, render_mode="zeros"))


@pytest.fixture(scope="module")
def world(env):
    state, _ = env.reset(jax.random.PRNGKey(0))
    return state.world


class TestFactory:
    def test_registry_covers_reference_types(self, env):
        for t in ("sensor.other.collision", "sensor.other.lane_invasion",
                  "sensor.other.gnss", "sensor.other.imu",
                  "sensor.other.obstacle", "sensor.lidar.ray_cast",
                  "sensor.other.radar"):
            assert sensors.create(t) is not None
        for t in ("sensor.camera.rgb", "sensor.camera.semantic_segmentation",
                  "sensor.camera.depth"):
            assert sensors.create(t, env=env).env is env
        with pytest.raises(ValueError):
            sensors.create("sensor.bogus")


class TestReadings:
    def test_gnss_roundtrip(self, world):
        out = sensors.GnssSensor().read(world)
        scale = 180.0 / (np.pi * sensors.EARTH_RADIUS)
        np.testing.assert_allclose(float(out["latitude"]),
                                   -float(world.y) * scale, rtol=1e-6)
        np.testing.assert_allclose(float(out["longitude"]),
                                   float(world.x) * scale, rtol=1e-6)

    def test_imu_static_world_zero_rates(self, world):
        out = sensors.IMUSensor().read(world, prev=world)
        np.testing.assert_allclose(np.asarray(out["gyroscope"]), 0.0)
        a = np.asarray(out["accelerometer"])
        np.testing.assert_allclose(a[:2], 0.0)         # no dv, no yaw rate
        np.testing.assert_allclose(a[2], sensors.GRAVITY)
        assert 0.0 <= float(out["compass"]) < 2 * np.pi

    def test_collision_and_lane_invasion_clean_at_spawn(self, env, world):
        col = sensors.CollisionDetector().read(world)
        assert not bool(col["triggered"])
        lane = sensors.LaneInvasionSensor().read(world, env.town)
        assert not bool(lane["triggered"])             # spawns are on-road
        assert float(lane["distance"]) < 6.0

    def test_lidar_geometry(self, env, world):
        lidar = sensors.LidarSensor(num_rays=90, max_range=40.0)
        out = lidar.read(world, env.town)
        r = np.asarray(out["ranges"])
        assert r.shape == (90,) and np.all(r > 0) and np.all(r <= 40.0)
        assert np.asarray(out["points"]).shape == (90, 2)
        assert np.asarray(out["hit"]).any()            # roads have boundaries
        # ego-frame points reproduce the ranges
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out["points"]), axis=-1), r, rtol=1e-5)

    def test_radar_and_obstacle_slots(self, world):
        out = sensors.RadarSensor().read(world)
        n = out["valid"].shape[0]
        assert (out["depth"].shape == out["azimuth"].shape
                == out["velocity"].shape == (n,))
        det = np.asarray(out["valid"])
        # inactive slots must not detect
        active = np.concatenate([np.asarray(world.npc.veh_active),
                                 np.asarray(world.npc.ped_active)]) > 0.5
        assert not np.any(det & ~active)
        obs = sensors.ObstacleDetector().read(world)
        assert np.isfinite(float(obs["distance"]))

    def test_radar_velocity_sign(self, world):
        """CARLA RadarDetection.velocity convention: positive = TOWARD the
        sensor.  Vehicle slot 0 placed dead ahead, driving at the ego."""
        npc = world.npc
        ex, ey = float(world.x), float(world.y)
        npc = npc._replace(
            veh_xy=npc.veh_xy.at[0].set(jnp.asarray([ex + 10.0, ey])),
            veh_yaw=npc.veh_yaw.at[0].set(jnp.pi),      # facing the ego
            veh_v=npc.veh_v.at[0].set(5.0),
            veh_active=npc.veh_active.at[0].set(1.0))
        w = world._replace(yaw=jnp.zeros_like(world.yaw),
                           v=jnp.zeros_like(world.v), npc=npc)
        out = sensors.RadarSensor().read(w)
        assert bool(out["valid"][0])
        np.testing.assert_allclose(float(out["velocity"][0]), 5.0, atol=1e-4)

    def test_reads_jit_and_vmap(self, env):
        states, _ = env.reset_batch(jax.random.PRNGKey(1), 4)
        lidar = sensors.LidarSensor(num_rays=45, max_range=30.0)
        fn = jax.jit(jax.vmap(lambda w: lidar.read(w, env.town)["ranges"]))
        r = np.asarray(fn(states.world))
        assert r.shape == (4, 45) and np.all((r > 0) & (r <= 30.0))

    def test_camera_kinds(self, env, world):
        rgb = sensors.create("sensor.camera.rgb", env=env,
                             height=24, width=32).read(world)
        assert rgb.shape == (24, 32, 3)
        depth = sensors.create("sensor.camera.depth", env=env,
                               height=24, width=32).read(world)
        assert depth.shape == (24, 32) and depth.dtype == jnp.uint8
        sem = sensors.create("sensor.camera.semantic_segmentation", env=env,
                             height=24, width=32).read(world)
        assert sem.shape == (24, 32, 3)
