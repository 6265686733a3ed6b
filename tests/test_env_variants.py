"""Env variant tests: shaped reward, one-camera, discrete actions, reverse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_driving_rl_agent_tpu.envs.carla_env import (
    CARLAEnv, CARLAEnvConfig, CARLAEnvDiscrete)
from carla_driving_rl_agent_tpu.envs.world import WorldParams


def make_env(**over):
    cfg = dict(world=WorldParams(town_names=("Town02",), num_routes=8,
                                 max_route_len=256, max_timesteps=32,
                                 **over.pop("world_over", {})),
               image_height=48, image_width=32, render_mode="zeros")
    cfg.update(over)
    return CARLAEnv(CARLAEnvConfig(**cfg))


class TestShapedReward:
    def test_shaped_reward_formula(self):
        env = make_env(world_over=dict(reward_mode="shaped"))
        state, _ = env.reset(jax.random.PRNGKey(0))
        state, _, reward, *_ = env.step(state, jnp.array([1.0, 0.0]))
        # near-zero speed, aligned, close to waypoint: r ~ time_cost - d + dir
        w = state.world
        spd = float(w.v) * 3.6
        d = float(jnp.linalg.norm(
            env.routes.xy[w.town_id, w.route_id, w.wp_idx] - jnp.stack([w.x, w.y])))
        sim = float(w.similarity)
        direction = spd * sim if 0.75 <= sim <= 1.0 else -(spd + 1) * abs(sim) * 2
        wp = -d if d <= 5.0 else -3 * d
        assert float(reward) == pytest.approx(-1.0 + wp + direction, rel=1e-3, abs=1e-3)


class TestOneCamera:
    def test_single_camera_image_shape(self):
        env = make_env(cameras=1)
        assert env.config.image_shape == (48, 32, 3)
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs["image"].shape == (4, 48, 32, 3)


class TestDepthModulate:
    def test_depth_modulated_image(self):
        """OneCamera depth fusion (reference environment.py:1038-1049):
        camera *= (1 - depth/255) — 3 channels (no stacked depth plane),
        far-field pixels darker than the raw render."""
        env = make_env(cameras=1, depth_modulate=True, render_mode="rasterizer")
        env_raw = make_env(cameras=1, render_mode="rasterizer")
        assert env.config.image_shape == (48, 32, 3)
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs["image"].shape == (4, 48, 32, 3)
        raw_state, raw_obs = env_raw.reset(jax.random.PRNGKey(0))
        mod = np.asarray(obs["image"][-1], np.float32)
        raw = np.asarray(raw_obs["image"][-1], np.float32)
        # modulation can only darken (multiply by <= 1)
        assert (mod <= raw + 1e-3).all()
        assert mod.sum() < raw.sum(), "depth modulation must darken the image"

    def test_exclusive_with_stack_depth(self):
        env = make_env(cameras=1, depth_modulate=True, stack_depth=True,
                       render_mode="rasterizer")
        with pytest.raises(AssertionError):
            env.reset(jax.random.PRNGKey(0))


class TestDiscrete:
    def test_bins_roundtrip_and_step(self):
        env = CARLAEnvDiscrete(make_env(), bins=4)
        assert tuple(env.action_space.nvec) == (4, 4)
        cont = env.to_continuous(jnp.array([0, 3]))
        np.testing.assert_allclose(np.asarray(cont), [-1.0, 0.5])
        back = env.to_discrete(cont)
        np.testing.assert_array_equal(np.asarray(back), [0, 3])
        state, _ = env.reset(jax.random.PRNGKey(0))
        state, obs, reward, term, trunc, info = env.step(state, jnp.array([3, 2]))
        assert jnp.isfinite(reward)


class TestReverse:
    def test_reverse_moves_backward(self):
        from carla_driving_rl_agent_tpu.envs import dynamics as dyn
        control = dyn.actions_to_control(jnp.array([0.5, 0.0, 1.0]),
                                         jnp.zeros(()),
                                         throttle_as_desired_speed=False,
                                         disable_reverse=False)
        assert float(control.reverse) == 1.0
        x, y, yaw, v = dyn.step_bicycle(jnp.zeros(()), jnp.zeros(()),
                                        jnp.zeros(()), jnp.asarray(5.0), control)
        assert float(x) < 0.0, "reverse gear should move backward"

    def test_disable_reverse_ignores_channel(self):
        from carla_driving_rl_agent_tpu.envs import dynamics as dyn
        control = dyn.actions_to_control(jnp.array([0.5, 0.0, 1.0]),
                                         jnp.zeros(()),
                                         throttle_as_desired_speed=False,
                                         disable_reverse=True)
        assert float(control.reverse) == 0.0


class TestOneCameraObsContract:
    def test_past_control_and_command_keys(self):
        """OneCamera base-env keys (reference environment.py:840-859,
        1071-1133): past_control (4,) and command (RoadOption one-hot, 7)."""
        env = make_env(cameras=1)
        assert "past_control" in env.observation_space
        assert "command" in env.observation_space
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs["past_control"].shape == (4,)
        assert obs["command"].shape == (7,)
        assert float(obs["command"].sum()) == pytest.approx(1.0)
        state, obs, *_ = env.step(state, jnp.array([0.8, 0.1]))
        # past_control reflects the applied control
        assert float(obs["past_control"][0]) > 0.0  # throttle
        # the three-camera flagship contract is unchanged
        env3 = make_env(cameras=3)
        assert "past_control" not in env3.observation_space
        _, obs3 = env3.reset(jax.random.PRNGKey(0))
        assert "command" not in obs3


class TestMultiLaneTowns:
    @pytest.mark.slow
    def test_town04_route_bank_contains_lane_changes(self):
        """Town04/06 are multi-lane: the planner's zero-cost lateral edges
        (reference navigation/route_planner.py:174-219) must surface
        CHANGELANELEFT/RIGHT RoadOptions in planned routes."""
        from carla_driving_rl_agent_tpu.envs import town as town_mod
        from carla_driving_rl_agent_tpu.envs import route as route_mod
        t4 = town_mod.get_town("Town04")
        assert t4.road_half > town_mod.LANE_WIDTH + 1.0
        assert np.any(t4.lane_left >= 0) and np.any(t4.lane_right >= 0)
        bank = route_mod.build_route_bank(t4, num_routes=16, max_len=512, seed=7)
        cl = (bank.option == route_mod.RO_CL_LEFT) | \
             (bank.option == route_mod.RO_CL_RIGHT)
        has = [bool(np.any(cl[i, :bank.length[i]])) for i in range(16)]
        assert any(has), "no Town04 route contains a lane change"
        # waypoint spacing stays dense through the change blends
        for i in range(16):
            L = int(bank.length[i])
            d = np.linalg.norm(np.diff(bank.xy[i, :L], axis=0), axis=1)
            assert d.max() < 8.0

    def test_single_lane_towns_have_no_lateral_links(self):
        from carla_driving_rl_agent_tpu.envs import town as town_mod
        t2 = town_mod.get_town("Town02")
        assert not np.any(t2.lane_left >= 0)
        assert t2.road_half == pytest.approx(town_mod.LANE_WIDTH + 0.3)

    def test_wp_lateral_mapping_is_consistent(self):
        """wp_left/wp_right land on the adjacent lane at a nearby position."""
        from carla_driving_rl_agent_tpu.envs import town as town_mod
        t4 = town_mod.get_town("Town04")
        idx = np.where(t4.wp_right >= 0)[0][:200]
        tgt = t4.wp_right[idx]
        # target wp belongs to the lane registered as the right neighbor
        assert np.all(t4.wp_lane[tgt] == t4.lane_right[t4.wp_lane[idx]])
        d = np.linalg.norm(t4.wp_xy[idx] - t4.wp_xy[tgt], axis=1)
        assert d.max() < 2.0 * town_mod.LANE_WIDTH

    def test_multilane_off_road_threshold_widened(self):
        """Driving in the outer lane of a 2-lane road must NOT be off-road."""
        cfg = CARLAEnvConfig(
            world=WorldParams(town_names=("Town04",), num_routes=8,
                              max_route_len=256, max_timesteps=32),
            image_height=48, image_width=32, render_mode="zeros")
        env = CARLAEnv(cfg)
        from carla_driving_rl_agent_tpu.envs import town as town_mod, world as world_mod
        t4 = town_mod.get_town("Town04")
        # a waypoint on an outer (k=1) lane: distance to centerline ~5.25 m
        outer = np.where((t4.wp_left >= 0))[0][50]   # has a left neighbor => k>0
        x, y = t4.wp_xy[outer]
        d = world_mod._off_road_distance(env.town, jnp.asarray(0), 
                                         jnp.asarray(float(x)), jnp.asarray(float(y)))
        thr = float(env.town.road_half[0]) + (5.5 - 3.8)
        assert float(d) < thr, "outer lane counted as off-road"
        assert float(d) > 3.8, "outer lane should be outside a single-lane band"


class TestKeyboardTeleop:
    def test_keyboard_teleop_runs_headless(self, monkeypatch):
        """Keyboard teleop (reference environment.py:568-664) drives the env
        under SDL's dummy video driver; quits cleanly via the ESC path."""
        import os
        os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
        pygame = pytest.importorskip("pygame")
        from carla_driving_rl_agent_tpu.envs.wrappers import CARLAPlayWrapper
        env = make_env()
        wrapper = CARLAPlayWrapper(env)
        # inject an ESC keydown after a few frames so the loop exits
        real_get = pygame.event.get
        count = {"n": 0}

        def fake_get(*a, **kw):
            count["n"] += 1
            if count["n"] >= 3:
                return [pygame.event.Event(pygame.KEYDOWN,
                                           key=pygame.K_ESCAPE)]
            return []
        monkeypatch.setattr(pygame.event, "get", fake_get)
        out = wrapper.keyboard(timesteps=32)
        assert out["timesteps"] <= 32


class TestLateralObs:
    """WorldParams.lateral_obs (opt-in deviation): a signed lateral-offset
    scalar appended to the navigation feature — the cue against the
    diagnosed uncorrected-lateral-drift failure mode."""

    @pytest.fixture(scope="class")
    def lat_env(self):
        return CARLAEnv(CARLAEnvConfig(
            world=WorldParams(town_names=("Town02",), num_routes=8,
                              max_route_len=256, max_timesteps=32,
                              lateral_obs=True),
            image_height=48, image_width=32, render_mode="zeros"))

    def test_spaces_and_shapes(self, lat_env):
        assert lat_env.observation_space["navigation"].shape == (6,)
        state, obs = lat_env.reset(jax.random.PRNGKey(0))
        assert obs["navigation"].shape[-1] == 6
        assert np.all(np.isfinite(np.asarray(obs["navigation"])))

    def test_sign_and_magnitude(self, lat_env):
        from carla_driving_rl_agent_tpu.envs import world as world_mod
        from carla_driving_rl_agent_tpu.envs.world import tgather
        state, _ = lat_env.reset(jax.random.PRNGKey(3))
        w = state.world
        routes = lat_env.routes
        offs = jnp.arange(2)
        w_xy = tgather(routes.xy, w.town_id, w.route_id, w.wp_idx + offs)
        d = np.asarray(w_xy[1] - w_xy[0])
        d = d / max(np.linalg.norm(d), 1e-6)
        left = np.array([-d[1], d[0]])        # +90 deg: left of travel

        def lat_of(wx, wy):
            ws = w._replace(x=jnp.asarray(wx), y=jnp.asarray(wy))
            nav = world_mod.navigation_features(ws, lat_env.params, routes)
            return float(nav[-1])

        x0, y0 = float(w_xy[0][0]), float(w_xy[0][1])
        assert abs(lat_of(x0, y0)) < 1e-5                      # on the line
        l_plus = lat_of(x0 + 1.5 * left[0], y0 + 1.5 * left[1])
        l_minus = lat_of(x0 - 1.5 * left[0], y0 - 1.5 * left[1])
        np.testing.assert_allclose(l_plus, 1.5 / 3.0, atol=1e-5)
        np.testing.assert_allclose(l_minus, -1.5 / 3.0, atol=1e-5)

    def test_default_env_unchanged(self):
        plain = CARLAEnv(CARLAEnvConfig(
            world=WorldParams(town_names=("Town02",), num_routes=8,
                              max_route_len=256, max_timesteps=32),
            image_height=48, image_width=32, render_mode="zeros"))
        assert plain.observation_space["navigation"].shape == (5,)

    def test_agent_init_with_lateral(self, lat_env):
        """Round-5 regression: CARLAgent._sample_net_input must size the
        navigation input from nav_feature_dim, not the waypoint count —
        the lateral chain crashed at the first predict otherwise."""
        from carla_driving_rl_agent_tpu.agents.carla_agent import (
            CARLAgent, CARLAgentConfig)
        import tempfile
        cfg = CARLAgentConfig(num_envs=2, rollout_steps=4, batch_size=8,
                              network=dict(
                                  control_policy=dict(units=16, num_layers=1),
                                  control_value=dict(units=16, num_layers=1),
                                  dynamics=dict(
                                      shufflenet=dict(g=0.5, last_channels=32),
                                      rnn=dict(image=16, road=8, vehicle=8,
                                               navigation=8),
                                      dynamics=dict(units=16))), seed=3)
        ag = CARLAgent(lat_env, cfg, name="lat-agent", log_mode=None,
                       weights_dir=tempfile.mkdtemp())
        k = ag.params["dynamics"]["FeatureNet_2"]["Dense_0"]["kernel"]
        assert k.shape[0] == 6, k.shape
        _, hist = ag.learn(num_updates=1)
        assert np.isfinite(hist[0]["loss_policy"])
