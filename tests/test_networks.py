"""Network architecture tests (reference core/networks.py, core/architectures.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from carla_driving_rl_agent_tpu.models.carla_network import CARLANetwork
from carla_driving_rl_agent_tpu.models.shufflenet import ShuffleNetV2, channel_shuffle


def sample_obs(batch=2, t=4, h=90, w=360, c=3):
    return dict(
        state_image=jnp.zeros((batch, t, h, w, c)),
        state_road=jnp.zeros((batch, t, 9)),
        state_vehicle=jnp.zeros((batch, t, 4)),
        state_navigation=jnp.zeros((batch, t, 5)),
        action=jnp.zeros((batch, 2)),
    )


class TestShuffleNet:
    def test_channel_shuffle_permutes(self):
        x = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 1, 8)
        y = channel_shuffle(x, groups=2)
        # reshape (c//g, g) -> transpose -> flatten: [0,2,4,6,1,3,5,7]
        # (reference core/architectures.py:109-118)
        np.testing.assert_array_equal(np.asarray(y).ravel(), [0, 2, 4, 6, 1, 3, 5, 7])

    def test_output_shape_and_time_sharing(self):
        net = ShuffleNetV2(g=1.0, last_channels=768)
        x = jnp.ones((1, 4, 48, 64, 3))
        variables = net.init(jax.random.PRNGKey(0), x, training=False)
        y = net.apply(variables, x, training=False)
        assert y.shape == (1, 4, 768)
        # identical frames -> identical features (weights shared over T)
        y = np.asarray(y)
        np.testing.assert_allclose(y[:, 0], y[:, 1], rtol=1e-5, atol=1e-6)

    def test_param_count_is_shufflenet_scale(self):
        net = ShuffleNetV2(g=1.0, last_channels=768)
        variables = net.init(jax.random.PRNGKey(0), jnp.ones((1, 1, 48, 64, 3)),
                             training=False)
        n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
        # ShuffleNetV2 x1.0 trunk is ~1.2-2M params depending on the exit conv
        assert 0.8e6 < n < 3e6, n


class TestCARLANetwork:
    def setup_method(self):
        self.net = CARLANetwork()
        self.obs = sample_obs(batch=2, t=4, h=45, w=90, c=3)  # small for test speed
        self.params, self.stats = self.net.init(jax.random.PRNGKey(0), self.obs)

    def test_predict_shapes(self):
        out = self.net.predict(self.params, self.stats, self.obs, jax.random.PRNGKey(1))
        assert out["action"].shape == (2, 2)
        assert out["log_prob"].shape == (2, 2)
        assert out["value"].shape == (2, 2)
        assert out["speed"].shape == (2, 1)
        assert out["similarity"].shape == (2, 1)
        a = np.asarray(out["action"])
        assert np.all((a > 0) & (a < 1))

    def test_value_head_ranges(self):
        feat, _ = self.net.dynamics_apply(self.params, self.stats, self.obs)
        val, _ = self.net.value_apply(self.params, self.stats, feat)
        v = np.asarray(val["value"])
        assert np.all(np.abs(v[:, 0]) <= 1.0)        # base = tanh
        assert np.all((v[:, 1] >= 0) & (v[:, 1] <= 6.0))  # exp = 6*sigmoid
        assert np.all(np.abs(np.asarray(val["similarity"])) <= 1.0)
        assert np.all((np.asarray(val["speed"]) >= 0) & (np.asarray(val["speed"]) <= 2.0))

    def test_beta_concentrations_above_one(self):
        feat, _ = self.net.dynamics_apply(self.params, self.stats, self.obs)
        pol, _ = self.net.policy_apply(self.params, self.stats, feat)
        assert np.all(np.asarray(pol["dist"].alpha) > 1.0)
        assert np.all(np.asarray(pol["dist"].beta) > 1.0)

    def test_old_policy_copy_matches(self):
        params = self.net.update_old_policy(self.params)
        feat, _ = self.net.dynamics_apply(params, self.stats, self.obs)
        new, _ = self.net.policy_apply(params, self.stats, feat, old=False)
        old, _ = self.net.policy_apply(params, self.stats, feat, old=True)
        np.testing.assert_allclose(np.asarray(new["dist"].alpha),
                                   np.asarray(old["dist"].alpha), rtol=1e-6)

    def test_training_mode_updates_batch_stats(self):
        obs = jax.tree_util.tree_map(
            lambda x: x + jax.random.normal(jax.random.PRNGKey(2), x.shape), self.obs)
        feat, new_stats = self.net.dynamics_apply(self.params, self.stats, obs, training=True)
        before = jax.tree_util.tree_leaves(self.stats["dynamics"])
        after = jax.tree_util.tree_leaves(new_stats)
        assert any(not np.allclose(np.asarray(b), np.asarray(a))
                   for b, a in zip(before, after))

    def test_dynamics_feature_dim(self):
        feat, _ = self.net.dynamics_apply(self.params, self.stats, self.obs)
        assert feat.shape == (2, 512)
