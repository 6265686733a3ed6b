"""Network architecture tests (reference core/networks.py, core/architectures.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


class TestBetaSaturationGuard:
    """The opt-in leaky pre-activation floor in PolicyHead (preact_floor):
    parameter structure and init behavior are identical to the default head,
    but gradients survive deep softplus saturation (the entropy-bonus trap
    documented in main.sharp_recipe)."""

    def _heads(self):
        from carla_driving_rl_agent_tpu.models.carla_network import PolicyHead
        return (PolicyHead(num_actions=2, spec={}),
                PolicyHead(num_actions=2, spec={"preact_floor": -3.0}))

    def test_structure_and_init_outputs_match(self):
        ph, phg = self._heads()
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 512))
        v1 = ph.init(jax.random.PRNGKey(1), x, training=False)
        v2 = phg.init(jax.random.PRNGKey(1), x, training=False)
        assert (jax.tree_util.tree_structure(v1)
                == jax.tree_util.tree_structure(v2))
        o1, o2 = ph.apply(v1, x), phg.apply(v2, x)
        np.testing.assert_allclose(np.asarray(o1["dist"].alpha),
                                   np.asarray(o2["dist"].alpha), rtol=1e-6)

    def test_gradient_survives_saturation(self):
        ph, phg = self._heads()
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 512))

        def entropy_of(head, variables):
            return jnp.mean(head.apply(variables, x)["dist"].entropy())

        def saturate(variables):
            p = jax.tree_util.tree_map(lambda a: a, variables)
            p["params"]["alpha"]["bias"] = p["params"]["alpha"]["bias"] - 8.0
            p["params"]["beta"]["bias"] = p["params"]["beta"]["bias"] - 8.0
            return p

        v1 = saturate(ph.init(jax.random.PRNGKey(1), x, training=False))
        v2 = saturate(phg.init(jax.random.PRNGKey(1), x, training=False))
        g1 = jax.grad(lambda v: entropy_of(ph, v))(v1)
        g2 = jax.grad(lambda v: entropy_of(phg, v))(v2)
        n1 = np.abs(np.asarray(g1["params"]["alpha"]["bias"])).mean()
        n2 = np.abs(np.asarray(g2["params"]["alpha"]["bias"])).mean()
        assert n2 > 5.0 * n1


def test_sharp_recipe_spec():
    """main.sharp_recipe: decaying entropy + the Beta-head guard."""
    import main as main_mod
    recipe = main_mod.sharp_recipe()
    sched = recipe["entropy_regularization"]
    assert sched() <= 0.02
    for _ in range(400):
        sched.on_episode()
    assert sched() <= 1e-3
    assert recipe["network"]["control_policy"]["preact_floor"] == -3.0
    assert recipe["gamma"] == 0.999 and recipe["lambda_"] == 0.95


class TestFusedShuffleUnits:
    """fused_units=True (Pallas, interpret mode on CPU) vs the flax path.

    Unit-level numerics (fwd/bwd/stats, tight tolerances) are pinned by
    scripts/smoke_shuffle_fused.py; these tests pin the BACKBONE integration:
    identical variable trees, inference/training forward agreement, the
    running-average fold, and gradient flow through the custom_vjp + weight
    prep un-scatter.  Tiny geometry keeps interpret mode affordable.
    """

    @staticmethod
    def _nets():
        kw = dict(g=0.5, last_channels=64)
        return (ShuffleNetV2(fused_units=False, **kw),
                ShuffleNetV2(fused_units=True, **kw))

    @staticmethod
    def _x():
        # 48x64 keeps the last stage at 2x2 with 8 rows of batch stats:
        # per-unit agreement is ~1e-7 (smoke), but degenerate late-stage
        # geometries (1x1, 2 rows) collapse batch variance and the BN's
        # rsqrt(var+eps) amplifies float noise ~30x PER UNIT — tolerances
        # here bound the integration, not the kernel numerics.
        return jax.random.normal(jax.random.PRNGKey(7), (2, 2, 48, 64, 3),
                                 jnp.float32)

    def test_tree_identical_and_infer_close(self):
        ref, fus = self._nets()
        x = self._x()
        v = ref.init(jax.random.PRNGKey(0), x, training=False)
        v2 = fus.init(jax.random.PRNGKey(0), x, training=False)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
        y_ref = ref.apply(v, x, training=False)
        y_fus = fus.apply(v, x, training=False)
        np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_train_forward_and_stat_fold(self):
        ref, fus = self._nets()
        x = self._x()
        v = ref.init(jax.random.PRNGKey(0), x, training=False)
        y_ref, mut_ref = ref.apply(v, x, training=True, mutable=["batch_stats"])
        y_fus, mut_fus = fus.apply(v, x, training=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref),
                                   rtol=1e-3, atol=1e-3)
        leaves_r = jax.tree_util.tree_leaves_with_path(mut_ref["batch_stats"])
        leaves_f = {jax.tree_util.keystr(k): val for k, val in
                    jax.tree_util.tree_leaves_with_path(mut_fus["batch_stats"])}
        assert len(leaves_r) == len(leaves_f)
        for k, val in leaves_r:
            np.testing.assert_allclose(np.asarray(leaves_f[jax.tree_util.keystr(k)]),
                                       np.asarray(val), rtol=1e-3, atol=1e-5,
                                       err_msg=jax.tree_util.keystr(k))

    @pytest.mark.slow
    def test_train_gradients_close(self):
        ref, fus = self._nets()
        x = self._x()
        v = ref.init(jax.random.PRNGKey(0), x, training=False)
        params, stats = v["params"], v["batch_stats"]

        def loss(net):
            def f(p):
                y, _ = net.apply({"params": p, "batch_stats": stats}, x,
                                 training=True, mutable=["batch_stats"])
                return jnp.sum(jnp.tanh(y))
            return f

        g_ref = jax.grad(loss(ref))(params)
        g_fus = jax.grad(loss(fus))(params)
        for (k, gr), gf in zip(jax.tree_util.tree_leaves_with_path(g_ref),
                               jax.tree_util.tree_leaves(g_fus)):
            scale = float(np.abs(np.asarray(gr)).max())
            err = float(np.abs(np.asarray(gf) - np.asarray(gr)).max())
            # 1e-1 floor: BN-absorbed conv biases have a mathematically-zero
            # gradient (BN is shift-invariant) — both paths emit float noise
            # there, so a pure relative metric is meaningless on those leaves.
            assert err / (1e-1 + scale) < 5e-3, (jax.tree_util.keystr(k), err, scale)
