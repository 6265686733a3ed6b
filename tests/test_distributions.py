"""Tests for policy distributions (Beta numerics are the critical path —
reference `core/networks.py:128-144`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_driving_rl_agent_tpu.models.distributions import Beta, Categorical, Gaussian


class TestBeta:
    def setup_method(self):
        self.dist = Beta(alpha=jnp.array([2.0, 5.0]), beta=jnp.array([3.0, 1.5]))

    def test_mean_std(self):
        np.testing.assert_allclose(np.asarray(self.dist.mean()), [2 / 5, 5 / 6.5], rtol=1e-6)
        a, b = 2.0, 3.0
        want_std = np.sqrt(a * b / ((a + b) ** 2 * (a + b + 1)))
        np.testing.assert_allclose(float(self.dist.stddev()[0]), want_std, rtol=1e-6)

    def test_log_prob_vs_scipy_formula(self):
        from math import lgamma
        x = np.array([0.3, 0.7], np.float32)
        lp = np.asarray(self.dist.log_prob(jnp.array(x)))
        for i, (a, b) in enumerate([(2.0, 3.0), (5.0, 1.5)]):
            log_beta = lgamma(a) + lgamma(b) - lgamma(a + b)
            want = (a - 1) * np.log(x[i]) + (b - 1) * np.log1p(-x[i]) - log_beta
            np.testing.assert_allclose(lp[i], want, rtol=1e-3, atol=5e-4)

    def test_entropy_uniform(self):
        # Beta(1,1) is Uniform(0,1): entropy 0
        d = Beta(alpha=jnp.array([1.0]), beta=jnp.array([1.0]))
        assert float(d.entropy()[0]) == pytest.approx(0.0, abs=1e-6)

    def test_samples_in_support_and_clipped_logprob_finite(self):
        key = jax.random.PRNGKey(0)
        s = self.dist.sample(key)
        assert np.all((np.asarray(s) >= 0) & (np.asarray(s) <= 1))
        # extreme samples must still give finite log-probs after clipping
        lp = self.dist.log_prob(jnp.array([0.0, 1.0]))
        assert np.all(np.isfinite(np.asarray(lp)))

    def test_sample_statistics(self):
        keys = jax.random.split(jax.random.PRNGKey(1), 8000)
        samples = jax.vmap(self.dist.sample)(keys)
        emp_mean = np.asarray(samples).mean(axis=0)
        np.testing.assert_allclose(emp_mean, np.asarray(self.dist.mean()), atol=0.02)


class TestGaussian:
    def test_log_prob_standard_normal(self):
        d = Gaussian(mu=jnp.zeros(1), log_std=jnp.zeros(1))
        lp = float(d.log_prob(jnp.zeros(1))[0])
        assert lp == pytest.approx(-0.5 * np.log(2 * np.pi), rel=1e-5)

    def test_entropy(self):
        d = Gaussian(mu=jnp.zeros(1), log_std=jnp.zeros(1))
        assert float(d.entropy()[0]) == pytest.approx(0.5 * (1 + np.log(2 * np.pi)), rel=1e-6)


class TestCategorical:
    def test_log_prob_and_entropy(self):
        logits = jnp.log(jnp.array([[0.2, 0.8]]))
        d = Categorical(logits=logits)
        np.testing.assert_allclose(float(d.log_prob(jnp.array([1]))[0]), np.log(0.8), rtol=1e-5)
        want_h = -(0.2 * np.log(0.2) + 0.8 * np.log(0.8))
        np.testing.assert_allclose(float(d.entropy()[0]), want_h, rtol=1e-5)

    def test_sampling_distribution(self):
        logits = jnp.zeros((3,))
        d = Categorical(logits=logits)
        keys = jax.random.split(jax.random.PRNGKey(0), 3000)
        s = np.asarray(jax.vmap(d.sample)(keys))
        counts = np.bincount(s.astype(int), minlength=3) / len(s)
        np.testing.assert_allclose(counts, 1 / 3, atol=0.03)
