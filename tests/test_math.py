"""Golden-value tests for the RL math core against the reference formulas
(reference `rl/utils.py:57-84,140-151,344-349`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from carla_driving_rl_agent_tpu.utils import math as m


def np_discount_cumsum(x, discount):
    out = np.zeros_like(x, dtype=np.float64)
    acc = 0.0
    for i in range(len(x) - 1, -1, -1):
        acc = x[i] + discount * acc
        out[i] = acc
    return out


def ref_decompose(num):
    """Literal transcription of the reference while-loop formula."""
    exponent = 0
    while abs(num) > 1.0:
        num /= 10.0
        exponent += 1
    return num, float(exponent)


class TestDiscountCumsum:
    @pytest.mark.parametrize("discount", [0.0, 0.5, 0.99, 0.9999, 1.0])
    def test_matches_sequential(self, discount, rng):
        x = rng.normal(size=57).astype(np.float32)
        got = np.asarray(m.discount_cumsum(x, discount))
        want = np_discount_cumsum(x, discount)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)

    def test_batched_axis0(self, rng):
        x = rng.normal(size=(31, 4)).astype(np.float32)
        got = np.asarray(m.discount_cumsum(x, 0.9))
        for b in range(4):
            np.testing.assert_allclose(got[:, b], np_discount_cumsum(x[:, b], 0.9),
                                       rtol=2e-5, atol=1e-5)


class TestGAE:
    def test_lambda_zero_is_td_error(self, rng):
        r = rng.normal(size=11).astype(np.float32)
        v = rng.normal(size=11).astype(np.float32)
        adv = np.asarray(m.gae(r, v, gamma=0.9, lambda_=0.0))
        want = r[:-1] + 0.9 * v[1:] - v[:-1]
        np.testing.assert_allclose(adv, want, rtol=1e-5, atol=1e-6)

    def test_gae_matches_reference_formula(self, rng):
        r = rng.normal(size=16).astype(np.float32)
        v = rng.normal(size=16).astype(np.float32)
        gamma, lam = 0.99, 0.95
        deltas = r[:-1] + gamma * v[1:] - v[:-1]
        want = np_discount_cumsum(deltas, gamma * lam)
        got = np.asarray(m.gae(r, v, gamma, lam))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)

    def test_rewards_to_go_drops_bootstrap(self, rng):
        r = rng.normal(size=9).astype(np.float32)
        got = np.asarray(m.rewards_to_go(r, 0.99))
        want = np_discount_cumsum(r, 0.99)[:-1]
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


class TestBatchedGAE:
    def test_no_done_matches_single_trajectory(self, rng):
        T, B = 20, 3
        r = rng.normal(size=(T, B)).astype(np.float32)
        v = rng.normal(size=(T, B)).astype(np.float32)
        boot = rng.normal(size=(B,)).astype(np.float32)
        dones = np.zeros((T, B), np.float32)
        adv, ret = m.batched_gae(r, v, dones, boot, gamma=0.99, lambda_=0.95)
        # compare against the unbatched reference-style computation per world
        for b in range(B):
            rr = np.concatenate([r[:, b], [0.0]])
            vv = np.concatenate([v[:, b], [boot[b]]])
            # fold gamma*boot into reference form: gae() with appended bootstrap
            want = np.asarray(m.gae(rr + 0.0, vv, 0.99, 0.95))
            np.testing.assert_allclose(np.asarray(adv)[:, b], want, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(ret), np.asarray(adv) + v, rtol=1e-5)

    def test_done_cuts_credit(self, rng):
        T = 10
        r = np.ones((T, 1), np.float32)
        v = np.zeros((T, 1), np.float32)
        dones = np.zeros((T, 1), np.float32)
        dones[4] = 1.0
        adv, _ = m.batched_gae(r, v, dones, np.zeros((1,), np.float32), gamma=1.0, lambda_=1.0)
        adv = np.asarray(adv)[:, 0]
        # steps 0..4 see only rewards up to the done at step 4 (5 ones)
        np.testing.assert_allclose(adv[0], 5.0, atol=1e-5)
        np.testing.assert_allclose(adv[4], 1.0, atol=1e-5)
        np.testing.assert_allclose(adv[5], 5.0, atol=1e-5)


class TestDecompose:
    @pytest.mark.parametrize("x", [0.0, 0.5, -0.5, 1.0, -1.0, 2.34, -2.34, 10.0,
                                   99.9, 100.0, 523.0, 1000.0, -1000.0, 2026.0, 1e6])
    def test_matches_reference_loop(self, x):
        base, exp = m.decompose_number(jnp.float32(x))
        want_base, want_exp = ref_decompose(np.float32(x))
        assert float(exp) == want_exp, (x, float(exp), want_exp)
        np.testing.assert_allclose(float(base), want_base, rtol=1e-5, atol=1e-7)

    def test_roundtrip(self, rng):
        x = rng.normal(size=128).astype(np.float32) * 1e4
        base, exp = m.decompose_number(x)
        back = np.asarray(m.compose_number(base, exp))
        np.testing.assert_allclose(back, x, rtol=1e-5, atol=1e-5)
        assert np.all(np.abs(np.asarray(base)) <= 1.0 + 1e-6)


class TestSpNorm:
    def test_reference_formula(self, rng):
        x = rng.normal(size=64).astype(np.float32)
        got = np.asarray(m.sp_norm(x))
        eps = 1e-3
        pos = x * (x > 0)
        neg = x * (x < 0)
        want = pos / (x.max() + eps) + neg / -(x.min() - eps)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_bounded_and_sign_preserving(self, rng):
        x = rng.normal(size=100).astype(np.float32) * 50
        y = np.asarray(m.sp_norm(x))
        assert np.all(np.abs(y) <= 1.0)
        assert np.all(np.sign(y) == np.sign(x))


class TestMisc:
    def test_kl(self):
        la, lb = jnp.float32(-0.5), jnp.float32(-1.5)
        assert float(m.kl_divergence(la, lb)) == pytest.approx(-0.5 * 1.0)

    def test_clip_by_norm(self, rng):
        x = rng.normal(size=(4, 4)).astype(np.float32) * 10
        y = np.asarray(m.clip_by_norm(x, 1.0))
        assert np.linalg.norm(y) <= 1.0 + 1e-5
        small = np.ones((2,), np.float32) * 1e-3
        np.testing.assert_allclose(np.asarray(m.clip_by_norm(small, 1.0)), small)

    def test_polyak(self):
        new = {"w": jnp.ones(3)}
        old = {"w": jnp.zeros(3)}
        out = m.polyak_average(new, old, alpha=0.75)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.75)

    def test_cosine_similarity(self):
        a = jnp.array([1.0, 0.0])
        b = jnp.array([0.0, 1.0])
        assert float(m.cosine_similarity(a, a)) == pytest.approx(1.0)
        assert float(m.cosine_similarity(a, b)) == pytest.approx(0.0, abs=1e-6)
        assert float(m.cosine_similarity(a, -a)) == pytest.approx(-1.0)
