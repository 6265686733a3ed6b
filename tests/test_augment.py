"""Augmentation library tests (reference rl/augmentations/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_driving_rl_agent_tpu.augment import augmentations as A
from carla_driving_rl_agent_tpu.augment import simclr


@pytest.fixture
def image(rng):
    return jnp.asarray(rng.random((32, 48, 3)), jnp.float32)


class TestGeometric:
    def test_crop_shape_and_resize(self, image):
        out = A.crop(jax.random.PRNGKey(0), image, (16, 24))
        assert out.shape == (16, 24, 3)
        out = A.crop(jax.random.PRNGKey(0), image, (16, 24), do_resize=True)
        assert out.shape == image.shape

    def test_flip_deterministic_under_key(self, image):
        a = A.flip(jax.random.PRNGKey(1), image)
        b = A.flip(jax.random.PRNGKey(1), image)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_cutout_zeroes_one_cell(self, image):
        out = np.asarray(A.cutout(jax.random.PRNGKey(0), image, size=4))
        zero_frac = (out == 0).mean()
        assert 0.01 < zero_frac < 0.2  # one of 16 cells zeroed

    def test_coarse_dropout_amount(self, image):
        out = np.asarray(A.coarse_dropout(jax.random.PRNGKey(0), image,
                                          size=16, amount=0.3))
        dropped = (out == 0).mean()
        assert 0.1 < dropped < 0.5

    def test_rotate(self, image):
        out = A.rotate(image, 90)
        assert out.shape == (48, 32, 3)


class TestAppearance:
    def test_grayscale_and_repeat(self, image):
        g = A.grayscale(image)
        assert g.shape == (32, 48, 1)
        rgb = A.repeat_channels(g, 3)
        assert rgb.shape == (32, 48, 3)

    def test_contrast_preserves_mean(self, image):
        out = A.contrast(jax.random.PRNGKey(3), image)
        np.testing.assert_allclose(np.asarray(out).mean(axis=(0, 1)),
                                   np.asarray(image).mean(axis=(0, 1)),
                                   atol=1e-3)

    def test_hue_preserves_luma(self, image):
        out = A.hue(jax.random.PRNGKey(4), image, delta=0.5)
        luma_in = np.asarray(A.grayscale(image))
        luma_out = np.asarray(A.grayscale(out))
        np.testing.assert_allclose(luma_out, luma_in, atol=0.02)

    def test_salt_and_pepper_fraction(self, image):
        out = np.asarray(A.salt_and_pepper(jax.random.PRNGKey(5), image,
                                           amount=1.0))
        changed = (np.abs(out - np.asarray(image)) > 1e-6).any(-1).mean()
        assert 0.02 < changed < 0.25  # amount/10 of pixels

    def test_blur_smooths(self, image):
        out = A.gaussian_blur(jax.random.PRNGKey(6), image, size=5)
        assert np.asarray(out).std() < np.asarray(image).std()

    def test_normalize_unit_range(self, image):
        out = np.asarray(A.normalize(image * 7.3 + 2))
        assert out.min() == pytest.approx(0.0, abs=1e-6)
        assert out.max() == pytest.approx(1.0, abs=1e-6)

    def test_jpeg_quality_degrades_monotonically(self, image):
        from carla_driving_rl_agent_tpu.augment.augmentations import jpeg_quality
        key = jax.random.PRNGKey(3)
        hi = jpeg_quality(key, image, min_quality=95, max_quality=95)
        lo = jpeg_quality(key, image, min_quality=5, max_quality=5)
        assert hi.shape == image.shape and lo.shape == image.shape
        e_hi = float(jnp.mean(jnp.abs(hi - image)))
        e_lo = float(jnp.mean(jnp.abs(lo - image)))
        # near-lossless at q=95, visible artifacts at q=5, all in range
        assert e_hi < 0.02 and e_lo > 2.0 * e_hi, (e_hi, e_lo)
        assert float(jnp.min(lo)) >= 0.0 and float(jnp.max(lo)) <= 1.0

    def test_sobel_runs(self, image):
        out = A.sobel(image)
        assert out.shape == image.shape


class TestSimCLR:
    def test_color_jitter_in_range(self, image):
        out = np.asarray(simclr.color_jitter(jax.random.PRNGKey(0), image, 1.0))
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_pipeline_zero_alpha_is_identity(self, image):
        out = simclr.carla_augment_pipeline(jax.random.PRNGKey(0), image, 0.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(image))

    def test_pipeline_full_alpha_changes_image(self, image):
        out = simclr.carla_augment_pipeline(jax.random.PRNGKey(0), image, 1.0)
        assert not np.allclose(np.asarray(out), np.asarray(image))
        assert np.all(np.isfinite(np.asarray(out)))


class TestWrappers:
    def test_play_wrapper_runs(self, tmp_path):
        from carla_driving_rl_agent_tpu.envs.carla_env import CARLAEnv, CARLAEnvConfig
        from carla_driving_rl_agent_tpu.envs.wrappers import CARLAPlayWrapper
        from carla_driving_rl_agent_tpu.envs.world import WorldParams
        env = CARLAEnv(CARLAEnvConfig(
            world=WorldParams(town_names=("Town02",), num_routes=4,
                              max_route_len=128, max_timesteps=16),
            image_height=48, image_width=32, render_mode="zeros"))
        result = CARLAPlayWrapper(env).play(timesteps=12)
        assert "total_reward" in result and result["timesteps"] <= 16
