"""SimCLR-style augmentations + the CARLA agent's training pipeline.

Reference: `rl/augmentations/simclr.py` (color_jitter/color_drop/pipeline)
and `core/carla_agent.py:527-579` (the probability-gated pipeline applied to
the stacked camera images, gated by `aug_intensity`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from carla_driving_rl_agent_tpu.augment import augmentations as A


def color_jitter(key: jax.Array, image: jax.Array, strength: float = 1.0) -> jax.Array:
    """brightness -> contrast -> saturation -> hue, clipped to [0,1]
    (reference `simclr.py:44-58`)."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    image = A.brightness(kb, image, delta=0.2 * strength)
    image = A.contrast(kc, image, lower=1.0 - 0.8 * strength, upper=1.0 + 0.8 * strength)
    image = A.saturation(ks, image, lower=1.0 - 0.8 * strength, upper=1.0 + 0.8 * strength)
    image = A.hue(kh, image, delta=0.2 * strength)
    return jnp.clip(image, 0.0, 1.0)


def color_drop(image: jax.Array) -> jax.Array:
    """Grayscale repeated to 3 channels (reference `simclr.py:61-64`)."""
    return A.repeat_channels(A.grayscale(image), n=3)


def color_distortion(key: jax.Array, image: jax.Array, strength: float = 1.0,
                     jitter_prob: float = 0.8, drop_prob: float = 0.2) -> jax.Array:
    k1, k2, k3 = jax.random.split(key, 3)
    image = jnp.where(A.chance(k1) <= jitter_prob,
                      color_jitter(k2, image, strength), image)
    image = jnp.where(A.chance(k3) <= drop_prob, color_drop(image), image)
    return image


def carla_augment_pipeline(key: jax.Array, image: jax.Array,
                           alpha: float) -> jax.Array:
    """The CARLAgent training augmentation (reference
    `core/carla_agent.py:544-579`): probability-gated color jitter, blur,
    salt&pepper, gaussian noise, min-max normalize, cutout, coarse dropout.
    `image` is (H, W, C) float in [0,1]; `alpha` = aug_intensity.
    """
    if alpha <= 0.0:
        return image
    keys = jax.random.split(key, 12)

    image = jnp.where(A.chance(keys[0]) < alpha,
                      color_jitter(keys[1], image, strength=alpha), image)

    blur3 = A.gaussian_blur(keys[3], image, size=3)
    blur5 = A.gaussian_blur(keys[3], image, size=5)
    blurred = jnp.where(A.chance(keys[4]) >= 0.5, blur3, blur5)
    image = jnp.where(A.chance(keys[2]) < 0.25 * alpha, blurred, image)

    image = jnp.where(A.chance(keys[5]) < 0.2 * alpha,
                      A.salt_and_pepper(keys[6], image, amount=0.1), image)
    image = jnp.where(A.chance(keys[7]) < 0.33 * alpha,
                      A.gaussian_noise(keys[8], image, amount=0.10, std=0.075), image)
    image = A.normalize(image)
    image = jnp.where(A.chance(keys[9]) < 0.15 * alpha,
                      A.cutout(keys[10], image, size=6), image)
    image = jnp.where(A.chance(keys[11]) < 0.15 * alpha,
                      A.coarse_dropout(keys[10], image, size=81, amount=0.04), image)
    return image
