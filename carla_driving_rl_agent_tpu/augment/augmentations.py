"""Image augmentation library — JAX ports of the reference's tf-graph ops.

Reference: `rl/augmentations/augmentations.py` (same op set and default
strengths; single-image signatures, vmap for batches — the `_batch` variants
of the reference become one-liners).  Images are float32 in [0, 1] with shape
(H, W, C), matching the env observation contract.

Every op takes an explicit PRNG key (pure functions: composable inside the
jitted update/rollout, unlike the reference's global-seed tf ops).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def chance(key: jax.Array) -> jax.Array:
    """A single uniform sample in [0,1) (reference `tf_chance`,
    `rl/utils.py:332-334`)."""
    return jax.random.uniform(key, ())


# -------------------------------------------------------------------------
# Geometric / spatial
# -------------------------------------------------------------------------

def resize(image: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize to (H, W) (reference `tf_resize`)."""
    return jax.image.resize(image, size + image.shape[2:], method="bilinear")


def crop(key: jax.Array, image: jax.Array, size: Tuple[int, int],
         do_resize: bool = False) -> jax.Array:
    """Random crop (reference `tf_crop`)."""
    h, w = image.shape[:2]
    ch, cw = size
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, max(h - ch, 0) + 1)
    x0 = jax.random.randint(kx, (), 0, max(w - cw, 0) + 1)
    out = jax.lax.dynamic_slice(image, (y0, x0, 0), (ch, cw, image.shape[2]))
    if do_resize:
        return resize(out, (h, w))
    return out


def flip(key: jax.Array, image: jax.Array, horizontal: bool = True,
         vertical: bool = False) -> jax.Array:
    """Random flips (reference `tf_flip`)."""
    kh, kv = jax.random.split(key)
    if horizontal:
        image = jnp.where(jax.random.uniform(kh, ()) < 0.5,
                          jnp.flip(image, axis=1), image)
    if vertical:
        image = jnp.where(jax.random.uniform(kv, ()) < 0.5,
                          jnp.flip(image, axis=0), image)
    return image


def rotate(image: jax.Array, degrees: int = 90) -> jax.Array:
    """Rotation by multiples of 90 degrees (reference `tf_rotate`)."""
    assert degrees % 90 == 0
    return jnp.rot90(image, k=degrees // 90)


def cutout(key: jax.Array, image: jax.Array, size: int = 5) -> jax.Array:
    """Zero out one cell of a size x size grid (reference `tf_cutout`: the
    argmax cell of a random (size, size) mask is dropped)."""
    noise = jax.random.normal(key, (size, size))
    mask_small = jnp.where(noise == jnp.max(noise), 0.0, 1.0)
    mask = jax.image.resize(mask_small, image.shape[:2], method="nearest")
    return image * mask[..., None]


def coarse_dropout(key: jax.Array, image: jax.Array, size: int = 25,
                   amount: float = 0.1) -> jax.Array:
    """Drop `amount` of the cells of a size x size grid
    (reference `tf_coarse_dropout`)."""
    mask_small = (jax.random.uniform(key, (size, size)) > amount).astype(jnp.float32)
    mask = jax.image.resize(mask_small, image.shape[:2], method="nearest")
    return image * mask[..., None]


# -------------------------------------------------------------------------
# Appearance
# -------------------------------------------------------------------------

def _rgb_to_gray(image: jax.Array) -> jax.Array:
    w = jnp.asarray([0.2989, 0.5870, 0.1140])
    return jnp.sum(image[..., :3] * w, axis=-1, keepdims=True)


def grayscale(image: jax.Array) -> jax.Array:
    """RGB -> 1-channel luminance (reference `tf_grayscale`)."""
    return _rgb_to_gray(image)


def repeat_channels(image: jax.Array, n: int = 3) -> jax.Array:
    return jnp.repeat(image, n, axis=-1)


def brightness(key: jax.Array, image: jax.Array, delta: float = 0.75) -> jax.Array:
    """Additive brightness in [-delta, delta] (reference `tf_brightness`)."""
    d = jax.random.uniform(key, (), minval=-delta, maxval=delta)
    return image + d


def contrast(key: jax.Array, image: jax.Array, lower: float = 0.4,
             upper: float = 1.6) -> jax.Array:
    """Per-channel contrast about the channel mean (reference `tf_contrast`)."""
    f = jax.random.uniform(key, (), minval=lower, maxval=upper)
    mean = jnp.mean(image, axis=(0, 1), keepdims=True)
    return (image - mean) * f + mean


def saturation(key: jax.Array, image: jax.Array, lower: float = 0.5,
               upper: float = 1.5) -> jax.Array:
    """Blend with grayscale (reference `tf_saturation`)."""
    f = jax.random.uniform(key, (), minval=lower, maxval=upper)
    gray = _rgb_to_gray(image)
    return gray + (image - gray) * f


def hue(key: jax.Array, image: jax.Array, delta: float = 0.5) -> jax.Array:
    """Hue rotation by a random angle (reference `tf_hue`), implemented as a
    YIQ-space chroma rotation (linear, VPU-friendly)."""
    theta = jax.random.uniform(key, (), minval=-delta, maxval=delta) * jnp.pi
    cos_h, sin_h = jnp.cos(theta), jnp.sin(theta)
    # RGB -> YIQ
    to_yiq = jnp.asarray([[0.299, 0.587, 0.114],
                          [0.596, -0.274, -0.322],
                          [0.211, -0.523, 0.312]])
    from_yiq = jnp.linalg.inv(to_yiq)
    yiq = image[..., :3] @ to_yiq.T
    rot = jnp.stack([yiq[..., 0],
                     yiq[..., 1] * cos_h - yiq[..., 2] * sin_h,
                     yiq[..., 1] * sin_h + yiq[..., 2] * cos_h], axis=-1)
    return rot @ from_yiq.T


def gaussian_noise(key: jax.Array, image: jax.Array, amount: float = 0.25,
                   std: float = 0.2) -> jax.Array:
    """Additive noise on a random `amount` of pixels
    (reference `tf_gaussian_noise`)."""
    k1, k2 = jax.random.split(key)
    select = (jax.random.uniform(k1, image.shape[:2]) < amount).astype(jnp.float32)
    noise = jnp.clip(jax.random.normal(k2, image.shape) * std, 0.0, 1.0)
    return image + select[..., None] * noise


def salt_and_pepper(key: jax.Array, image: jax.Array, amount: float = 0.1,
                    prob: float = 0.5) -> jax.Array:
    """Salt & pepper on amount/10 of pixels (reference `tf_salt_and_pepper`)."""
    k1, k2 = jax.random.split(key)
    select = (jax.random.uniform(k1, image.shape[:2]) < amount / 10.0).astype(jnp.float32)
    noise = (jax.random.uniform(k2, image.shape[:2]) < prob).astype(jnp.float32)
    select = select[..., None]
    return image * (1 - select) + noise[..., None] * select


def gaussian_blur(key: jax.Array, image: jax.Array, size: int = 5,
                  std: float = 0.25) -> jax.Array:
    """Depthwise blur with a random near-one kernel (the reference's
    idiosyncratic `tf_gaussian_blur` uses a normal(mean=1, std) kernel)."""
    c = image.shape[-1]
    kernel = jax.random.normal(key, (size, size)) * std + 1.0
    kernel = kernel / jnp.sum(kernel)
    img = jnp.moveaxis(image, -1, 0)[:, None]         # (C, 1, H, W)
    out = jax.lax.conv_general_dilated(
        img, kernel[None, None], (1, 1), "SAME")
    return jnp.moveaxis(out[:, 0], 0, -1)


def median_blur(image: jax.Array, size: int = 5) -> jax.Array:
    """Box filter (the reference's `tf_median_blur` is actually an unweighted
    box sum via depthwise conv of ones; normalized here)."""
    c = image.shape[-1]
    kernel = jnp.ones((size, size)) / (size * size)
    img = jnp.moveaxis(image, -1, 0)[:, None]
    out = jax.lax.conv_general_dilated(img, kernel[None, None], (1, 1), "SAME")
    return jnp.moveaxis(out[:, 0], 0, -1)


def multiply_channels(key: jax.Array, image: jax.Array,
                      strength: float = 1.0) -> jax.Array:
    """Channel-wise multiplication by softmax-random scalars
    (reference `tf_multiply_channels`)."""
    logits = jax.random.uniform(key, (image.shape[-1],), minval=-1, maxval=1)
    alpha = jax.nn.softmax(logits) * strength
    return normalize(image * alpha)


def sobel(image: jax.Array) -> jax.Array:
    """Sobel edges dx + dy (reference `tf_sobel`)."""
    kx = jnp.asarray([[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]])
    ky = kx.T
    img = jnp.moveaxis(image, -1, 0)[:, None]
    dx = jax.lax.conv_general_dilated(img, kx[None, None], (1, 1), "SAME")
    dy = jax.lax.conv_general_dilated(img, ky[None, None], (1, 1), "SAME")
    return jnp.moveaxis((dx + dy)[:, 0], 0, -1)


def normalize(image: jax.Array, eps: float = 1e-7) -> jax.Array:
    """0-1 min-max scaling (reference `tf_normalize`)."""
    lo = jnp.min(image)
    hi = jnp.max(image)
    return (image - lo) / jnp.maximum(hi - lo, eps)


def _dct8() -> jax.Array:
    """Orthonormal 8-point DCT-II matrix."""
    k = jnp.arange(8, dtype=jnp.float32)
    d = jnp.cos((2.0 * k[None, :] + 1.0) * k[:, None] * jnp.pi / 16.0)
    scale = jnp.full((8, 1), 0.5).at[0, 0].set(1.0 / (2.0 * jnp.sqrt(2.0)))
    return d * scale


# JPEG luminance quantization table (ITU-T T.81 Annex K.1)
_JPEG_Q50 = jnp.asarray([
    [16, 11, 10, 16, 24, 40, 51, 61], [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56], [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77], [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101], [72, 92, 95, 98, 112, 100, 103, 99],
], jnp.float32)


def jpeg_quality(key: jax.Array, image: jax.Array, min_quality: int = 20,
                 max_quality: int = 95) -> jax.Array:
    """JPEG-compression-artifact analog of the reference's `tf_quality`
    (`rl/augmentations/augmentations.py:40-41`, tf.image.random_jpeg_quality):
    8x8 block DCT + standard-table quantization at a random quality in
    [min_quality, max_quality], per channel.  TPU-first: the DCT is two 8x8
    matmuls per block (MXU), quantization is elementwise — no entropy coding,
    which contributes no visual artifact anyway."""
    h, w, c = image.shape
    q = jax.random.randint(key, (), min_quality, max_quality + 1).astype(jnp.float32)
    # ITU quality -> table scale: 5000/q below 50, 200-2q above
    scale = jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q) / 100.0
    table = jnp.clip(jnp.round(_JPEG_Q50 * scale), 1.0, 255.0)
    ph, pw = (-h) % 8, (-w) % 8
    x = jnp.pad(image, ((0, ph), (0, pw), (0, 0)), mode="edge") * 255.0 - 128.0
    hb, wb = (h + ph) // 8, (w + pw) // 8
    blocks = x.reshape(hb, 8, wb, 8, c).transpose(0, 2, 4, 1, 3)  # (hb,wb,c,8,8)
    d = _dct8()
    coeff = jnp.einsum("ij,...jk,lk->...il", d, blocks, d)
    coeff = jnp.round(coeff / table) * table
    out = jnp.einsum("ji,...jk,kl->...il", d, coeff, d)
    out = out.transpose(0, 3, 1, 4, 2).reshape(hb * 8, wb * 8, c)
    return jnp.clip((out + 128.0) / 255.0, 0.0, 1.0)[:h, :w]
