"""On-device photometric augmentation (the train-time RGB jitter chain).

Capability match for the reference's Pillow augmentation chain — gaussian
blur, sharpness, contrast, brightness, color, each applied with probability p
(ref: cosypose/datasets/augmentations.py:40-91) — implemented as vectorized
jnp ops inside the jitted train step.

Why on device: this host has a single CPU core driving the TPU through a
dispatch tunnel; the Pillow chain costs ~1 ms/image serially and cannot be
parallelized away (threads are GIL-bound, there is one core for processes).
Every op here is elementwise or a tiny separable conv — microseconds on the
MXU/VPU and fused by XLA into the uint8→float conversion it already performs.

Semantics match Pillow's ImageEnhance operators:
  * enhance(f) = degenerate + f·(image − degenerate)   (Image.blend)
  * Brightness: degenerate = black
  * Contrast:   degenerate = uniform image at the mean of the L channel
  * Color:      degenerate = grayscale (ITU-R 601-2 L = .299R+.587G+.114B)
  * Sharpness:  degenerate = 3×3 SMOOTH-filtered image
                (kernel [[1,1,1],[1,5,1],[1,1,1]]/13)
  * GaussianBlur(radius): separable gaussian, sigma = radius
Pillow clamps to uint8 after every op; we clamp to [0,1] (images arrive as
float in [0,1] on device) without re-quantizing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Parameter ranges of the host chain (data/augmentations.py:142-159).
_BLUR_RADIUS = (1.0, 3.0)
_SHARPNESS = (0.0, 50.0)
_CONTRAST = (0.2, 50.0)
_BRIGHTNESS = (0.1, 6.0)
_COLOR = (0.0, 20.0)

_GAUSS_R = 9  # taps cover ±3σ at the max radius 3


def _luminance(images):
    """ITU-R 601-2 L channel; images (B, 3, H, W)."""
    w = jnp.array([0.299, 0.587, 0.114], images.dtype)
    return jnp.einsum("c,bchw->bhw", w, images)


def _per_sample_blend(images, degenerate, factor):
    """Pillow enhance: degenerate + f·(im − degenerate), f per sample (B,)."""
    f = factor[:, None, None, None]
    return jnp.clip(degenerate + f * (images - degenerate), 0.0, 1.0)


def _gaussian_blur(images, sigma):
    """Separable per-sample gaussian blur. images (B,C,H,W), sigma (B,)."""
    B, C, H, W = images.shape
    x = jnp.arange(-_GAUSS_R, _GAUSS_R + 1, dtype=images.dtype)
    taps = jnp.exp(-0.5 * (x[None, :] / sigma[:, None]) ** 2)  # (B, K)
    taps = taps / taps.sum(axis=1, keepdims=True)
    rhs = jnp.repeat(taps, C, axis=0)[:, None, None, :]  # (B*C, 1, 1, K)
    dn = ("NCHW", "OIHW", "NCHW")

    out = jnp.pad(images, ((0, 0), (0, 0), (0, 0), (_GAUSS_R, _GAUSS_R)),
                  mode="edge").reshape(1, B * C, H, W + 2 * _GAUSS_R)
    out = jax.lax.conv_general_dilated(
        out, rhs, (1, 1), "VALID", feature_group_count=B * C,
        dimension_numbers=dn,
    ).reshape(B, C, H, W)
    out = jnp.pad(out, ((0, 0), (0, 0), (_GAUSS_R, _GAUSS_R), (0, 0)),
                  mode="edge").reshape(1, B * C, H + 2 * _GAUSS_R, W)
    out = jax.lax.conv_general_dilated(
        out, rhs[:, :, :, :].transpose(0, 1, 3, 2), (1, 1), "VALID",
        feature_group_count=B * C, dimension_numbers=dn,
    ).reshape(B, C, H, W)
    return jnp.clip(out, 0.0, 1.0)


def _smooth3x3(images):
    """Pillow ImageFilter.SMOOTH: [[1,1,1],[1,5,1],[1,1,1]]/13, edge pad."""
    B, C, H, W = images.shape
    k = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], images.dtype) / 13.0
    rhs = jnp.tile(k[None, None], (B * C, 1, 1, 1))  # (B*C,1,3,3)
    out = jnp.pad(images, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    out = jax.lax.conv_general_dilated(
        out.reshape(1, B * C, H + 2, W + 2), rhs, (1, 1), "VALID",
        feature_group_count=B * C,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ).reshape(B, C, H, W)
    # Pillow keeps the original 1-px border unfiltered (ImageEnhance pastes
    # the source border back over kernel-filter output)
    out = out.at[:, :, 0, :].set(images[:, :, 0, :])
    out = out.at[:, :, -1, :].set(images[:, :, -1, :])
    out = out.at[:, :, :, 0].set(images[:, :, :, 0])
    out = out.at[:, :, :, -1].set(images[:, :, :, -1])
    return out


def _maybe(key, p, images, aug_images):
    """Per-sample coin flip between original and augmented."""
    use = jax.random.uniform(key, (images.shape[0],)) < p
    return jnp.where(use[:, None, None, None], aug_images, images)


def color_jitter(rng, images, p: float = 0.4):
    """The full jitter chain on (B, 3, H, W) float images in [0, 1].

    Each op fires independently per sample with probability p, factor drawn
    uniformly from the host chain's interval (ref augmentations.py:142-159).
    """
    B = images.shape[0]
    keys = jax.random.split(rng, 10)

    # 1. gaussian blur
    sigma = jax.random.uniform(keys[0], (B,), minval=_BLUR_RADIUS[0],
                               maxval=_BLUR_RADIUS[1])
    images = _maybe(keys[1], p, images, _gaussian_blur(images, sigma))
    # 2. sharpness
    f = jax.random.uniform(keys[2], (B,), minval=_SHARPNESS[0],
                           maxval=_SHARPNESS[1])
    images = _maybe(keys[3], p, images,
                    _per_sample_blend(images, _smooth3x3(images), f))
    # 3. contrast (degenerate = mean of L, Pillow rounds the mean on the
    # 0-255 scale — round(mean·255)/255 keeps that quantization)
    f = jax.random.uniform(keys[4], (B,), minval=_CONTRAST[0],
                           maxval=_CONTRAST[1])
    mean = jnp.round(
        _luminance(images).mean(axis=(1, 2)) * 255.0 + 0.5
    ) / 255.0
    images = _maybe(keys[5], p, images,
                    _per_sample_blend(images, mean[:, None, None, None], f))
    # 4. brightness (degenerate = black)
    f = jax.random.uniform(keys[6], (B,), minval=_BRIGHTNESS[0],
                           maxval=_BRIGHTNESS[1])
    images = _maybe(keys[7], p, images, _per_sample_blend(images, 0.0, f))
    # 5. color/saturation (degenerate = grayscale)
    f = jax.random.uniform(keys[8], (B,), minval=_COLOR[0], maxval=_COLOR[1])
    gray = _luminance(images)[:, None]
    images = _maybe(keys[9], p, images, _per_sample_blend(images, gray, f))
    return images
