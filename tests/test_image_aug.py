"""Device-side photometric jitter vs the Pillow host chain.

The train step can run the augmentation chain on device (ops/image_aug.py,
PoseTrainConfig.rgb_aug_device) — these tests pin each op to its Pillow
counterpart (the host chain in data/augmentations.py:142-159, itself the
capability match for ref cosypose/datasets/augmentations.py:40-91).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageFilter

from cosypose_tpu.ops.image_aug import (
    _gaussian_blur,
    _luminance,
    _per_sample_blend,
    _smooth3x3,
    color_jitter,
)


@pytest.fixture(scope="module")
def rgb():
    rng = np.random.RandomState(0)
    # smooth-ish image: random low-res upsampled, so blur comparisons are not
    # dominated by per-pixel quantization of high-frequency noise
    small = rng.randint(0, 255, (15, 20, 3), np.uint8)
    im = Image.fromarray(small).resize((160, 120), Image.BILINEAR)
    return np.asarray(im)


def _dev(rgb):
    return jnp.asarray(rgb, jnp.float32).transpose(2, 0, 1)[None] / 255.0


def _host(out):
    return np.asarray(out[0].transpose(1, 2, 0) * 255.0)


def test_brightness_matches_pillow(rgb):
    f = 1.7
    pil = np.asarray(ImageEnhance.Brightness(Image.fromarray(rgb)).enhance(f))
    ours = _host(_per_sample_blend(_dev(rgb), 0.0, jnp.array([f])))
    assert np.abs(ours - pil).max() <= 1.0


def test_color_matches_pillow(rgb):
    f = 0.3
    pil = np.asarray(ImageEnhance.Color(Image.fromarray(rgb)).enhance(f))
    x = _dev(rgb)
    ours = _host(_per_sample_blend(x, _luminance(x)[:, None], jnp.array([f])))
    assert np.abs(ours - pil).max() <= 2.0


def test_contrast_matches_pillow(rgb):
    f = 1.9
    pil = np.asarray(ImageEnhance.Contrast(Image.fromarray(rgb)).enhance(f))
    x = _dev(rgb)
    mean = jnp.round(_luminance(x).mean(axis=(1, 2)) * 255.0 + 0.5) / 255.0
    ours = _host(_per_sample_blend(x, mean[:, None, None, None],
                                   jnp.array([f])))
    # PIL quantizes the L channel per pixel before averaging; the float-L
    # mean differs by <0.5 gray level, amplified by (f-1)
    assert np.abs(ours - pil).max() <= 2.5


def test_sharpness_matches_pillow(rgb):
    f = 2.0
    pil = np.asarray(ImageEnhance.Sharpness(Image.fromarray(rgb)).enhance(f))
    x = _dev(rgb)
    ours = _host(_per_sample_blend(x, _smooth3x3(x), jnp.array([f])))
    inner = (slice(2, -2), slice(2, -2))
    assert np.abs(ours[inner] - pil[inner]).max() <= 2.0


def test_gaussian_blur_close_to_pillow(rgb):
    sigma = 2.0
    pil = np.asarray(Image.fromarray(rgb).filter(
        ImageFilter.GaussianBlur(radius=sigma)))
    ours = _host(_gaussian_blur(_dev(rgb), jnp.array([sigma])))
    inner = (slice(8, -8), slice(8, -8))
    assert np.abs(ours[inner].astype(np.float32)
                  - pil[inner].astype(np.float32)).max() <= 4.0


def test_chain_p0_is_identity_and_p1_changes(rgb):
    x = jnp.concatenate([_dev(rgb)] * 4)
    out0 = color_jitter(jax.random.PRNGKey(0), x, p=0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(x), atol=1e-6)
    out1 = color_jitter(jax.random.PRNGKey(0), x, p=1.0)
    assert np.abs(np.asarray(out1) - np.asarray(x)).max() > 0.05
    assert np.isfinite(np.asarray(out1)).all()
    assert np.asarray(out1).min() >= 0.0 and np.asarray(out1).max() <= 1.0
    # per-sample independence: different samples get different factors
    o = np.asarray(out1)
    assert not np.allclose(o[0], o[1])


def test_chain_deterministic_under_key(rgb):
    x = jnp.concatenate([_dev(rgb)] * 2)
    a = color_jitter(jax.random.PRNGKey(7), x, p=0.7)
    b = color_jitter(jax.random.PRNGKey(7), x, p=0.7)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
