"""ROI-align crop extraction as a fixed-shape gather, pure jnp.

Replaces ``torchvision.ops.roi_align`` used by the reference's crop path
(ref: cosypose/lib3d/cropping.py:50-75). Implements the same semantics
(aligned=False, configurable sampling_ratio, out-of-bounds samples contribute 0)
so pose parity against released checkpoints is achievable, but as a pure
vectorized bilinear gather that XLA fuses into the surrounding jit — no host
round-trip, no dynamic shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear_sample_one(image: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Bilinear-sample one CHW image at continuous (y, x) locations.

    roi_align semantics: a sample whose (y, x) lies outside [-1, H] x [-1, W]
    contributes exactly 0; in-range coordinates are clamped to the valid pixel
    grid before interpolation.

    image (C, H, W); ys, xs (...,) → (C, ...).
    """
    C, H, W = image.shape
    oob = (ys < -1.0) | (ys > H) | (xs < -1.0) | (xs > W)
    y = jnp.clip(ys, 0.0, H - 1)
    x = jnp.clip(xs, 0.0, W - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly = y - y0
    lx = x - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    y0i = y0.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    x1i = x1.astype(jnp.int32)

    # (C, ...) gathers; XLA lowers these to efficient dynamic-gathers.
    v00 = image[:, y0i, x0i]
    v01 = image[:, y0i, x1i]
    v10 = image[:, y1i, x0i]
    v11 = image[:, y1i, x1i]
    out = hy * hx * v00 + hy * lx * v01 + ly * hx * v10 + ly * lx * v11
    return jnp.where(oob[None], 0.0, out)


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(
    images: jax.Array,
    boxes: jax.Array,
    output_size: tuple[int, int],
    sampling_ratio: int = 4,
) -> jax.Array:
    """Crop + resize each image to its box with roi_align sampling.

    images (B, C, H, W); boxes (B, 4) as (x1, y1, x2, y2) in input-pixel
    coordinates (one box per image — the reference builds its roi_align call the
    same way, batch index i ↔ box i); output_size (out_h, out_w) static.
    Returns (B, C, out_h, out_w).
    """
    out_h, out_w = output_size
    s = sampling_ratio

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    roi_w = x2 - x1
    roi_h = y2 - y1
    bin_w = roi_w / out_w
    bin_h = roi_h / out_h

    # sample offsets within one output bin: (s*out,) continuous coordinates
    iy = (jnp.arange(out_h * s) + 0.5) / s  # in units of bins along y
    ix = (jnp.arange(out_w * s) + 0.5) / s
    # per-image absolute sample coordinates: (B, out_h*s), (B, out_w*s)
    ys = y1[:, None] + iy[None, :] * bin_h[:, None]
    xs = x1[:, None] + ix[None, :] * bin_w[:, None]

    def sample_image(image, ys_i, xs_i):
        yy = jnp.repeat(ys_i, out_w * s)  # (out_h*s*out_w*s,)
        xx = jnp.tile(xs_i, out_h * s)
        vals = _bilinear_sample_one(image, yy, xx)  # (C, N)
        C = image.shape[0]
        vals = vals.reshape(C, out_h, s, out_w, s)
        return vals.mean(axis=(2, 4))

    return jax.vmap(sample_image)(images, ys, xs)
