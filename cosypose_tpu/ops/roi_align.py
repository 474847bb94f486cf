"""ROI-align crop extraction as separable interpolation MATMULS (MXU path).

Replaces ``torchvision.ops.roi_align`` used by the reference's crop path
(ref: cosypose/lib3d/cropping.py:50-75) with identical sampling semantics
(aligned=False, configurable sampling_ratio, out-of-bounds samples contribute 0).

TPU-first formulation: bilinear sampling is LINEAR in the image, and roi_align's
sample grid is axis-separable, so the whole crop is two matmuls per image:

    crop[b] = Wy[b] @ image[b] @ Wx[b]^T

where Wy (out_h, H) / Wx (out_w, W) are banded interpolation-weight matrices
(each row: the s-sample-averaged bilinear hat weights of one output row/col).
A naive gather implementation issues ~out_h*out_w*s*s*4 random scalar gathers
per image — measured 3.6 s for a 32-crop batch on TPU v5e (gathers are
row-granular on TPU); the matmul form runs on the MXU in ~milliseconds. The
gather variant is kept for differential testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _axis_weights(start, roi_extent, out: int, s: int, size: int):
    """Interpolation weight matrices for one axis.

    start, roi_extent: (B,) box start coordinate and extent along this axis.
    Returns (B, out, size): averaged-over-s bilinear weights with torchvision
    roi_align boundary semantics (sample < -1 or > size → 0; else clamped).
    """
    bin_size = roi_extent / out  # (B,)
    i = (jnp.arange(out * s, dtype=jnp.float32) + 0.5) / s  # in bins
    coords = start[:, None] + i[None, :] * bin_size[:, None]  # (B, out*s)

    oob = (coords < -1.0) | (coords > size)
    c = jnp.clip(coords, 0.0, size - 1)
    c0 = jnp.floor(c)
    frac = c - c0
    c1 = jnp.minimum(c0 + 1.0, size - 1)

    p = jnp.arange(size, dtype=jnp.float32)  # (size,)
    w = (
        (p[None, None, :] == c0[..., None]) * (1.0 - frac[..., None])
        + (p[None, None, :] == c1[..., None]) * frac[..., None]
    )  # (B, out*s, size)
    w = jnp.where(oob[..., None], 0.0, w)
    B = start.shape[0]
    return w.reshape(B, out, s, size).mean(axis=2)  # (B, out, size)


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(
    images: jax.Array,
    boxes: jax.Array,
    output_size: tuple[int, int],
    sampling_ratio: int = 4,
) -> jax.Array:
    """Crop + resize each image to its box with roi_align sampling.

    images (B, C, H, W); boxes (B, 4) as (x1, y1, x2, y2) in input pixels (one
    box per image — the reference builds its roi_align call the same way);
    output_size (out_h, out_w) static. Returns (B, C, out_h, out_w).
    """
    out_h, out_w = output_size
    s = sampling_ratio
    H, W = images.shape[-2:]

    Wy = _axis_weights(boxes[:, 1], boxes[:, 3] - boxes[:, 1], out_h, s, H)
    Wx = _axis_weights(boxes[:, 0], boxes[:, 2] - boxes[:, 0], out_w, s, W)

    # crop[b,c] = Wy[b] @ img[b,c] @ Wx[b]^T — two MXU contractions
    tmp = jnp.einsum("byh,bchw->bcyw", Wy, images)
    return jnp.einsum("bxw,bcyw->bcyx", Wx, tmp)


# ---------------------------------------------------------------------------
# reference gather implementation (differential testing only — slow on TPU)
# ---------------------------------------------------------------------------


def _bilinear_sample_one(image: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
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

    v00 = image[:, y0i, x0i]
    v01 = image[:, y0i, x1i]
    v10 = image[:, y1i, x0i]
    v11 = image[:, y1i, x1i]
    out = hy * hx * v00 + hy * lx * v01 + ly * hx * v10 + ly * lx * v11
    return jnp.where(oob[None], 0.0, out)


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align_gather(
    images: jax.Array,
    boxes: jax.Array,
    output_size: tuple[int, int],
    sampling_ratio: int = 4,
) -> jax.Array:
    """Gather-based roi_align (exact same semantics; for tests/CPU)."""
    out_h, out_w = output_size
    s = sampling_ratio

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bin_w = (x2 - x1) / out_w
    bin_h = (y2 - y1) / out_h

    iy = (jnp.arange(out_h * s) + 0.5) / s
    ix = (jnp.arange(out_w * s) + 0.5) / s
    ys = y1[:, None] + iy[None, :] * bin_h[:, None]
    xs = x1[:, None] + ix[None, :] * bin_w[:, None]

    def sample_image(image, ys_i, xs_i):
        yy = jnp.repeat(ys_i, out_w * s)
        xx = jnp.tile(xs_i, out_h * s)
        vals = _bilinear_sample_one(image, yy, xx)
        C = image.shape[0]
        vals = vals.reshape(C, out_h, s, out_w, s)
        return vals.mean(axis=(2, 4))

    return jax.vmap(sample_image)(images, ys, xs)
