"""Batched pinhole camera geometry, pure jnp.

TPU-native equivalent of the reference's ``cosypose/lib3d/camera_geometry.py``:
projection, uv bounding boxes, and intrinsics update under crop + resize.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def project_points(points_3d: jax.Array, K: jax.Array, TCO: jax.Array) -> jax.Array:
    """Pinhole projection of object-frame points.

    points_3d (B, P, 3), K (B, 3, 3), TCO (B, 4, 4) → uv (B, P, 2).
    (ref: cosypose/lib3d/camera_geometry.py:4-16)
    """
    pts_cam = (
        jnp.einsum("bij,bpj->bpi", TCO[:, :3, :3], points_3d, precision=jax.lax.Precision.HIGHEST) + TCO[:, None, :3, 3]
    )
    suv = jnp.einsum("bij,bpj->bpi", K, pts_cam, precision=jax.lax.Precision.HIGHEST)
    return suv[..., :2] / suv[..., 2:3]


def project_points_robust(
    points_3d: jax.Array, K: jax.Array, TCO: jax.Array, z_min: float = 0.1
) -> jax.Array:
    """Projection with depth clamped to z_min — keeps the crop/update math finite
    when an intermediate pose estimate puts the object behind the camera.
    (ref: cosypose/lib3d/camera_geometry.py:18-31)
    """
    pts_cam = (
        jnp.einsum("bij,bpj->bpi", TCO[:, :3, :3], points_3d, precision=jax.lax.Precision.HIGHEST) + TCO[:, None, :3, 3]
    )
    suv = jnp.einsum("bij,bpj->bpi", K, pts_cam, precision=jax.lax.Precision.HIGHEST)
    z = jnp.maximum(suv[..., 2:3], z_min)
    return suv[..., :2] / z


def boxes_from_uv(uv: jax.Array) -> jax.Array:
    """Axis-aligned bounding boxes (x1,y1,x2,y2) of projected point sets.

    uv (B, P, 2) → (B, 4). (ref: cosypose/lib3d/camera_geometry.py:34-42)
    """
    mins = jnp.min(uv, axis=1)
    maxs = jnp.max(uv, axis=1)
    return jnp.concatenate([mins, maxs], axis=-1)


def masked_boxes_from_uv(uv: jax.Array, valid: jax.Array) -> jax.Array:
    """boxes_from_uv over only the rows where ``valid`` (B, P) is True.

    Padding-aware variant for the fixed-shape mesh database (padded point sets).
    """
    big = jnp.asarray(jnp.inf, uv.dtype)
    mins = jnp.min(jnp.where(valid[..., None], uv, big), axis=1)
    maxs = jnp.max(jnp.where(valid[..., None], uv, -big), axis=1)
    return jnp.concatenate([mins, maxs], axis=-1)


def get_K_crop_resize(
    K: jax.Array, boxes: jax.Array, orig_size, crop_resize
) -> jax.Array:
    """New intrinsics after cropping to ``boxes`` and resizing to ``crop_resize``.

    K (B, 3, 3), boxes (B, 4) as (x1, y1, x2, y2); orig_size/crop_resize are
    static (h, w) tuples. Matches the reference's convention where the final
    width is max(crop_resize) and final height is min(crop_resize)
    (ref: cosypose/lib3d/camera_geometry.py:45-87). Skew is not handled.
    """
    final_width = float(max(crop_resize))
    final_height = float(min(crop_resize))
    crop_width = boxes[:, 2] - boxes[:, 0]
    crop_height = boxes[:, 3] - boxes[:, 1]
    crop_cj = (boxes[:, 0] + boxes[:, 2]) / 2.0
    crop_ci = (boxes[:, 1] + boxes[:, 3]) / 2.0

    # principal point in the (unresized) crop frame
    cx = K[:, 0, 2] + (crop_width - 1) / 2.0 - crop_cj
    cy = K[:, 1, 2] + (crop_height - 1) / 2.0 - crop_ci

    # resize about the crop center
    orig_cx_diff = cx - (crop_width - 1) / 2.0
    orig_cy_diff = cy - (crop_height - 1) / 2.0
    scale_x = final_width / crop_width
    scale_y = final_height / crop_height
    fx = scale_x * K[:, 0, 0]
    fy = scale_y * K[:, 1, 1]
    new_cx = (final_width - 1) / 2.0 + scale_x * orig_cx_diff
    new_cy = (final_height - 1) / 2.0 + scale_y * orig_cy_diff

    new_K = K
    new_K = new_K.at[:, 0, 0].set(fx)
    new_K = new_K.at[:, 1, 1].set(fy)
    new_K = new_K.at[:, 0, 2].set(new_cx)
    new_K = new_K.at[:, 1, 2].set(new_cy)
    return new_K
