"""Pose initialization and the DeepIM-style image-space pose update, pure jnp.

TPU-native equivalent of the reference's ``cosypose/lib3d/cosypose_ops.py``
pose-side helpers (update + the two TCO initializers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .transforms import make_T, transform_pts


def apply_imagespace_predictions(
    TCO: jax.Array, K: jax.Array, vxvyvz: jax.Array, dRCO: jax.Array
) -> jax.Array:
    """Apply the network's image-space SE(3) update to the current pose.

    vx, vy are image-plane offsets scaled by focal length; vz is a multiplicative
    depth update; dRCO is premultiplied onto the rotation
    (ref: cosypose/lib3d/cosypose_ops.py:10-31).

    TCO (B,4,4), K (B,3,3), vxvyvz (B,3), dRCO (B,3,3) → (B,4,4).
    """
    zsrc = TCO[:, 2, 3]
    ztgt = vxvyvz[:, 2] * zsrc
    fxfy = jnp.stack([K[:, 0, 0], K[:, 1, 1]], axis=-1)
    xsrcysrc = TCO[:, :2, 3]
    xy = (vxvyvz[:, :2] / fxfy + xsrcysrc / zsrc[:, None]) * ztgt[:, None]
    t = jnp.concatenate([xy, ztgt[:, None]], axis=-1)
    R = jnp.matmul(dRCO, TCO[:, :3, :3], precision=jax.lax.Precision.HIGHEST)
    return make_T(R, t)


def TCO_init_from_boxes(boxes: jax.Array, K: jax.Array, z_range=(1.0, 1.0)) -> jax.Array:
    """Paper-style coarse init: identity rotation, z = mean(z_range), xy from the
    2D box center back-projected at that depth
    (ref: cosypose/lib3d/cosypose_ops.py:121-135).

    boxes (B, 4) as (x1,y1,x2,y2), K (B,3,3) → TCO (B,4,4).
    """
    bsz = boxes.shape[0]
    dtype = boxes.dtype
    z = jnp.full((bsz,), (z_range[0] + z_range[1]) / 2.0, dtype=dtype)
    uv_centers = (boxes[:, :2] + boxes[:, 2:4]) / 2.0
    fxfy = jnp.stack([K[:, 0, 0], K[:, 1, 1]], axis=-1)
    cxcy = jnp.stack([K[:, 0, 2], K[:, 1, 2]], axis=-1)
    xy = (uv_centers - cxcy) * z[:, None] / fxfy
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (bsz, 3, 3))
    return make_T(R, jnp.concatenate([xy, z[:, None]], axis=-1))


_R_ZUP = jnp.array(
    [[0.0, 1.0, 0.0], [0.0, 0.0, -1.0], [-1.0, 0.0, 0.0]], dtype=jnp.float32
)


def TCO_init_from_boxes_zup_autodepth(
    boxes_2d: jax.Array,
    model_points_3d: jax.Array,
    K: jax.Array,
    points_valid: jax.Array | None = None,
) -> jax.Array:
    """BOP20-style coarse init: canonical z-up rotation, depth guessed from the
    ratio between the projected model extent at z=1 and the detected 2D box
    (ref: cosypose/lib3d/cosypose_ops.py:138-173).

    boxes_2d (B,4), model_points_3d (B,P,3), K (B,3,3) → TCO (B,4,4).
    points_valid (B,P) optionally masks padded mesh points.
    """
    bsz = boxes_2d.shape[0]
    dtype = boxes_2d.dtype
    z_guess = 1.0
    fxfy = jnp.stack([K[:, 0, 0], K[:, 1, 1]], axis=-1)
    cxcy = jnp.stack([K[:, 0, 2], K[:, 1, 2]], axis=-1)
    bb_xy_centers = (boxes_2d[:, :2] + boxes_2d[:, 2:4]) / 2.0
    xy_init = (bb_xy_centers - cxcy) * z_guess / fxfy

    R = jnp.broadcast_to(_R_ZUP.astype(dtype), (bsz, 3, 3))
    t0 = jnp.concatenate(
        [xy_init, jnp.full((bsz, 1), z_guess, dtype=dtype)], axis=-1
    )
    TCO = make_T(R, t0)

    C_pts = transform_pts(TCO, model_points_3d)
    if points_valid is not None:
        big = jnp.asarray(jnp.inf, dtype)
        x = jnp.where(points_valid, C_pts[..., 0], jnp.nan)
        y = jnp.where(points_valid, C_pts[..., 1], jnp.nan)
        deltax = jnp.nanmax(x, axis=1) - jnp.nanmin(x, axis=1)
        deltay = jnp.nanmax(y, axis=1) - jnp.nanmin(y, axis=1)
        del big
    else:
        deltax = jnp.max(C_pts[..., 0], axis=1) - jnp.min(C_pts[..., 0], axis=1)
        deltay = jnp.max(C_pts[..., 1], axis=1) - jnp.min(C_pts[..., 1], axis=1)

    bb_deltax = boxes_2d[:, 2] - boxes_2d[:, 0] + 1.0
    bb_deltay = boxes_2d[:, 3] - boxes_2d[:, 1] + 1.0
    z_from_dx = fxfy[:, 0] * deltax / bb_deltax
    z_from_dy = fxfy[:, 1] * deltay / bb_deltay
    z = (z_from_dx + z_from_dy) / 2.0

    xy = (bb_xy_centers - cxcy) * z[:, None] / fxfy
    return make_T(R, jnp.concatenate([xy, z[:, None]], axis=-1))
