"""Batched SE(3) / rotation math, pure jnp.

TPU-native re-design of the reference's ``cosypose/lib3d/transform_ops.py`` and
``cosypose/lib3d/rotations.py``: everything is a fixed-shape, vmappable function on
device arrays (einsum over MXU-friendly layouts, no in-place mutation, no host sync).
Pose math is kept in float32 — rotations degrade quickly in bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transform_pts(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply homogeneous transform(s) to 3D point sets.

    T:   (..., 4, 4) — trailing dims are the transform; leading dims broadcast
         against the points' batch dims. Supports the reference's two cases
         (ref: cosypose/lib3d/transform_ops.py:7-21): T (B,4,4) with pts (B,P,3)
         → (B,P,3), and T (B,S,4,4) with pts (B,P,3) → (B,S,P,3).
    pts: (B, P, 3)
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if T.ndim == pts.ndim:  # (B,4,4) @ (B,P,3)
        return jnp.einsum("...ij,...pj->...pi", R, pts, precision=jax.lax.Precision.HIGHEST) + t[..., None, :]
    elif T.ndim == pts.ndim + 1:  # (B,S,4,4) @ (B,P,3) -> (B,S,P,3)
        return jnp.einsum("...sij,...pj->...spi", R, pts, precision=jax.lax.Precision.HIGHEST) + t[..., None, :]
    else:
        raise ValueError(f"Unsupported shapes T={T.shape} pts={pts.shape}")


def invert_T(T: jax.Array) -> jax.Array:
    """Closed-form SE(3) inverse (ref: cosypose/lib3d/transform_ops.py:24-32)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3:4]
    R_inv = jnp.swapaxes(R, -2, -1)
    t_inv = -jnp.matmul(R_inv, t, precision=jax.lax.Precision.HIGHEST)
    top = jnp.concatenate([R_inv, t_inv], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def make_T(R: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble (...,4,4) from R (...,3,3) and t (...,3)."""
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), R.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rot6d_to_matrix(rot6d: jax.Array) -> jax.Array:
    """Zhou et al. CVPR'19 continuous 6D → rotation matrix via Gram–Schmidt.

    Column-stacked convention matching the reference
    (ref: cosypose/lib3d/rotations.py:6-21): the two 3-vectors are the first two
    *columns* of the output after orthonormalization. Input (..., 6) → (..., 3, 3).
    """
    x_raw = rot6d[..., 0:3]
    y_raw = rot6d[..., 3:6]
    # guard only against exact 0/0 — torch divides by the exact norm, and the
    # raw head outputs can legitimately be ~1e-9 at init
    eps = 1e-20
    x = x_raw / jnp.maximum(jnp.linalg.norm(x_raw, axis=-1, keepdims=True), eps)
    z = jnp.cross(x, y_raw)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), eps)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def matrix_to_rot6d(R: jax.Array) -> jax.Array:
    """Inverse of rot6d_to_matrix (first two columns flattened)."""
    return jnp.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)


def quat_to_matrix(quat_xyzw: jax.Array) -> jax.Array:
    """Normalized quaternion (xyzw) → rotation matrix.

    Mathematically identical to the reference's normalize → angle-axis → matrix
    chain (ref: cosypose/lib3d/rotations.py:34-170) but computed directly — the
    direct formula is branch-free and therefore XLA-friendly. Input (..., 4).
    """
    q = quat_xyzw / jnp.maximum(
        jnp.linalg.norm(quat_xyzw, axis=-1, keepdims=True), 1e-12
    )
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def euler_to_matrix(euler_xyz: jax.Array) -> jax.Array:
    """Static-frame sxyz euler angles (radians) → rotation matrix, R = Rz @ Ry @ Rx.

    Matches transforms3d.euler.euler2mat's 'sxyz' convention used by the reference
    for refiner-training pose noise (ref: cosypose/lib3d/transform_ops.py:35-51).
    Input (..., 3) → (..., 3, 3).
    """
    ax, ay, az = euler_xyz[..., 0], euler_xyz[..., 1], euler_xyz[..., 2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    m = jnp.stack(
        [
            cy * cz, sx * sy * cz - cx * sz, cx * sy * cz + sx * sz,
            cy * sz, sx * sy * sz + cx * cz, cx * sy * sz - sx * cz,
            -sy, sx * cy, cx * cy,
        ],
        axis=-1,
    )
    return m.reshape(euler_xyz.shape[:-1] + (3, 3))


def pose9d_to_T(pose9d: jax.Array) -> jax.Array:
    """9D (rot6d + translation) → (..., 4, 4) homogeneous transform.

    (ref: cosypose/lib3d/transform_ops.py:54-64)
    """
    R = rot6d_to_matrix(pose9d[..., :6])
    t = pose9d[..., 6:9]
    return make_T(R, t)


def T_to_pose9d(T: jax.Array) -> jax.Array:
    """(..., 4, 4) → 9D (rot6d + translation). Used by the BA parametrization."""
    return jnp.concatenate([matrix_to_rot6d(T[..., :3, :3]), T[..., :3, 3]], axis=-1)


def add_pose_noise(
    key: jax.Array,
    TCO: jax.Array,
    euler_deg_std=(15.0, 15.0, 15.0),
    trans_std=(0.01, 0.01, 0.05),
) -> jax.Array:
    """Perturb poses with gaussian euler-angle and translation noise.

    Refiner training input generator (ref: cosypose/lib3d/transform_ops.py:35-51):
    R ← R @ R_noise (object-frame rotation noise), t ← t + n. Device-side
    jax.random instead of host numpy so it lives inside the jitted train step.
    TCO (B, 4, 4) → (B, 4, 4).
    """
    bsz = TCO.shape[0]
    k1, k2 = jax.random.split(key)
    euler_std = jnp.asarray(euler_deg_std, dtype=TCO.dtype) * (jnp.pi / 180.0)
    euler = jax.random.normal(k1, (bsz, 3), dtype=TCO.dtype) * euler_std
    trans = jax.random.normal(k2, (bsz, 3), dtype=TCO.dtype) * jnp.asarray(
        trans_std, dtype=TCO.dtype
    )
    R_noise = euler_to_matrix(euler)
    R = jnp.matmul(TCO[..., :3, :3], R_noise, precision=jax.lax.Precision.HIGHEST)
    t = TCO[..., :3, 3] + trans
    return make_T(R, t)
