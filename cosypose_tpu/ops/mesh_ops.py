"""Mesh point-set helpers, pure jnp + host-side sampling.

TPU-native equivalent of the reference's ``cosypose/lib3d/mesh_ops.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def get_meshes_bounding_boxes(pts: jax.Array) -> jax.Array:
    """8 AABB corner points per point set, in the reference's corner order
    (ref: cosypose/lib3d/mesh_ops.py:15-28). pts (B, P, 3) → (B, 8, 3).
    """
    xmin = pts[..., 0].min(axis=-1)
    xmax = pts[..., 0].max(axis=-1)
    ymin = pts[..., 1].min(axis=-1)
    ymax = pts[..., 1].max(axis=-1)
    zmin = pts[..., 2].min(axis=-1)
    zmax = pts[..., 2].max(axis=-1)
    corners = [
        (xmin, ymax, zmax),
        (xmax, ymax, zmax),
        (xmax, ymin, zmax),
        (xmin, ymin, zmax),
        (xmin, ymax, zmin),
        (xmax, ymax, zmin),
        (xmax, ymin, zmin),
        (xmin, ymin, zmin),
    ]
    return jnp.stack([jnp.stack(c, axis=-1) for c in corners], axis=-2)


def get_meshes_center(pts: jax.Array) -> jax.Array:
    """SE(3) translation to each point set's AABB center → (B, 4, 4).
    (ref: cosypose/lib3d/mesh_ops.py:5-12)
    """
    corners = get_meshes_bounding_boxes(pts)
    t = corners.mean(axis=-2)
    T = jnp.broadcast_to(jnp.eye(4, dtype=pts.dtype), pts.shape[:-2] + (4, 4))
    return T.at[..., :3, 3].set(t)


def sample_points(
    points: jax.Array, n_points: int, deterministic: bool = False, seed: int = 0
) -> jax.Array:
    """Select n_points columns with a host-side RNG (static shapes on device).

    Matches the reference's numpy RandomState(0) deterministic path
    (ref: cosypose/lib3d/mesh_ops.py:31-41). points (B, P, 3) → (B, n, 3).
    """
    P = points.shape[1]
    assert n_points <= P
    rng = np.random.RandomState(0) if deterministic else np.random.RandomState(seed)
    ids = jnp.asarray(rng.choice(P, size=n_points, replace=False))
    return jnp.take(points, ids, axis=1)
