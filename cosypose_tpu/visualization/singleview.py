"""Single-view prediction overlay rendering.

Capability match for the reference's ``cosypose/visualization/singleview.py``
(:37-63): render each predicted pose and composite it over the input image.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.rasterizer import rasterize


def render_prediction_overlay(mesh_db, rgb_input, TCO, K, label,
                              alpha: float = 0.6):
    """rgb_input (H, W, 3) uint8; TCO (4,4); K (3,3) → (H, W, 3) uint8."""
    H, W = rgb_input.shape[:2]
    oid = mesh_db.label_to_id[label]
    out = rasterize(
        mesh_db.tri_verts[oid][None],
        mesh_db.tri_valid[oid][None],
        jnp.asarray(np.asarray(TCO, np.float32)[None]),
        jnp.asarray(np.asarray(K, np.float32)[None]),
        image_size=(H, W),
        colors=mesh_db.tri_colors[oid][None],
    )
    ren = np.asarray(out.rgb[0]).transpose(1, 2, 0)
    mask = np.asarray(out.mask[0])[..., None]
    inp = rgb_input.astype(np.float32) / 255.0
    overlay = np.where(mask, alpha * ren + (1 - alpha) * inp, inp)
    return (np.clip(overlay, 0, 1) * 255).astype(np.uint8)
