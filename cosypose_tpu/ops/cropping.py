"""DeepIM crop-box computation + crop extraction, pure jnp.

TPU-native equivalent of the reference's ``cosypose/lib3d/cropping.py``: an
aspect-preserving box around the projected object center covering the union of
the observed and rendered boxes with margin lamb=1.4, then a roi_align crop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .camera import project_points_robust, boxes_from_uv
from .roi_align import roi_align


def deepim_boxes(
    rend_center_uv: jax.Array,
    obs_boxes: jax.Array,
    rend_boxes: jax.Array,
    im_size: tuple[int, int],
    lamb: float = 1.4,
) -> jax.Array:
    """Aspect-preserving crop boxes centered on the projected object center.

    rend_center_uv (B, 1, 2); obs_boxes, rend_boxes (B, 4); im_size static (h, w).
    The box half-extent is the max over the 8 box-edge distances to the center,
    made aspect-consistent with r = w/h and inflated by lamb
    (ref: cosypose/lib3d/cropping.py:7-47). Returns (B, 4).
    """
    h, w = min(im_size), max(im_size)
    r = w / h
    xc = rend_center_uv[:, 0, 0]
    yc = rend_center_uv[:, 0, 1]

    xdist = jnp.maximum(
        jnp.maximum(jnp.abs(obs_boxes[:, 0] - xc), jnp.abs(rend_boxes[:, 0] - xc)),
        jnp.maximum(jnp.abs(obs_boxes[:, 2] - xc), jnp.abs(rend_boxes[:, 2] - xc)),
    )
    ydist = jnp.maximum(
        jnp.maximum(jnp.abs(obs_boxes[:, 1] - yc), jnp.abs(rend_boxes[:, 1] - yc)),
        jnp.maximum(jnp.abs(obs_boxes[:, 3] - yc), jnp.abs(rend_boxes[:, 3] - yc)),
    )
    width = jnp.maximum(xdist, ydist * r) * 2 * lamb
    height = jnp.maximum(xdist / r, ydist) * 2 * lamb
    return jnp.stack(
        [xc - width / 2, yc - height / 2, xc + width / 2, yc + height / 2], axis=-1
    )


def deepim_crops(
    images: jax.Array,
    obs_boxes: jax.Array,
    K: jax.Array,
    TCO_pred: jax.Array,
    O_vertices: jax.Array,
    output_size: tuple[int, int],
    lamb: float = 1.4,
    sampling_ratio: int = 4,
):
    """Compute DeepIM crop boxes and extract the crops (robust projection).

    images (B, C, H, W); obs_boxes (B, 4); K (B,3,3); TCO_pred (B,4,4);
    O_vertices (B, P, 3). Returns (boxes (B,4), crops (B, C, out_h, out_w)).
    (ref: cosypose/lib3d/cropping.py:64-75 — the robust variant used by the model)
    """
    B, _, h, w = images.shape
    uv = project_points_robust(O_vertices, K, TCO_pred)
    rend_boxes = boxes_from_uv(uv)
    centers = project_points_robust(jnp.zeros((B, 1, 3), images.dtype), K, TCO_pred)
    boxes = deepim_boxes(centers, obs_boxes, rend_boxes, im_size=(h, w), lamb=lamb)
    crops = roi_align(images, boxes, output_size=output_size, sampling_ratio=sampling_ratio)
    return boxes, crops
