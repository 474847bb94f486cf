"""Rendering dispatcher: Pallas kernel on TPU, XLA rasterizer elsewhere.

The Pallas kernel (ops/rasterizer_pallas.py) is both faster and more robust
than the XLA formulation on TPU (per-tile chunk-count early exit lets it
carry an 8× larger triangle budget at lower cost); on CPU it would need
interpreter mode, so tests and host-side paths use the XLA version. Both
paths support the flat instance-attribute channel (`tri_attr`) used by
SceneRenderer / recording segmentation.
"""

from __future__ import annotations

import jax

from .rasterizer import RenderOutput, rasterize
from .rasterizer_pallas import rasterize_pallas


def render(tri_verts, tri_valid, TCO, K, image_size=(240, 320), colors=None,
           use_pallas: bool | None = None,
           tile=(24, 64), max_tris_per_tile=128,
           pallas_tile=(24, 320), pallas_max_tris_per_tile=768,
           tri_attr=None) -> RenderOutput:
    if use_pallas is None:
        # respect an active jax.default_device(...) override (e.g. the bench's
        # CPU-baseline measurement on a TPU host)
        dev = jax.config.jax_default_device
        platform = dev.platform if dev is not None else jax.default_backend()
        use_pallas = platform == "tpu"
    if use_pallas:
        return rasterize_pallas(
            tri_verts, tri_valid, TCO, K, image_size=image_size, colors=colors,
            tile=pallas_tile, max_tris_per_tile=pallas_max_tris_per_tile,
            tri_attr=tri_attr,
        )
    return rasterize(
        tri_verts, tri_valid, TCO, K, image_size=image_size, colors=colors,
        tile=tile, max_tris_per_tile=max_tris_per_tile, tri_attr=tri_attr,
    )
