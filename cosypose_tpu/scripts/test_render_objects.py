"""Smoke script: render every object of a dataset at a fixed pose.

Capability match for the reference's ``cosypose/scripts/test_render_objects.py``
(:1-39): asserts every object produces a non-empty render.

  python -m cosypose_tpu.scripts.test_render_objects --object-ds ycbv.models
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from ..data.datasets_cfg import make_object_dataset
from ..ops.mesh_db import build_mesh_db
from ..rendering import BatchRenderer
from ..utils.logging import get_logger

logger = get_logger(__name__)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--object-ds", required=True)
    parser.add_argument("--ds-root", default=None)
    args = parser.parse_args()

    obj_ds = make_object_dataset(args.object_ds, ds_root=args.ds_root)
    mesh_db = build_mesh_db(obj_ds.mesh_specs())
    renderer = BatchRenderer(mesh_db)

    n = mesh_db.n_objects
    TCO = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    TCO[:, 2, 3] = 0.45
    K = np.zeros((n, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 515
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = 160, 120, 1

    renders = np.asarray(
        renderer.render(jnp.arange(n), jnp.asarray(TCO), jnp.asarray(K))
    )
    for i, label in enumerate(mesh_db.labels):
        s = renders[i].sum()
        assert s > 0, f"empty render for {label}"
        logger.info(f"{label}: ok (sum={s:.1f})")
    logger.info(f"All {n} objects render correctly")


if __name__ == "__main__":
    main()
