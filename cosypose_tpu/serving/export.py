"""AOT export of trained pose models as serialized StableHLO artifacts.

Deployment path the reference does not have: its inference stack needs the
full torch + pybullet + framework install at serving time. Here a trained
refiner (or coarse model) exports — weights, mesh geometry and the whole
iterate-render-compare loop baked in — to ONE portable `jax.export`
artifact that any process with jax can `load_exported(...).call(...)`,
with no cosypose_tpu import, no checkpoint, no mesh files (the natural
shape for a TPU serving fleet: ship bytes, not environments).

The exported program is the same jitted XLA computation inference runs
(models/pose_predictor.py:forward — lax.scan over iterations), specialized
to a fixed candidate batch / image size (fixed shapes are what the TPU
runtime wants anyway, see README "Fixed shapes everywhere") and callable as

    refined = fn(images, K, TCO_init, label_ids)   # (B,4,4) poses

Multi-platform by default (cpu + tpu) so one artifact serves both a CI
smoke host and the accelerator fleet.
"""

from __future__ import annotations

import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from ..models.pose_predictor import gather_mesh_data
from ..utils.logging import get_logger

logger = get_logger(__name__)

__all__ = ["export_pose_model", "load_exported"]


def export_pose_model(model, batch_size: int, image_hw, n_iterations: int = 1,
                      out_path=None, platforms=("cpu", "tpu")):
    """Export a LoadedPoseModel as a serialized StableHLO blob.

    model: integrated.pose_predictor.LoadedPoseModel (weights + mesh_db).
    batch_size: fixed candidate batch B (callers pad, exactly like
        CoarseRefinePosePredictor.batched_model_predictions does).
    image_hw: (H, W) of the full input frames.
    n_iterations: refinement iterations baked into the program's lax.scan.

    Returns the serialized bytes; writes them to out_path when given.
    The artifact's calling convention:
        call(images (B,3,H,W) f32, K (B,3,3) f32, TCO_init (B,4,4) f32,
             label_ids (B,) i32) -> TCO_refined (B,4,4) f32
    """
    from jax import export as jexport

    cfg = model.predictor.cfg
    mesh_db = model.mesh_db
    variables = model.variables
    h, w = image_hw

    def serve_fn(images, K, TCO_init, label_ids):
        mesh_data = gather_mesh_data(mesh_db, label_ids, cfg.n_points_crop)
        out = model.predictor.forward(
            variables, mesh_data, images, K, TCO_init,
            n_iterations=n_iterations, train=False,
        )
        # final iteration's refined poses
        return out["TCO_output"][-1]

    args = (
        jax.ShapeDtypeStruct((batch_size, 3, h, w), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, 3, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, 4, 4), jnp.float32),
        jax.ShapeDtypeStruct((batch_size,), jnp.int32),
    )
    exported = jexport.export(jax.jit(serve_fn), platforms=list(platforms))(
        *args
    )
    blob = exported.serialize()
    logger.info(
        f"exported pose model: B={batch_size} {h}x{w} "
        f"iters={n_iterations} platforms={list(platforms)} "
        f"({len(blob) / 1e6:.1f} MB)"
    )
    if out_path is not None:
        out_path = pathlib.Path(out_path)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        out_path.write_bytes(blob)
        logger.info(f"wrote {out_path}")
    return blob


def load_exported(path_or_bytes):
    """Rehydrate an exported artifact; returns a callable
    fn(images, K, TCO_init, label_ids) -> TCO_refined.

    Needs only jax — no framework import, checkpoint, or mesh files."""
    from jax import export as jexport

    blob = (path_or_bytes if isinstance(path_or_bytes, (bytes, bytearray))
            else pathlib.Path(path_or_bytes).read_bytes())
    exported = jexport.deserialize(blob)

    def fn(images, K, TCO_init, label_ids):
        return exported.call(
            jnp.asarray(images, jnp.float32), jnp.asarray(K, jnp.float32),
            jnp.asarray(TCO_init, jnp.float32),
            jnp.asarray(label_ids, jnp.int32),
        )

    return fn
