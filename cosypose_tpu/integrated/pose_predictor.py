"""Inference API: coarse + refiner orchestration.

Capability match for the reference's CoarseRefinePosePredictor
(ref: cosypose/integrated/pose_predictor.py:14-107): builds the TCO init from
detection boxes (method per coarse config), runs detections through the coarse
model then chains into the refiner, mini-batching at a fixed object batch size,
and returns per-iteration predictions keyed 'coarse/iteration=n' /
'refiner/iteration=n' plus the final poses.

TPU-first: batches are PADDED to the fixed object batch size (one compiled
program regardless of detection count); each model's full n-iteration
refinement loop is a single jit (models/pose_predictor.py), so the only
per-chunk host work is the gather/scatter of rows.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..models.pose_predictor import PosePredictor, gather_mesh_data
from ..ops.pose_ops import TCO_init_from_boxes, TCO_init_from_boxes_zup_autodepth
from ..utils.tensor_collection import PandasTensorCollection, concatenate
from ..utils.logging import get_logger
from ..utils.timer import Timer

logger = get_logger(__name__)


@dataclasses.dataclass
class LoadedPoseModel:
    """A pose model ready for inference: module + weights + mesh database."""

    predictor: PosePredictor
    variables: dict
    mesh_db: object  # BatchedMeshes
    init_method: str = "v0"  # 'v0' (paper) | 'z-up+auto-depth' (BOP20)

    def __post_init__(self):
        cfg = self.predictor.cfg

        def fwd(variables, mesh_data, images, K, TCO_init, n_iterations):
            return self.predictor.forward(
                variables, mesh_data, images, K, TCO_init,
                n_iterations=n_iterations, train=False,
            )

        self._fwd = jax.jit(fwd, static_argnames=("n_iterations",))
        self._cfg = cfg


class CoarseRefinePosePredictor:
    def __init__(self, coarse_model: LoadedPoseModel | None = None,
                 refiner_model: LoadedPoseModel | None = None,
                 bsz_objects: int = 64):
        self.coarse_model = coarse_model
        self.refiner_model = refiner_model
        self.bsz_objects = bsz_objects

    # -- batched model predictions (ref: pose_predictor.py:26-63) ---------
    def batched_model_predictions(self, model: LoadedPoseModel, images, K,
                                  obj_data: PandasTensorCollection,
                                  n_iterations: int = 1):
        timer = Timer()
        timer.start()
        n_obj = len(obj_data)
        bsz = self.bsz_objects
        preds = {f"iteration={n}": [] for n in range(1, n_iterations + 1)}

        for start in range(0, n_obj, bsz):
            ids = np.arange(start, min(start + bsz, n_obj))
            n_valid = len(ids)
            # pad the chunk to the fixed batch size (repeat last row)
            ids_padded = np.concatenate(
                [ids, np.full(bsz - n_valid, ids[-1], ids.dtype)]
            )
            obj_inputs = obj_data[ids_padded]
            labels = obj_inputs.infos["label"].values
            im_ids = obj_inputs.infos["batch_im_id"].values
            label_ids = model.mesh_db.ids_for(labels)
            mesh_data = gather_mesh_data(
                model.mesh_db, label_ids, model._cfg.n_points_crop
            )
            outputs = model._fwd(
                model.variables, mesh_data,
                jnp.asarray(images)[jnp.asarray(im_ids)],
                jnp.asarray(K)[jnp.asarray(im_ids)],
                jnp.asarray(obj_inputs.poses),
                n_iterations,
            )
            for n in range(1, n_iterations + 1):
                it = n - 1
                batch_preds = PandasTensorCollection(
                    obj_inputs.infos.iloc[:n_valid],
                    poses=outputs["TCO_output"][it][:n_valid],
                    poses_input=outputs["TCO_input"][it][:n_valid],
                    K_crop=outputs["K_crop"][it][:n_valid],
                    boxes_rend=outputs["boxes_rend"][it][:n_valid],
                    boxes_crop=outputs["boxes_crop"][it][:n_valid],
                )
                preds[f"iteration={n}"].append(batch_preds)

        logger.debug(
            f"Pose prediction on {n_obj} detections "
            f"(n_iterations={n_iterations}): {timer.stop()}"
        )
        return {k: concatenate(v) for k, v in preds.items()}

    # -- TCO init from detections (ref: pose_predictor.py:65-74) ----------
    def make_TCO_init(self, detections: PandasTensorCollection, K):
        # box-seeded init; without a coarse model the refiner's mesh_db and
        # init method are used (z-up auto-depth directly into the refiner)
        model = self.coarse_model or self.refiner_model
        K_dets = jnp.asarray(K)[jnp.asarray(detections.infos["batch_im_id"].values)]
        boxes = jnp.asarray(detections.bboxes)
        if model.init_method == "z-up+auto-depth":
            label_ids = model.mesh_db.ids_for(detections.infos["label"].values)
            points = model.mesh_db.sample_points(
                jnp.asarray(label_ids), 2000, deterministic=True
            )
            TCO_init = TCO_init_from_boxes_zup_autodepth(boxes, points, K_dets)
        else:
            TCO_init = TCO_init_from_boxes(boxes, K_dets, z_range=(1.0, 1.0))
        return PandasTensorCollection(detections.infos, poses=TCO_init)

    # -- public API (ref: pose_predictor.py:76-107) ------------------------
    def get_predictions(self, images, K, detections=None, data_TCO_init=None,
                        n_coarse_iterations=1, n_refiner_iterations=1):
        preds = {}
        if data_TCO_init is None:
            assert detections is not None
            data_TCO_init = self.make_TCO_init(detections, K)
            if n_coarse_iterations > 0:
                assert self.coarse_model is not None
                coarse_preds = self.batched_model_predictions(
                    self.coarse_model, images, K, data_TCO_init,
                    n_iterations=n_coarse_iterations,
                )
                for n in range(1, n_coarse_iterations + 1):
                    preds[f"coarse/iteration={n}"] = (
                        coarse_preds[f"iteration={n}"])
                data_TCO = coarse_preds[f"iteration={n_coarse_iterations}"]
            else:
                # box-seeded init straight into the refiner (no coarse model)
                data_TCO = data_TCO_init
                preds["coarse/box_init"] = data_TCO_init
        else:
            assert n_coarse_iterations == 0
            data_TCO = data_TCO_init
            preds["external_coarse"] = data_TCO

        if n_refiner_iterations >= 1:
            assert self.refiner_model is not None
            refiner_preds = self.batched_model_predictions(
                self.refiner_model, images, K, data_TCO,
                n_iterations=n_refiner_iterations,
            )
            for n in range(1, n_refiner_iterations + 1):
                preds[f"refiner/iteration={n}"] = refiner_preds[f"iteration={n}"]
            data_TCO = refiner_preds[f"iteration={n_refiner_iterations}"]
        return data_TCO, preds
