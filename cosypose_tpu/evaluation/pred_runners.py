"""Prediction runners over scene datasets.

Capability match for the reference's ``cosypose/evaluation/pred_runner/``:
  * MultiviewPredictionRunner (multiview_predictions.py:79-154): iterate view
    groups, join saved detections by (scene_id, view_id), run coarse+refiner
    (optionally seeding from external TCO) and optionally the multiview
    predictor; accumulate per-key predictions.
  * BopPredictionRunner (bop_predictions.py:75-151): end-to-end — detector →
    coarse+refiner → (n_views>1) multiview → (icp) depth refinement; per-image
    wall time recorded into infos (warm-up excluded).
  * DetectionRunner (detections.py): detector-only predictions.
"""

from __future__ import annotations

import time
from collections import defaultdict

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..utils.logging import get_logger
from ..utils.tensor_collection import PandasTensorCollection, concatenate
from .data_utils import parse_camera_data

logger = get_logger(__name__)


def _group_images_K(group_obs):
    images = np.stack(
        [np.transpose(rgb, (2, 0, 1)).astype(np.float32) / 255.0
         for rgb, _, _ in group_obs]
    )
    cam_rows = [
        parse_camera_data(obs, batch_im_id=n)
        for n, (_, _, obs) in enumerate(group_obs)
    ]
    K = np.stack([c["K"] for c in cam_rows])
    return images, K, cam_rows


class MultiviewPredictionRunner:
    def __init__(self, scene_ds_multiview, n_coarse_iterations=1,
                 n_refiner_iterations=4):
        self.ds = scene_ds_multiview
        self.n_coarse = n_coarse_iterations
        self.n_refiner = n_refiner_iterations

    def get_predictions(self, pose_predictor, mv_predictor=None,
                        detections=None, use_detections_TCO=False,
                        **mv_kwargs):
        """detections: PandasTensorCollection with infos[scene_id, view_id,
        label, score] and bboxes (and poses when use_detections_TCO)."""
        assert detections is not None
        det_index = detections.infos.copy()
        det_index["det_row"] = np.arange(len(det_index))

        predictions = defaultdict(list)
        for group_idx in range(len(self.ds)):
            group_obs = self.ds[group_idx]
            images, K, cam_rows = _group_images_K(group_obs)
            cameras = PandasTensorCollection(
                pd.DataFrame(
                    [{k: c[k] for k in ("scene_id", "view_id", "group_id",
                                        "batch_im_id")} for c in cam_rows]
                ),
                K=jnp.asarray(K),
                TWC=jnp.asarray(np.stack([c["TWC"] for c in cam_rows])),
            )
            # join saved detections to this group's frames
            frame_keys = cameras.infos.loc[:, ["scene_id", "view_id",
                                               "batch_im_id", "group_id"]]
            dets_g = det_index.merge(
                frame_keys, on=["scene_id", "view_id"], how="inner"
            )
            if len(dets_g) == 0:
                continue
            rows = dets_g["det_row"].values
            group_dets = detections[rows]
            group_dets.infos["batch_im_id"] = dets_g["batch_im_id"].values
            group_dets.infos["group_id"] = dets_g["group_id"].values

            if use_detections_TCO:
                data_TCO_init = PandasTensorCollection(
                    group_dets.infos, poses=group_dets.poses
                )
                data_TCO, preds = pose_predictor.get_predictions(
                    jnp.asarray(images), jnp.asarray(K),
                    data_TCO_init=data_TCO_init,
                    n_coarse_iterations=0,
                    n_refiner_iterations=self.n_refiner,
                )
            else:
                data_TCO, preds = pose_predictor.get_predictions(
                    jnp.asarray(images), jnp.asarray(K),
                    detections=group_dets,
                    n_coarse_iterations=self.n_coarse,
                    n_refiner_iterations=self.n_refiner,
                )
            for k, v in preds.items():
                predictions[k].append(v)

            if mv_predictor is not None:
                candidates = PandasTensorCollection(
                    data_TCO.infos.copy(), poses=data_TCO.poses
                )
                mv_preds = mv_predictor.predict_scene_state(
                    candidates, cameras, **mv_kwargs
                )
                for k in ("cand_inputs", "cand_matched", "ba_input",
                          "ba_output", "ba_output+all_cand"):
                    predictions[f"multiview/{k}"].append(mv_preds[k])
                predictions["multiview/scene_objects"].append(
                    mv_preds["scene/objects"]
                )
                predictions["multiview/scene_cameras"].append(
                    mv_preds["scene/cameras"]
                )

        return {k: concatenate(v) for k, v in predictions.items() if v}


class BopPredictionRunner:
    """End-to-end BOP20 inference (detector → pose → [multiview] → [icp])."""

    def __init__(self, scene_ds_multiview, n_coarse_iterations=1,
                 n_refiner_iterations=4):
        self.ds = scene_ds_multiview
        self.n_coarse = n_coarse_iterations
        self.n_refiner = n_refiner_iterations

    def get_predictions(self, detector, pose_predictor, mv_predictor=None,
                        icp_refiner=None, detection_th=0.3, **mv_kwargs):
        predictions = defaultdict(list)
        warm = False
        for group_idx in range(len(self.ds)):
            group_obs = self.ds[group_idx]
            images, K, cam_rows = _group_images_K(group_obs)

            t0 = time.perf_counter()
            detections = detector.get_detections(
                jnp.asarray(images), detection_th=detection_th,
                output_masks=icp_refiner is not None,
            )
            if len(detections) == 0:
                continue
            data_TCO, _ = pose_predictor.get_predictions(
                jnp.asarray(images), jnp.asarray(K),
                detections=detections,
                n_coarse_iterations=self.n_coarse,
                n_refiner_iterations=self.n_refiner,
            )
            dt = time.perf_counter() - t0
            if not warm:
                warm = True  # exclude the compile/warm-up group from timing
                dt = float("nan")
            data_TCO.infos["time"] = dt / max(len(group_obs), 1)

            for c in cam_rows:
                m = data_TCO.infos["batch_im_id"] == c["batch_im_id"]
                data_TCO.infos.loc[m, "scene_id"] = c["scene_id"]
                data_TCO.infos.loc[m, "view_id"] = c["view_id"]
                data_TCO.infos.loc[m, "group_id"] = c["group_id"]
            predictions["pose"].append(data_TCO)

            if mv_predictor is not None and len(group_obs) > 1:
                cameras = PandasTensorCollection(
                    pd.DataFrame(
                        [{k: c[k] for k in ("scene_id", "view_id", "group_id",
                                            "batch_im_id")} for c in cam_rows]
                    ),
                    K=jnp.asarray(K),
                    TWC=jnp.asarray(np.stack([c["TWC"] for c in cam_rows])),
                )
                mv = mv_predictor.predict_scene_state(
                    PandasTensorCollection(data_TCO.infos.copy(),
                                           poses=data_TCO.poses),
                    cameras, **mv_kwargs,
                )
                predictions["multiview"].append(mv["ba_output+all_cand"])

            if icp_refiner is not None:
                depths = np.stack(
                    [obs["camera"].get("depth") for _, _, obs in group_obs]
                )
                refined = icp_refiner.refine_poses(
                    data_TCO, detections.masks
                    if hasattr(detections, "masks") else None,
                    jnp.asarray(depths), jnp.asarray(K),
                )
                predictions["icp"].append(refined)

        return {k: concatenate(v) for k, v in predictions.items() if v}


class DetectionRunner:
    def __init__(self, scene_ds, batch_size: int = 16):
        self.ds = scene_ds
        # fixed-size batched dispatches: per-frame B=1 calls pay the TPU
        # tunnel's per-dispatch latency 16x over (and a recompile per shape)
        self.batch_size = batch_size

    def get_predictions(self, detector, detection_th=0.0):
        preds = []
        n = len(self.ds)
        bsz = self.batch_size
        for start in range(0, n, bsz):
            ids = list(range(start, min(start + bsz, n)))
            items = [self.ds[i] for i in ids]
            ims = np.stack(
                [np.transpose(rgb, (2, 0, 1)) for rgb, _, _ in items]
            )
            n_valid = len(ids)
            if n_valid < bsz:  # pad to the fixed batch (repeat last frame)
                ims = np.concatenate(
                    [ims, np.repeat(ims[-1:], bsz - n_valid, axis=0)]
                )
            dets = detector.get_detections(
                jnp.asarray(ims), detection_th=detection_th
            )
            keep = dets.infos["batch_im_id"].values < n_valid
            dets = dets[np.where(keep)[0]]
            frames = [it[2]["frame_info"] for it in items]
            dets.infos["scene_id"] = [
                frames[b]["scene_id"] for b in dets.infos["batch_im_id"]
            ]
            dets.infos["view_id"] = [
                frames[b]["view_id"] for b in dets.infos["batch_im_id"]
            ]
            preds.append(dets)
        return {"detections": concatenate(preds)}
