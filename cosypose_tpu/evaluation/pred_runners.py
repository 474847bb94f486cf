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
    """End-to-end BOP20 inference (detector → pose → [multiview] → [icp]).

    TPU-first restructuring of the reference's per-group loop
    (ref: evaluation/pred_runner/bop_predictions.py:75-151): frames from a
    WINDOW of view groups are detected in fixed-size padded batches (one
    compiled detector program regardless of group sizes — a per-group call
    recompiles for every distinct group size and pays the ~40ms tunnel
    dispatch floor per group), then each group's pose stage runs on its own
    detections (the pose predictor already pads candidates to a fixed object
    batch). Per-image wall time is detector-batch time amortized per frame
    plus the group's pose time per view; the warm-up (first detector batch +
    first pose group) is excluded from timing as in the reference (:96-136).
    """

    def __init__(self, scene_ds_multiview, n_coarse_iterations=1,
                 n_refiner_iterations=4, det_batch_size: int = 16):
        self.ds = scene_ds_multiview
        self.n_coarse = n_coarse_iterations
        self.n_refiner = n_refiner_iterations
        self.det_batch_size = det_batch_size

    def _detect_window(self, detector, frames, detection_th, output_masks,
                       already_warm):
        """Fixed-batch detection over a flat frame list.

        frames: list of (group_idx, local_idx, rgb). Returns (per-frame
        detections as a list aligned with frames, per-frame detector seconds,
        warm-up flag list — true only for the compile batch, i.e. the first
        chunk of the FIRST window; already_warm suppresses it for later
        windows so their times stay measured)."""
        bsz = self.det_batch_size
        dets_per_frame = [None] * len(frames)
        det_time = np.zeros(len(frames))
        first_flags = np.zeros(len(frames), bool)
        for start in range(0, len(frames), bsz):
            chunk = frames[start:start + bsz]
            ims = np.stack(
                [np.transpose(rgb, (2, 0, 1)) for _, _, rgb in chunk]
            )
            n_valid = len(chunk)
            if n_valid < bsz:
                ims = np.concatenate(
                    [ims, np.repeat(ims[-1:], bsz - n_valid, axis=0)]
                )
            t0 = time.perf_counter()
            dets = detector.get_detections(
                jnp.asarray(ims), detection_th=detection_th,
                output_masks=output_masks,
            )
            dt = time.perf_counter() - t0
            for j in range(n_valid):
                rows = np.where(dets.infos["batch_im_id"].values == j)[0]
                dets_per_frame[start + j] = dets[rows]
                det_time[start + j] = dt / n_valid
                first_flags[start + j] = start == 0 and not already_warm
        return dets_per_frame, det_time, first_flags

    def get_predictions(self, detector, pose_predictor, mv_predictor=None,
                        icp_refiner=None, detection_th=0.3,
                        window_groups: int = 16, **mv_kwargs):
        predictions = defaultdict(list)
        output_masks = icp_refiner is not None
        warm_pose = False
        warm_det = False

        n_groups = len(self.ds)
        for w0 in range(0, n_groups, window_groups):
            gids = range(w0, min(w0 + window_groups, n_groups))
            groups = {g: self.ds[g] for g in gids}

            # ---- phase 1: fixed-batch detection over the window's frames
            frames = [
                (g, i, rgb)
                for g in gids for i, (rgb, _, _) in enumerate(groups[g])
            ]
            dets_pf, det_time, det_first = self._detect_window(
                detector, frames, detection_th, output_masks, warm_det
            )
            warm_det = True
            by_group = defaultdict(list)
            for fi, (g, i, _) in enumerate(frames):
                by_group[g].append(fi)

            # ---- phase 2: per-group pose (+ multiview / icp)
            for g in gids:
                group_obs = groups[g]
                images, K, cam_rows = _group_images_K(group_obs)
                frame_ids = by_group[g]
                group_dets = [dets_pf[fi] for fi in frame_ids]
                for i, d in enumerate(group_dets):
                    d.infos["batch_im_id"] = i  # re-key to the group batch
                detections = concatenate(
                    [d for d in group_dets if len(d)]
                ) if any(len(d) for d in group_dets) else None
                if detections is None or len(detections) == 0:
                    continue

                t0 = time.perf_counter()
                data_TCO, _ = pose_predictor.get_predictions(
                    jnp.asarray(images), jnp.asarray(K),
                    detections=detections,
                    n_coarse_iterations=self.n_coarse,
                    n_refiner_iterations=self.n_refiner,
                )
                pose_dt = time.perf_counter() - t0
                # warm-up exclusion: first pose group / first detector batch
                if not warm_pose:
                    warm_pose = True
                    pose_dt = float("nan")
                per_frame = pose_dt / max(len(group_obs), 1)
                times = det_time[frame_ids] + per_frame
                times[det_first[frame_ids]] = float("nan")
                time_by_im = dict(enumerate(times))
                data_TCO.infos["time"] = (
                    data_TCO.infos["batch_im_id"].map(time_by_im)
                )

                for c in cam_rows:
                    m = data_TCO.infos["batch_im_id"] == c["batch_im_id"]
                    data_TCO.infos.loc[m, "scene_id"] = c["scene_id"]
                    data_TCO.infos.loc[m, "view_id"] = c["view_id"]
                    data_TCO.infos.loc[m, "group_id"] = c["group_id"]
                predictions["pose"].append(data_TCO)

                if mv_predictor is not None and len(group_obs) > 1:
                    cameras = PandasTensorCollection(
                        pd.DataFrame(
                            [{k: c[k] for k in ("scene_id", "view_id",
                                                "group_id", "batch_im_id")}
                             for c in cam_rows]
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

    def get_predictions(self, detector, detection_th=0.0, output_masks=False,
                        mask_th=0.05):
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
                jnp.asarray(ims), detection_th=detection_th,
                output_masks=output_masks, mask_th=mask_th,
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
