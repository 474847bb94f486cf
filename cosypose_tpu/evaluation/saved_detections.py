"""Loaders for externally saved detections/poses used by the paper protocol.

Capability match for the reference's loaders in run_cosypose_eval.py:
  * load_posecnn_results  — YCB-V PoseCNN rois/poses pickle + the YCB point
    offsets file, poses corrected by the per-object offset
    (ref: scripts/run_cosypose_eval.py:50-96)
  * load_pix2pose_results — T-LESS Pix2Pose RetinaNet detections (ViVo "all"
    or SiSo "top1" files), box axes swapped to xyxy
    (ref: scripts/run_cosypose_eval.py:98-137)

Outputs are PandasTensorCollections with infos[scene_id, view_id, score,
label], poses (N,4,4) and bboxes (N,4) — directly consumable by
CoarseRefinePosePredictor / the eval runners.

Note: the reference stores `result['rois'][n, 1]` (the object id column) in
the score field for PoseCNN; that quirk is reproduced so ranking-dependent
results match the published protocol exactly.
"""

from __future__ import annotations

import json
import pickle

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..config import LOCAL_DATA_DIR
from ..ops.transform import Transform
from ..utils.tensor_collection import PandasTensorCollection


def _load_ycb_offsets(ds_dir):
    ycb_offsets = {}
    for line in (ds_dir / "offsets.txt").read_text().strip().split("\n"):
        obj_id, offset = int(line[:2]), np.array(json.loads(line[3:])) * 0.001
        ycb_offsets[obj_id] = offset
    return ycb_offsets


def load_posecnn_results(local_data_dir=None):
    local = local_data_dir or LOCAL_DATA_DIR
    results_path = local / "saved_detections" / "ycbv_posecnn.pkl"
    results = pickle.loads(results_path.read_bytes())
    ycb_offsets = _load_ycb_offsets(local / "bop_datasets" / "ycbv")

    def mat_from_qt(qt):
        wxyz = qt[:4].tolist()
        xyzw = [*wxyz[1:], wxyz[0]]
        return Transform(np.asarray(xyzw), qt[4:])

    infos, poses, bboxes = [], [], []
    for scene_view_str, result in results.items():
        scene_id, view_id = map(int, scene_view_str.split("/"))
        for n in range(result["rois"].shape[0]):
            obj_id = int(result["rois"][:, 1].astype(np.int64)[n])
            infos.append(
                dict(scene_id=scene_id, view_id=view_id,
                     score=result["rois"][n, 1],  # ref quirk, see docstring
                     label=f"obj_{obj_id:06d}")
            )
            bboxes.append(result["rois"][n, 2:6])
            pose = mat_from_qt(result["poses"][n])
            offset = ycb_offsets[obj_id]
            pose = pose * Transform(np.asarray([0.0, 0, 0, 1]), offset).inverse()
            poses.append(pose.toHomogeneousMatrix())

    return PandasTensorCollection(
        infos=pd.DataFrame(infos),
        poses=jnp.asarray(np.stack(poses), jnp.float32),
        bboxes=jnp.asarray(np.stack(bboxes), jnp.float32),
    )


def load_pix2pose_results(all_detections: bool = True,
                          remove_incorrect_poses: bool = False,
                          local_data_dir=None):
    local = local_data_dir or LOCAL_DATA_DIR
    fname = (
        "tless_pix2pose_retinanet_vivo_all.pkl" if all_detections
        else "tless_pix2pose_retinanet_siso_top1.pkl"
    )
    results = pickle.loads((local / "saved_detections" / fname).read_bytes())

    infos, poses, bboxes = [], [], []
    for key, result in results.items():
        scene_id, view_id = map(int, key.split("/"))
        boxes = np.asarray(result["rois"])
        new_boxes = boxes.copy()
        new_boxes[:, [0, 1, 2, 3]] = boxes[:, [1, 0, 3, 2]]  # yxyx → xyxy
        for o, label in enumerate(result["labels_txt"]):
            t = np.asarray(result["poses"][o])[:3, -1]
            if remove_incorrect_poses and (np.sum(t) == 0 or np.max(t) > 100):
                continue
            infos.append(
                dict(scene_id=scene_id, view_id=view_id,
                     score=float(result["scores"][o]), label=label)
            )
            bboxes.append(new_boxes[o])
            poses.append(np.asarray(result["poses"][o]))

    return PandasTensorCollection(
        infos=pd.DataFrame(infos),
        poses=jnp.asarray(np.stack(poses), jnp.float32),
        bboxes=jnp.asarray(np.stack(bboxes), jnp.float32),
    )
