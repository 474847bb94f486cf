"""GT observation parsing for evaluation.

Capability match for the reference's ``cosypose/evaluation/data_utils.py``
(parse_obs_data :8-35): convert a scene dataset's obs dict into the GT
PandasTensorCollection the meters consume (poses in the camera frame, bboxes,
visib_fract, per-frame ids).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..utils.tensor_collection import PandasTensorCollection


def parse_obs_data(obs: dict) -> PandasTensorCollection:
    frame = obs["frame_info"]
    TWC = np.asarray(obs["camera"].get("TWC", np.eye(4)), np.float32)
    TCW = np.linalg.inv(TWC)
    rows, poses, bboxes = [], [], []
    for obj in obs["objects"]:
        rows.append(
            dict(
                scene_id=frame["scene_id"],
                view_id=frame["view_id"],
                label=obj["label"],
                visib_fract=obj.get("visib_fract", 1.0),
            )
        )
        poses.append(TCW @ np.asarray(obj["TWO"], np.float32))
        bboxes.append(np.asarray(obj.get("bbox", np.zeros(4)), np.float32))
    if not rows:
        return PandasTensorCollection(
            pd.DataFrame(columns=["scene_id", "view_id", "label", "visib_fract"]),
            poses=jnp.zeros((0, 4, 4), jnp.float32),
            bboxes=jnp.zeros((0, 4), jnp.float32),
        )
    return PandasTensorCollection(
        pd.DataFrame(rows),
        poses=jnp.asarray(np.stack(poses)),
        bboxes=jnp.asarray(np.stack(bboxes)),
    )


def parse_camera_data(obs: dict, batch_im_id: int) -> dict:
    frame = obs["frame_info"]
    return dict(
        scene_id=frame["scene_id"],
        view_id=frame["view_id"],
        group_id=frame.get("group_id", 0),
        batch_im_id=batch_im_id,
        K=np.asarray(obs["camera"]["K"], np.float32),
        TWC=np.asarray(obs["camera"].get("TWC", np.eye(4)), np.float32),
    )
