"""Public stage-2/3 utility: multi-view scene reconstruction from a CSV.

Capability match for the reference's ``cosypose/scripts/run_custom_scenario.py``
(:94-180): reads <scenario_dir>/candidates.csv + scene_camera.json + models/
(BOP format), runs MultiviewScenePredictor (RANSAC matching + bundle
adjustment), writes predicted_scene.json (objects + cameras in world frame) and
scene_reprojected.csv (every object reprojected into every camera, nms3d'd).

Usage:
  python -m cosypose_tpu.scripts.run_custom_scenario --scenario <dir>
      [--sv_score_th 0.3] [--ransac_n_iter 2000] [--ransac_dist_threshold 0.02]
      [--ba_n_iter 100] [--nms_th 0.04]
"""

from __future__ import annotations

import argparse
import json
import pathlib

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..data.bop import BOPObjectDataset
from ..evaluation.bop_export import csv_to_candidates, predictions_to_bop_csv
from ..integrated.multiview_predictor import MultiviewScenePredictor
from ..ops.mesh_db import build_mesh_db
from ..utils.logging import get_logger
from ..utils.tensor_collection import PandasTensorCollection
from ..visualization.multiview import nms3d

logger = get_logger(__name__)


def load_scene_cameras(path):
    with open(path) as f:
        cams = json.load(f)
    rows, K_l, TWC_l = [], [], []
    for view_id_str, cam in cams.items():
        rows.append(dict(view_id=int(view_id_str),
                         batch_im_id=len(rows), scene_id=0))
        K_l.append(np.asarray(cam["cam_K"], np.float32).reshape(3, 3))
        TWC = np.eye(4, dtype=np.float32)
        if "cam_R_w2c" in cam:
            T_w2c = np.eye(4, dtype=np.float32)
            T_w2c[:3, :3] = np.asarray(cam["cam_R_w2c"], np.float32).reshape(3, 3)
            T_w2c[:3, 3] = np.asarray(cam["cam_t_w2c"], np.float32) / 1000.0
            TWC = np.linalg.inv(T_w2c)
        TWC_l.append(TWC)
    return PandasTensorCollection(
        pd.DataFrame(rows),
        K=jnp.asarray(np.stack(K_l)),
        TWC=jnp.asarray(np.stack(TWC_l)),
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--scenario", required=True)
    parser.add_argument("--sv_score_th", type=float, default=0.3)
    parser.add_argument("--ransac_n_iter", type=int, default=2000)
    parser.add_argument("--ransac_dist_threshold", type=float, default=0.02)
    parser.add_argument("--ba_n_iter", type=int, default=100)
    parser.add_argument("--nms_th", type=float, default=0.04)
    parser.add_argument("--no_visualization", action="store_true")
    args = parser.parse_args(argv)

    scenario = pathlib.Path(args.scenario)
    df, poses = csv_to_candidates(scenario / "candidates.csv")
    df["group_id"] = 0
    candidates = PandasTensorCollection(df, poses=jnp.asarray(poses))
    cameras = load_scene_cameras(scenario / "scene_camera.json")

    obj_ds = BOPObjectDataset(scenario / "models")
    mesh_db = build_mesh_db(obj_ds.mesh_specs(), aabb=True, keep_geometry=False)

    predictor = MultiviewScenePredictor(mesh_db)
    preds = predictor.predict_scene_state(
        candidates, cameras,
        score_th=args.sv_score_th,
        ransac_n_iter=args.ransac_n_iter,
        ransac_dist_threshold=args.ransac_dist_threshold,
        ba_n_iter=args.ba_n_iter,
    )

    objects = preds["scene/objects"]
    cams = preds["scene/cameras"]
    scene = dict(
        objects=[
            dict(
                label=objects.infos["label"].iloc[n],
                score=float(objects.infos["score"].iloc[n]),
                n_cand=int(objects.infos["n_cand"].iloc[n]),
                TWO=np.asarray(objects.TWO[n]).tolist(),
            )
            for n in range(len(objects))
        ],
        cameras=[
            dict(
                view_id=int(cams.infos["view_id"].iloc[n]),
                TWC=np.asarray(cams.TWC[n]).tolist(),
                K=np.asarray(cams.K[n]).tolist(),
            )
            for n in range(len(cams))
        ],
    )
    (scenario / "results").mkdir(exist_ok=True)
    out_json = scenario / "results" / "predicted_scene.json"
    out_json.write_text(json.dumps(scene, indent=2))

    reproj = preds["ba_output"]
    reproj = nms3d(reproj, th=args.nms_th)
    out_csv = scenario / "results" / "scene_reprojected.csv"
    predictions_to_bop_csv(reproj, out_csv)
    logger.info(f"Wrote {out_json} and {out_csv}")
    return scene


if __name__ == "__main__":
    main()
