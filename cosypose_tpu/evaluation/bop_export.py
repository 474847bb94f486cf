"""BOP challenge CSV export.

Capability match for the reference's prediction→CSV conversion consumed by the
official bop_toolkit (ref: cosypose/scripts/run_bop20_eval.py:47-71 and
run_custom_scenario.py:26-42 tc_to_csv): one row per prediction:

    scene_id,im_id,obj_id,score,R (9 floats),t (3 floats, MILLIMETERS),time

Metric computation itself stays external (official toolkit, invoked
out-of-process), mirroring the reference's process boundary (SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np


def predictions_to_bop_csv(preds, csv_path, use_pose_score=True):
    """preds: PandasTensorCollection with infos[scene_id, view_id, label, score
    (, time)] and poses (N, 4, 4) in meters."""
    infos = preds.infos
    poses = np.asarray(preds.poses, np.float64)
    lines = ["scene_id,im_id,obj_id,score,R,t,time"]
    for n in range(len(infos)):
        row = infos.iloc[n]
        obj_id = int(str(row["label"]).split("_")[-1])
        R = poses[n, :3, :3].reshape(-1)
        t = poses[n, :3, 3] * 1000.0  # m → mm
        score = row["score"] if use_pose_score else 1.0
        time = row.get("time", -1.0)
        lines.append(
            f"{int(row['scene_id'])},{int(row['view_id'])},{obj_id},"
            f"{score},{' '.join(f'{x:.8f}' for x in R)},"
            f"{' '.join(f'{x:.8f}' for x in t)},{time}"
        )
    with open(csv_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return csv_path


def csv_to_candidates(csv_path):
    """Inverse: read a candidates.csv into (infos rows, poses) — the
    custom-scenario entry format (ref: run_custom_scenario.py:45-60)."""
    import pandas as pd

    rows, poses = [], []
    with open(csv_path) as f:
        header = f.readline().strip().split(",")
        for line in f:
            vals = dict(zip(header, line.strip().split(",")))
            R = np.asarray([float(x) for x in vals["R"].split()]).reshape(3, 3)
            t = np.asarray([float(x) for x in vals["t"].split()]) / 1000.0
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = t
            poses.append(T)
            rows.append(
                dict(
                    scene_id=int(vals["scene_id"]),
                    view_id=int(vals["im_id"]),
                    label=f"obj_{int(vals['obj_id']):06d}",
                    score=float(vals["score"]),
                )
            )
    return pd.DataFrame(rows), np.asarray(poses, np.float32)
