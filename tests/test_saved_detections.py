"""Saved-detections loaders consume the reference's pickle formats end-to-end
(fixtures mimic the published ycbv_posecnn.pkl / tless_pix2pose_*.pkl files,
ref: scripts/run_cosypose_eval.py:50-137)."""

import json
import pickle

import numpy as np

from cosypose_tpu.evaluation.saved_detections import (
    load_pix2pose_results,
    load_posecnn_results,
)


def test_load_posecnn_results(tmp_path):
    (tmp_path / "saved_detections").mkdir()
    (tmp_path / "bop_datasets" / "ycbv").mkdir(parents=True)
    # offsets.txt: "NN [x, y, z]" lines (mm)
    (tmp_path / "bop_datasets" / "ycbv" / "offsets.txt").write_text(
        "01 [10.0, 0.0, 0.0]\n05 [0.0, -20.0, 5.0]\n"
    )
    results = {
        "48/1": dict(
            rois=np.array([[0, 1, 10.0, 20.0, 100.0, 120.0],
                           [0, 5, 30.0, 40.0, 200.0, 220.0]]),
            poses=np.array([[1, 0, 0, 0, 0.1, 0.2, 0.9],   # wxyz + t
                            [0, 1, 0, 0, -0.1, 0.0, 1.1]]),
        ),
    }
    (tmp_path / "saved_detections" / "ycbv_posecnn.pkl").write_bytes(
        pickle.dumps(results)
    )
    data = load_posecnn_results(local_data_dir=tmp_path)
    assert len(data) == 2
    assert list(data.infos["label"]) == ["obj_000001", "obj_000005"]
    poses = np.asarray(data.poses)
    assert poses.shape == (2, 4, 4)
    # identity rotation + offset-corrected translation for det 0:
    # t' = t - R @ offset = (0.1,0.2,0.9) - (0.01,0,0)
    np.testing.assert_allclose(poses[0, :3, 3], [0.09, 0.2, 0.9], atol=1e-6)
    np.testing.assert_allclose(poses[0, :3, :3], np.eye(3), atol=1e-6)
    assert np.asarray(data.bboxes).shape == (2, 4)


def test_load_pix2pose_results(tmp_path):
    (tmp_path / "saved_detections").mkdir()
    T_bad = np.eye(4); T_bad[:3, 3] = 0.0       # degenerate pose
    T_ok = np.eye(4); T_ok[:3, 3] = [0.1, 0.0, 0.5]
    results = {
        "3/7": dict(
            rois=np.array([[5.0, 10.0, 50.0, 90.0],
                           [1.0, 2.0, 3.0, 4.0]]),   # yxyx
            scores=np.array([0.9, 0.4]),
            poses=np.stack([T_ok, T_bad]),
            labels_txt=["obj_000002", "obj_000009"],
        ),
    }
    for name in ("tless_pix2pose_retinanet_vivo_all.pkl",
                 "tless_pix2pose_retinanet_siso_top1.pkl"):
        (tmp_path / "saved_detections" / name).write_bytes(
            pickle.dumps(results)
        )
    data = load_pix2pose_results(all_detections=True, local_data_dir=tmp_path)
    assert len(data) == 2
    np.testing.assert_allclose(
        np.asarray(data.bboxes)[0], [10.0, 5.0, 90.0, 50.0]
    )  # xyxy
    filtered = load_pix2pose_results(
        all_detections=False, remove_incorrect_poses=True,
        local_data_dir=tmp_path,
    )
    assert len(filtered) == 1 and filtered.infos.iloc[0]["label"] == "obj_000002"
