"""End-to-end prediction-runner tests over the synthetic BOP fixture."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd

from cosypose_tpu.data.bop import BOPDataset, BOPObjectDataset
from cosypose_tpu.data.wrappers import MultiViewWrapper
from cosypose_tpu.evaluation.eval_runners import PoseEvaluation
from cosypose_tpu.evaluation.meters import PoseErrorMeter
from cosypose_tpu.evaluation.pred_runners import (
    DetectionRunner,
    MultiviewPredictionRunner,
)
from cosypose_tpu.integrated import CoarseRefinePosePredictor, LoadedPoseModel
from cosypose_tpu.models import PosePredictor, PosePredictorConfig
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.utils.tensor_collection import PandasTensorCollection
from tests.test_data import build_bop_fixture


def tiny_model(mesh_db):
    cfg = PosePredictorConfig(
        backbone="efficientnet-b0",
        render_size=(48, 64),
        n_points_crop=8,
        raster_max_tris_per_tile=16,
    )
    pp = PosePredictor(cfg)
    variables = pp.init(jax.random.PRNGKey(0))
    return LoadedPoseModel(pp, variables, mesh_db, init_method="v0")


def test_multiview_runner_with_saved_detections(tmp_path):
    root = build_bop_fixture(tmp_path)
    scene_ds = BOPDataset(root, split="test")
    obj_ds = BOPObjectDataset(root / "models")
    mesh_db = build_mesh_db(obj_ds.mesh_specs())

    ds_multi = MultiViewWrapper(scene_ds, n_views=3)
    model = tiny_model(mesh_db)
    predictor = CoarseRefinePosePredictor(model, model, bsz_objects=4)

    # saved detections: GT boxes of the visible object in each view
    rows, boxes = [], []
    for idx in range(len(scene_ds)):
        _, _, obs = scene_ds[idx]
        frame = obs["frame_info"]
        o = obs["objects"][0]
        rows.append(dict(scene_id=frame["scene_id"], view_id=frame["view_id"],
                         label=o["label"], score=0.9))
        boxes.append(o["bbox"])
    detections = PandasTensorCollection(
        pd.DataFrame(rows), bboxes=jnp.asarray(np.stack(boxes), jnp.float32)
    )

    runner = MultiviewPredictionRunner(ds_multi, n_coarse_iterations=1,
                                       n_refiner_iterations=1)
    preds = runner.get_predictions(predictor, detections=detections)
    assert "coarse/iteration=1" in preds
    assert "refiner/iteration=1" in preds
    final = preds["refiner/iteration=1"]
    assert len(final) == 3  # one detection per view
    assert {"scene_id", "view_id", "label", "score"} <= set(final.infos.columns)

    # evaluate the (untrained) predictions through the meter stack — the
    # pipeline wiring is what's under test, not accuracy
    for label in mesh_db.infos:
        mesh_db.infos[label].setdefault("diameter_m", 0.18)
    meter = PoseErrorMeter(mesh_db, error_type="ADD", report_error_AUC=True)
    ev = PoseEvaluation(scene_ds, {"ADD": meter})
    metrics, _ = ev.evaluate(final)
    assert metrics["ADD"]["n_gt"] == 6  # 2 objects × 3 views
    assert np.isfinite(metrics["ADD"]["n_pred"])


def test_detection_runner(tmp_path):
    from cosypose_tpu.integrated import Detector
    from cosypose_tpu.models.detector import CenterNetDetector, DetectorConfig

    root = build_bop_fixture(tmp_path)
    scene_ds = BOPDataset(root, split="test")
    cfg = DetectorConfig(n_classes=2, max_detections=4)
    model = CenterNetDetector(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 128, 3)),
                           train=False)
    det = Detector(model, variables,
                   {"obj_000001": 0, "obj_000002": 1})
    runner = DetectionRunner(scene_ds)
    preds = runner.get_predictions(det, detection_th=0.0)
    assert "detections" in preds
    assert {"scene_id", "view_id"} <= set(preds["detections"].infos.columns)


def test_bop_prediction_runner_end_to_end(tmp_path):
    """Full BOP pipeline wiring: detector → coarse+refiner → CSV export."""
    from cosypose_tpu.evaluation.bop_export import predictions_to_bop_csv
    from cosypose_tpu.evaluation.pred_runners import BopPredictionRunner
    from cosypose_tpu.integrated import Detector
    from cosypose_tpu.models.detector import CenterNetDetector, DetectorConfig

    root = build_bop_fixture(tmp_path)
    scene_ds = BOPDataset(root, split="test")
    obj_ds = BOPObjectDataset(root / "models")
    mesh_db = build_mesh_db(obj_ds.mesh_specs())

    det_model = CenterNetDetector(DetectorConfig(n_classes=2, max_detections=4))
    det_vars = det_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 96, 128, 3)), train=False)
    detector = Detector(det_model, det_vars,
                        {"obj_000001": 0, "obj_000002": 1})

    model = tiny_model(mesh_db)
    predictor = CoarseRefinePosePredictor(model, model, bsz_objects=4)

    ds_multi = MultiViewWrapper(scene_ds, n_views=1)
    runner = BopPredictionRunner(ds_multi, n_coarse_iterations=1,
                                 n_refiner_iterations=1)
    # untrained detector: accept everything above 0 so the pipeline runs
    preds = runner.get_predictions(detector, predictor, detection_th=0.0)
    assert "pose" in preds
    pose_preds = preds["pose"]
    assert len(pose_preds) > 0
    assert "time" in pose_preds.infos.columns

    csv = tmp_path / "preds.csv"
    predictions_to_bop_csv(pose_preds, csv)
    assert csv.read_text().startswith("scene_id,im_id,obj_id,score,R,t,time")


def test_bop19_ar_over_bop_dataset(tmp_path):
    """Native BOP19 AR driven by a real BOPDataset: perfect predictions of
    the visible object score AR 1 (the visib_fract 0.05 object is excluded
    by the 0.1 validity filter — toolkit protocol); jitter degrades AR."""
    from cosypose_tpu.evaluation.bop_metrics import compute_bop19_ar

    root = build_bop_fixture(tmp_path)
    scene_ds = BOPDataset(root, split="test")
    obj_ds = BOPObjectDataset(root / "models")
    mesh_db = build_mesh_db(obj_ds.mesh_specs())

    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = (0, 0, 0.5)  # fixture GT: obj1 at z=0.5m in every view
    infos = pd.DataFrame(
        dict(scene_id=[1] * 3, view_id=[0, 1, 2],
             label=["obj_000001"] * 3, score=[1.0] * 3)
    )
    perfect = PandasTensorCollection(
        infos.copy(), poses=jnp.asarray(np.stack([T] * 3)))
    s = compute_bop19_ar(perfect, scene_ds, mesh_db,
                         error_types=("mssd", "mspd"))
    assert s["n_gt"] == 3  # obj2 (visib 0.05) excluded in all 3 views
    assert s["AR"] == 1.0

    Tj = T.copy()
    Tj[:3, 3] += (0.04, 0, 0)  # ~40% of the 10.4 cm diameter
    jitter = PandasTensorCollection(
        infos.copy(), poses=jnp.asarray(np.stack([Tj] * 3)))
    s2 = compute_bop19_ar(jitter, scene_ds, mesh_db,
                          error_types=("mssd", "mspd"))
    assert 0.0 < s2["AR"] < 1.0
