import pytest

pytestmark = pytest.mark.slow
import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd

from cosypose_tpu.integrated import (
    CoarseRefinePosePredictor,
    LoadedPoseModel,
    Detector,
)
from cosypose_tpu.models import PosePredictor, PosePredictorConfig
from cosypose_tpu.models.detector import CenterNetDetector, DetectorConfig, decode_detections
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.utils.tensor_collection import PandasTensorCollection
from tests.test_pose_predictor import cube_specs, make_K, small_cfg


def make_loaded_model(init_method="v0"):
    cfg = small_cfg()
    pp = PosePredictor(cfg)
    variables = pp.init(jax.random.PRNGKey(0))
    db = build_mesh_db(cube_specs())
    return LoadedPoseModel(pp, variables, db, init_method=init_method)


def test_coarse_refine_pipeline():
    coarse = make_loaded_model()
    refiner = make_loaded_model()
    predictor = CoarseRefinePosePredictor(coarse, refiner, bsz_objects=4)

    B_img = 2
    images = jnp.asarray(
        np.random.RandomState(0).uniform(size=(B_img, 3, 120, 160)).astype(np.float32)
    )
    K = make_K(B_img)
    detections = PandasTensorCollection(
        pd.DataFrame(
            dict(
                batch_im_id=[0, 0, 1],
                label=["obj_000001", "obj_000002", "obj_000001"],
                score=[0.9, 0.8, 0.7],
            )
        ),
        bboxes=jnp.asarray(
            [[60, 40, 100, 80], [30, 30, 80, 70], [70, 50, 110, 90]], jnp.float32
        ),
    )
    data_TCO, preds = predictor.get_predictions(
        images, K, detections=detections,
        n_coarse_iterations=1, n_refiner_iterations=2,
    )
    assert len(data_TCO) == 3
    assert data_TCO.poses.shape == (3, 4, 4)
    assert "coarse/iteration=1" in preds
    assert "refiner/iteration=2" in preds
    # chaining: refiner iteration-1 input == coarse iteration-1 output
    np.testing.assert_allclose(
        np.asarray(preds["refiner/iteration=1"].poses_input),
        np.asarray(preds["coarse/iteration=1"].poses),
        atol=1e-5,
    )
    # infos preserved
    assert list(data_TCO.infos["label"]) == ["obj_000001", "obj_000002", "obj_000001"]


def test_coarse_refine_autodepth_init():
    coarse = make_loaded_model(init_method="z-up+auto-depth")
    predictor = CoarseRefinePosePredictor(coarse, None, bsz_objects=4)
    K = make_K(1)
    detections = PandasTensorCollection(
        pd.DataFrame(dict(batch_im_id=[0], label=["obj_000001"], score=[0.9])),
        bboxes=jnp.asarray([[60, 40, 100, 80]], jnp.float32),
    )
    init = predictor.make_TCO_init(detections, K)
    R = np.asarray(init.poses[0, :3, :3])
    expected_R = np.array([[0, 1, 0], [0, 0, -1], [-1, 0, 0]], np.float32)
    np.testing.assert_allclose(R, expected_R, atol=1e-6)
    assert float(init.poses[0, 2, 3]) > 0.05


def test_detector_decode_fixed_shapes():
    cfg = DetectorConfig(n_classes=3, max_detections=8)
    model = CenterNetDetector(cfg)
    images = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), images, train=False)
    out = model.apply(variables, images, train=False)
    dec = decode_detections(out, cfg.max_detections)
    assert dec["scores"].shape == (2, 8)
    assert dec["boxes"].shape == (2, 8, 4)
    assert dec["class_ids"].shape == (2, 8)


def test_detector_wrapper():
    cfg = DetectorConfig(n_classes=3, max_detections=8)
    model = CenterNetDetector(cfg)
    images = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), images, train=False)
    det = Detector(model, variables, {"obj_1": 0, "obj_2": 1, "obj_3": 2})
    out = det.get_detections(np.zeros((1, 3, 64, 64), np.float32), detection_th=None)
    # untrained heatmap sigmoid ≈ 0.1 > 0 → detections exist with valid labels
    assert set(out.infos["label"]).issubset({"obj_1", "obj_2", "obj_3"})
    out2 = det.get_detections(
        np.zeros((1, 3, 64, 64), np.float32), one_instance_per_class=True
    )
    assert out2.infos["label"].nunique() == len(out2)
