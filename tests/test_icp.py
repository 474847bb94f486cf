import numpy as np
import jax.numpy as jnp
import pandas as pd

from cosypose_tpu.integrated.icp_refiner import ICPRefiner, _icp_refine_batch
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.ops.rasterizer import rasterize
from cosypose_tpu.utils.tensor_collection import PandasTensorCollection
from tests.test_pose_predictor import cube_specs, make_K


def test_icp_recovers_translation_offset():
    """Render GT depth; perturb the pose; ICP should pull it back."""
    db = build_mesh_db(cube_specs())
    K = make_K(1, f=300.0, cx=80.0, cy=60.0)
    H, W = 120, 160

    TCO_gt = np.eye(4, dtype=np.float32)[None]
    TCO_gt[:, 2, 3] = 0.5
    label_ids = jnp.asarray([0])
    tri_verts = jnp.take(db.tri_verts, label_ids, axis=0)
    tri_valid = jnp.take(db.tri_valid, label_ids, axis=0)

    depth_gt = rasterize(
        tri_verts, tri_valid, jnp.asarray(TCO_gt), K, image_size=(H, W)
    ).depth

    TCO_bad = TCO_gt.copy()
    TCO_bad[:, 0, 3] += 0.01
    TCO_bad[:, 2, 3] += 0.02

    preds = PandasTensorCollection(
        pd.DataFrame([dict(batch_im_id=0, label="obj_000001", score=1.0)]),
        poses=jnp.asarray(TCO_bad),
    )
    refiner = ICPRefiner(db)
    out = refiner.refine_poses(preds, None, depth_gt, K, n_iterations=15)
    refined = np.asarray(out.poses[0])
    err_before = np.linalg.norm(TCO_bad[0, :3, 3] - TCO_gt[0, :3, 3])
    err_after = np.linalg.norm(refined[:3, 3] - TCO_gt[0, :3, 3])
    assert err_after < err_before * 0.5, (err_before, err_after)
    assert bool(out.infos["icp_ok"].iloc[0])


def test_icp_no_depth_keeps_pose():
    db = build_mesh_db(cube_specs())
    K = make_K(1, f=300.0, cx=80.0, cy=60.0)
    TCO = np.eye(4, dtype=np.float32)[None]
    TCO[:, 2, 3] = 0.5
    preds = PandasTensorCollection(
        pd.DataFrame([dict(batch_im_id=0, label="obj_000001", score=1.0)]),
        poses=jnp.asarray(TCO),
    )
    refiner = ICPRefiner(db)
    out = refiner.refine_poses(preds, None, jnp.zeros((1, 120, 160)), K)
    np.testing.assert_allclose(np.asarray(out.poses[0]), TCO[0], atol=1e-5)
    assert not bool(out.infos["icp_ok"].iloc[0])
