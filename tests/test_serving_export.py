"""Round-trip test for serving/export.py: export a tiny trained-shape model
to a StableHLO artifact and check the rehydrated callable reproduces the
in-process forward exactly (same jitted program, same outputs)."""

import jax
import numpy as np
import jax.numpy as jnp

from cosypose_tpu.integrated import LoadedPoseModel
from cosypose_tpu.models import PosePredictor
from cosypose_tpu.models.pose_predictor import gather_mesh_data
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.serving.export import export_pose_model, load_exported
from tests.test_pose_predictor import cube_specs, make_K, small_cfg


def test_export_roundtrip(tmp_path):
    cfg = small_cfg()
    pp = PosePredictor(cfg)
    variables = pp.init(jax.random.PRNGKey(0))
    db = build_mesh_db(cube_specs())
    model = LoadedPoseModel(pp, variables, db, init_method="v0")

    B, H, W = 2, 120, 160
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, 3, H, W), jnp.float32)
    K = make_K(B)
    TCO_init = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))
    TCO_init = TCO_init.at[:, 2, 3].set(0.45)
    label_ids = jnp.zeros((B,), jnp.int32)

    path = tmp_path / "refiner.stablehlo"
    blob = export_pose_model(
        model, batch_size=B, image_hw=(H, W), n_iterations=1,
        out_path=path, platforms=("cpu",),
    )
    assert path.read_bytes() == blob

    fn = load_exported(path)
    got = np.asarray(fn(images, K, TCO_init, label_ids))

    mesh_data = gather_mesh_data(db, label_ids, cfg.n_points_crop)
    want = np.asarray(
        model.predictor.forward(
            variables, mesh_data, images, K, TCO_init,
            n_iterations=1, train=False,
        )["TCO_output"][-1]
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
