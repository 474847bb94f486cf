"""End-to-end tests of the CLI surface (custom scenario, viz, multichip smoke)."""

import pytest

pytestmark = pytest.mark.slow

import json

import numpy as np
import jax.numpy as jnp
import pandas as pd

from cosypose_tpu.evaluation.bop_export import predictions_to_bop_csv
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.scripts.run_custom_scenario import main as custom_scenario_main
from cosypose_tpu.utils.tensor_collection import PandasTensorCollection
from cosypose_tpu.visualization import nms3d, make_scene_renderings
from tests.test_data import write_cube_ply
from tests.test_multiview import make_scene


def build_scenario(tmp_path):
    scenario = tmp_path / "scenario"
    models = scenario / "models"
    models.mkdir(parents=True)
    write_cube_ply(models / "obj_000001.ply", 60.0)
    write_cube_ply(models / "obj_000002.ply", 90.0)
    write_cube_ply(models / "obj_000003.ply", 120.0)
    (models / "models_info.json").write_text(
        json.dumps({"1": {"diameter": 103.9}, "2": {"diameter": 155.9},
                    "3": {"diameter": 207.8}})
    )

    candidates, TWO, TWC = make_scene(noise=0.002)
    # remap labels obj_0..2 → obj_00000{1,2,3}
    infos = candidates.infos.copy()
    infos["label"] = infos["label"].map(
        {f"obj_{i}": f"obj_{i+1:06d}" for i in range(3)}
    )
    infos["scene_id"] = 0
    infos["im_id"] = infos["view_id"]
    tc = PandasTensorCollection(infos, poses=candidates.poses)
    predictions_to_bop_csv(tc, scenario / "candidates.csv")

    cams = {}
    for v in range(3):
        TCW = np.linalg.inv(TWC[v])
        cams[str(v)] = dict(
            cam_K=[600.0, 0, 320, 0, 600.0, 240, 0, 0, 1],
            cam_R_w2c=TCW[:3, :3].reshape(-1).tolist(),
            cam_t_w2c=(TCW[:3, 3] * 1000).tolist(),
        )
    (scenario / "scene_camera.json").write_text(json.dumps(cams))
    return scenario, TWO, TWC


def test_custom_scenario_cli(tmp_path):
    scenario, TWO, TWC = build_scenario(tmp_path)
    scene = custom_scenario_main(
        ["--scenario", str(scenario), "--ransac_n_iter", "20",
         "--ransac_dist_threshold", "0.05", "--ba_n_iter", "20"]
    )
    assert (scenario / "results" / "predicted_scene.json").exists()
    assert (scenario / "results" / "scene_reprojected.csv").exists()
    assert len(scene["objects"]) == 3
    assert len(scene["cameras"]) == 3
    # reconstructed relative camera poses ≈ GT (world gauge-free)
    TWC_est = {c["view_id"]: np.asarray(c["TWC"]) for c in scene["cameras"]}
    rel_est = np.linalg.inv(TWC_est[0]) @ TWC_est[1]
    rel_gt = np.linalg.inv(TWC[0]) @ TWC[1]
    np.testing.assert_allclose(rel_est, rel_gt, atol=0.03)


def test_nms3d():
    poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    poses[1, :3, 3] = [0.001, 0, 0]   # within threshold of #0
    poses[2, :3, 3] = [1.0, 0, 0]     # far away
    tc = PandasTensorCollection(
        pd.DataFrame(dict(score=[0.5, 0.9, 0.7], label=["a", "a", "b"])),
        poses=jnp.asarray(poses),
    )
    out = nms3d(tc, th=0.04)
    assert len(out) == 2
    # the higher-scored duplicate (index 1) is kept
    assert 0.9 in out.infos["score"].values
    assert 0.5 not in out.infos["score"].values


def test_make_scene_renderings():
    from tests.test_pose_predictor import cube_specs

    db = build_mesh_db(cube_specs())
    objects = PandasTensorCollection(
        pd.DataFrame(dict(label=["obj_000001"], score=[1.0])),
        TWO=jnp.asarray(np.eye(4, dtype=np.float32)[None]),
    )
    frames = make_scene_renderings(objects, None, db, n_frames=2,
                                   resolution=(60, 80), orbit_radius=0.8)
    assert len(frames) == 2
    assert frames[0].shape == (60, 80, 3)
    assert frames[0].sum() > 0  # object visible


def test_example_multichip_runs():
    from cosypose_tpu.scripts.example_multichip import main

    main()  # asserts internally on the 8-device CPU mesh
