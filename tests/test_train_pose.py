"""End-to-end training smoke: tiny run over the synthetic BOP fixture."""

import dataclasses
import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from cosypose_tpu.data.bop import BOPDataset, BOPObjectDataset
from cosypose_tpu.data.pose_dataset import PoseDataset
from cosypose_tpu.models import PosePredictorConfig
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.training.configs import RunConfig, make_cfg
from cosypose_tpu.training.pose_training import PoseTrainConfig
from cosypose_tpu.training.train_pose import train_pose
from cosypose_tpu.training.checkpoint import latest_checkpoint, load_checkpoint
from tests.test_data import build_bop_fixture


def test_named_configs():
    for name in ("tless-coarse", "tless-refiner", "ycbv-refiner-syntonly",
                 "bop-ycbv-pbr-refiner", "bop-tless-synt+real-coarse"):
        cfg = make_cfg(name)
        assert cfg.run_id == name
        assert cfg.train.lr == 3e-4
    cfg = make_cfg("tless-refiner")
    assert cfg.train.input_generator == "gt+noise"
    assert cfg.train.n_iterations == 3
    cfg = make_cfg("bop-ycbv-pbr-coarse")
    assert cfg.train.input_generator == "fixed+trans_noise"
    dbg = make_cfg("tless-coarse", debug=True)
    assert dbg.train.n_epochs == 4


@pytest.mark.slow
def test_train_pose_end_to_end(tmp_path):
    root = build_bop_fixture(tmp_path)
    scene_ds = BOPDataset(root, split="test")
    obj_ds = BOPObjectDataset(root / "models")
    mesh_db = build_mesh_db(obj_ds.mesh_specs())

    pose_ds = PoseDataset(scene_ds, resize=(48, 64),
                          apply_rgb_augmentation=False)

    tcfg = PoseTrainConfig(
        predictor=PosePredictorConfig(
            backbone="efficientnet-b0",
            render_size=(48, 64),
            n_points_crop=8,
            raster_tile=(24, 64),
            raster_max_tris_per_tile=16,
        ),
        n_iterations=1,
        n_points_loss=8,
        input_generator="gt+noise",
        batch_size=2,
        epoch_size=4,
        n_epochs=2,
        n_epochs_warmup=1,
    )
    cfg = RunConfig(run_id="test-run", train=tcfg, n_dataloader_workers=1,
                    save_epoch_interval=1)

    state, run_dir = train_pose(
        cfg,
        scene_datasets={"train": [(pose_ds, 1)]},
        mesh_db=mesh_db,
        exp_dir=tmp_path / "experiments",
        use_mesh=False,
    )
    assert int(state.step) == 2  # 2 epochs × 1 step (3 frames, batch 2)
    assert (run_dir / "config.yaml").exists()
    log_lines = (run_dir / "log.txt").read_text().strip().splitlines()
    assert len(log_lines) == 2
    rec = json.loads(log_lines[-1])
    assert np.isfinite(rec["train/loss_total"])

    ckpt = latest_checkpoint(run_dir)
    assert ckpt is not None
    payload = load_checkpoint(ckpt)
    assert payload["epoch"] == 1
    assert int(payload["step"]) == 2

    # resume continues from the checkpointed epoch
    cfg2 = dataclasses.replace(cfg)
    cfg2.train = dataclasses.replace(tcfg, n_epochs=3)
    state2, _ = train_pose(
        cfg2,
        scene_datasets={"train": [(pose_ds, 1)]},
        mesh_db=mesh_db,
        resume=True,
        exp_dir=tmp_path / "experiments",
        use_mesh=False,
    )
    assert int(state2.step) == 3


def test_eval_callback_hook(tmp_path):
    import json as _json

    root = build_bop_fixture(tmp_path)
    scene_ds = BOPDataset(root, split="test")
    obj_ds = BOPObjectDataset(root / "models")
    mesh_db = build_mesh_db(obj_ds.mesh_specs())
    pose_ds = PoseDataset(scene_ds, resize=(48, 64), apply_rgb_augmentation=False)

    tcfg = PoseTrainConfig(
        predictor=PosePredictorConfig(
            backbone="efficientnet-b0", render_size=(48, 64),
            n_points_crop=8, raster_max_tris_per_tile=16,
        ),
        n_iterations=1, n_points_loss=8, input_generator="gt+noise",
        batch_size=2, epoch_size=4, n_epochs=2, n_epochs_warmup=1,
    )
    cfg = RunConfig(run_id="cb-run", train=tcfg, n_dataloader_workers=1,
                    test_epoch_interval=1)
    calls = []

    def eval_cb(state, epoch):
        calls.append(epoch)
        return {"dummy_metric": float(epoch)}

    _, run_dir = train_pose(
        cfg, scene_datasets={"train": [(pose_ds, 1)]}, mesh_db=mesh_db,
        exp_dir=tmp_path / "exp", use_mesh=False, eval_callback=eval_cb,
    )
    assert calls == [0, 1]
    recs = [_json.loads(l) for l in (run_dir / "log.txt").read_text().splitlines()]
    assert any("test/dummy_metric" in r for r in recs)


def test_make_eval_bundle(tmp_path):
    """The default in-training eval bundle (ref train_pose.py:76-185
    make_eval_bundle): per-pair ADD metrics land in log.jsonl during
    training without the caller assembling anything."""
    import json as _json

    from cosypose_tpu.evaluation.eval_bundle import make_eval_bundle
    from cosypose_tpu.models.pose_predictor import PosePredictor

    root = build_bop_fixture(tmp_path)
    scene_ds = BOPDataset(root, split="test")
    obj_ds = BOPObjectDataset(root / "models")
    mesh_db = build_mesh_db(obj_ds.mesh_specs())
    pose_ds = PoseDataset(scene_ds, resize=(48, 64),
                          apply_rgb_augmentation=False)

    tcfg = PoseTrainConfig(
        predictor=PosePredictorConfig(
            backbone="efficientnet-b0", render_size=(48, 64),
            n_points_crop=8, raster_max_tris_per_tile=16,
        ),
        n_iterations=1, n_points_loss=8, input_generator="gt+noise",
        batch_size=2, epoch_size=4, n_epochs=1, n_epochs_warmup=1,
    )
    cfg = RunConfig(run_id="bundle-run", train=tcfg, n_dataloader_workers=1,
                    test_epoch_interval=1, input_resize=(48, 64))

    pp = PosePredictor(tcfg.predictor)
    cb = make_eval_bundle(cfg, pp, mesh_db, scene_ds, n_frames=2)
    _, run_dir = train_pose(
        cfg, scene_datasets={"train": [(pose_ds, 1)]}, mesh_db=mesh_db,
        exp_dir=tmp_path / "exp", use_mesh=False, eval_callback=cb,
    )
    recs = [_json.loads(l)
            for l in (run_dir / "log.txt").read_text().splitlines()]
    keys = set().union(*[set(r) for r in recs])
    assert "test/init/ADD_median" in keys
    assert "test/iter=1/ADD_median" in keys
    vals = [r["test/iter=1/ADD_median"] for r in recs
            if "test/iter=1/ADD_median" in r]
    assert all(np.isfinite(v) for v in vals)
