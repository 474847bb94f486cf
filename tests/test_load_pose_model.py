"""Checkpoint -> inference model round-trip (scripts/run_bop_inference.py).

`load_pose_model` must rebuild EXACTLY the architecture a run trained from
its saved config.yaml — a partially-mapped config silently rebuilds a
different parameter tree and orbax then restores garbage or crashes late,
after hours of upstream pipeline work (ref analogue: the reference attaches
the config to the checkpoint and rebuilds from it,
run_cosypose_eval.py:236-248).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosypose_tpu.models.pose_predictor import (PosePredictor,
                                                PosePredictorConfig)
from cosypose_tpu.training.checkpoint import save_checkpoint, save_config


class _State:
    def __init__(self, params, batch_stats):
        self.params = params
        self.batch_stats = batch_stats
        self.opt_state = {}
        self.step = 7


def _nondefault_cfg():
    """A config that differs from PosePredictorConfig() in every field class
    load_pose_model must map (shape-changing AND semantics-changing)."""
    cfg = PosePredictorConfig()
    kw = dict(backbone="wide-resnet18", render_size=(32, 32),
              compute_dtype=jnp.bfloat16, pooling="moments",
              input_mode="9ch", vxvy_scale=2.0, pose_dim=7,
              n_points_crop=24, remat=False)
    return dataclasses.replace(cfg, **kw)


@pytest.fixture()
def saved_run(tmp_path):
    cfg = _nondefault_cfg()
    pp = PosePredictor(cfg)
    variables = pp.init(jax.random.PRNGKey(0))
    run_dir = tmp_path / "tiny-run"
    run_dir.mkdir()
    # mimic run_pose_training's layout: config.yaml holds train.predictor
    train_ns = dict(predictor=cfg)

    @dataclasses.dataclass
    class FakeTrain:
        predictor: PosePredictorConfig

    @dataclasses.dataclass
    class FakeRun:
        run_id: str
        train: FakeTrain

    save_config(run_dir, FakeRun("tiny-run", FakeTrain(cfg)))
    save_checkpoint(run_dir, _State(variables["params"],
                                    variables["batch_stats"]), epoch=0)
    return run_dir, cfg, variables


def test_round_trip_rebuilds_identical_architecture(saved_run, tmp_path):
    run_dir, cfg, variables = saved_run
    from cosypose_tpu.scripts.run_bop_inference import load_pose_model
    from tests.test_pose_predictor import cube_specs
    from cosypose_tpu.ops.mesh_db import build_mesh_db

    mesh_db = build_mesh_db(cube_specs())
    model = load_pose_model("tiny-run", mesh_db, exp_dir=tmp_path)

    # every saved field round-trips (incl. dtype string -> jnp dtype)
    for f in dataclasses.fields(PosePredictorConfig):
        got, want = getattr(model.predictor.cfg, f.name), getattr(cfg, f.name)
        assert got == want, f"{f.name}: {got!r} != {want!r}"

    # restored parameter tree is exactly the saved one
    flat_saved = jax.tree_util.tree_leaves(variables["params"])
    flat_restored = jax.tree_util.tree_leaves(model.variables["params"])
    assert len(flat_saved) == len(flat_restored)
    for a, b in zip(flat_saved, flat_restored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_missing_checkpoint_fails_fast(tmp_path):
    from cosypose_tpu.scripts.run_bop_inference import load_pose_model

    (tmp_path / "empty-run").mkdir()
    with pytest.raises(AssertionError, match="no checkpoint"):
        load_pose_model("empty-run", None, exp_dir=tmp_path)
