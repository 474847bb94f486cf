import pytest

pytestmark = pytest.mark.slow
import numpy as np
import jax
import jax.numpy as jnp

from cosypose_tpu.models import PosePredictorConfig
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.parallel import make_mesh
from cosypose_tpu.training import (
    PoseTrainConfig,
    create_train_state,
    make_train_step,
)
from tests.test_pose_predictor import cube_specs, make_K


def tiny_cfg(**kw):
    return PoseTrainConfig(
        predictor=PosePredictorConfig(
            backbone="efficientnet-b0",
            render_size=(48, 64),
            n_points_crop=8,
            raster_tile=(24, 64),
            raster_max_tris_per_tile=16,
        ),
        n_iterations=1,
        n_points_loss=8,
        batch_size=8,
        epoch_size=64,
        **kw,
    )


def make_batch(B):
    rng = np.random.RandomState(0)
    TCO = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    TCO[:, 2, 3] = 0.5
    TCO[:, 0, 3] = rng.uniform(-0.02, 0.02, B)
    return dict(
        images=jnp.asarray(rng.uniform(size=(B, 3, 120, 160)).astype(np.float32)),
        K=make_K(B),
        TCO=jnp.asarray(TCO),
        bboxes=jnp.asarray(
            np.tile(np.array([60.0, 40.0, 100.0, 80.0], np.float32), (B, 1))
        ),
        label_ids=jnp.asarray(rng.randint(0, 2, B), jnp.int32),
    )


def test_train_step_runs_and_decreases_nothing_nan():
    cfg = tiny_cfg()
    pp, state = create_train_state(cfg, jax.random.PRNGKey(0))
    db = build_mesh_db(cube_specs())
    step_fn = make_train_step(pp, cfg, db)
    batch = make_batch(8)
    # snapshot before the step — the train step donates its input state
    before = jax.tree.map(np.asarray, state.params)
    state2, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_total"]))
    assert float(metrics["grad_norm"]) > 0
    assert int(state2.step) == 1
    # params actually moved
    moved = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(np.abs(a - np.asarray(b)).sum()), before, state2.params
        ),
    )
    assert moved > 0


def test_train_step_sharded_8_devices():
    """DP over the virtual 8-device CPU mesh (SURVEY.md §4 test strategy)."""
    mesh = make_mesh(8)
    cfg = tiny_cfg(input_generator="gt+noise")
    pp, state = create_train_state(cfg, jax.random.PRNGKey(0))
    db = build_mesh_db(cube_specs())
    step_fn = make_train_step(pp, cfg, db, mesh=mesh)
    batch = make_batch(16)  # 2 per device
    state2, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_total"]))
    # replicated outputs
    assert int(state2.step) == 1


def test_train_step_fsdp_matches_replicated():
    """ZeRO-style param/opt-state sharding (param_mode='fsdp') computes the
    SAME step as replicated DP — XLA's all-gather/reduce-scatter placement
    must not change the math — and actually shards the big leaves."""
    from jax.sharding import NamedSharding

    mesh = make_mesh(8)
    cfg = tiny_cfg(input_generator="gt+noise")
    db = build_mesh_db(cube_specs())
    batch = make_batch(16)
    rngs = (jax.random.PRNGKey(0), jax.random.PRNGKey(1))

    pp, state_r = create_train_state(cfg, rngs[0])
    step_r = make_train_step(pp, cfg, db, mesh=mesh)
    out_r, metrics_r = step_r(state_r, batch, rngs[1])

    pp, state_f = create_train_state(cfg, rngs[0])
    step_f = make_train_step(pp, cfg, db, mesh=mesh, param_mode="fsdp",
                             state=state_f)
    out_f, metrics_f = step_f(state_f, batch, rngs[1])

    assert np.isfinite(float(metrics_f["loss_total"]))
    np.testing.assert_allclose(
        float(metrics_f["loss_total"]), float(metrics_r["loss_total"]),
        rtol=2e-5,
    )
    # the updated params agree leaf-wise (bf16/reduction-order noise floor)
    for a, b in zip(jax.tree.leaves(out_r.params),
                    jax.tree.leaves(out_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)
    # at least one large leaf is genuinely sharded over the mesh
    sharded = [
        x for x in jax.tree.leaves(out_f.params)
        if isinstance(x.sharding, NamedSharding)
        and any(s is not None for s in x.sharding.spec)
    ]
    assert sharded, "no parameter leaf was sharded under fsdp"


def test_lr_schedule():
    from cosypose_tpu.training.pose_training import lr_schedule

    cfg = tiny_cfg()  # epoch_size 64 / batch 8 → 8 steps/epoch, warmup 50 epochs
    sched = lr_schedule(cfg)
    steps_per_epoch = 8
    warmup_steps = 50 * steps_per_epoch
    # mid-warmup: half lr
    assert abs(float(sched(warmup_steps // 2 - 1)) - 0.5 * cfg.lr) < 1e-6
    # after warmup
    assert abs(float(sched(warmup_steps + 10)) - cfg.lr) < 1e-7
    # after decay epoch (500)
    assert abs(float(sched(500 * steps_per_epoch + 1)) - cfg.lr * 0.1) < 1e-7
