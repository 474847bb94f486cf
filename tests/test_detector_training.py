import pytest

pytestmark = pytest.mark.slow
import numpy as np
import jax
import jax.numpy as jnp

from cosypose_tpu.models.detector import DetectorConfig
from cosypose_tpu.parallel import make_mesh, shard_batch
from cosypose_tpu.training.detector_training import (
    DetectorTrainConfig,
    create_detector_train_state,
    make_detector_train_step,
    focal_loss,
)


def make_batch(B, H=64, W=64, n_classes=3, max_obj=4):
    rng = np.random.RandomState(0)
    Hm, Wm = H // 4, W // 4
    heatmap = np.zeros((B, Hm, Wm, n_classes), np.float32)
    heatmap[:, 4, 4, 0] = 1.0
    inds = np.zeros((B, max_obj), np.int64)
    inds[:, 0] = 4 * Wm + 4
    obj_mask = np.zeros((B, max_obj), bool)
    obj_mask[:, 0] = True
    return dict(
        images=jnp.asarray(rng.uniform(size=(B, 3, H, W)).astype(np.float32)),
        heatmap=jnp.asarray(heatmap),
        wh=jnp.asarray(np.ones((B, max_obj, 2), np.float32) * 3),
        offset=jnp.asarray(np.ones((B, max_obj, 2), np.float32) * 0.4),
        inds=jnp.asarray(inds),
        obj_mask=jnp.asarray(obj_mask),
        seg_mask=jnp.asarray(np.zeros((B, H, W), bool)),
    )


def test_focal_loss_perfect_prediction_low():
    targets = np.zeros((1, 8, 8, 2), np.float32)
    targets[0, 3, 3, 0] = 1.0
    good = np.full(targets.shape, -8.0, np.float32)
    good[0, 3, 3, 0] = 8.0
    bad = -good
    l_good = float(focal_loss(jnp.asarray(good), jnp.asarray(targets)))
    l_bad = float(focal_loss(jnp.asarray(bad), jnp.asarray(targets)))
    assert l_good < 0.01
    assert l_bad > 1.0


def test_detector_train_step():
    cfg = DetectorTrainConfig(
        detector=DetectorConfig(n_classes=3, max_detections=8),
        batch_size=2, epoch_size=8,
    )
    model, state = create_detector_train_state(
        cfg, jax.random.PRNGKey(0), image_size=(64, 64)
    )
    step = make_detector_train_step(model, cfg)
    batch = make_batch(2)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_total"]))
    assert int(state2.step) == 1
    # loss decreases over a few steps on a fixed batch
    losses = [float(metrics["loss_total"])]
    for i in range(5):
        state2, metrics = step(state2, batch, jax.random.PRNGKey(i + 2))
        losses.append(float(metrics["loss_total"]))
    assert losses[-1] < losses[0]


def test_detector_train_step_sharded():
    mesh = make_mesh(8)
    cfg = DetectorTrainConfig(
        detector=DetectorConfig(n_classes=3, max_detections=8),
        batch_size=1, epoch_size=8,
    )
    model, state = create_detector_train_state(
        cfg, jax.random.PRNGKey(0), image_size=(64, 64)
    )
    step = make_detector_train_step(model, cfg, mesh=mesh)
    batch = shard_batch(mesh, make_batch(8))
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_total"]))
