"""Correlation backbone (models/corrnet.py) unit tests."""

import numpy as np
import jax
import jax.numpy as jnp

from cosypose_tpu.models.corrnet import CorrNet, local_correlation


def test_local_correlation_recovers_known_shift():
    """A feature map correlated against a (dy, dx)-shifted copy peaks at the
    displacement channel encoding that shift."""
    rng = np.random.RandomState(0)
    r = 3
    base = rng.normal(size=(1, 16, 20, 8)).astype(np.float32)
    dy, dx = 2, -1
    # f1 shifted so that f1[h+dy, w+dx] == f2[h, w]
    f2 = base
    f1 = np.roll(base, shift=(dy, dx), axis=(1, 2))
    corr = np.asarray(local_correlation(jnp.asarray(f1), jnp.asarray(f2), r))
    assert corr.shape == (1, 16, 20, (2 * r + 1) ** 2)
    # interior pixels (away from the pad/wrap borders)
    interior = corr[0, r + 2:-r - 2, r + 2:-r - 2, :]
    peak = interior.mean(axis=(0, 1)).argmax()
    expected = (dy + r) * (2 * r + 1) + (dx + r)
    assert peak == expected, (peak, expected)


def test_corrnet_forward_shapes_and_grad():
    net = CorrNet(corr_radius=2, stem_features=16, n_features=64)
    x = jnp.asarray(np.random.RandomState(1).normal(
        size=(2, 32, 32, 6)).astype(np.float32))
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y = net.apply(variables, x, train=False)
    assert y.shape == (2, 2, 2, 64)  # total stride 16

    def loss(params):
        out = net.apply({"params": params,
                         "batch_stats": variables["batch_stats"]},
                        x, train=False)
        return (out ** 2).mean()

    g = jax.grad(loss)(variables["params"])
    # gradient reaches the shared stem (both branches contribute)
    gn = jax.tree_util.tree_map(lambda a: float(jnp.abs(a).sum()), g)
    assert gn["stem"]["conv1"]["kernel"] > 0.0


def test_posenet_with_corrnet_backbone():
    from cosypose_tpu.models import PosePredictor, PosePredictorConfig

    cfg = PosePredictorConfig(backbone="corrnet", render_size=(32, 32),
                              n_points_crop=32)
    pp = PosePredictor(cfg)
    variables = pp.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 32, 32, 6))
    out = pp.net.apply(variables, x, train=False)
    assert out.shape == (2, 9)
    # identity bias init: dR=I, v=(0,0,1)
    np.testing.assert_allclose(
        np.asarray(out[0]), [1, 0, 0, 0, 1, 0, 0, 0, 1], atol=0.3
    )


def test_corrnet_uses_diff_channels():
    """9-channel input: the diff channels (6:9) must influence the output
    (they are stem-encoded and appended to the trunk input — a regression
    for the round-3 bug where they were silently dropped)."""
    net = CorrNet(corr_radius=2, stem_features=16, n_features=64)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 9)).astype(np.float32))
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y0 = net.apply(variables, x, train=False)
    x2 = x.at[..., 6:9].add(1.0)
    y1 = net.apply(variables, x2, train=False)
    assert float(jnp.abs(y1 - y0).max()) > 1e-6
