"""Numerical parity: flax EfficientNet vs the reference's PyTorch EfficientNet.

The reference implementation is imported read-only from /root/reference at test
time (skipped when unavailable) — the converted weights must produce the same
features to float tolerance, which validates both the weight converter and the
backbone architecture (padding/BN/SE/skip semantics).
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from cosypose_tpu.models.efficientnet import EfficientNet
from cosypose_tpu.utils.torch_compat import convert_efficientnet_state_dict


@pytest.fixture(scope="module")
def reference_model():
    sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    try:
        from cosypose.models.efficientnet import EfficientNet as TorchEffNet
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    m = TorchEffNet.from_name("efficientnet-b3", in_channels=6)
    m.eval()
    return m


def test_efficientnet_parity_with_reference(reference_model):
    import torch

    rng = np.random.RandomState(0)
    x = rng.uniform(size=(2, 6, 96, 128)).astype(np.float32)

    with torch.no_grad():
        ref_feats = reference_model.extract_features(torch.as_tensor(x)).numpy()

    params, stats = convert_efficientnet_state_dict(
        reference_model.state_dict(), "efficientnet-b3"
    )
    model = EfficientNet(variant="efficientnet-b3", in_channels=6)
    # NHWC input
    feats = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    feats_nchw = np.asarray(feats).transpose(0, 3, 1, 2)
    assert feats_nchw.shape == ref_feats.shape
    np.testing.assert_allclose(feats_nchw, ref_feats, atol=2e-3, rtol=1e-3)


def test_pose_head_conversion(reference_model):
    import torch

    from cosypose_tpu.models import PosePredictor, PosePredictorConfig
    from cosypose_tpu.utils.torch_compat import convert_pose_checkpoint

    # assemble a reference-style PosePredictor state dict
    sd = {f"backbone.{k}": v for k, v in reference_model.state_dict().items()}
    fc_w = torch.randn(9, 1536)
    fc_b = torch.randn(9)
    sd["pose_fc.weight"] = fc_w
    sd["pose_fc.bias"] = fc_b

    variables = convert_pose_checkpoint(sd)
    pp = PosePredictor(PosePredictorConfig(render_size=(96, 128)))

    rng = np.random.RandomState(1)
    x = rng.uniform(size=(1, 96, 128, 6)).astype(np.float32)
    out = pp.net.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False,
    )

    with torch.no_grad():
        feats = reference_model.extract_features(
            torch.as_tensor(x.transpose(0, 3, 1, 2))
        )
        pooled = feats.flatten(2).mean(dim=-1)
        ref_out = (pooled @ fc_w.T + fc_b).numpy()
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-3, rtol=1e-3)
