"""Numerical parity: flax EfficientNet vs the reference's PyTorch EfficientNet.

The reference implementation is imported read-only from /root/reference at test
time (skipped when unavailable) — the converted weights must produce the same
features to float tolerance, which validates both the weight converter and the
backbone architecture (padding/BN/SE/skip semantics).
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

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


def test_flownet_pretrained_conversion_parity():
    """FlowNetS encoder: torch weights → flax, numerical output parity.

    Builds the reference's conv stack in torch (Sequential(conv, leaky_relu),
    ref: cosypose/models/flownet.py:63-76), randomizes weights as a stand-in
    for flownets_EPE1.951.pth.tar, converts, and compares features.
    """
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from cosypose_tpu.models.wide_resnet import FlowNetSEncoder
    from cosypose_tpu.utils.torch_compat import convert_flownet_state_dict

    tnn = torch.nn

    def conv(cin, cout, k=3, s=1):
        return tnn.Sequential(
            tnn.Conv2d(cin, cout, kernel_size=k, stride=s,
                       padding=(k - 1) // 2, bias=True),
            tnn.LeakyReLU(0.1, inplace=True),
        )

    torch.manual_seed(0)
    layers = dict(
        conv1=conv(6, 64, 7, 2), conv2=conv(64, 128, 5, 2),
        conv3=conv(128, 256, 5, 2), conv3_1=conv(256, 256),
        conv4=conv(256, 512, s=2), conv4_1=conv(512, 512),
        conv5=conv(512, 512, s=2), conv5_1=conv(512, 512),
        conv6=conv(512, 1024, s=2), conv6_1=conv(1024, 1024),
    )
    model = tnn.ModuleDict(layers).eval()
    state_dict = model.state_dict()  # keys like 'conv1.0.weight'

    x = np.random.RandomState(0).uniform(-1, 1, (2, 6, 64, 64)).astype(
        np.float32)
    with torch.no_grad():
        t = torch.tensor(x)
        for name in ["conv1", "conv2", "conv3", "conv3_1", "conv4",
                     "conv4_1", "conv5", "conv5_1", "conv6", "conv6_1"]:
            t = layers[name](t)
        ref_out = t.numpy()

    variables = convert_flownet_state_dict(state_dict)
    variables = jax.tree.map(jnp.asarray, variables)
    enc = FlowNetSEncoder()
    ours = enc.apply(variables, jnp.asarray(np.moveaxis(x, 1, -1)))
    ours = np.moveaxis(np.asarray(ours), -1, 1)
    np.testing.assert_allclose(ours, ref_out, atol=2e-4)
