"""The three depthwise lowerings (XLA grouped conv, VPU shift-multiplies,
MXU dense embedding) share one parameter tree and must be numerically
equivalent — checkpoints trained under any of them load against any other
(models/efficientnet.py: DepthwiseConv / DenseLoweredDepthwise)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from cosypose_tpu.models.efficientnet import EfficientNet


@pytest.mark.parametrize("impl", ["dense", "shift"])
def test_dw_lowering_matches_grouped_conv(impl):
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 6), jnp.float32)
    ref = EfficientNet(variant="efficientnet-b0", in_channels=6,
                       dw_impl="conv")
    v = ref.init(jax.random.PRNGKey(0), x)
    want = np.asarray(ref.apply(v, x))
    alt = EfficientNet(variant="efficientnet-b0", in_channels=6, dw_impl=impl)
    got = np.asarray(alt.apply(v, x))  # same params, different lowering
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_backbone_dw_selector():
    from cosypose_tpu.models import PosePredictorConfig
    from cosypose_tpu.models.pose_predictor import make_backbone

    cfg = PosePredictorConfig(backbone="efficientnet-b0+dwdense")
    bb, n_feat = make_backbone(cfg)
    assert bb.variant == "efficientnet-b0" and bb.dw_impl == "dense"
    assert n_feat == 1280
