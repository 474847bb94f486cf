"""Pre-activation (v2) WideResNet-18/34 ablation backbones (flax.linen, NHWC).

Capability match for the reference's backbone ablations
(ref: cosypose/models/wide_resnet.py): 5×5/stride-2 stem, 3×3 max-pool, four
stages of pre-act BasicBlocks ([2,2,2,2] / [3,4,6,3]), n_features = 512·width.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class PreActBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        out = nn.relu(norm("bn1")(x))
        residual = (
            nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, name="downsample")(out)
            if self.downsample
            else x
        )
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, dtype=self.dtype, name="conv1")(out)
        out = nn.relu(norm("bn2")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        return out + residual


class WideResNet(nn.Module):
    layers: Sequence[int] = (2, 2, 2, 2)
    width: float = 1.0
    dtype: Any = jnp.float32

    @property
    def n_features(self) -> int:
        return int(512 * self.width)

    @nn.compact
    def __call__(self, x, train: bool = False):
        chs = [int(v * self.width) for v in (64, 128, 256, 512)]
        x = x.astype(self.dtype)
        x = nn.Conv(chs[0], (5, 5), strides=(2, 2), padding=2, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        in_ch = chs[0]
        for stage, (planes, n_blocks) in enumerate(zip(chs, self.layers)):
            stride = 1 if stage == 0 else 2
            for i in range(n_blocks):
                s = stride if i == 0 else 1
                ds = i == 0 and (s != 1 or in_ch != planes)
                x = PreActBasicBlock(
                    planes=planes, stride=s, downsample=ds, dtype=self.dtype,
                    name=f"stage{stage}_block{i}",
                )(x, train=train)
                in_ch = planes
        return x


def WideResNet18(width: float = 1.0, dtype=jnp.float32) -> WideResNet:
    return WideResNet(layers=(2, 2, 2, 2), width=width, dtype=dtype)


def WideResNet34(width: float = 1.0, dtype=jnp.float32) -> WideResNet:
    return WideResNet(layers=(3, 4, 6, 3), width=width, dtype=dtype)


class FlowNetSEncoder(nn.Module):
    """Encoder half of FlowNetS (ablation backbone; n_features=1024).

    (ref: cosypose/models/flownet.py:9-60 — the reference likewise uses only the
    contracting path, discarding the flow decoder)
    """

    dtype: Any = jnp.float32
    n_features: int = 1024

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        conv = lambda ch, k, s, name: nn.Conv(
            ch, (k, k), strides=(s, s), padding=(k - 1) // 2,
            dtype=self.dtype, name=name,
        )
        act = lambda v: nn.leaky_relu(v, negative_slope=0.1)
        x = x.astype(self.dtype)
        x = act(conv(64, 7, 2, "conv1")(x))
        x = act(conv(128, 5, 2, "conv2")(x))
        x = act(conv(256, 5, 2, "conv3")(x))
        x = act(conv(256, 3, 1, "conv3_1")(x))
        x = act(conv(512, 3, 2, "conv4")(x))
        x = act(conv(512, 3, 1, "conv4_1")(x))
        x = act(conv(512, 3, 2, "conv5")(x))
        x = act(conv(512, 3, 1, "conv5_1")(x))
        x = act(conv(1024, 3, 2, "conv6")(x))
        x = act(conv(1024, 3, 1, "conv6_1")(x))
        return x
