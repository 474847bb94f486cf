"""EfficientNet backbone family (flax.linen), TPU-native.

Functional re-implementation of the capability provided by the reference's
vendored EfficientNet-PyTorch (ref: cosypose/models/efficientnet.py,
cosypose/models/efficientnet_utils.py): MBConv blocks with squeeze-excitation,
swish activations, compound width/depth scaling, and a configurable input channel
count (the pose networks use 6 = observed crop ⊕ render,
ref: cosypose/training/pose_models_cfg.py:20-24). The classifier head is omitted —
the pose predictor consumes the final conv features (B3 → 1536 channels).

TPU-first choices:
  * NHWC layout (XLA's native conv layout on TPU — keeps the MXU fed without
    layout transposes).
  * 'SAME' padding (identical spatial arithmetic to the reference's
    static same-padding for even strides/kernels used here).
  * bfloat16 compute with float32 params/batch-norm statistics via an optional
    dtype knob; the 9D pose head downstream always runs fp32.
  * BatchNorm with mutable running stats under training, frozen under eval.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# (width_mult, depth_mult, resolution, dropout) — compound scaling table
EFFICIENTNET_PARAMS = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
}

# base (B0) stage configuration:
# (num_repeat, kernel, stride, expand_ratio, in_ch, out_ch, se_ratio)
_BASE_BLOCKS = [
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
]


def round_filters(filters: int, width_mult: float, divisor: int = 8) -> int:
    """Standard EfficientNet channel rounding (to multiples of 8)."""
    filters *= width_mult
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


class SqueezeExcite(nn.Module):
    channels: int
    se_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.se_channels, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = nn.swish(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="expand")(s)
        return x * jax.nn.sigmoid(s)


class DepthwiseConv(nn.Module):
    """Depthwise conv as explicit shift-multiplies (VPU-native lowering).

    Measured ALTERNATIVE lowering, kept for reference: same math and the same
    parameter tree ("kernel" shaped (kh, kw, 1, C), exactly nn.Conv's grouped
    kernel) so checkpoints load against either implementation. On v5e at the
    flagship operating point (B3, 240x320, B=64, bf16) this formulation
    measured 25.3 ms vs 13.8 ms for XLA's native grouped-conv lowering — the
    k^2 strided slices do NOT fuse into one elementwise loop and multiply HBM
    traffic instead. Default stays "conv"; don't flip without re-measuring.
    """

    features: int
    kernel: tuple[int, int]
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, 1, self.features), jnp.float32,
        ).astype(self.dtype)
        x = x.astype(self.dtype)
        N, H, W, C = x.shape
        s = self.stride
        oh, ow = -(-H // s), -(-W // s)  # SAME output sizes
        ph = max((oh - 1) * s + kh - H, 0)
        pw = max((ow - 1) * s + kw - W, 0)
        xp = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                         (pw // 2, pw - pw // 2), (0, 0)))
        acc = jnp.zeros((N, oh, ow, C), self.dtype)
        for a in range(kh):
            for b in range(kw):
                sl = jax.lax.slice(
                    xp, (0, a, b, 0),
                    (N, a + (oh - 1) * s + 1, b + (ow - 1) * s + 1, C),
                    (1, s, s, 1),
                )
                acc = acc + sl * w[a, b, 0]
        return acc


class DenseLoweredDepthwise(nn.Module):
    """Depthwise conv embedded in a zero-off-diagonal DENSE conv (MXU lowering).

    The VERDICT-r3 roofline shows B3's depthwise stages running on the VPU at
    ~8% MFU; this lowering trades C× more FLOPs (W[a,b,i,o] = dw[a,b,o]·δ_io)
    for MXU execution — potentially a win where the MXU:VPU throughput ratio
    exceeds the channel count. Same parameter tree as nn.Conv's grouped kernel
    ("kernel" (kh,kw,1,C)) so checkpoints load against any dw_impl. Measured
    on v5e (bench_stages --dw-impl dense, B3 240x320 B=64 bf16): see README
    roofline table — recorded either way, win or dead end.
    """

    features: int
    kernel: tuple[int, int]
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, 1, self.features), jnp.float32,
        ).astype(self.dtype)
        C = self.features
        w_dense = jnp.eye(C, dtype=self.dtype)[None, None] * w  # (kh,kw,C,C)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w_dense,
            window_strides=(self.stride, self.stride), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class MBConvBlock(nn.Module):
    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    expand_ratio: int
    se_ratio: float
    drop_rate: float = 0.0
    dtype: Any = jnp.float32
    bn_momentum: float = 0.99
    bn_eps: float = 1e-3
    dw_impl: str = "conv"  # "conv" (XLA grouped) | "shift" (see DepthwiseConv)

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        mid = self.in_ch * self.expand_ratio
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            name=name,
        )
        if self.expand_ratio != 1:
            x = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="expand_conv")(x)
            x = norm("bn0")(x)
            x = nn.swish(x)
        if self.dw_impl == "shift":
            x = DepthwiseConv(
                mid, (self.kernel, self.kernel), stride=self.stride,
                dtype=self.dtype, name="dw_conv",
            )(x)
        elif self.dw_impl == "dense":
            x = DenseLoweredDepthwise(
                mid, (self.kernel, self.kernel), stride=self.stride,
                dtype=self.dtype, name="dw_conv",
            )(x)
        else:
            x = nn.Conv(
                mid,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding="SAME",
                feature_group_count=mid,
                use_bias=False,
                dtype=self.dtype,
                name="dw_conv",
            )(x)
        x = norm("bn1")(x)
        x = nn.swish(x)
        if self.se_ratio and 0 < self.se_ratio <= 1:
            se_ch = max(1, int(self.in_ch * self.se_ratio))
            x = SqueezeExcite(mid, se_ch, dtype=self.dtype, name="se")(x)
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="project_conv")(x)
        x = norm("bn2")(x)
        if self.stride == 1 and self.in_ch == self.out_ch:
            if self.drop_rate > 0:
                x = nn.Dropout(
                    rate=self.drop_rate, broadcast_dims=(1, 2, 3), name="drop"
                )(x, deterministic=not train)
            x = x + inp
        return x


class EfficientNet(nn.Module):
    """EfficientNet feature extractor. Input NHWC; returns final conv features.

    n_features: B0→1280, B3→1536 (ref: cosypose/training/pose_models_cfg.py:24).
    """

    variant: str = "efficientnet-b3"
    in_channels: int = 6
    dtype: Any = jnp.float32
    drop_connect_rate: float = 0.2
    dw_impl: str = "conv"  # see DepthwiseConv (measured slower; kept as option)

    @property
    def n_features(self) -> int:
        w, _, _, _ = EFFICIENTNET_PARAMS[self.variant]
        return round_filters(1280, w)

    @nn.compact
    def __call__(self, x, train: bool = False):
        w_mult, d_mult, _, _ = EFFICIENTNET_PARAMS[self.variant]
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
            name=name,
        )
        x = x.astype(self.dtype)
        stem_ch = round_filters(32, w_mult)
        x = nn.Conv(
            stem_ch, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
            dtype=self.dtype, name="stem_conv",
        )(x)
        x = norm("stem_bn")(x)
        x = nn.swish(x)

        # total block count for drop-connect schedule
        total_blocks = sum(round_repeats(r, d_mult) for (r, *_rest) in _BASE_BLOCKS)
        block_idx = 0
        for stage, (repeat, kernel, stride, expand, cin, cout, se) in enumerate(
            _BASE_BLOCKS
        ):
            cin_r = round_filters(cin, w_mult)
            cout_r = round_filters(cout, w_mult)
            for i in range(round_repeats(repeat, d_mult)):
                drop = self.drop_connect_rate * block_idx / total_blocks
                x = MBConvBlock(
                    in_ch=cin_r if i == 0 else cout_r,
                    out_ch=cout_r,
                    kernel=kernel,
                    stride=stride if i == 0 else 1,
                    expand_ratio=expand,
                    se_ratio=se,
                    drop_rate=drop,
                    dtype=self.dtype,
                    dw_impl=self.dw_impl,
                    name=f"block{stage}_{i}",
                )(x, train=train)
                block_idx += 1

        head_ch = round_filters(1280, w_mult)
        x = nn.Conv(head_ch, (1, 1), use_bias=False, dtype=self.dtype, name="head_conv")(x)
        x = norm("head_bn")(x)
        x = nn.swish(x)
        return x  # (B, H/32, W/32, head_ch)
