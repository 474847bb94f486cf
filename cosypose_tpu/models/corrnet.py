"""Correlation backbone: explicit render↔observation matching features.

TPU-first divergence from the reference (which stacks obs+render channels
into a generic CNN — ref: cosypose/models/pose.py:25-45 — and needs an
80.6M-sample schedule for the network to discover the comparison): a
FlowNetC-style local correlation volume between separately-encoded render
and observation feature maps makes the displacement evidence an explicit
input feature. Background clutter does not correlate with the rendered
object's appearance, so the matching signal survives cluttered crops — a
measured failure mode of the stacked-channel design (see README
"End-to-end accuracy": linear probes on signed-diff moments reach only
R²≈0.25 for vx/vy under clutter).

Shapes are static and the correlation is an unrolled set of
shift-multiply-reduce ops over a (H/4, W/4, C) map — XLA fuses them into a
few VPU passes; the trunk below is plain dense convs on the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def local_correlation(f1, f2, radius: int):
    """corr[b,h,w,(dy,dx)] = <f1[b,h+dy,w+dx,:], f2[b,h,w,:]> / C.

    f1, f2: (B, H, W, C). Returns (B, H, W, (2r+1)²), fp32. The unrolled
    (2r+1)² shifted multiplies are cheap relative to one conv at the same
    resolution and fuse into a handful of elementwise passes.
    """
    B, H, W, C = f1.shape
    r = radius
    pad = jnp.pad(f1, ((0, 0), (r, r), (r, r), (0, 0)))
    out = []
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            shifted = pad[:, dy:dy + H, dx:dx + W, :]
            out.append((shifted * f2).mean(axis=-1))
    return jnp.stack(out, axis=-1).astype(jnp.float32)


class _Stem(nn.Module):
    """Shared-weight 2-stage conv encoder (stride 4, C features)."""

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        x = nn.Conv(self.features // 2, (5, 5), strides=(2, 2), padding=2,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(norm("bn1")(x))
        x = nn.Conv(self.features, (3, 3), strides=(2, 2), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = nn.relu(norm("bn2")(x))
        return x


class CorrNet(nn.Module):
    """Siamese stem → local correlation → dense conv trunk.

    Input is the PoseNet comparison stack (B, H, W, 6|9): channels 0:3 are
    the observed crop, 3:6 the render; optional diff channels 6:9 are
    encoded by the same shared stem and appended to the trunk input.
    n_features = 512.
    """

    corr_radius: int = 6
    stem_features: int = 64
    n_features: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        obs, rend = x[..., 0:3], x[..., 3:6]
        stem = _Stem(features=self.stem_features, dtype=self.dtype,
                     name="stem")
        f_obs = stem(obs, train=train)     # shared weights: same module,
        f_rend = stem(rend, train=train)   # applied twice
        corr = local_correlation(f_obs, f_rend, self.corr_radius)
        corr = corr.astype(self.dtype)

        trunk_feats = [corr, f_obs, f_rend]
        if x.shape[-1] > 6:
            trunk_feats.append(stem(x[..., 6:9], train=train))
        trunk_in = jnp.concatenate(trunk_feats, axis=-1)
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        y = nn.Conv(128, (3, 3), strides=(1, 1), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv3")(trunk_in)
        y = nn.relu(norm("bn3")(y))
        y = nn.Conv(256, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv4")(y)
        y = nn.relu(norm("bn4")(y))
        y = nn.Conv(self.n_features, (3, 3), strides=(2, 2), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv5")(y)
        y = nn.relu(norm("bn5")(y))
        return y
