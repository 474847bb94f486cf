"""Render-and-compare pose predictor with an on-device scanned refinement loop.

Capability match for the reference's PosePredictor (ref: cosypose/models/pose.py:18-132)
with the TPU-first restructuring sketched in SURVEY.md §7.1: one jitted program
runs crop (roi_align gather) → render (on-device rasterizer) → backbone → 9D head
→ image-space pose update, iterated via ``lax.scan`` with ``stop_gradient``
between iterations (the reference detaches TCO between iterations,
ref: pose.py:96-118). No host sync, no process boundary, no per-iteration
device round-trip — the reference crosses all three every iteration.

The network input is the 6-channel concat of the observed crop and the render
(ref: pose.py:104); features are global-average-pooled and mapped to
pose_dim=9 (rot6d + vxvyvz) by a linear head (ref: pose.py:81-87).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.camera import boxes_from_uv, get_K_crop_resize, project_points_robust
from ..ops.cropping import deepim_crops
from ..ops.pose_ops import apply_imagespace_predictions
from ..ops.transforms import rot6d_to_matrix, quat_to_matrix
from ..ops.render import render
from .efficientnet import EfficientNet
from .wide_resnet import WideResNet18, WideResNet34, FlowNetSEncoder


@dataclasses.dataclass(frozen=True)
class PosePredictorConfig:
    backbone: str = "efficientnet-b3"
    render_size: tuple[int, int] = (240, 320)
    pose_dim: int = 9
    pooling: str = "gap"  # '+'-joined: 'gap' (reference semantics) |
    # 'gap+moments' | 'gap+moments+flatten' (spatial grid kept — rotation)
    input_mode: str = "obs+render"  # | 'obs+render+diff' (9ch: + obs-render)
    vxvy_scale: float = 1.0
    # Output gain on the vx/vy head. The image-space update consumes vx/vy in
    # crop PIXELS (Δuv = f_crop·Δxy/z is O(10) for centimeter offsets) while
    # every other head output is O(0.1); with per-parameter-bounded optimizers
    # (Adam moves each weight ≲lr per step) the vx/vy head weights must grow
    # ~100× farther than the rest, which is a large share of why the reference
    # needs its 80.6M-sample schedule. A gain of 10-30 equalizes the scales;
    # 1.0 reproduces reference semantics (ref: lib3d/cosypose_ops.py:10-31).
    # The explicit difference channel makes the render-vs-observation
    # discrepancy — the quantity the refiner must regress — first-order
    # visible to the first conv layer instead of something it must learn to
    # compute. Costs 3 input channels; reference parity mode is the 6-channel
    # concat (ref: models/pose.py:104).
    # 'gap+moments' appends spatial first moments (mean of feat·x, feat·y over
    # a [-1,1] grid) to the pooled features. Plain GAP is translation-invariant
    # up to zero-padding border effects, so the image-space offset between the
    # observed and rendered object — the very signal the vx/vy head must read —
    # reaches the head only through those border effects; the reference
    # compensates with an 80.6M-sample schedule
    # (ref: models/pose.py:81-87 flatten(2).mean(-1);
    # scripts/run_pose_training.py:61-63). Moment pooling exposes the offset
    # directly and costs two elementwise multiplies + means on TPU.
    n_points_crop: int = 2000       # points projected for crop-box computation
    lamb: float = 1.4               # deepim crop margin
    compute_dtype: Any = jnp.float32  # bfloat16 for the backbone on TPU
    raster_tile: tuple[int, int] = (24, 64)        # XLA-path tiles
    raster_max_tris_per_tile: int = 128
    pallas_tile: tuple[int, int] = (24, 320)       # TPU kernel strips
    pallas_max_tris_per_tile: int = 1024
    # budget note: the Pallas kernel early-exits on true per-tile counts, so
    # the budget costs HBM/binning only — but tiles holding MORE triangles
    # than the budget silently drop the highest ids. Dense meshes zoomed to
    # full-crop need budgets near their decimated face count.
    head_init_scale: float = 0.0
    # Pose-head kernel init. 0.0 = zero kernel (identity-output start, clean
    # linear-readout dynamics — but the BACKBONE receives zero gradient until
    # the head kernel grows, and the head only grows along directions where
    # the *random-init* backbone features already correlate with the pose
    # residual. Translation bootstraps (offset/scale are linearly readable
    # from any conv features); ROTATION does not: measured on the ±15° SE(3)
    # solo arm, loss_orn stays at the identity floor (0.0072) for 8 epochs to
    # the 4th decimal while xy/z learn — the rot rows never receive gradient
    # to create the features they need. A small variance_scaling(scale) init
    # (output std ≈ sqrt(scale) on LayerNorm'd inputs) breaks the deadlock:
    # the backbone gets rotation-flavored gradient from step 0 while the
    # output stays a near-identity update (scale 0.01 → ~0.1 std ≈ a few
    # degrees of rotation perturbation).
    drop_connect_rate: float = 0.2
    # EfficientNet stochastic-depth rate (ref efficientnet_utils defaults);
    # 0.0 disables residual-branch dropout — a lever for the B3
    # learning-dynamics study (the per-block drop noise can pin a deep
    # backbone to the identity basin at small sample budgets).
    remat: bool = True  # rematerialize backbone activations in training
    # (a 3-iteration scan of EfficientNet-B3 at 240x320 batch 32 otherwise
    # needs ~70 GB of HBM for stored activations; remat trades ~30% extra
    # forward FLOPs for fitting on a 16 GB chip — jax.checkpoint)


def make_backbone(cfg: PosePredictorConfig):
    n_ch = 9 if cfg.input_mode == "obs+render+diff" else 6
    if cfg.backbone.startswith("efficientnet"):
        # optional depthwise-lowering selector for the roofline experiments:
        # "efficientnet-b3+dwdense" / "+dwshift" (models/efficientnet.py)
        variant, _, dw = cfg.backbone.partition("+dw")
        dw_impl = dw or "conv"
        # a typo'd suffix (e.g. '+dwdens') would otherwise silently fall
        # through to the default grouped conv and measure the wrong lowering
        assert dw_impl in ("conv", "shift", "dense"), (
            f"unknown depthwise lowering {dw_impl!r} in {cfg.backbone!r}"
        )
        bb = EfficientNet(variant=variant, in_channels=n_ch,
                          dtype=cfg.compute_dtype, dw_impl=dw_impl,
                          drop_connect_rate=cfg.drop_connect_rate)
        return bb, bb.n_features
    if "resnet34" in cfg.backbone:
        bb = WideResNet34(dtype=cfg.compute_dtype)
        return bb, bb.n_features
    if "resnet18" in cfg.backbone:
        bb = WideResNet18(dtype=cfg.compute_dtype)
        return bb, bb.n_features
    if cfg.backbone == "flownet":
        bb = FlowNetSEncoder(dtype=cfg.compute_dtype)
        return bb, bb.n_features
    if cfg.backbone == "corrnet":
        from .corrnet import CorrNet

        bb = CorrNet(dtype=cfg.compute_dtype)
        return bb, bb.n_features
    raise ValueError(f"Unknown backbone {cfg.backbone}")


def _identity_pose_bias(pose_dim: int):
    """Head bias so an untrained net outputs the identity update (dR=I, v=(0,0,1)).

    The reference zero-initializes this bias, which makes the multiplicative
    depth update vz·z collapse z→0 until training fixes it; identity init keeps
    early refinement iterations well-posed without changing trained semantics.
    """
    if pose_dim == 9:
        b = jnp.array([1, 0, 0, 0, 1, 0, 0, 0, 1], jnp.float32)
    elif pose_dim == 7:
        b = jnp.array([0, 0, 0, 1, 0, 0, 1], jnp.float32)  # quat xyzw + v
    else:
        raise ValueError(pose_dim)

    def init(key, shape, dtype=jnp.float32):
        del key
        assert shape == b.shape, (shape, b.shape)
        return b.astype(dtype)

    return init


def _lk_pyramid_stats(x_nhwc, levels=(2, 4, 8)):
    """Pooled Lucas-Kanade/ESM alignment statistics of the obs/render pair.

    The render-and-compare residual is, to first order in the pose error,
    an optical-flow field between the render and the observation; classic
    LK projects the image difference onto gradient×basis fields to read the
    motion parameters linearly. Translation got this treatment via moment
    pooling; this is the same trick for the REMAINING motion basis: per
    channel and pyramid level, project diff = obs − rend onto
    {gx, gy} × {1, X, Y} (affine flow basis — in-plane rotation lives in
    the antisymmetric X·gy − Y·gx component, scale/z in the symmetric one,
    out-of-plane rotation in the shears), normalized by the matching
    diagonal Gauss-Newton energy so each statistic approximates the LK
    parameter step. Multi-level because the ±15° refiner noise moves edge
    pixels ~10-15 px — beyond single-level linearization range; level /8
    brings it to ~1-2 px.

    Motivation (measured): with GAP(+moments)(+flatten) pooling alone the
    rot head NEVER escapes the identity output on generalizing data —
    train loss_orn flat at the 0.0072 identity floor for 30 epochs while
    xy/z learn — because no pooled statistic exposes orientation
    misalignment linearly. Pure elementwise mults + means (VPU), fp32,
    ~54 numbers: 6 basis projections × 3 channels × len(levels).
    """
    obs = x_nhwc[..., 0:3].astype(jnp.float32)
    rend = x_nhwc[..., 3:6].astype(jnp.float32)
    diff = obs - rend
    stats = []
    for lvl in levels:
        if lvl > 1:
            d = nn.avg_pool(diff, (lvl, lvl), strides=(lvl, lvl))
            r = nn.avg_pool(rend, (lvl, lvl), strides=(lvl, lvl))
        else:
            d, r = diff, rend
        # central differences (interior), normalized image coords in [-1,1]
        gy = 0.5 * (r[:, 2:, 1:-1] - r[:, :-2, 1:-1])
        gx = 0.5 * (r[:, 1:-1, 2:] - r[:, 1:-1, :-2])
        d = d[:, 1:-1, 1:-1]
        h, w = d.shape[1], d.shape[2]
        Y = jnp.linspace(-1.0, 1.0, h)[None, :, None, None]
        X = jnp.linspace(-1.0, 1.0, w)[None, None, :, None]
        for g in (gx, gy):
            for basis in (jnp.ones_like(X), X, Y):
                b = (d * g * basis).mean(axis=(1, 2))          # (B, 3)
                e = ((g * basis) ** 2).mean(axis=(1, 2))       # (B, 3)
                stats.append(b * jax.lax.rsqrt(e + 1e-8))
    return jnp.concatenate(stats, axis=-1)  # (B, 6·3·len(levels))


class PoseNet(nn.Module):
    """Backbone + global average pool + linear pose head (fp32 head)."""

    cfg: PosePredictorConfig

    @nn.compact
    def __call__(self, x_nhwc, train: bool = False):
        backbone, _ = make_backbone(self.cfg)
        feats = backbone(x_nhwc, train=train)          # (B, h, w, C)
        parts = self.cfg.pooling.split("+")
        pooled = feats.mean(axis=(1, 2)).astype(jnp.float32)
        if "moments" in parts or "scale" in parts:
            h, w = feats.shape[1], feats.shape[2]
            fy = jnp.linspace(-1.0, 1.0, h, dtype=feats.dtype)[:, None, None]
            fx = jnp.linspace(-1.0, 1.0, w, dtype=feats.dtype)[None, :, None]
        if "moments" in parts:
            mx = (feats * fx).mean(axis=(1, 2)).astype(jnp.float32)
            my = (feats * fy).mean(axis=(1, 2)).astype(jnp.float32)
            pooled = jnp.concatenate([pooled, mx, my], axis=-1)
        if "scale" in parts:
            # second spatial moments: the radial-extent statistic. The z
            # error renders as a SCALE difference between observation and
            # render (the DeepIM crop tracks the render, so the render's
            # apparent size is ~constant); first moments are scale-blind
            # (diag: scripts/diag_z.py, results/diag-z.json).
            sx = (feats * fx * fx).mean(axis=(1, 2)).astype(jnp.float32)
            sy = (feats * fy * fy).mean(axis=(1, 2)).astype(jnp.float32)
            pooled = jnp.concatenate([pooled, sx, sy], axis=-1)
        if "flatten" in parts:
            # keep the final spatial grid: GAP(+moments) statistics are
            # nearly ROTATION-blind — measured on the ±15° SE(3) refiner arm,
            # the rot head stays at the identity output (feature/residual
            # correlation ≈ 0) while xy/z learn; a spatially-indexed readout
            # exposes orientation directly. The grid goes through a 1x1 conv
            # to 16 channels BEFORE flattening: a raw h·w·C flatten (~10k
            # dims) makes the zero-init head a 10k-wide Adam layer whose
            # outputs drift ~lr·sqrt(D) per step — measured grad_norm 41→128
            # in two epochs on the ±15° SE(3) arm. 16·h·w (~320) keeps the
            # drift at the scale the moments arms already train at, and the
            # conv learns which channels carry orientation.
            red = nn.Conv(16, (1, 1), dtype=jnp.float32,
                          name="flatten_reduce")(feats.astype(jnp.float32))
            red = red.reshape(red.shape[0], -1)
            red = nn.LayerNorm(name="flatten_ln")(red)
            pooled = jnp.concatenate([pooled, red], axis=-1)
        if "lk" in parts:
            lk = _lk_pyramid_stats(x_nhwc)
            lk = nn.LayerNorm(name="lk_ln")(lk)
            pooled = jnp.concatenate([pooled, lk], axis=-1)
        # zero kernel + identity bias: the untrained head outputs EXACTLY the
        # identity update, so training starts at the identity floor with
        # clean linear-readout dynamics (with lecun init the raw flattened
        # features put O(1) noise on the pose outputs — measured loss 3.9 /
        # grad_norm 106 at step 0 on the flatten arms)
        kernel_init = (
            nn.initializers.variance_scaling(
                self.cfg.head_init_scale, "fan_in", "truncated_normal"
            )
            if self.cfg.head_init_scale > 0.0
            else nn.initializers.zeros
        )
        out = nn.Dense(
            self.cfg.pose_dim,
            dtype=jnp.float32,
            kernel_init=kernel_init,
            bias_init=_identity_pose_bias(self.cfg.pose_dim),
            name="pose_fc",
        )(pooled)
        if self.cfg.vxvy_scale != 1.0:
            vx0 = 6 if self.cfg.pose_dim == 9 else 4
            gain = jnp.ones(self.cfg.pose_dim, jnp.float32)
            gain = gain.at[vx0:vx0 + 2].set(self.cfg.vxvy_scale)
            out = out * gain
        return out


class PosePredictor:
    """Stateless orchestrator: holds config + flax module, exposes pure fns.

    Usage:
        pp = PosePredictor(cfg)
        variables = pp.init(key)
        outputs = pp.forward(variables, mesh_data, images, K, TCO_init, n_iterations)
    """

    def __init__(self, cfg: PosePredictorConfig):
        self.cfg = cfg
        self.net = PoseNet(cfg)

    def init(self, key: jax.Array):
        h, w = self.cfg.render_size

        # jit the whole init: eager flax init dispatches every layer op
        # separately, which costs minutes through a ~40ms/dispatch TPU tunnel
        n_ch = 9 if self.cfg.input_mode == "obs+render+diff" else 6

        @jax.jit
        def _init(key):
            dummy = jnp.zeros((1, h, w, n_ch), jnp.float32)
            return self.net.init({"params": key}, dummy, train=False)

        return _init(key)

    # -- single refinement iteration ------------------------------------
    def _iteration(self, variables, mesh_data, images, K, TCO_input,
                   train, rng, mutable):
        cfg = self.cfg
        crop_points = mesh_data["crop_points"]     # (B, P, 3)

        # 1. crop box + observed crop + cropped intrinsics
        uv = project_points_robust(crop_points, K, TCO_input)
        boxes_rend = boxes_from_uv(uv)
        boxes_crop, images_crop = deepim_crops(
            images, boxes_rend, K, TCO_input, crop_points,
            output_size=cfg.render_size, lamb=cfg.lamb,
        )
        K_crop = jax.lax.stop_gradient(
            get_K_crop_resize(K, boxes_crop, images.shape[-2:], cfg.render_size)
        )

        # 2. render the object at the current pose estimate in the crop frame
        # (Pallas kernel on TPU, XLA rasterizer on CPU — ops/render.py)
        rendered = render(
            mesh_data["tri_verts"], mesh_data["tri_valid"],
            TCO_input, K_crop,
            image_size=cfg.render_size,
            colors=mesh_data.get("tri_colors"),
            tile=cfg.raster_tile,
            max_tris_per_tile=cfg.raster_max_tris_per_tile,
            pallas_tile=cfg.pallas_tile,
            pallas_max_tris_per_tile=cfg.pallas_max_tris_per_tile,
        ).rgb  # (B, 3, H, W)

        # 3. network forward on the comparison stack (NHWC for TPU)
        if cfg.input_mode == "obs+render+diff":
            x = jnp.concatenate(
                [images_crop, rendered, images_crop - rendered], axis=1
            )
        else:
            x = jnp.concatenate([images_crop, rendered], axis=1)
        x = jnp.moveaxis(x, 1, -1)
        if train:
            def net_apply(variables, x, rng):
                return self.net.apply(
                    variables, x, train=True,
                    rngs={"dropout": rng},
                    mutable=["batch_stats"],
                )

            if cfg.remat:
                net_apply = jax.checkpoint(net_apply)
            pose_outputs, updates = net_apply(variables, x, rng)
        else:
            pose_outputs = self.net.apply(variables, x, train=False)
            updates = None

        # 4. image-space pose update
        if cfg.pose_dim == 9:
            dR = rot6d_to_matrix(pose_outputs[:, 0:6])
            v = pose_outputs[:, 6:9]
        else:
            dR = quat_to_matrix(pose_outputs[:, 0:4])
            v = pose_outputs[:, 4:7]
        TCO_output = apply_imagespace_predictions(TCO_input, K_crop, v, dR)

        iter_out = dict(
            TCO_input=TCO_input,
            TCO_output=TCO_output,
            K_crop=K_crop,
            pose_outputs=pose_outputs,
            boxes_rend=boxes_rend,
            boxes_crop=boxes_crop,
        )
        return TCO_output, iter_out, updates

    # -- scanned multi-iteration forward --------------------------------
    def forward(self, variables, mesh_data, images, K, TCO_init,
                n_iterations: int = 1, train: bool = False,
                rng: jax.Array | None = None):
        """Run n_iterations of render-and-compare.

        mesh_data: dict of per-candidate gathered mesh arrays
          {tri_verts (B,F,3,3), tri_colors (B,F,3,3), tri_valid (B,F),
           crop_points (B,P,3)}
        images (B, 3, H, W) float in [0,1]; K (B, 3, 3); TCO_init (B, 4, 4).

        Returns dict with per-iteration stacked leaves, each (n_iter, B, ...)
        — same contents as the reference's outputs['iteration=n'] dict
        (ref: cosypose/models/pose.py:110-117) — plus 'TCO_final' (B, 4, 4)
        and, under train, 'batch_stats' updates.
        """
        if rng is None:
            rng = jax.random.PRNGKey(0)

        if train:
            # thread mutable batch stats through the scan carry
            def body(carry, it_rng):
                TCO, vars_c = carry
                TCO = jax.lax.stop_gradient(TCO)
                TCO_out, iter_out, updates = self._iteration(
                    vars_c, mesh_data, images, K, TCO, True, it_rng, True
                )
                vars_n = {**vars_c, "batch_stats": updates["batch_stats"]}
                return (TCO_out, vars_n), iter_out

            rngs = jax.random.split(rng, n_iterations)
            (TCO_final, vars_out), outs = jax.lax.scan(
                body, (TCO_init, variables), rngs
            )
            outs["TCO_final"] = TCO_final
            outs["batch_stats"] = vars_out["batch_stats"]
            return outs
        else:
            def body(carry, _):
                TCO_out, iter_out, _unused = self._iteration(
                    variables, mesh_data, images, K, carry, False, rng, False
                )
                return TCO_out, iter_out

            TCO_final, outs = jax.lax.scan(
                body, TCO_init, jnp.arange(n_iterations)
            )
            outs["TCO_final"] = TCO_final
            return outs


def gather_mesh_data(mesh_db, label_ids: jax.Array, n_points_crop: int = 2000) -> dict:
    """Device-side gather of per-candidate mesh arrays from a BatchedMeshes.

    Replaces the reference's mesh_db.select(labels) + sample_points
    (ref: cosypose/models/pose.py:50-51) but keyed by integer ids so it can run
    inside jit. Geometry is triangle-major (tri_verts/tri_colors) — dense
    corner positions, no vertex-index indirection (see ops/mesh_db.py docstring).
    """
    P = min(n_points_crop, mesh_db.points.shape[1])
    import numpy as np

    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.choice(mesh_db.points.shape[1], size=P, replace=False))
    return dict(
        tri_verts=jnp.take(mesh_db.tri_verts, label_ids, axis=0),
        tri_colors=jnp.take(mesh_db.tri_colors, label_ids, axis=0),
        tri_valid=jnp.take(mesh_db.tri_valid, label_ids, axis=0),
        crop_points=jnp.take(
            jnp.take(mesh_db.points, ids, axis=1), label_ids, axis=0
        ),
    )
