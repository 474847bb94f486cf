"""Pose training losses, pure jnp.

TPU-native equivalent of the reference's loss-side ``cosypose/lib3d/cosypose_ops.py``
(disentangled refiner loss) and ``cosypose/lib3d/mesh_losses.py`` (ADD-L1 / ADD-S).
All losses are symmetry-aware via a padded (B, S, 4, 4) set of symmetry-equivalent
ground-truth poses with a (B, S) validity mask (identity-padded sym sets are valid
by construction, so the mask is optional).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .transforms import transform_pts, rot6d_to_matrix, quat_to_matrix, make_T


def loss_CO_symmetric(
    TCO_possible_gt: jax.Array,
    TCO_pred: jax.Array,
    points: jax.Array,
    points_valid: jax.Array | None = None,
) -> jax.Array:
    """Min over symmetry-equivalent GTs of the mean |Δxyz| point displacement.

    TCO_possible_gt (B, S, 4, 4), TCO_pred (B, 4, 4), points (B, P, 3) → (B,).
    Matches the reference's flatten(-2,-1).mean(-1) (mean over P*3 coords) with
    l1 (ref: cosypose/lib3d/cosypose_ops.py:34-47).
    """
    gt_pts = transform_pts(TCO_possible_gt, points)  # (B, S, P, 3)
    pred_pts = transform_pts(TCO_pred, points)[:, None]  # (B, 1, P, 3)
    diff = jnp.abs(pred_pts - gt_pts)
    if points_valid is not None:
        w = points_valid[:, None, :, None].astype(diff.dtype)
        losses = (diff * w).sum(axis=(-1, -2)) / jnp.maximum(w.sum(axis=(-1, -2)), 1.0)
    else:
        losses = diff.mean(axis=(-1, -2))  # (B, S)
    return jnp.min(losses, axis=1)


def _xy_head_pose(TCO_gt, TCO_input, vxvy, K_crop):
    z_gt = TCO_gt[:, 2, 3]
    z_input = TCO_input[:, 2, 3]
    fxfy = jnp.stack([K_crop[:, 0, 0], K_crop[:, 1, 1]], axis=-1)
    xsrcysrc = TCO_input[:, :2, 3]
    xy = (vxvy / fxfy + xsrcysrc / z_input[:, None]) * z_gt[:, None]
    t = jnp.concatenate([xy, z_gt[:, None]], axis=-1)
    return make_T(TCO_gt[:, :3, :3], t)


def loss_refiner_CO_disentangled(
    TCO_possible_gt: jax.Array,
    TCO_input: jax.Array,
    refiner_outputs: jax.Array,
    K_crop: jax.Array,
    points: jax.Array,
    points_valid: jax.Array | None = None,
    pose_dim: int = 9,
    return_components: bool = False,
    z_weight: float = 1.0,
) -> jax.Array:
    """Disentangled loss: rotation / xy / z hypotheses each swapped into the GT
    pose and scored with the symmetric point-displacement loss, then summed
    (ref: cosypose/lib3d/cosypose_ops.py:49-82; quaternion variant :85-118).

    refiner_outputs (B, 9) = rot6d + (vx, vy, vz), or (B, 7) = quat + v.
    TCO_possible_gt (B, S, 4, 4) with the canonical GT at index 0.

    z_weight: gradient-priority weight on the z hypothesis. Measured basis
    (scripts/diag_z.py, results/diag-z.json): under the training noise the
    z residual is ~2.5x less linearly readable from the input than xy
    (vz R² 0.37 vs vx/vy 0.93 across every pooled-statistic family) — a
    low-SNR target the optimizer deprioritizes when all three hypotheses
    share one scale. 1.0 reproduces reference semantics.
    """
    if pose_dim == 9:
        dR = rot6d_to_matrix(refiner_outputs[:, 0:6])
        vxvyvz = refiner_outputs[:, 6:9]
    elif pose_dim == 7:
        dR = quat_to_matrix(refiner_outputs[:, 0:4])
        vxvyvz = refiner_outputs[:, 4:7]
    else:
        raise ValueError(f"pose_dim={pose_dim} not supported")
    TCO_gt = TCO_possible_gt[:, 0]

    TCO_pred_orn = make_T(jnp.matmul(dR, TCO_input[:, :3, :3], precision=jax.lax.Precision.HIGHEST), TCO_gt[:, :3, 3])
    TCO_pred_xy = _xy_head_pose(TCO_gt, TCO_input, vxvyvz[:, :2], K_crop)
    z_pred = vxvyvz[:, 2] * TCO_input[:, 2, 3]
    t_z = TCO_gt[:, :3, 3].at[:, 2].set(z_pred)
    TCO_pred_z = make_T(TCO_gt[:, :3, :3], t_z)

    loss_orn = loss_CO_symmetric(TCO_possible_gt, TCO_pred_orn, points, points_valid)
    loss_xy = loss_CO_symmetric(TCO_possible_gt, TCO_pred_xy, points, points_valid)
    loss_z = loss_CO_symmetric(TCO_possible_gt, TCO_pred_z, points, points_valid)
    if return_components:
        return loss_orn + loss_xy + z_weight * loss_z, dict(
            loss_orn=loss_orn, loss_xy=loss_xy, loss_z=loss_z
        )
    return loss_orn + loss_xy + z_weight * loss_z


def loss_refiner_aux_regression(
    TCO_gt: jax.Array,
    TCO_input: jax.Array,
    refiner_outputs: jax.Array,
    K_crop: jax.Array,
    pose_dim: int = 9,
    rot_lever_m: float = 0.05,
) -> jax.Array:
    """L2 regression to the closed-form optimal head outputs → (B,).

    The disentangled point loss above is L1 in point space: at the
    constant-identity basin (model outputs the identity update regardless of
    input) its gradient is sign(residual) — magnitude-independent — so
    escaping the basin rides on a second-order feature/residual correlation.
    That is a large share of why the reference needs its 80.6M-sample
    schedule (ref: scripts/run_pose_training.py:61-63). The pose update
    (ops/pose_ops.py:pose_update) is invertible in closed form, so the
    optimal head outputs are computable targets:

        vxvy* = f_crop · (xy_gt/z_gt − xy_in/z_in)      [crop pixels]
        vz*   = z_gt / z_in
        dR*   = R_gt · R_inᵀ

    An L2 penalty on them has gradient proportional to the residual (linear
    regression dynamics) and the same minimizer for asymmetric objects; for
    symmetric ones it biases toward the canonical GT, so use it as a
    *weighted auxiliary* next to the symmetric point loss, which remains the
    objective of record. All components are expressed in meters (rotation
    residual scaled by a lever arm) so a single weight applies.
    """
    if pose_dim == 9:
        dR = rot6d_to_matrix(refiner_outputs[:, 0:6])
        vxvyvz = refiner_outputs[:, 6:9]
    elif pose_dim == 7:
        dR = quat_to_matrix(refiner_outputs[:, 0:4])
        vxvyvz = refiner_outputs[:, 4:7]
    else:
        raise ValueError(f"pose_dim={pose_dim} not supported")

    R_in = TCO_input[:, :3, :3]
    R_gt = TCO_gt[:, :3, :3]
    dR_star = jnp.matmul(
        R_gt, jnp.swapaxes(R_in, -1, -2), precision=jax.lax.Precision.HIGHEST
    )
    z_in = TCO_input[:, 2, 3]
    z_gt = TCO_gt[:, 2, 3]
    fxfy = jnp.stack([K_crop[:, 0, 0], K_crop[:, 1, 1]], axis=-1)
    vxvy_star = fxfy * (
        TCO_gt[:, :2, 3] / z_gt[:, None] - TCO_input[:, :2, 3] / z_in[:, None]
    )
    vz_star = z_gt / z_in

    d_xy = (vxvyvz[:, :2] - vxvy_star) / fxfy * z_gt[:, None]  # meters
    d_z = (vxvyvz[:, 2] - vz_star) * z_in  # meters
    d_R = dR - dR_star
    return (
        (d_xy**2).sum(-1)
        + d_z**2
        + rot_lever_m**2 * (d_R**2).sum((-1, -2))
    )


def compute_ADD_L1_loss(
    TCO_gt: jax.Array, TCO_pred: jax.Array, points: jax.Array
) -> jax.Array:
    """Plain ADD-L1: mean |Δxyz| between GT- and pred-posed points → (B,).
    (ref: cosypose/lib3d/mesh_losses.py:21-26)
    """
    diff = transform_pts(TCO_gt, points) - transform_pts(TCO_pred, points)
    return jnp.abs(diff).mean(axis=(-1, -2))


def compute_ADDS_loss(
    TCO_gt: jax.Array, TCO_pred: jax.Array, points: jax.Array
) -> jax.Array:
    """ADD-S (symmetric nearest-point) squared loss → (B,).
    (ref: cosypose/lib3d/mesh_losses.py:5-18)
    """
    gt_pts = transform_pts(TCO_gt, points)  # (B, P, 3)
    pred_pts = transform_pts(TCO_pred, points)
    d2 = ((gt_pts[:, :, None] - pred_pts[:, None, :]) ** 2).sum(-1)  # (B, Pgt, Ppred)
    nearest_sq = jnp.min(d2, axis=2)  # for each gt point, squared dist to nearest pred
    # the reference averages the per-coordinate squared components (mean over P and 3)
    return nearest_sq.mean(axis=-1) / 3.0
