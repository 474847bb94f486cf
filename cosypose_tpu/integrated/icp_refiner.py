"""Depth-based ICP pose refinement, on-device.

Capability match for the reference's ICPRefiner
(ref: cosypose/integrated/icp_refiner.py:138-179): for each predicted pose,
render the object's depth, lift both rendered and observed depth to 3D point
clouds, and refine the pose by aligning them (the reference uses
cv2.ppf_match_3d_ICP per detection in a Python loop, with Pix2Pose-derived
centroid pre-alignment, ref: :90-135).

TPU-first redesign: batched projective point-to-point ICP as a fixed-iteration
``lax.scan``: projective data association (lookup of the observed depth at the
rendered points' pixel projections — no nearest-neighbor trees), masked
Umeyama/Kabsch solve per iteration, all detections refined in one jitted
program. Centroid pre-alignment mirrors the reference (:119-124).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.render import render as _render
from ..ops.transforms import make_T
from ..utils.tensor_collection import PandasTensorCollection


def _depth_to_points(depth, K):
    """depth (H, W), K (3,3) → (H, W, 3) camera-frame points (z=0 invalid)."""
    H, W = depth.shape
    us = jnp.arange(W, dtype=jnp.float32) + 0.5
    vs = jnp.arange(H, dtype=jnp.float32) + 0.5
    x = (us[None, :] - K[0, 2]) / K[0, 0] * depth
    y = (vs[:, None] - K[1, 2]) / K[1, 1] * depth
    return jnp.stack([x, y, depth], axis=-1)


def _kabsch(P, Q, w):
    """Weighted rigid alignment P→Q: returns (R, t) minimizing Σw‖R p + t − q‖²."""
    wsum = jnp.maximum(w.sum(), 1e-6)
    mu_p = (P * w[:, None]).sum(0) / wsum
    mu_q = (Q * w[:, None]).sum(0) / wsum
    Pc = P - mu_p
    Qc = Q - mu_q
    H = (Pc * w[:, None]).T @ Qc
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) .at[2].set(d))
    R = Vt.T @ D @ U.T
    t = mu_q - R @ mu_p
    return R, t


@functools.partial(jax.jit, static_argnames=("n_iterations", "n_points"))
def _icp_refine_batch(TCO, rendered_depth, observed_depth, K,
                      n_iterations: int = 10, n_points: int = 1024,
                      dist_threshold: float = 0.02):
    """Projective ICP for a batch of detections.

    TCO (B,4,4); rendered_depth/observed_depth (B,H,W); K (B,3,3).
    Returns refined TCO (B,4,4) and a per-item validity flag.
    """
    B, H, W = rendered_depth.shape

    def refine_one(TCO_b, rd, od, K_b):
        model_pts_img = _depth_to_points(rd, K_b)  # camera frame at pred pose
        obs_pts_img = _depth_to_points(od, K_b)

        # subsample a fixed set of rendered surface pixels
        flat_valid = (rd > 0).reshape(-1)
        # deterministic stratified pick of n_points candidate pixels
        ids = jnp.linspace(0, H * W - 1, n_points).astype(jnp.int32)
        # prefer valid pixels: roll invalid picks onto valid ones by sorting
        order = jnp.argsort(~flat_valid)  # valid first
        ids = order[ids % jnp.maximum(flat_valid.sum(), 1)]
        model_pts = model_pts_img.reshape(-1, 3)[ids]
        model_valid = flat_valid[ids]

        # centroid pre-alignment (ref: icp_refiner.py:119-124): shift the model
        # cloud by the difference of visible centroids
        obs_valid_img = od > 0
        w_obs = obs_valid_img.astype(jnp.float32)
        mu_obs = (obs_pts_img * w_obs[..., None]).sum((0, 1)) / jnp.maximum(
            w_obs.sum(), 1.0
        )
        w_rend = (rd > 0).astype(jnp.float32)
        mu_rend = (model_pts_img * w_rend[..., None]).sum((0, 1)) / jnp.maximum(
            w_rend.sum(), 1.0
        )
        delta0 = mu_obs - mu_rend
        R0 = jnp.eye(3)
        t0 = delta0

        def body(carry, _):
            R, t = carry
            cur = model_pts @ R.T + t
            # projective association: look up observed depth at projections
            u = K_b[0, 0] * cur[:, 0] / jnp.maximum(cur[:, 2], 1e-6) + K_b[0, 2]
            v = K_b[1, 1] * cur[:, 1] / jnp.maximum(cur[:, 2], 1e-6) + K_b[1, 2]
            ui = jnp.clip(u.astype(jnp.int32), 0, W - 1)
            vi = jnp.clip(v.astype(jnp.int32), 0, H - 1)
            target = obs_pts_img[vi, ui]
            in_img = (u >= 0) & (u < W) & (v >= 0) & (v < H)
            d = jnp.linalg.norm(target - cur, axis=-1)
            w = (
                model_valid & in_img & (target[:, 2] > 0)
                & (d < dist_threshold)
            ).astype(jnp.float32)
            dR, dt = _kabsch(cur, target, w)
            return (dR @ R, dR @ t + dt), w.sum()

        (R, t), n_inl = jax.lax.scan(body, (R0, t0), jnp.arange(n_iterations))
        T_delta = make_T(R, t)
        TCO_refined = T_delta @ TCO_b
        ok = n_inl[-1] > 16
        return jnp.where(ok, TCO_refined, TCO_b), ok

    return jax.vmap(refine_one)(TCO, rendered_depth, observed_depth, K)


class ICPRefiner:
    """Post-refine predicted poses against observed depth (BOP20 --icp)."""

    def __init__(self, mesh_db, resolution=(240, 320)):
        self.mesh_db = mesh_db
        self.resolution = resolution

    def refine_poses(self, predictions: PandasTensorCollection, masks,
                     depth, K, n_iterations: int = 10):
        """predictions: infos[batch_im_id, label, ...] + poses; depth (n_img,
        H, W); K (n_img, 3, 3). Returns predictions with refined poses."""
        im_ids = jnp.asarray(predictions.infos["batch_im_id"].values)
        label_ids = self.mesh_db.ids_for(predictions.infos["label"].values)
        TCO = jnp.asarray(predictions.poses)
        K_dets = jnp.asarray(K)[im_ids]
        H, W = depth.shape[-2:]

        tri_verts = jnp.take(self.mesh_db.tri_verts, label_ids, axis=0)
        tri_valid = jnp.take(self.mesh_db.tri_valid, label_ids, axis=0)
        rendered = _render(
            tri_verts, tri_valid, TCO, K_dets, image_size=(H, W)
        ).depth

        observed = jnp.asarray(depth)[im_ids]
        if masks is not None:
            det_masks = jnp.asarray(masks)
            observed = jnp.where(det_masks, observed, 0.0)

        TCO_refined, ok = _icp_refine_batch(
            TCO, rendered, observed, K_dets, n_iterations=n_iterations
        )
        out = PandasTensorCollection(
            predictions.infos.copy(), poses=TCO_refined
        )
        out.infos["icp_ok"] = np.asarray(ok)
        return out
