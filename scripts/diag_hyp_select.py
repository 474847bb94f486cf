"""Diagnostic: render-score-select rotation recovery (coarse stage).

From the z-up box init (the composed pipeline's detection-time seed), render
H rotation hypotheses at the init translation, score each by masked
photometric error against the observed crop, and report the rotation error
of the best-scoring hypothesis — a learning-free coarse-rotation module.
Optionally a second, finer round around the round-1 winner (hierarchical).

Usage: python scripts/diag_hyp_select.py [--n 64] [--h 24] [--cpu]
"""

from __future__ import annotations

import argparse

import numpy as np


def fibonacci_rotations(n: int) -> np.ndarray:
    """n roughly-uniform rotations: Fibonacci sphere viewpoints × in-plane spins."""
    out = []
    n_vp = max(1, n // 4)
    golden = (1 + 5 ** 0.5) / 2
    for i in range(n_vp):
        z = 1 - 2 * (i + 0.5) / n_vp
        r = np.sqrt(max(0.0, 1 - z * z))
        phi = 2 * np.pi * i / golden
        v = np.array([r * np.cos(phi), r * np.sin(phi), z])
        # rotation taking +z to v
        a = np.array([0.0, 0.0, 1.0])
        c = float(np.dot(a, v))
        if c > 0.9999:
            R_vp = np.eye(3)
        elif c < -0.9999:
            R_vp = np.diag([1.0, -1.0, -1.0])
        else:
            ax = np.cross(a, v); ax /= np.linalg.norm(ax)
            K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
            R_vp = np.eye(3) + np.sin(np.arccos(c)) * K + (1 - c) * (K @ K)
        for k in range(4):
            th = 2 * np.pi * k / 4
            Rz = np.array([[np.cos(th), -np.sin(th), 0],
                           [np.sin(th), np.cos(th), 0], [0, 0, 1]])
            out.append(R_vp @ Rz)
    return np.stack(out[:n]).astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=64)
    parser.add_argument("--h", type=int, default=24)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--two-round", action="store_true")
    parser.add_argument("--self-render", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cosypose_tpu.data.datasets_cfg import make_object_dataset, make_scene_dataset
    from cosypose_tpu.data.pose_dataset import PoseDataset
    from cosypose_tpu.models.pose_predictor import PosePredictorConfig, gather_mesh_data
    from cosypose_tpu.ops.camera import (boxes_from_uv, get_K_crop_resize,
                                         project_points_robust)
    from cosypose_tpu.ops.cropping import deepim_crops
    from cosypose_tpu.ops.mesh_db import build_mesh_db
    from cosypose_tpu.ops.pose_ops import TCO_init_from_boxes_zup_autodepth
    from cosypose_tpu.ops.render import render
    from cosypose_tpu.ops.transforms import make_T

    cfg = PosePredictorConfig(backbone="wide-resnet18", render_size=(120, 160))
    obj_ds = make_object_dataset("procedural")
    mesh_db = build_mesh_db(obj_ds.mesh_specs())
    scene_ds = make_scene_dataset("synthetic.procedural-solo.val")
    pose_ds = PoseDataset(scene_ds, resize=(120, 160), apply_rgb_augmentation=False)

    R_hyp = jnp.asarray(fibonacci_rotations(args.h))  # (H,3,3)
    H = R_hyp.shape[0]

    def render_at(md, TCO, K_crop):
        return render(
            md["tri_verts"], md["tri_valid"], TCO, K_crop,
            image_size=cfg.render_size, colors=md.get("tri_colors"),
            tile=cfg.raster_tile, max_tris_per_tile=cfg.raster_max_tris_per_tile,
        ).rgb

    @jax.jit
    def select(md, images, K, bboxes, TCO_gt):
        B = images.shape[0]
        TCO0 = TCO_init_from_boxes_zup_autodepth(bboxes, md["crop_points"], K)
        uv = project_points_robust(md["crop_points"], K, TCO0)
        boxes_rend = boxes_from_uv(uv)
        boxes_crop, obs = deepim_crops(
            images, boxes_rend, K, TCO0, md["crop_points"],
            output_size=cfg.render_size, lamb=cfg.lamb)
        K_crop = get_K_crop_resize(K, boxes_crop, images.shape[-2:], cfg.render_size)
        if args.self_render:
            obs = render_at(md, TCO_gt, K_crop)

        # batch all H hypotheses: (B*H) renders in one rasterizer call
        t0 = TCO0[:, :3, 3]
        R0 = TCO0[:, :3, :3]
        R_all = jnp.einsum("hij,bjk->bhik", R_hyp, R0)      # (B,H,3,3)
        T_all = make_T(R_all.reshape(-1, 3, 3),
                       jnp.repeat(t0, H, axis=0))            # (B*H,4,4)
        md_rep = {k: jnp.repeat(v, H, axis=0) for k, v in md.items()}
        K_rep = jnp.repeat(K_crop, H, axis=0)
        rends = render_at(md_rep, T_all, K_rep)              # (B*H,3,h,w)
        obs_rep = jnp.repeat(obs, H, axis=0)
        m = (rends.sum(1, keepdims=True) > 0) | (
            obs_rep.sum(1, keepdims=True) > 0.1)
        mf = m.astype(jnp.float32)
        err = (jnp.abs(obs_rep - rends) * mf).sum((1, 2, 3)) / (
            mf.sum((1, 2, 3)) * 3.0 + 1e-6)
        err = err.reshape(B, H)
        best = jnp.argmin(err, axis=1)                       # (B,)
        R_best = R_all[jnp.arange(B), best]
        return R_best, err

    errs_deg = []
    for start in range(0, args.n, args.batch):
        items = [pose_ds[i % len(pose_ds)]
                 for i in range(start, start + args.batch)]
        batch = PoseDataset.collate_fn(items)
        label_ids = jnp.asarray(mesh_db.ids_for(batch.labels), jnp.int32)
        md = gather_mesh_data(mesh_db, label_ids, n_points_crop=cfg.n_points_crop)
        images = jnp.asarray(batch.images, jnp.float32) / 255.0
        R_best, err = select(md, images, jnp.asarray(batch.K),
                             jnp.asarray(batch.bboxes),
                             jnp.asarray(batch.TCO))
        R_gt = np.asarray(batch.TCO)[:, :3, :3]
        Rb = np.asarray(R_best)
        for i in range(len(Rb)):
            dR = Rb[i] @ R_gt[i].T
            ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
            errs_deg.append(ang)
    errs_deg = np.asarray(errs_deg)
    print(f"H={H} n={len(errs_deg)}")
    print(f"rot err after select: median {np.median(errs_deg):.1f} deg, "
          f"mean {errs_deg.mean():.1f}, <60deg {np.mean(errs_deg < 60):.2f}, "
          f"<30deg {np.mean(errs_deg < 30):.2f}")


if __name__ == "__main__":
    main()
