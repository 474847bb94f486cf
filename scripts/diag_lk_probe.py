"""Diagnostic: do the LK pooled statistics carry rotation on REAL data?

Loads recorded solo-tier samples, applies the training-time rot+trans noise,
runs the model's actual crop+render input path, computes _lk_pyramid_stats,
and ridge-fits linear probes from the stats to the closed-form optimal head
outputs (dR* rot6d residual components + vxvy*/vz*). R^2 per target tells
whether the statistic is informative where the head needs it.

Usage: python scripts/diag_lk_probe.py [--n 192] [--cpu]
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=192)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cosypose_tpu.data.datasets_cfg import make_object_dataset, make_scene_dataset
    from cosypose_tpu.data.pose_dataset import PoseDataset
    from cosypose_tpu.models.pose_predictor import (
        PosePredictor, PosePredictorConfig, _lk_pyramid_stats, gather_mesh_data,
    )
    from cosypose_tpu.ops.mesh_db import build_mesh_db
    from cosypose_tpu.ops.transforms import add_pose_noise

    cfg = PosePredictorConfig(
        backbone="wide-resnet18", render_size=(120, 160),
        pooling="gap+moments+flatten+lk", input_mode="obs+render+diff",
    )
    pp = PosePredictor(cfg)

    obj_ds = make_object_dataset("procedural")
    mesh_db = build_mesh_db(obj_ds.mesh_specs())
    scene_ds = make_scene_dataset("synthetic.procedural-solo.train")
    pose_ds = PoseDataset(scene_ds, resize=(120, 160), apply_rgb_augmentation=False)

    def input_stack(variables, mesh_data, images, K, TCO_input):
        """The exact _iteration input path, truncated before the backbone."""
        from cosypose_tpu.ops.camera import (boxes_from_uv, get_K_crop_resize,
                                             project_points_robust)
        from cosypose_tpu.ops.cropping import deepim_crops
        from cosypose_tpu.ops.render import render

        crop_points = mesh_data["crop_points"]
        uv = project_points_robust(crop_points, K, TCO_input)
        boxes_rend = boxes_from_uv(uv)
        boxes_crop, images_crop = deepim_crops(
            images, boxes_rend, K, TCO_input, crop_points,
            output_size=cfg.render_size, lamb=cfg.lamb,
        )
        K_crop = get_K_crop_resize(K, boxes_crop, images.shape[-2:], cfg.render_size)
        rendered = render(
            mesh_data["tri_verts"], mesh_data["tri_valid"], TCO_input, K_crop,
            image_size=cfg.render_size, colors=mesh_data.get("tri_colors"),
            tile=cfg.raster_tile, max_tris_per_tile=cfg.raster_max_tris_per_tile,
            pallas_tile=cfg.pallas_tile,
            pallas_max_tris_per_tile=cfg.pallas_max_tris_per_tile,
        ).rgb
        x = jnp.concatenate([images_crop, rendered], axis=1)
        return jnp.moveaxis(x, 1, -1), K_crop

    @jax.jit
    def stats_and_targets(mesh_data, images, K, TCO, key):
        TCO_input = add_pose_noise(
            key, TCO, euler_deg_std=(15.0, 15.0, 15.0),
            trans_std=(0.01, 0.01, 0.03),
        )
        x, K_crop = input_stack(None, mesh_data, images, K, TCO_input)
        stats = _lk_pyramid_stats(x)
        R_in, R_gt = TCO_input[:, :3, :3], TCO[:, :3, :3]
        dR_star = jnp.matmul(R_gt, jnp.swapaxes(R_in, -1, -2))
        z_in, z_gt = TCO_input[:, 2, 3], TCO[:, 2, 3]
        fxfy = jnp.stack([K_crop[:, 0, 0], K_crop[:, 1, 1]], axis=-1)
        vxvy = fxfy * (TCO[:, :2, 3] / z_gt[:, None]
                       - TCO_input[:, :2, 3] / z_in[:, None])
        vz = z_gt / z_in
        targets = jnp.concatenate(
            [dR_star.reshape(-1, 9), vxvy, vz[:, None]], axis=-1)
        return stats, targets

    all_s, all_t = [], []
    key = jax.random.PRNGKey(0)
    for start in range(0, args.n, args.batch):
        idx = list(range(start, start + args.batch))
        items = [pose_ds[i % len(pose_ds)] for i in idx]
        batch = PoseDataset.collate_fn(items)
        label_ids = jnp.asarray(mesh_db.ids_for(batch.labels), jnp.int32)
        mesh_data = gather_mesh_data(mesh_db, label_ids, n_points_crop=cfg.n_points_crop)
        images = jnp.asarray(batch.images, jnp.float32) / 255.0
        key, sub = jax.random.split(key)
        s, t = stats_and_targets(
            mesh_data, images, jnp.asarray(batch.K), jnp.asarray(batch.TCO), sub)
        all_s.append(np.asarray(s))
        all_t.append(np.asarray(t))
    S = np.concatenate(all_s)  # (N, 54)
    T = np.concatenate(all_t)  # (N, 12)

    # ridge probes with train/val split
    n_tr = int(0.75 * len(S))
    mu, sd = S[:n_tr].mean(0), S[:n_tr].std(0) + 1e-8
    Sn = (S - mu) / sd
    names = [f"dR{i}{j}" for i in range(3) for j in range(3)] + ["vx", "vy", "vz"]
    print(f"N={len(S)} stats_dim={S.shape[1]}")
    for k, name in enumerate(names):
        y = T[:, k] - T[:n_tr, k].mean()
        A = Sn[:n_tr]
        w = np.linalg.solve(A.T @ A + 10.0 * np.eye(A.shape[1]), A.T @ y[:n_tr])
        pred = Sn[n_tr:] @ w
        res = y[n_tr:] - pred
        r2 = 1.0 - res.var() / (y[n_tr:].var() + 1e-12)
        print(f"{name}: val R2 = {r2:+.3f} (target std {T[:, k].std():.4f})")


if __name__ == "__main__":
    main()
