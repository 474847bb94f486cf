"""Diagnostic: why is vz the weak head? (VERDICT r4 weak #6)

The refiner's z error appears in the crop as a SCALE difference between the
observed and rendered object (the DeepIM crop tracks the render, so the
render's apparent size is ~constant and the observation's size carries z).
This probe quantifies which pooled statistic families expose that signal
linearly, on the real solo-tier data through the model's exact crop+render
input path:

  * mom1  — per-channel mean + first spatial moments (what 'gap+moments'
            pooling exposes, computed on the raw input stack)
  * mom2  — second spatial moments (x², y², |x||y| weighted means): the
            radial-extent / SCALE statistic that first moments cannot carry
  * lk    — the LK/ESM pyramid statistics (models/pose_predictor.py), whose
            symmetric X·gx + Y·gy component is the classic scale reading

Ridge probes fit stats → closed-form optimal head targets (vx*, vy*,
vz*−1); val R² per (family, noise mode) is the verdict. Writes
results/diag-z.json (--json) so the README analysis is regenerable.

Usage: python scripts/diag_z.py [--n 256] [--cpu] [--json PATH]
"""

from __future__ import annotations

import argparse
import json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=256)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--json", default=None)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from cosypose_tpu.data.datasets_cfg import (make_object_dataset,
                                                make_scene_dataset)
    from cosypose_tpu.data.pose_dataset import PoseDataset
    from cosypose_tpu.models.pose_predictor import (
        PosePredictorConfig, _lk_pyramid_stats, gather_mesh_data,
    )
    from cosypose_tpu.ops.mesh_db import build_mesh_db
    from cosypose_tpu.ops.transforms import add_pose_noise

    cfg = PosePredictorConfig(backbone="wide-resnet18",
                              render_size=(120, 160))

    obj_ds = make_object_dataset("procedural")
    mesh_db = build_mesh_db(obj_ds.mesh_specs())
    scene_ds = make_scene_dataset("synthetic.procedural-solo.train")
    pose_ds = PoseDataset(scene_ds, resize=(120, 160),
                          apply_rgb_augmentation=False)

    def input_stack(mesh_data, images, K, TCO_input):
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
        K_crop = get_K_crop_resize(K, boxes_crop, images.shape[-2:],
                                   cfg.render_size)
        rendered = render(
            mesh_data["tri_verts"], mesh_data["tri_valid"], TCO_input,
            K_crop, image_size=cfg.render_size,
            colors=mesh_data.get("tri_colors"), tile=cfg.raster_tile,
            max_tris_per_tile=cfg.raster_max_tris_per_tile,
            pallas_tile=cfg.pallas_tile,
            pallas_max_tris_per_tile=cfg.pallas_max_tris_per_tile,
        ).rgb
        x = jnp.concatenate([images_crop, rendered], axis=1)
        return jnp.moveaxis(x, 1, -1), K_crop

    def channel_moments(x_nhwc):
        """First and second spatial moments of obs/rend/diff channels."""
        obs, rend = x_nhwc[..., 0:3], x_nhwc[..., 3:6]
        ch = jnp.concatenate([obs, rend, obs - rend], axis=-1)  # (B,H,W,9)
        h, w = ch.shape[1], ch.shape[2]
        fy = jnp.linspace(-1.0, 1.0, h)[None, :, None, None]
        fx = jnp.linspace(-1.0, 1.0, w)[None, None, :, None]
        mean = ch.mean(axis=(1, 2))
        m1 = jnp.concatenate(
            [mean, (ch * fx).mean(axis=(1, 2)), (ch * fy).mean(axis=(1, 2))],
            axis=-1)
        m2 = jnp.concatenate(
            [(ch * fx * fx).mean(axis=(1, 2)),
             (ch * fy * fy).mean(axis=(1, 2)),
             (ch * jnp.abs(fx) * jnp.abs(fy)).mean(axis=(1, 2))], axis=-1)
        return m1, m2

    @jax.jit
    def stats_and_targets(mesh_data, images, K, TCO, key, trans_std,
                          euler_deg):
        TCO_input = add_pose_noise(key, TCO, euler_deg_std=euler_deg,
                                   trans_std=trans_std)
        x, K_crop = input_stack(mesh_data, images, K, TCO_input)
        m1, m2 = channel_moments(x)
        lk = _lk_pyramid_stats(x)
        z_in, z_gt = TCO_input[:, 2, 3], TCO[:, 2, 3]
        fxfy = jnp.stack([K_crop[:, 0, 0], K_crop[:, 1, 1]], axis=-1)
        vxvy = fxfy * (TCO[:, :2, 3] / z_gt[:, None]
                       - TCO_input[:, :2, 3] / z_in[:, None])
        vz = z_gt / z_in - 1.0
        targets = jnp.concatenate([vxvy, vz[:, None]], axis=-1)
        return m1, m2, lk, targets

    modes = dict(
        z_only=((0.0, 0.0, 0.03), (0.0, 0.0, 0.0)),
        train_noise=((0.01, 0.01, 0.03), (0.0, 0.0, 0.0)),
    )
    results = {}
    key = jax.random.PRNGKey(0)
    for mode, (trans_std, euler) in modes.items():
        S = {"mom1": [], "mom2": [], "lk": []}
        T = []
        for start in range(0, args.n, args.batch):
            items = [pose_ds[i % len(pose_ds)]
                     for i in range(start, start + args.batch)]
            batch = PoseDataset.collate_fn(items)
            label_ids = jnp.asarray(mesh_db.ids_for(batch.labels), jnp.int32)
            mesh_data = gather_mesh_data(mesh_db, label_ids,
                                         n_points_crop=cfg.n_points_crop)
            images = jnp.asarray(batch.images, jnp.float32) / 255.0
            key, sub = jax.random.split(key)
            m1, m2, lk, t = stats_and_targets(
                mesh_data, images, jnp.asarray(batch.K),
                jnp.asarray(batch.TCO), sub, trans_std, euler)
            S["mom1"].append(np.asarray(m1))
            S["mom2"].append(np.asarray(m2))
            S["lk"].append(np.asarray(lk))
            T.append(np.asarray(t))
        T = np.concatenate(T)
        fams = {k: np.concatenate(v) for k, v in S.items()}
        fams["mom1+mom2"] = np.concatenate([fams["mom1"], fams["mom2"]], 1)
        fams["all"] = np.concatenate([fams["mom1"], fams["mom2"],
                                      fams["lk"]], 1)

        res_mode = {}
        n_tr = int(0.75 * len(T))
        for fam, X in fams.items():
            mu, sd = X[:n_tr].mean(0), X[:n_tr].std(0) + 1e-8
            Xn = (X - mu) / sd
            fam_r2 = {}
            for k, name in enumerate(["vx", "vy", "vz"]):
                y = T[:, k] - T[:n_tr, k].mean()
                A = Xn[:n_tr]
                w = np.linalg.solve(A.T @ A + 10.0 * np.eye(A.shape[1]),
                                    A.T @ y[:n_tr])
                res = y[n_tr:] - Xn[n_tr:] @ w
                fam_r2[name] = float(
                    1.0 - res.var() / (y[n_tr:].var() + 1e-12))
            res_mode[fam] = fam_r2
            print(f"[{mode}] {fam:10s}: " + "  ".join(
                f"{k} R2={v:+.3f}" for k, v in fam_r2.items()))
        results[mode] = res_mode

    if args.json:
        with open(args.json, "w") as f:
            json.dump(dict(n=args.n, results=results), f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
