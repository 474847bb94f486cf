"""Diagnostic: finite-difference render-Jacobian (Gauss-Newton) statistics.

For each sample, renders the object at the noised pose T and at small
rotational perturbations T·exp(eps·e_k) about the object center, then probes
how well the normalized projections <diff, J_k>/<J_k,J_k> (diff = obs - rend,
J_k the finite-difference render Jacobian) linearly predict the axis-angle
components of dR* — including out-of-plane axes, which no affine-flow (LK)
statistic can read because they change appearance rather than displace it.

Also fits probes for shading-robust LK variants (high-pass / gradient-
magnitude preprocessing) for comparison.

Usage: python scripts/diag_fdj_probe.py [--n 192] [--cpu]
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=192)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--eps-deg", type=float, default=4.0)
    parser.add_argument("--noise-deg", type=float, default=15.0)
    parser.add_argument("--self-render", action="store_true",
                        help="replace the observed crop with our own render "
                             "at the GT pose (isolates appearance mismatch)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cosypose_tpu.data.datasets_cfg import make_object_dataset, make_scene_dataset
    from cosypose_tpu.data.pose_dataset import PoseDataset
    from cosypose_tpu.models.pose_predictor import (
        PosePredictorConfig, _lk_pyramid_stats, gather_mesh_data,
    )
    from cosypose_tpu.ops.camera import (boxes_from_uv, get_K_crop_resize,
                                         project_points_robust)
    from cosypose_tpu.ops.cropping import deepim_crops
    from cosypose_tpu.ops.mesh_db import build_mesh_db
    from cosypose_tpu.ops.render import render
    from cosypose_tpu.ops.transforms import add_pose_noise, make_T
    from cosypose_tpu.ops.losses import loss_CO_symmetric

    cfg = PosePredictorConfig(backbone="wide-resnet18", render_size=(120, 160))

    obj_ds = make_object_dataset("procedural")
    mesh_db = build_mesh_db(obj_ds.mesh_specs())
    scene_ds = make_scene_dataset("synthetic.procedural-solo.train")
    pose_ds = PoseDataset(scene_ds, resize=(120, 160), apply_rgb_augmentation=False)

    eps = float(np.radians(args.eps_deg))

    def rot_about(axis, angle):
        c, s = jnp.cos(angle), jnp.sin(angle)
        if axis == 0:
            return jnp.array([[1, 0, 0], [0, c, -s], [0, s, c]], jnp.float32)
        if axis == 1:
            return jnp.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], jnp.float32)
        return jnp.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], jnp.float32)

    def render_at(mesh_data, TCO, K_crop):
        return render(
            mesh_data["tri_verts"], mesh_data["tri_valid"], TCO, K_crop,
            image_size=cfg.render_size, colors=mesh_data.get("tri_colors"),
            tile=cfg.raster_tile, max_tris_per_tile=cfg.raster_max_tris_per_tile,
            pallas_tile=cfg.pallas_tile,
            pallas_max_tris_per_tile=cfg.pallas_max_tris_per_tile,
        ).rgb

    @jax.jit
    def stats_and_targets(mesh_data, images, K, TCO, key):
        TCO_input = add_pose_noise(
            key, TCO, euler_deg_std=(args.noise_deg,) * 3,
            trans_std=(0.01, 0.01, 0.03),
        )
        crop_points = mesh_data["crop_points"]
        uv = project_points_robust(crop_points, K, TCO_input)
        boxes_rend = boxes_from_uv(uv)
        boxes_crop, images_crop = deepim_crops(
            images, boxes_rend, K, TCO_input, crop_points,
            output_size=cfg.render_size, lamb=cfg.lamb,
        )
        K_crop = get_K_crop_resize(K, boxes_crop, images.shape[-2:], cfg.render_size)
        rend0 = render_at(mesh_data, TCO_input, K_crop)   # (B,3,H,W)
        obs = (render_at(mesh_data, TCO, K_crop) if args.self_render
               else images_crop)
        diff = obs - rend0

        # finite-difference rotational Jacobians about the object center
        # (camera-frame left-multiplied dR, matching the head convention)
        R_in, t_in = TCO_input[:, :3, :3], TCO_input[:, :3, 3]
        feats = []
        for axis in range(3):
            dRa = rot_about(axis, eps)
            T_pert = make_T(
                jnp.einsum("ij,bjk->bik", dRa, R_in), t_in)
            J = (render_at(mesh_data, T_pert, K_crop) - rend0) / eps
            # normalized Gauss-Newton projections, global + first moments
            num = (diff * J).mean(axis=(1, 2, 3))
            den = (J * J).mean(axis=(1, 2, 3)) + 1e-6
            feats.append(num / den)
            feats.append(num * jax.lax.rsqrt(den))
            # per-channel versions
            num_c = (diff * J).mean(axis=(2, 3))
            den_c = (J * J).mean(axis=(2, 3)) + 1e-6
            feats.append((num_c / den_c).reshape(diff.shape[0], -1))
        fdj = jnp.concatenate(
            [f[:, None] if f.ndim == 1 else f for f in feats], axis=-1)

        # hypothesis-error statistics: finite differences of the MASKED
        # photometric error under rotated render hypotheses — monotone in the
        # rotation error over +-2*alpha, robust to blur/shading (systematic
        # appearance offsets cancel between hypotheses)
        hyp_feats = []
        for alpha_deg in (6.0, 12.0, 18.0):
            a = jnp.float32(np.radians(alpha_deg))
            for axis in range(3):
                ms = []
                for sign in (1.0, -1.0):
                    dRa = rot_about(axis, sign * a)
                    T_h = make_T(jnp.einsum("ij,bjk->bik", dRa, R_in), t_in)
                    r_h = render_at(mesh_data, T_h, K_crop)
                    m_mask = ((r_h.sum(1) > 0) | (rend0.sum(1) > 0)
                              ).astype(jnp.float32)[:, None]
                    err = (jnp.abs(obs - r_h) * m_mask).sum((1, 2, 3)) / (
                        m_mask.sum((1, 2, 3)) * 3.0 + 1e-6)
                    ms.append(err)
                m0_mask = (rend0.sum(1) > 0).astype(jnp.float32)[:, None]
                m0 = (jnp.abs(obs - rend0) * m0_mask).sum((1, 2, 3)) / (
                    m0_mask.sum((1, 2, 3)) * 3.0 + 1e-6)
                hyp_feats.append((ms[0] - ms[1]) / (m0 + 1e-6))
                hyp_feats.append((ms[0] + ms[1] - 2 * m0) / (m0 + 1e-6))
        hyp = jnp.stack(hyp_feats, axis=-1)

        # LK variants on preprocessed channels
        x = jnp.moveaxis(jnp.concatenate([obs, rend0], axis=1), 1, -1)
        lk_raw = _lk_pyramid_stats(x)

        def highpass(im_nchw):
            k = 9
            mean = jax.lax.reduce_window(
                im_nchw, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, 1, 1),
                "SAME") / (k * k)
            return im_nchw - mean

        x_hp = jnp.moveaxis(
            jnp.concatenate([highpass(obs), highpass(rend0)], axis=1), 1, -1)
        lk_hp = _lk_pyramid_stats(x_hp)

        def gradmag(im_nchw):
            gy = jnp.pad(im_nchw[:, :, 2:] - im_nchw[:, :, :-2],
                         ((0, 0), (0, 0), (1, 1), (0, 0)))
            gx = jnp.pad(im_nchw[:, :, :, 2:] - im_nchw[:, :, :, :-2],
                         ((0, 0), (0, 0), (0, 0), (1, 1)))
            return jnp.sqrt(gx * gx + gy * gy + 1e-8)

        x_gm = jnp.moveaxis(
            jnp.concatenate([gradmag(obs), gradmag(rend0)], axis=1), 1, -1)
        lk_gm = _lk_pyramid_stats(x_gm)

        # targets: camera-frame axis-angle of dR*
        R_gt = TCO[:, :3, :3]
        dR_star = jnp.matmul(R_gt, jnp.swapaxes(R_in, -1, -2))
        w = jnp.stack([
            dR_star[:, 2, 1] - dR_star[:, 1, 2],
            dR_star[:, 0, 2] - dR_star[:, 2, 0],
            dR_star[:, 1, 0] - dR_star[:, 0, 1],
        ], axis=-1) * 0.5  # ~ sin(theta) * axis

        # oracle check: identity-floor vs the point loss at dR_star
        pts = mesh_data["crop_points"]
        gt = TCO[:, None]
        floor = loss_CO_symmetric(gt, TCO_input, pts)
        return fdj, hyp, lk_raw, lk_hp, lk_gm, w, floor

    outs = {k: [] for k in ["fdj", "hyp", "lk_raw", "lk_hp", "lk_gm", "w"]}
    key = jax.random.PRNGKey(0)
    for start in range(0, args.n, args.batch):
        items = [pose_ds[i % len(pose_ds)]
                 for i in range(start, start + args.batch)]
        batch = PoseDataset.collate_fn(items)
        label_ids = jnp.asarray(mesh_db.ids_for(batch.labels), jnp.int32)
        mesh_data = gather_mesh_data(mesh_db, label_ids,
                                     n_points_crop=cfg.n_points_crop)
        images = jnp.asarray(batch.images, jnp.float32) / 255.0
        key, sub = jax.random.split(key)
        fdj, hyp, lk_raw, lk_hp, lk_gm, w, floor = stats_and_targets(
            mesh_data, images, jnp.asarray(batch.K), jnp.asarray(batch.TCO), sub)
        for name, val in [("fdj", fdj), ("hyp", hyp), ("lk_raw", lk_raw),
                          ("lk_hp", lk_hp), ("lk_gm", lk_gm), ("w", w)]:
            outs[name].append(np.asarray(val))
    W = np.concatenate(outs["w"])
    n_tr = int(0.75 * len(W))

    def fit(S, name):
        mu, sd = S[:n_tr].mean(0), S[:n_tr].std(0) + 1e-8
        Sn = (S - mu) / sd
        r2s = []
        for k, ax in enumerate(["wx", "wy", "wz(in-plane)"]):
            y = W[:, k] - W[:n_tr, k].mean()
            A = Sn[:n_tr]
            wgt = np.linalg.solve(A.T @ A + 10.0 * np.eye(A.shape[1]),
                                  A.T @ y[:n_tr])
            res = y[n_tr:] - Sn[n_tr:] @ wgt
            r2 = 1.0 - res.var() / (y[n_tr:].var() + 1e-12)
            r2s.append(f"{ax}={r2:+.3f}")
        print(f"{name:8s} dim={S.shape[1]:3d}  " + "  ".join(r2s))

    print(f"N={len(W)}  (val split {len(W)-n_tr})")
    for name in ["fdj", "hyp", "lk_raw", "lk_hp", "lk_gm"]:
        fit(np.concatenate(outs[name]), name)
    fit(np.concatenate(
        [np.concatenate(outs["fdj"]), np.concatenate(outs["lk_gm"])], axis=1),
        "fdj+gm")


if __name__ == "__main__":
    main()
