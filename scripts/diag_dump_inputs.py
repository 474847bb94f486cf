"""Dump (obs crop, render at noised pose, diff, J_rot) panels to PNG."""

from __future__ import annotations

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cosypose_tpu.data.datasets_cfg import make_object_dataset, make_scene_dataset
    from cosypose_tpu.data.pose_dataset import PoseDataset
    from cosypose_tpu.models.pose_predictor import (
        PosePredictorConfig, gather_mesh_data,
    )
    from cosypose_tpu.ops.camera import (boxes_from_uv, get_K_crop_resize,
                                         project_points_robust)
    from cosypose_tpu.ops.cropping import deepim_crops
    from cosypose_tpu.ops.mesh_db import build_mesh_db
    from cosypose_tpu.ops.render import render
    from cosypose_tpu.ops.transforms import add_pose_noise, make_T

    cfg = PosePredictorConfig(backbone="wide-resnet18", render_size=(120, 160))
    obj_ds = make_object_dataset("procedural")
    mesh_db = build_mesh_db(obj_ds.mesh_specs())
    scene_ds = make_scene_dataset("synthetic.procedural-solo.train")
    pose_ds = PoseDataset(scene_ds, resize=(120, 160), apply_rgb_augmentation=False)

    B = 6
    items = [pose_ds[i * 37] for i in range(B)]
    batch = PoseDataset.collate_fn(items)
    label_ids = jnp.asarray(mesh_db.ids_for(batch.labels), jnp.int32)
    mesh_data = gather_mesh_data(mesh_db, label_ids, n_points_crop=cfg.n_points_crop)
    images = jnp.asarray(batch.images, jnp.float32) / 255.0
    K = jnp.asarray(batch.K)
    TCO = jnp.asarray(batch.TCO)

    key = jax.random.PRNGKey(5)
    TCO_input = add_pose_noise(key, TCO, euler_deg_std=(15.0, 15.0, 15.0),
                               trans_std=(0.01, 0.01, 0.03))

    crop_points = mesh_data["crop_points"]
    uv = project_points_robust(crop_points, K, TCO_input)
    boxes_rend = boxes_from_uv(uv)
    boxes_crop, images_crop = deepim_crops(
        images, boxes_rend, K, TCO_input, crop_points,
        output_size=cfg.render_size, lamb=cfg.lamb)
    K_crop = get_K_crop_resize(K, boxes_crop, images.shape[-2:], cfg.render_size)

    def rend_at(T):
        return render(
            mesh_data["tri_verts"], mesh_data["tri_valid"], T, K_crop,
            image_size=cfg.render_size, colors=mesh_data.get("tri_colors"),
            tile=cfg.raster_tile, max_tris_per_tile=cfg.raster_max_tris_per_tile,
        ).rgb

    rend0 = rend_at(TCO_input)
    rend_gt = rend_at(TCO)
    eps = np.radians(8.0)
    c, s = np.cos(eps), np.sin(eps)
    dRz = jnp.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], jnp.float32)
    T_z = make_T(jnp.einsum("ij,bjk->bik", dRz, TCO_input[:, :3, :3]),
                 TCO_input[:, :3, 3])
    Jz = (rend_at(T_z) - rend0) / eps

    obs = np.asarray(jnp.moveaxis(images_crop, 1, -1))
    r0 = np.asarray(jnp.moveaxis(rend0, 1, -1))
    rg = np.asarray(jnp.moveaxis(rend_gt, 1, -1))
    dif = np.abs(obs - r0)
    jz = np.abs(np.asarray(jnp.moveaxis(Jz, 1, -1)))
    jz = jz / (jz.max() + 1e-6)

    rows = []
    for i in range(B):
        row = np.concatenate(
            [obs[i], r0[i], rg[i], dif[i], jz[i]], axis=1)
        rows.append(row)
    panel = (np.clip(np.concatenate(rows, axis=0), 0, 1) * 255).astype(np.uint8)
    try:
        import imageio.v2 as imageio
        imageio.imwrite("/tmp/diag_inputs.png", panel)
    except ImportError:
        from PIL import Image
        Image.fromarray(panel).save("/tmp/diag_inputs.png")
    print("wrote /tmp/diag_inputs.png  columns: obs | rend(noised) | rend(GT) | |diff| | |J_z|")


if __name__ == "__main__":
    main()
