"""In-training evaluation bundle.

Capability match for the reference's ``make_eval_bundle``/``run_eval``
(ref: cosypose/training/train_pose.py:76-185): build (prediction pass +
meters) over a held-out scene dataset once, return a callback that training
invokes every ``test_epoch_interval`` epochs so accuracy curves land in
``log.jsonl`` alongside the losses.

TPU-first shape: the bundle pre-collects a fixed set of frames + GT (one host
pass), seeds the model from the config's input generator (noisy GT for
refiners, box init for coarse models) and scores with the known-correspondence
per-pair ADD distribution — the insensitive matched-AUC detection protocol is
left to the offline CLI (scripts/run_procedural_accuracy.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from ..integrated.pose_predictor import CoarseRefinePosePredictor, LoadedPoseModel
from ..utils.tensor_collection import PandasTensorCollection
from ..utils.logging import get_logger

logger = get_logger(__name__)


def collect_gt(ds, n_frames: int, resize=None, with_images: bool = True):
    """First n_frames of a scene dataset → images, K, per-object GT rows,
    GT poses and GT boxes. resize=(h, w) downsamples frames and rescales K.
    with_images=False returns images=None (GT-only callers on large sets
    would otherwise stack every frame as float32 — ~1 GB/1k VGA frames)."""
    from PIL import Image

    images, Ks, rows, TCO, boxes = [], [], [], [], []
    n = min(n_frames, len(ds))
    for i in range(n):
        rgb, _, obs = ds[i]
        cam = obs["camera"]
        K_i = np.asarray(cam["K"], np.float32).copy()
        sx = sy = 1.0
        if resize is not None and tuple(rgb.shape[:2]) != tuple(resize):
            h0, w0 = rgb.shape[:2]
            h1, w1 = resize
            rgb = np.asarray(
                Image.fromarray(rgb).resize((w1, h1), Image.BILINEAR)
            )
            sx, sy = w1 / w0, h1 / h0
            K_i[0] *= sx
            K_i[1] *= sy
        TCW = np.linalg.inv(np.asarray(cam["TWC"], np.float64))
        if with_images:
            images.append(np.moveaxis(rgb, -1, 0).astype(np.float32) / 255.0)
        Ks.append(K_i)
        for obj in obs["objects"]:
            rows.append(
                dict(
                    scene_id=int(obs["frame_info"]["scene_id"]),
                    view_id=int(obs["frame_info"]["view_id"]),
                    label=obj["label"],
                    visib_fract=float(obj.get("visib_fract", 1.0)),
                    batch_im_id=i,
                    score=1.0,
                )
            )
            TCO.append((TCW @ np.asarray(obj["TWO"], np.float64)).astype(
                np.float32))
            bb = np.asarray(obj.get("bbox", (0, 0, 1, 1)), np.float32)
            boxes.append(bb * np.array([sx, sy, sx, sy], np.float32))
    infos = pd.DataFrame(rows)
    return (np.stack(images) if with_images else None, np.stack(Ks), infos,
            np.stack(TCO).astype(np.float32),
            np.stack(boxes).astype(np.float32))


def per_pair_errors(mesh_db, labels, TCO_pred, TCO_gt):
    """Known-correspondence error distribution: per-object ADD + decomposed
    rotation / translation errors. Unlike the detection-protocol matched-AUC
    (which saturates at the match rate), this sees every pair.

    Returns a dict of floats: ADD mean/median/p90 (meters), ADD normalized by
    object diameter (mean/median + <0.1d fraction), rotation geodesic angle
    (deg, mean/median), |Δxy| and |Δz| (meters, mean)."""
    label_ids = mesh_db.ids_for(np.asarray(labels))
    pts = np.asarray(mesh_db.points)[label_ids]        # (N, P, 3)
    valid = np.asarray(mesh_db.valid)[label_ids]       # (N, P)
    Tp = np.asarray(TCO_pred, np.float64)
    Tg = np.asarray(TCO_gt, np.float64)

    gt_pts = np.einsum("nij,npj->npi", Tg[:, :3, :3], pts) + Tg[:, None, :3, 3]
    pr_pts = np.einsum("nij,npj->npi", Tp[:, :3, :3], pts) + Tp[:, None, :3, 3]
    d = np.linalg.norm(gt_pts - pr_pts, axis=-1)       # (N, P)
    w = valid.astype(np.float64)
    add = (d * w).sum(1) / np.maximum(w.sum(1), 1.0)   # (N,)

    # object diameters from the valid point cloud extent (for normalized ADD)
    ctr = (pts * w[..., None]).sum(1, keepdims=True) / np.maximum(
        w.sum(1)[:, None, None], 1.0)
    radii = (np.linalg.norm(pts - ctr, axis=-1) * w).max(1)
    diam = 2.0 * radii
    add_rel = add / np.maximum(diam, 1e-9)

    # rotation geodesic angle
    R_rel = np.einsum("nij,nkj->nik", Tp[:, :3, :3], Tg[:, :3, :3])
    cos = np.clip((np.trace(R_rel, axis1=1, axis2=2) - 1.0) / 2.0, -1.0, 1.0)
    ang = np.degrees(np.arccos(cos))

    dt = Tp[:, :3, 3] - Tg[:, :3, 3]
    dxy = np.linalg.norm(dt[:, :2], axis=-1)
    dz = np.abs(dt[:, 2])

    return dict(
        ADD_mean=float(add.mean()), ADD_median=float(np.median(add)),
        ADD_p90=float(np.percentile(add, 90)),
        ADD_rel_mean=float(add_rel.mean()),
        ADD_rel_median=float(np.median(add_rel)),
        frac_ADD_lt_0p1d=float((add_rel < 0.1).mean()),
        rot_deg_mean=float(ang.mean()), rot_deg_median=float(np.median(ang)),
        dxy_mean=float(dxy.mean()), dz_mean=float(dz.mean()),
    )


def make_eval_bundle(cfg, pp, mesh_db, scene_ds, n_frames: int = 30,
                     n_iterations: int | None = None, noise_seed: int = 0):
    """Build the default in-training eval callback.

    cfg: training.configs.RunConfig; pp: models.PosePredictor (the training
    module); scene_ds: held-out scene dataset. Returns
    ``eval_callback(state, epoch) -> dict`` reporting per-pair ADD / rotation /
    translation errors at init and after the config's refinement iterations
    (ref contract: train_pose.py:76-185 — pred runner + meters each
    test_epoch_interval; here the metric is the known-correspondence
    distribution, see module docstring).
    """
    from ..ops.pose_ops import TCO_init_from_boxes_zup_autodepth
    from ..ops.transforms import add_pose_noise

    tcfg = cfg.train
    n_iterations = n_iterations or max(tcfg.n_iterations, 1)
    resize = tuple(getattr(cfg, "input_resize", ())) or None
    images, K, gt_infos, TCO_gt, gt_boxes = collect_gt(
        scene_ds, n_frames, resize=resize
    )
    labels = gt_infos["label"].values

    if tcfg.input_generator == "gt+noise":
        TCO_init = np.asarray(
            add_pose_noise(
                jax.random.PRNGKey(noise_seed), jnp.asarray(TCO_gt),
                euler_deg_std=tuple(tcfg.noise_euler_deg),
                trans_std=tuple(tcfg.noise_trans),
            )
        )
    else:  # coarse models: the BOP20 box init from GT boxes
        label_ids = mesh_db.ids_for(labels)
        points = mesh_db.sample_points(
            jnp.asarray(label_ids), 1000, deterministic=True
        )
        im_ids = gt_infos["batch_im_id"].values
        TCO_init = np.asarray(
            TCO_init_from_boxes_zup_autodepth(
                jnp.asarray(gt_boxes), points, jnp.asarray(K[im_ids])
            )
        )

    init_errors = per_pair_errors(mesh_db, labels, TCO_init, TCO_gt)
    logger.info(
        f"eval bundle: {len(gt_infos)} GT pairs / {images.shape[0]} frames, "
        f"init ADD median {init_errors['ADD_median'] * 1000:.2f}mm"
    )

    def eval_callback(state, epoch):
        model = LoadedPoseModel(
            predictor=pp,
            variables={"params": state.params,
                       "batch_stats": state.batch_stats},
            mesh_db=mesh_db,
        )
        predictor = CoarseRefinePosePredictor(refiner_model=model)
        obj_data = PandasTensorCollection(
            gt_infos.copy(), poses=jnp.asarray(TCO_init)
        )
        preds = predictor.batched_model_predictions(
            model, images, K, obj_data, n_iterations=n_iterations
        )
        metrics = {f"init/{k}": v for k, v in init_errors.items()}
        for n in range(1, n_iterations + 1):
            e = per_pair_errors(
                mesh_db, labels,
                np.asarray(preds[f"iteration={n}"].poses), TCO_gt,
            )
            metrics.update({f"iter={n}/{k}": v for k, v in e.items()})
        final = metrics[f"iter={n_iterations}/ADD_median"]
        logger.info(
            f"eval epoch {epoch}: ADD median "
            f"{init_errors['ADD_median'] * 1000:.2f} -> {final * 1000:.2f}mm"
        )
        return metrics

    return eval_callback
