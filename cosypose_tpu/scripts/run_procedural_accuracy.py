"""End-to-end accuracy regression on the recorded procedural dataset.

The rebuild's analog of the reference's pinned result tables (T-LESS SiSo
recall, YCB-V AUC — ref: README.md:233,264-277): evaluate a trained refiner
checkpoint on held-out recorded frames, comparing the noisy initial poses
against the refined poses.

Because the eval initializes from GT+noise, the GT↔prediction correspondence
is KNOWN — so the primary metric is the full per-pair ADD error distribution
(mean/median/p90, init vs each refinement iteration), plus decomposed
rotation-angle and xy/z translation errors. The detection-style matched-AUC
summary (reference protocol) is reported alongside for parity, but it is
insensitive at low match rates (AUC saturates at the match fraction).

  python -m cosypose_tpu.scripts.run_procedural_accuracy \
      --run-id procedural-refiner [--n-frames 150] [--n-iterations 4]

Prints an init→refined table and writes <results>/procedural-accuracy.json.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..config import EXP_DIR, RESULTS_DIR
from ..data.datasets_cfg import make_scene_dataset
from ..data.procedural_objects import ProceduralObjectDataset
from ..integrated.pose_predictor import CoarseRefinePosePredictor, LoadedPoseModel
from ..evaluation.meters import PoseErrorMeter
from ..models.pose_predictor import PosePredictor
from ..ops.mesh_db import build_mesh_db
from ..ops.transforms import add_pose_noise
from ..training.checkpoint import latest_checkpoint, load_checkpoint
from ..training.configs import make_cfg
from ..utils.tensor_collection import PandasTensorCollection
from ..utils.logging import get_logger

logger = get_logger(__name__)


def collect_gt(ds, n_frames: int, resize=None):
    """First n_frames of the dataset → images, K, and per-object GT rows.
    resize=(h, w) downsamples frames and rescales K (mini configs train at a
    reduced input size)."""
    from PIL import Image

    images, Ks, rows, TCO = [], [], [], []
    n = min(n_frames, len(ds))
    for i in range(n):
        rgb, _, obs = ds[i]
        cam = obs["camera"]
        K_i = np.asarray(cam["K"], np.float32).copy()
        if resize is not None and tuple(rgb.shape[:2]) != tuple(resize):
            h0, w0 = rgb.shape[:2]
            h1, w1 = resize
            rgb = np.asarray(
                Image.fromarray(rgb).resize((w1, h1), Image.BILINEAR)
            )
            K_i[0] *= w1 / w0
            K_i[1] *= h1 / h0
        TCW = np.linalg.inv(np.asarray(cam["TWC"], np.float64))
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
    infos = pd.DataFrame(rows)
    return (np.stack(images), np.stack(Ks), infos,
            np.stack(TCO).astype(np.float32))


def per_pair_errors(mesh_db, labels, TCO_pred, TCO_gt):
    """Known-correspondence error distribution: per-object ADD + decomposed
    rotation / translation errors. Unlike the detection-protocol matched-AUC
    (which saturates at the match rate), this sees every pair.

    Returns a dict of floats: ADD mean/median/p90 (meters), ADD normalized by
    object diameter (mean/median), rotation geodesic angle (deg, mean/median),
    |Δxy| and |Δz| (meters, mean)."""
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


def evaluate(mesh_db, infos, poses, gt_infos, gt_poses, error_type="ADD(-S)"):
    meter = PoseErrorMeter(
        mesh_db, error_type=error_type, report_error_AUC=True,
        report_error_stats=True,
    )
    meter.add(
        PandasTensorCollection(infos.copy(), poses=jnp.asarray(poses)),
        PandasTensorCollection(gt_infos.copy(), poses=jnp.asarray(gt_poses)),
    )
    summary = meter.summary()
    if isinstance(summary, tuple):
        summary = summary[0]
    return summary


def main(argv=None):
    # persistent compile cache (the tunneled chip pays minutes per compile)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/cosypose_tpu_train_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    parser = argparse.ArgumentParser()
    parser.add_argument("--run-id", default="procedural-refiner")
    parser.add_argument("--config", default=None,
                        help="training config name (default: --run-id)")
    parser.add_argument("--dataset", default=None)
    parser.add_argument("--n-frames", type=int, default=150)
    parser.add_argument("--n-iterations", type=int, default=4)
    parser.add_argument("--noise-seed", type=int, default=0)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    cfg = make_cfg(args.config or args.run_id)
    mesh_db = build_mesh_db(ProceduralObjectDataset().mesh_specs())

    ckpt = latest_checkpoint(EXP_DIR / args.run_id)
    assert ckpt is not None, f"no checkpoint under {EXP_DIR / args.run_id}"
    payload = load_checkpoint(ckpt)
    pp = PosePredictor(cfg.train.predictor)
    variables = {"params": payload["params"],
                 "batch_stats": payload["batch_stats"]}
    model = LoadedPoseModel(predictor=pp, variables=variables, mesh_db=mesh_db)
    predictor = CoarseRefinePosePredictor(refiner_model=model)

    dataset = args.dataset or (
        cfg.val_ds_names[0][0] if getattr(cfg, "val_ds_names", ())
        else "synthetic.procedural-4k.val"
    )
    ds = make_scene_dataset(dataset)
    images, K, gt_infos, TCO_gt = collect_gt(
        ds, args.n_frames, resize=tuple(getattr(cfg, "input_resize", ())) or None
    )
    logger.info(f"{len(gt_infos)} GT objects over {images.shape[0]} frames")

    # the training-time input distribution: noisy GT (the config's gt+noise
    # generator magnitudes)
    TCO_init = np.asarray(
        add_pose_noise(
            jax.random.PRNGKey(args.noise_seed), jnp.asarray(TCO_gt),
            euler_deg_std=tuple(cfg.train.noise_euler_deg),
            trans_std=tuple(cfg.train.noise_trans),
        )
    )

    obj_data = PandasTensorCollection(
        gt_infos.copy(), poses=jnp.asarray(TCO_init)
    )
    preds = predictor.batched_model_predictions(
        model, images, K, obj_data, n_iterations=args.n_iterations
    )
    labels = gt_infos["label"].values

    # primary: known-correspondence per-pair error distribution, init + each
    # refinement iteration
    per_pair = {"init": per_pair_errors(mesh_db, labels, TCO_init, TCO_gt)}
    for n in range(1, args.n_iterations + 1):
        per_pair[f"iteration={n}"] = per_pair_errors(
            mesh_db, labels, np.asarray(preds[f"iteration={n}"].poses), TCO_gt
        )
    for name, e in per_pair.items():
        logger.info(
            f"{name:12s}: ADD mean={e['ADD_mean']*1000:7.2f}mm "
            f"median={e['ADD_median']*1000:7.2f}mm p90={e['ADD_p90']*1000:7.2f}mm "
            f"rot={e['rot_deg_median']:5.2f}deg dxy={e['dxy_mean']*1000:6.2f}mm "
            f"dz={e['dz_mean']*1000:6.2f}mm <0.1d={e['frac_ADD_lt_0p1d']:.3f}"
        )

    # secondary: reference-protocol matched-AUC summary (for parity only)
    refined = np.asarray(preds[f"iteration={args.n_iterations}"].poses)
    results = {}
    for name, poses in (("init", TCO_init), ("refined", refined)):
        s = evaluate(mesh_db, gt_infos, poses, gt_infos, TCO_gt)
        results[name] = {
            k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
            for k, v in s.items()
            if isinstance(v, (int, float, np.floating))
        }

    out = args.out or (RESULTS_DIR / f"procedural-accuracy-{args.run_id}.json")
    RESULTS_DIR.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(
            dict(run_id=args.run_id, dataset=dataset,
                 n_frames=int(images.shape[0]), n_objects=int(len(gt_infos)),
                 n_iterations=args.n_iterations, per_pair=per_pair,
                 matched_auc=results),
            f, indent=2,
        )
    logger.info(f"wrote {out}")
    return dict(per_pair=per_pair, matched_auc=results)


if __name__ == "__main__":
    main()
