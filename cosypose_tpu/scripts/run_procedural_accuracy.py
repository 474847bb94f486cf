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
from ..evaluation.eval_bundle import collect_gt, per_pair_errors
from ..evaluation.meters import PoseErrorMeter
from ..models.pose_predictor import PosePredictor
from ..ops.mesh_db import build_mesh_db
from ..ops.transforms import add_pose_noise
from ..training.checkpoint import latest_checkpoint, load_checkpoint
from ..training.configs import make_cfg
from ..utils.tensor_collection import PandasTensorCollection
from ..utils.logging import get_logger

logger = get_logger(__name__)


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
    parser.add_argument("--init", default=None, choices=("gt+noise", "box"),
                        help="initial-pose source: noisy GT (refiner protocol)"
                             " or GT-box z-up auto-depth (the pipeline's "
                             "detection-seeded coarse init). Default follows "
                             "the config's input generator.")
    parser.add_argument("--render-lod", type=int, default=None,
                        help="decimate render geometry to <= this many faces "
                             "(ADD points keep full fidelity)")
    parser.add_argument("--out", default=None)
    parser.add_argument("--save-overlays", default=None, metavar="DIR",
                        help="write input|init|refined overlay panels for the "
                             "first --n-overlays pairs (docs/qualitative "
                             "check, ref visualization/singleview.py)")
    parser.add_argument("--n-overlays", type=int, default=4)
    args = parser.parse_args(argv)

    cfg = make_cfg(args.config or args.run_id)
    # follow the config's object set (e.g. the sine-textured 'procedural-tex'
    # set of the texsolo tier) so render-and-compare sees the same albedo
    # field the arm was trained on
    from ..data.datasets_cfg import make_object_dataset

    obj_ds_name = getattr(cfg, "object_ds_name", "procedural")
    obj_ds = (make_object_dataset(obj_ds_name) if obj_ds_name != "procedural"
              else ProceduralObjectDataset())
    mesh_db = build_mesh_db(obj_ds.mesh_specs(),
                            render_max_faces=args.render_lod)

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
    images, K, gt_infos, TCO_gt, gt_boxes = collect_gt(
        ds, args.n_frames, resize=tuple(getattr(cfg, "input_resize", ())) or None
    )
    logger.info(f"{len(gt_infos)} GT objects over {images.shape[0]} frames")

    # the training-time input distribution: noisy GT for refiner configs,
    # GT-box z-up auto-depth for box-seeded (coarse) configs
    init_mode = args.init or (
        "box" if cfg.train.input_generator.startswith("fixed") else "gt+noise"
    )
    if init_mode == "box":
        from ..ops.pose_ops import TCO_init_from_boxes_zup_autodepth

        label_ids = mesh_db.ids_for(gt_infos["label"].values)
        points = mesh_db.sample_points(
            jnp.asarray(label_ids), 2000, deterministic=True
        )
        K_per_obj = jnp.asarray(K)[gt_infos["batch_im_id"].values]
        TCO_init = np.asarray(TCO_init_from_boxes_zup_autodepth(
            jnp.asarray(gt_boxes), points, K_per_obj
        ))
    else:
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

    if args.save_overlays:
        import pathlib

        from PIL import Image

        from ..visualization.singleview import render_prediction_overlay

        from ..ops.camera import project_points

        odir = pathlib.Path(args.save_overlays)
        odir.mkdir(parents=True, exist_ok=True)
        for n in range(min(args.n_overlays, len(gt_infos))):
            im_id = int(gt_infos["batch_im_id"].values[n])
            rgb = (np.moveaxis(images[im_id], 0, -1) * 255).astype(np.uint8)
            panels = [rgb]
            for poses in (TCO_init, refined):
                panels.append(render_prediction_overlay(
                    mesh_db, rgb, poses[n], K[im_id],
                    str(gt_infos["label"].values[n])
                ))
            # zoom each panel to a square crop around the object (GT
            # projection, 2x margin) so the pose/rotation change is legible
            # at doc scale; full frames leave a ~30 px object unreadable
            lab_id = mesh_db.ids_for([str(gt_infos["label"].values[n])])[0]
            pts = np.asarray(mesh_db.points[lab_id])
            uv = np.asarray(project_points(
                jnp.asarray(pts)[None], jnp.asarray(K[im_id])[None],
                jnp.asarray(TCO_gt[n])[None]))[0]
            H, W = rgb.shape[:2]
            cx, cy = float(uv[:, 0].mean()), float(uv[:, 1].mean())
            half = 2.0 * max(np.ptp(uv[:, 0]), np.ptp(uv[:, 1]), 16.0) / 2
            x0 = int(np.clip(cx - half, 0, W - 1))
            x1 = int(np.clip(cx + half, x0 + 8, W))
            y0 = int(np.clip(cy - half, 0, H - 1))
            y1 = int(np.clip(cy + half, y0 + 8, H))
            zoom = [p[y0:y1, x0:x1] for p in panels]
            up = max(1, int(round(160 / max(y1 - y0, 1))))
            zoom = [np.kron(z, np.ones((up, up, 1), np.uint8)) for z in zoom]
            Image.fromarray(np.concatenate(zoom, axis=1).astype(np.uint8)).save(
                odir / f"refinement_{n:02d}.png")
        logger.info(f"wrote {min(args.n_overlays, len(gt_infos))} overlay "
                    f"panels (input|init|refined) to {odir}")
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
