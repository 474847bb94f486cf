"""Paper-style single/multi-view evaluation CLI.

Capability match for the reference's ``cosypose/scripts/run_cosypose_eval.py``:
evaluate coarse+refiner (and optionally the multiview stage) over a dataset,
seeding from saved detections (the paper pipeline evaluates from saved
PoseCNN/Pix2Pose detections, ref: :50-137), reporting ADD/ADD-S AUC and 0.1d
metrics per prediction key.

  python -m cosypose_tpu.scripts.run_cosypose_eval --dataset ycbv \
      --detections <csv with candidate boxes or poses> \
      --coarse RUN_ID --refiner RUN_ID [--nviews N]
"""

from __future__ import annotations

import argparse
import pathlib
import pickle

import jax.numpy as jnp

from ..config import RESULTS_DIR
from ..data.datasets_cfg import make_object_dataset, make_scene_dataset
from ..data.wrappers import MultiViewWrapper
from ..evaluation.bop_export import csv_to_candidates
from ..evaluation.eval_runners import PoseEvaluation
from ..evaluation.meters import PoseErrorMeter
from ..evaluation.pred_runners import MultiviewPredictionRunner
from ..evaluation.runner_utils import format_results
from ..integrated.multiview_predictor import MultiviewScenePredictor
from ..integrated.pose_predictor import CoarseRefinePosePredictor
from ..ops.mesh_db import build_mesh_db
from ..utils.tensor_collection import PandasTensorCollection
from ..utils.logging import get_logger
from .run_bop_inference import load_pose_model

logger = get_logger(__name__)


def get_pose_meters(mesh_db, obj_ds, n_top=1):
    """Meter set mirroring the paper eval (ref: run_cosypose_eval.py:140-218)."""
    for o in obj_ds.objects:
        mesh_db.infos[o["label"]]["diameter_m"] = o["diameter_m"]
    return {
        "ADD(-S)_ntop=1": PoseErrorMeter(
            mesh_db, error_type="ADD(-S)", n_top=n_top, sample_n_points=2000,
            report_error_AUC=True, report_AP=True,
        ),
        "ADD-S_ntop=1": PoseErrorMeter(
            mesh_db, error_type="ADD-S", n_top=n_top, sample_n_points=2000,
            report_error_AUC=True,
        ),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True)
    parser.add_argument(
        "--detections", required=True,
        help="BOP CSV of candidate detections/poses, or one of the saved "
             "paper-protocol sets: posecnn_init (YCB-V PoseCNN), "
             "pix2pose_detections / pix2pose_coarse_init (T-LESS)"
    )
    parser.add_argument("--coarse", default=None)
    parser.add_argument("--refiner", required=True)
    parser.add_argument("--use-detections-tco", action="store_true",
                        help="seed the refiner from the CSV poses (PoseCNN-style)")
    parser.add_argument("--nviews", type=int, default=1)
    parser.add_argument("--n-refiner-iterations", type=int, default=4)
    parser.add_argument("--ds-root", default=None)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args()

    scene_ds = make_scene_dataset(f"{args.dataset}.test", ds_root=args.ds_root)
    if args.debug:
        scene_ds.frame_index = scene_ds.frame_index.iloc[:4].reset_index(drop=True)
    ds_multi = MultiViewWrapper(scene_ds, n_views=args.nviews)

    obj_ds = make_object_dataset(f"{args.dataset}.models", ds_root=args.ds_root)
    mesh_db = build_mesh_db(obj_ds.mesh_specs())

    # saved paper-protocol detections (ref: run_cosypose_eval.py:50-137,
    # 318-336) or a BOP CSV of candidates
    if args.detections == "posecnn_init":
        from ..evaluation.saved_detections import load_posecnn_results

        detections = load_posecnn_results()
        args.use_detections_tco = True
    elif args.detections in ("pix2pose_detections", "pix2pose_coarse_init"):
        from ..evaluation.saved_detections import load_pix2pose_results

        detections = load_pix2pose_results(
            all_detections=args.nviews > 1,
            remove_incorrect_poses=args.detections == "pix2pose_coarse_init",
        )
        if args.detections == "pix2pose_coarse_init":
            args.use_detections_tco = True
    else:
        df, poses = csv_to_candidates(args.detections)
        detections = PandasTensorCollection(df, poses=jnp.asarray(poses))
        # candidate CSVs carry poses; boxes for coarse init come from
        # reprojection
        if not args.use_detections_tco:
            raise SystemExit(
                "box-seeded eval requires a detections CSV with bboxes; "
                "use --use-detections-tco to seed from the CSV poses"
            )

    if not args.use_detections_tco and not args.coarse:
        raise SystemExit(
            "box-seeded eval runs a coarse iteration: pass --coarse RUN_ID "
            "(or --use-detections-tco to seed the refiner from CSV poses)"
        )
    refiner = load_pose_model(args.refiner, mesh_db, exp_dir=None)
    coarse = load_pose_model(args.coarse, mesh_db) if args.coarse else None
    predictor = CoarseRefinePosePredictor(coarse, refiner)

    mv_predictor = None
    if args.nviews > 1:
        mesh_db_aabb = build_mesh_db(obj_ds.mesh_specs(), aabb=True,
                                     keep_geometry=False)
        mv_predictor = MultiviewScenePredictor(mesh_db_aabb)

    runner = MultiviewPredictionRunner(
        ds_multi,
        n_coarse_iterations=0 if args.use_detections_tco else 1,
        n_refiner_iterations=args.n_refiner_iterations,
    )
    preds = runner.get_predictions(
        predictor, mv_predictor=mv_predictor, detections=detections,
        use_detections_TCO=args.use_detections_tco,
    )

    meters = get_pose_meters(mesh_db, obj_ds)
    evaluator = PoseEvaluation(scene_ds, meters)
    metrics, dfs = {}, {}
    for key, tc in preds.items():
        metrics[key], dfs[key] = evaluator.evaluate(tc)
    results = format_results(preds, metrics, dfs)

    out = pathlib.Path(RESULTS_DIR) / f"eval-{args.dataset}"
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "results.pkl", "wb") as f:
        pickle.dump(
            dict(summary=results["summary"], summary_txt=results["summary_txt"]),
            f,
        )
    logger.info(results["summary_txt"])


if __name__ == "__main__":
    main()
