"""BOP official-toolkit evaluation hook.

Capability match for the reference's ``cosypose/scripts/run_bop20_eval.py``:
convert predictions to the challenge CSV, then invoke the official bop_toolkit
out-of-process (the metric computation stays external by design, SURVEY.md
§2.3). The toolkit is not bundled in this image; when absent, the script
reports the internal meters instead (ADD/ADD-S AUC, 0.1d recall).

  python -m cosypose_tpu.scripts.run_bop_eval --csv <predictions.csv> \
      --dataset ycbv [--bop-toolkit-dir PATH]
"""

from __future__ import annotations

import argparse
import pathlib
import subprocess
import sys

from ..utils.logging import get_logger

logger = get_logger(__name__)


def run_toolkit_eval(csv_path, toolkit_dir, results_dir):
    """Subprocess the official eval (ref: run_bop20_eval.py:74-85)."""
    script = pathlib.Path(toolkit_dir) / "scripts" / "eval_bop19.py"
    cmd = [
        sys.executable, str(script),
        "--renderer_type", "python",
        "--result_filenames", str(csv_path),
        "--results_path", str(pathlib.Path(csv_path).parent),
        "--eval_path", str(results_dir),
    ]
    logger.info(f"Running official BOP eval: {' '.join(cmd)}")
    return subprocess.run(cmd, check=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--csv", required=True)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--bop-toolkit-dir", default=None)
    parser.add_argument("--ds-root", default=None)
    args = parser.parse_args()

    if args.bop_toolkit_dir and pathlib.Path(args.bop_toolkit_dir).exists():
        run_toolkit_eval(args.csv, args.bop_toolkit_dir,
                         pathlib.Path(args.csv).parent / "bop_eval")
        return

    logger.info("bop_toolkit not available — computing native metrics")
    import jax.numpy as jnp

    from ..data.datasets_cfg import make_object_dataset, make_scene_dataset
    from ..evaluation.bop_export import csv_to_candidates
    from ..evaluation.eval_runners import PoseEvaluation
    from ..evaluation.meters import PoseErrorMeter
    from ..ops.mesh_db import build_mesh_db
    from ..utils.tensor_collection import PandasTensorCollection

    df, poses = csv_to_candidates(args.csv)
    preds = PandasTensorCollection(df, poses=jnp.asarray(poses))
    scene_ds = make_scene_dataset(f"{args.dataset}.test.bop19",
                                  ds_root=args.ds_root, load_depth=True)
    obj_ds = make_object_dataset(f"{args.dataset}.models", ds_root=args.ds_root)
    mesh_db = build_mesh_db(obj_ds.mesh_specs())
    for o in obj_ds.objects:
        mesh_db.infos[o["label"]]["diameter_m"] = o["diameter_m"]

    meters = {
        "ADD(-S)": PoseErrorMeter(mesh_db, error_type="ADD(-S)",
                                  report_error_AUC=True, report_AP=True,
                                  sample_n_points=2000),
    }
    ev = PoseEvaluation(scene_ds, meters)
    metrics, _ = ev.evaluate(preds)
    for name, summary in metrics.items():
        logger.info(f"{name}: {summary}")

    # native BOP19 Average Recall (the challenge's headline metric):
    # VSD over the dataset's depth images + MSSD/MSPD (bop_metrics.py)
    from ..evaluation.bop_metrics import compute_bop19_ar
    from ..rendering.scene_renderer import BatchRenderer

    ar = compute_bop19_ar(preds, scene_ds, mesh_db,
                          renderer=BatchRenderer(mesh_db))
    logger.info(
        f"BOP19 AR: AR={ar['AR']:.4f} vsd={ar['AR_vsd']:.4f} "
        f"mssd={ar['AR_mssd']:.4f} mspd={ar['AR_mspd']:.4f} "
        f"(n_gt={ar['n_gt']})"
    )


if __name__ == "__main__":
    main()
