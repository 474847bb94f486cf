"""Evaluate BOP20 predictions for ALL datasets of a result id.

Capability match for the reference's ``cosypose/scripts/run_bop20_eval_multi.py``:
walk <results>/<result_id>/dataset=<ds>/ prediction dirs, run the per-dataset
BOP evaluation (official toolkit when available, internal meters otherwise)
for each, and print the collected score files at the end. Fan-out uses worker
processes like the reference (:40-47); with --serial they run in-process.

  python -m cosypose_tpu.scripts.run_bop20_eval_multi --result-id bop-pbr-1 \
      [--bop-toolkit-dir PATH] [--serial]
"""

from __future__ import annotations

import argparse
import multiprocessing
import pathlib

from ..config import RESULTS_DIR
from ..utils.logging import get_logger

logger = get_logger(__name__)


def eval_one(ds_name: str, csv_path: pathlib.Path, bop_toolkit_dir, ds_root):
    from .run_bop_eval import main as eval_main  # reuse the single-ds CLI
    import sys

    argv = ["--csv", str(csv_path), "--dataset", ds_name]
    if bop_toolkit_dir:
        argv += ["--bop-toolkit-dir", str(bop_toolkit_dir)]
    if ds_root:
        argv += ["--ds-root", str(ds_root)]
    old = sys.argv
    sys.argv = ["run_bop_eval"] + argv
    try:
        eval_main()
    finally:
        sys.argv = old


def main():
    parser = argparse.ArgumentParser("Bop multi evaluation")
    parser.add_argument("--result-id", required=True)
    parser.add_argument("--bop-toolkit-dir", default=None)
    parser.add_argument("--ds-root", default=None)
    parser.add_argument("--serial", action="store_true")
    args = parser.parse_args()

    result_dir = pathlib.Path(RESULTS_DIR) / args.result_id
    assert result_dir.exists(), result_dir
    jobs = []
    for ds_dir in sorted(result_dir.iterdir()):
        if "=" not in ds_dir.name:
            continue
        ds_name = ds_dir.name.split("=")[-1]
        csvs = sorted(ds_dir.glob("*.csv"))
        if not csvs:
            logger.warning(f"no prediction CSV under {ds_dir}")
            continue
        jobs.append((ds_name, csvs[0]))

    if args.serial:
        for ds_name, csv_path in jobs:
            eval_one(ds_name, csv_path, args.bop_toolkit_dir, args.ds_root)
    else:
        ctx = multiprocessing.get_context("spawn")
        procs = [
            ctx.Process(
                target=eval_one,
                args=(ds, csv, args.bop_toolkit_dir, args.ds_root),
            )
            for ds, csv in jobs
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join()

    print("-" * 80)
    for ds_name, csv_path in jobs:
        scores = csv_path.parent / "bop_eval" / "scores_bop19.json"
        print(f"{ds_name}: {scores}")
        if scores.exists():
            print(scores.read_text())


if __name__ == "__main__":
    main()
