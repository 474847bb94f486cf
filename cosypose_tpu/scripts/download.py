"""Dataset/model download helper.

Capability match for the reference's ``cosypose/scripts/download.py`` (rclone/
gdrive/wget fetchers, ref: :56-74). This build environment has no network
egress, so this script documents the expected local layout and verifies what is
present instead of fetching:

    <LOCAL_DATA_DIR>/
      bop_datasets/<ds>/{models,models_eval,test,train_pbr,...}   (BOP zips)
      synt_datasets/<name>/train_synt/...                (run_dataset_recording)
      experiments/<run_id>/{config.yaml,checkpoint,log.txt}       (training)
      results/...                                                 (evaluation)

BOP datasets: https://bop.felk.cvut.cz/datasets/ (download manually or via the
official bop_toolkit; unzip under bop_datasets/<ds>/).
"""

from __future__ import annotations

import argparse

from ..config import EXP_DIR, LOCAL_DATA_DIR, RESULTS_DIR
from ..utils.logging import get_logger

logger = get_logger(__name__)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--check", default=None,
                        help="dataset name to verify, e.g. ycbv")
    args = parser.parse_args()

    logger.info(f"LOCAL_DATA_DIR = {LOCAL_DATA_DIR}")
    logger.info(f"EXP_DIR        = {EXP_DIR}")
    logger.info(f"RESULTS_DIR    = {RESULTS_DIR}")

    bop_root = LOCAL_DATA_DIR / "bop_datasets"
    if bop_root.exists():
        for d in sorted(bop_root.iterdir()):
            if d.is_dir():
                has_models = (d / "models").exists()
                splits = [s.name for s in d.iterdir()
                          if s.is_dir() and s.name != "models"]
                logger.info(f"  {d.name}: models={has_models} splits={splits}")
    else:
        logger.info("no bop_datasets directory yet — see this script's "
                     "docstring for the expected layout")

    if args.check:
        ds_dir = bop_root / args.check
        ok = (ds_dir / "models" / "models_info.json").exists()
        logger.info(f"{args.check}: {'OK' if ok else 'MISSING models_info.json'}")


if __name__ == "__main__":
    main()
