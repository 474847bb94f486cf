"""Dataset/model/asset download helper.

Capability match for the reference's ``cosypose/scripts/download.py``
(ref: :56-150 fetcher matrix): the same argument surface fetches BOP dataset
zips over HTTP, plus the project's auxiliary assets (texture datasets, synt
datasets, saved detections, result archives, URDF packs, trained models). The
reference pulls auxiliary assets from its gdrive/rclone remote; gdrive has no
stable anonymous HTTP endpoint, so those fetchers require --mirror-url
pointing at a mirror of the `zip_files/` tree (any static HTTP host). BOP
zips come from the official public server.

Without network egress (this build image), every requested item is resolved
to its target path and reported, so the script doubles as a layout checker:

    <LOCAL_DATA_DIR>/
      bop_datasets/<ds>/{models,models_eval,test,train_pbr,...}
      texture_datasets/ | synt_datasets/ | saved_detections/
      experiments/<run_id>/   results/<result_id>/   urdfs/
"""

from __future__ import annotations

import argparse
import pathlib
import urllib.error
import urllib.request
import zipfile

from ..config import LOCAL_DATA_DIR
from ..utils.logging import get_logger

logger = get_logger(__name__)

DOWNLOAD_DIR = LOCAL_DATA_DIR / "downloads"

BOP_SRC = "https://bop.felk.cvut.cz/media/data/bop_datasets/"
BOP_DS_NAMES = ("lm", "lmo", "tless", "tudl", "icbin", "itodd", "hb", "ycbv")

BOP_DATASETS = {
    name: dict(splits=["train_pbr", "test_all", "base", "models"])
    for name in BOP_DS_NAMES
}
BOP_DATASETS["tless"]["splits"] = [
    "train_pbr", "test_primesense_all", "base", "models"
]
BOP_DATASETS["hb"]["splits"] = ["train_pbr", "test_primesense_all", "base",
                                "models"]


def wget_download_and_extract(url, out_dir, tmp_dir=None):
    tmp_dir = pathlib.Path(tmp_dir or DOWNLOAD_DIR)
    tmp_dir.mkdir(parents=True, exist_ok=True)
    tmp_path = tmp_dir / url.split("/")[-1]
    logger.info(f"fetch {url} -> {tmp_path}")
    try:
        urllib.request.urlretrieve(url, tmp_path)
    except (urllib.error.URLError, OSError) as e:
        logger.warning(
            f"no network egress ({e}); download manually:\n"
            f"  {url}\nand extract into {out_dir}"
        )
        return False
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    zipfile.ZipFile(tmp_path).extractall(out_dir)
    logger.info(f"extracted into {out_dir}")
    return True


def download_bop_original(ds_name, download_pbr=True):
    """Official BOP server zips (ref: download.py:168-177)."""
    suffixes = ["base", "models"]
    if download_pbr:
        suffixes.append("train_pbr")
    suffixes += [s for s in BOP_DATASETS[ds_name]["splits"]
                 if s.startswith("test")]
    out = LOCAL_DATA_DIR / "bop_datasets" / ds_name
    for suffix in dict.fromkeys(suffixes):
        wget_download_and_extract(
            f"{BOP_SRC}{ds_name}_{suffix}.zip", out
        )


def mirror_download(mirror_url, rel_zip, out_dir):
    """Auxiliary assets from a mirror of the project's zip_files tree
    (the reference pulls these via gdrive/rclone, ref: download.py:152-166)."""
    if not mirror_url:
        logger.warning(
            f"no --mirror-url given; place the contents of {rel_zip} "
            f"under {out_dir} manually"
        )
        return False
    return wget_download_and_extract(
        mirror_url.rstrip("/") + "/" + rel_zip, out_dir
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--bop_dataset", default="", choices=("",) + BOP_DS_NAMES)
    parser.add_argument("--bop_src", default="bop", choices=["bop", "mirror"])
    parser.add_argument("--bop_extra_files", default="",
                        choices=["", "ycbv", "tless"])
    parser.add_argument("--model", default="", help="trained run id to fetch")
    parser.add_argument("--urdf_models", default="")
    parser.add_argument("--ycbv_compat_models", action="store_true")
    parser.add_argument("--texture_dataset", action="store_true")
    parser.add_argument("--result_id", default="")
    parser.add_argument("--bop_result_id", default="")
    parser.add_argument("--synt_dataset", default="")
    parser.add_argument("--detections", default="")
    parser.add_argument("--example_scenario", action="store_true")
    parser.add_argument("--pbr_training_images",
                        action=argparse.BooleanOptionalAction, default=True,
                        help="--no-pbr_training_images skips the multi-GB "
                             "train_pbr zip")
    parser.add_argument("--all_bop20_results", action="store_true")
    parser.add_argument("--all_bop20_models", action="store_true")
    parser.add_argument("--mirror-url", default="",
                        help="HTTP mirror of the project's zip_files tree")
    parser.add_argument("--check", default="",
                        help="dataset name to verify, e.g. ycbv")
    args = parser.parse_args()

    mirror = args.mirror_url

    if args.bop_dataset:
        if args.bop_src == "bop":
            download_bop_original(args.bop_dataset, args.pbr_training_images)
        else:
            mirror_download(mirror, f"bop_datasets/{args.bop_dataset}.zip",
                            LOCAL_DATA_DIR / "bop_datasets")

    if args.bop_extra_files == "tless":
        # detections + target list for the paper T-LESS eval
        mirror_download(mirror, "zip_files/tless_extras.zip", LOCAL_DATA_DIR)
    elif args.bop_extra_files == "ycbv":
        # compat models, offsets, keyframes, PoseCNN detections
        mirror_download(mirror, "zip_files/ycbv_extras.zip", LOCAL_DATA_DIR)

    if args.texture_dataset:
        mirror_download(mirror, "zip_files/textures.zip",
                        LOCAL_DATA_DIR / "texture_datasets")

    if args.synt_dataset:
        mirror_download(mirror, f"zip_files/{args.synt_dataset}.zip",
                        LOCAL_DATA_DIR / "synt_datasets")

    if args.detections:
        mirror_download(mirror, f"saved_detections/{args.detections}.pkl",
                        LOCAL_DATA_DIR / "saved_detections")

    if args.model or args.all_bop20_models:
        models = [args.model] if args.model else ["all_bop20_models"]
        for m in models:
            mirror_download(mirror, f"experiments/{m}.zip",
                            LOCAL_DATA_DIR / "experiments")

    if args.urdf_models:
        mirror_download(mirror, f"urdfs/{args.urdf_models}.zip",
                        LOCAL_DATA_DIR / "urdfs")

    if args.ycbv_compat_models:
        mirror_download(mirror, "zip_files/ycbv_compat_models.zip",
                        LOCAL_DATA_DIR / "bop_datasets/ycbv")

    if args.result_id or args.bop_result_id or args.all_bop20_results:
        rid = args.result_id or args.bop_result_id or "all_bop20_results"
        mirror_download(mirror, f"results/{rid}.zip",
                        LOCAL_DATA_DIR / "results")

    if args.example_scenario:
        mirror_download(mirror, "zip_files/custom_scenario.zip",
                        LOCAL_DATA_DIR / "custom_scenarios" / "example")

    bop_root = LOCAL_DATA_DIR / "bop_datasets"
    if args.check:
        ds_dir = bop_root / args.check
        ok = (ds_dir / "models" / "models_info.json").exists()
        logger.info(
            f"{args.check}: {'OK' if ok else 'MISSING models_info.json'}"
        )
    elif bop_root.exists():
        for d in sorted(bop_root.iterdir()):
            if d.is_dir():
                splits = [s.name for s in d.iterdir() if s.is_dir()]
                logger.info(f"  {d.name}: {splits}")


if __name__ == "__main__":
    main()
