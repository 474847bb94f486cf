"""COLMAP multiview reconstruction baseline.

Capability match for the reference's ``cosypose/scripts/run_colmap_reconstruction.py``:
for every n-view group of the test set, collect the group's images and run
``colmap automatic_reconstructor`` on them (the paper's structure-from-motion
baseline against the RANSAC+BA scene reconstruction). Requires the ``colmap``
binary on PATH; without it, the workspaces are still prepared and the exact
command printed, and existing reconstructions can be inspected via
utils/colmap_io.read_model.

  python -m cosypose_tpu.scripts.run_colmap_reconstruction --dataset tless \
      --nviews 4
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess

import numpy as np

from ..config import LOCAL_DATA_DIR
from ..data.datasets_cfg import make_scene_dataset
from ..data.wrappers import MultiViewWrapper
from ..utils.logging import get_logger

logger = get_logger(__name__)


def main():
    parser = argparse.ArgumentParser("Running COLMAP")
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--nviews", type=int, default=4)
    parser.add_argument("--ds-root", default=None)
    parser.add_argument("--max-groups", type=int, default=None)
    args = parser.parse_args()
    assert args.nviews > 1

    if args.dataset == "tless":
        scene_ds = make_scene_dataset("tless.primesense.test.bop19",
                                      ds_root=args.ds_root)
    elif args.dataset == "ycbv":
        scene_ds = make_scene_dataset("ycbv.test.keyframes",
                                      ds_root=args.ds_root)
    else:
        scene_ds = make_scene_dataset(f"{args.dataset}.test",
                                      ds_root=args.ds_root)
    ds_multi = MultiViewWrapper(scene_ds, n_views=args.nviews)

    colmap_bin = shutil.which("colmap")
    colmap_dir = LOCAL_DATA_DIR / "colmap" / \
        f"{args.dataset}_nviews={args.nviews}"
    colmap_dir.mkdir(exist_ok=True, parents=True)

    groups = ds_multi.frame_index.groupby("group_id")
    for n_done, (group_id, group) in enumerate(groups):
        if args.max_groups is not None and n_done >= args.max_groups:
            break
        view_ids = group["view_ids"].values[0]
        scene_id = np.unique(group["scene_id"]).item()
        views_str = "-".join(map(str, view_ids))
        group_dir = colmap_dir / (
            f"{args.dataset}_groupid={group_id}_scene={scene_id}"
            f"-views={views_str}"
        )
        images_dir = group_dir / "images"
        images_dir.mkdir(exist_ok=True, parents=True)
        for view_id in view_ids:
            src = (scene_ds.split_dir / f"{int(scene_id):06d}" / "rgb"
                   / f"{int(view_id):06d}.png")
            if not src.exists():
                src = src.with_suffix(".jpg")
            try:
                os.symlink(src, images_dir / src.name)
            except FileExistsError:
                pass

        cmd = ["colmap", "automatic_reconstructor",
               "--workspace_path", group_dir.as_posix(),
               "--image_path", images_dir.as_posix()]
        if colmap_bin:
            logger.info(f"{group_dir}")
            subprocess.run(cmd, check=False)
        else:
            logger.info(
                f"prepared {group_dir} (colmap binary not found — run: "
                f"{' '.join(cmd)})"
            )


if __name__ == "__main__":
    main()
