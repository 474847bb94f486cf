"""Precompute aggregate `<view>_all.png` instance masks for a BOP split.

Capability match for the reference's ``cosypose/scripts/preprocess_bop_dataset.py``:
iterating a scene dataset merges the per-object `mask_visib/<view>_<n>.png`
files into one id-coded `<view>_all.png` per view, which the loader then reads
in a single file open (a large training-time IO win on 1M-frame sets).

  python -m cosypose_tpu.scripts.preprocess_bop_dataset --dataset itodd.pbr
"""

from __future__ import annotations

import argparse

import numpy as np
from PIL import Image

from ..data.datasets_cfg import make_scene_dataset
from ..utils.logging import get_logger

logger = get_logger(__name__)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="itodd.pbr")
    parser.add_argument("--ds-root", default=None)
    args = parser.parse_args()

    scene_ds = make_scene_dataset(args.dataset, ds_root=args.ds_root)
    for n in range(len(scene_ds)):
        _, mask, obs = scene_ds[n]
        info = obs["frame_info"]
        scene_dir = scene_ds.split_dir / f"{int(info['scene_id']):06d}"
        out = scene_dir / "mask_visib" / f"{int(info['view_id']):06d}_all.png"
        Image.fromarray(np.asarray(mask).astype(np.uint8)).save(out)
        if n % 1000 == 0:
            logger.info(f"{n}/{len(scene_ds)}")


if __name__ == "__main__":
    main()
