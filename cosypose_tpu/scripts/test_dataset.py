"""Smoke script: iterate a PoseDataset to test loading + augmentation throughput.

Capability match for the reference's ``cosypose/scripts/test_dataset.py`` (:1-33).

  python -m cosypose_tpu.scripts.test_dataset --dataset ycbv.train.pbr
"""

from __future__ import annotations

import argparse
import time

from ..data.datasets_cfg import make_scene_dataset
from ..data.pose_dataset import PoseDataset
from ..utils.logging import get_logger

logger = get_logger(__name__)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--n-frames", type=int, default=50)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--ds-root", default=None)
    args = parser.parse_args()

    scene_ds = make_scene_dataset(args.dataset, ds_root=args.ds_root)
    pose_ds = PoseDataset(scene_ds)
    t0 = time.perf_counter()
    n = 0
    for start in range(0, min(args.n_frames, len(pose_ds)), args.batch_size):
        ids = list(range(start, min(start + args.batch_size, len(pose_ds))))
        batch = pose_ds.make_batch(ids)
        assert batch.images.shape[0] == len(ids)
        n += len(ids)
    dt = time.perf_counter() - t0
    logger.info(f"{n} frames in {dt:.2f}s → {n / dt:.1f} frames/s")


if __name__ == "__main__":
    main()
