"""Detector training CLI.

Capability match for the reference's ``cosypose/scripts/run_detector_training.py``:
``python -m cosypose_tpu.scripts.run_detector_training --config bop-ycbv-pbr
[--debug]``.
"""

from __future__ import annotations

import argparse
import pathlib

import jax
import numpy as np

from ..bop_config import BOP_CONFIG
from ..config import EXP_DIR
from ..data.datasets_cfg import make_object_dataset, make_scene_dataset
from ..data.detection_dataset import DetectionDataset
from ..data.wrappers import PartialSampler
from ..models.detector import DetectorConfig
from ..training.checkpoint import save_checkpoint, save_config
from ..training.detector_training import (
    DetectorTrainConfig,
    create_detector_train_state,
    make_detector_train_step,
)
from ..training.logs import MetricsAccumulator, RunLogger
from ..training.train_pose import PrefetchLoader
from ..utils.logging import get_logger

logger = get_logger(__name__)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True,
                        help="e.g. detector-bop-ycbv-pbr")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--ds-root", default=None)
    args = parser.parse_args()

    # config name: detector-bop-<ds>-{pbr|synt+real}
    parts = args.config.split("-")
    ds = parts[2]
    data = parts[3]
    bop = BOP_CONFIG[ds]
    obj_ds = make_object_dataset(bop["obj_ds_name"], ds_root=args.ds_root)
    label_to_cat = {o["label"]: i for i, o in enumerate(obj_ds.objects)}

    h, w = bop["input_resize"][1], bop["input_resize"][0]
    tcfg = DetectorTrainConfig(
        detector=DetectorConfig(n_classes=len(label_to_cat)),
        batch_size=4 if args.debug else 16,
        epoch_size=32 if args.debug else 115200,
        n_epochs=2 if args.debug else 200,
    )
    split = (bop["train_pbr_ds_name"][0] if data == "pbr"
             else bop["train_synt_real_ds_names"][0][0])
    scene_ds = make_scene_dataset(split, ds_root=args.ds_root)
    det_ds = DetectionDataset(scene_ds, label_to_cat, resize=(h, w))

    run_dir = pathlib.Path(EXP_DIR) / args.config
    run_dir.mkdir(parents=True, exist_ok=True)
    save_config(run_dir, tcfg)
    run_logger = RunLogger(run_dir)

    model, state = create_detector_train_state(
        tcfg, jax.random.PRNGKey(0), image_size=(h, w)
    )
    step_fn = make_detector_train_step(model, tcfg)

    rng = jax.random.PRNGKey(1)
    for epoch in range(tcfg.n_epochs):
        sampler = PartialSampler(det_ds, tcfg.epoch_size, seed=epoch)
        loader = PrefetchLoader(det_ds, sampler, tcfg.batch_size,
                                DetectionDataset.collate_fn, n_workers=8)
        acc = MetricsAccumulator()
        for batch in loader:
            rng, step_rng = jax.random.split(rng)
            batch["images"] = batch.pop("image").astype(np.float32) / 255.0
            state, metrics = step_fn(state, batch, step_rng)
            acc.add({k: float(v) for k, v in metrics.items()})
        record = run_logger.append(epoch, acc.means())
        logger.info(f"epoch {epoch}: {record}")
        save_checkpoint(run_dir, state, epoch)


if __name__ == "__main__":
    main()
