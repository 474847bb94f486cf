"""Detector training CLI.

Capability match for the reference's ``cosypose/scripts/run_detector_training.py``:
``python -m cosypose_tpu.scripts.run_detector_training --config bop-ycbv-pbr
[--debug]``.
"""

from __future__ import annotations

import argparse
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from ..bop_config import BOP_CONFIG
from ..config import EXP_DIR
from ..data.datasets_cfg import make_object_dataset, make_scene_dataset
from ..data.detection_dataset import DetectionDataset
from ..data.wrappers import PartialSampler
from ..models.detector import DetectorConfig
from ..training.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    restore_into_state,
    save_checkpoint,
    save_config,
)
from ..training.detector_training import (
    DetectorTrainConfig,
    create_detector_train_state,
    make_detector_train_step,
)
from ..training.logs import MetricsAccumulator, RunLogger
from ..training.train_pose import PrefetchLoader
from ..utils.logging import get_logger

logger = get_logger(__name__)


def _load_pretrain_params(state, run_id, exp_dir=None):
    """Init matching param subtrees from another run's checkpoint.

    The capability match for the reference's COCO-pretrained init, which
    loads the pretrained state_dict minus the class-count-dependent heads
    (ref: training/train_detector.py:198-203): every leaf whose path AND
    shape match is copied; heads with different shapes keep their fresh init.
    """
    from ..training.checkpoint import latest_checkpoint, load_checkpoint

    ckpt = latest_checkpoint(pathlib.Path(exp_dir or EXP_DIR) / run_id)
    assert ckpt is not None, f"no checkpoint for pretrain run {run_id}"
    payload = load_checkpoint(ckpt)

    import jax.tree_util as jtu

    src = {jtu.keystr(p): v for p, v in
           jtu.tree_flatten_with_path(payload["params"])[0]}
    n_loaded = 0

    def merge(path, v):
        nonlocal n_loaded
        key = jtu.keystr(path)
        sv = src.get(key)
        if sv is not None and np.shape(sv) == np.shape(v):
            n_loaded += 1
            return jnp.asarray(sv)
        return v

    params = jtu.tree_map_with_path(merge, state.params)
    logger.info(f"pretrain {run_id}: loaded {n_loaded} matching param leaves")
    return state.replace(params=params)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True,
                        help="e.g. detector-bop-ycbv-pbr, detector-procedural")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--ds-root", default=None)
    parser.add_argument("--pretrain-run-id", default=None,
                        help="init backbone/neck from this run's checkpoint "
                             "(shape-matching leaves only)")
    parser.add_argument("--n-epochs", type=int, default=None)
    parser.add_argument("--mask-pos-weight", type=float, default=None,
                        help="foreground BCE weight for the instance-mask "
                             "loss (see DetectorTrainConfig.mask_pos_weight)")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the run's latest checkpoint "
                             "(full state incl. optimizer, as in pose "
                             "training — ref train_detector.py has the "
                             "same --resume contract)")
    args = parser.parse_args()

    if args.config.startswith("detector-procedural"):
        # data-free end-to-end config over the recorded procedural set;
        # detector-procedural-all trains over every recorded tier (4k piles
        # + canon piles + solo) with a longer schedule
        from ..data.procedural_objects import ProceduralObjectDataset
        from ..data.wrappers import ConcatSceneDataset

        obj_ds = ProceduralObjectDataset()
        label_to_cat = {l: i for i, l in enumerate(obj_ds.labels)}
        h, w = 240, 320
        use_all = args.config.startswith("detector-procedural-all")
        # -all2: every tier incl. the sine-textured texsolo recording, the
        # exclusive softmax classifier (DetectorConfig.cls_mode — the r4
        # percls ranking analysis), and 32 mask prototypes (the queued r4
        # mask-quality lever)
        v2 = args.config == "detector-procedural-all2"
        tcfg = DetectorTrainConfig(
            detector=DetectorConfig(
                n_classes=len(label_to_cat),
                cls_mode="softmax" if v2 else "percls",
                n_mask_protos=32 if v2 else 16,
            ),
            batch_size=4 if args.debug else 16,
            epoch_size=32 if args.debug else 3200,
            n_epochs=2 if args.debug else (args.n_epochs or (90 if use_all
                                                             else 30)),
            n_epochs_warmup=1,
            lr_epoch_decay=40 if use_all else 100,
            mask_pos_weight=2.0 if v2 else 1.0,
        )
        names = (["synthetic.procedural-4k.train",
                  "synthetic.procedural-canon.train",
                  "synthetic.procedural-solo.train"] if use_all
                 else ["synthetic.procedural-4k.train"])
        if v2:
            names.append("synthetic.procedural-texsolo.train")
        sets = [make_scene_dataset(n, ds_root=args.ds_root) for n in names]
        scene_ds = sets[0] if len(sets) == 1 else ConcatSceneDataset(sets)
        det_ds = DetectionDataset(scene_ds, label_to_cat, resize=(h, w))
    else:
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
            n_epochs=2 if args.debug else (args.n_epochs or 200),
        )
        split = (bop["train_pbr_ds_name"][0] if data == "pbr"
                 else bop["train_synt_real_ds_names"][0][0])
        scene_ds = make_scene_dataset(split, ds_root=args.ds_root)
        det_ds = DetectionDataset(scene_ds, label_to_cat, resize=(h, w))

    # debug smoke runs get their own run dir — writing into the real run's
    # dir would prune its trained checkpoints (save_checkpoint keeps last 2)
    if args.mask_pos_weight is not None:
        import dataclasses

        tcfg = dataclasses.replace(tcfg, mask_pos_weight=args.mask_pos_weight)

    run_name = f"{args.config}-debug" if args.debug else args.config
    run_dir = pathlib.Path(EXP_DIR) / run_name
    run_dir.mkdir(parents=True, exist_ok=True)
    save_config(run_dir, tcfg)
    run_logger = RunLogger(run_dir)

    model, state = create_detector_train_state(
        tcfg, jax.random.PRNGKey(0), image_size=(h, w)
    )
    if args.pretrain_run_id:
        state = _load_pretrain_params(state, args.pretrain_run_id)
    start_epoch = 0
    if args.resume:
        ckpt = latest_checkpoint(run_dir)
        if ckpt is not None:
            payload = load_checkpoint(ckpt)
            state = restore_into_state(state, payload)
            start_epoch = int(payload["epoch"]) + 1
            logger.info(f"Resumed from {ckpt} at epoch {start_epoch}")
    step_fn = make_detector_train_step(model, tcfg)

    rng = jax.random.PRNGKey(1)
    for epoch in range(start_epoch, tcfg.n_epochs):
        sampler = PartialSampler(det_ds, tcfg.epoch_size, seed=epoch)
        loader = PrefetchLoader(det_ds, sampler, tcfg.batch_size,
                                DetectionDataset.collate_fn, n_workers=8)
        acc = MetricsAccumulator()
        for batch in loader:
            rng, step_rng = jax.random.split(rng)
            batch["images"] = batch.pop("image")  # uint8; converted on device
            state, metrics = step_fn(state, batch, step_rng)
            acc.add(metrics)
        record = run_logger.append(epoch, acc.means())
        logger.info(f"epoch {epoch}: {record}")
        save_checkpoint(run_dir, state, epoch)


if __name__ == "__main__":
    main()
