"""Pose training CLI.

Capability match for the reference's ``cosypose/scripts/run_pose_training.py``:
``python -m cosypose_tpu.scripts.run_pose_training --config tless-coarse
[--debug] [--resume RUN_ID]``. Named configs resolve hyperparameters
(training/configs.py); datasets come from the registry (local BOP data
required), the mesh database is built from the config's object dataset.
"""

from __future__ import annotations

import argparse

from ..data.datasets_cfg import make_object_dataset, make_scene_dataset
from ..data.pose_dataset import PoseDataset
from ..ops.mesh_db import build_mesh_db
from ..training.configs import make_cfg
from ..training.train_pose import train_pose
from ..utils.logging import get_logger

logger = get_logger(__name__)


def main():
    import jax

    # persistent compile cache: the B3 train step costs minutes to compile
    # through the TPU tunnel; restarts/resumes should not pay it again
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/cosypose_tpu_train_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True,
                        help="e.g. tless-coarse, bop-ycbv-pbr-refiner")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--pretrain-run-id", default=None)
    parser.add_argument("--ds-root", default=None)
    parser.add_argument("--no-eval-bundle", action="store_true",
                        help="skip the default in-training eval bundle")
    parser.add_argument("--n-epochs", type=int, default=None,
                        help="override the config's epoch budget (shorter "
                             "regression-artifact trainings; the run dir "
                             "records the override in config.yaml)")
    args = parser.parse_args()

    cfg = make_cfg(args.config, debug=args.debug)
    if args.n_epochs is not None:
        import dataclasses

        cfg.train = dataclasses.replace(cfg.train, n_epochs=args.n_epochs)

    obj_ds = make_object_dataset(cfg.object_ds_name, ds_root=args.ds_root)
    mesh_db = build_mesh_db(obj_ds.mesh_specs())

    resize = tuple(getattr(cfg, "input_resize", (480, 640)))
    train_sets = []
    for ds_name, repeat in cfg.train_ds_names:
        scene_ds = make_scene_dataset(ds_name, ds_root=args.ds_root)
        train_sets.append(
            (PoseDataset(
                scene_ds, resize=resize,
                # with device-side jitter (train.rgb_aug_device) the host
                # Pillow chain stays off — ops/image_aug.py runs it in-step
                apply_rgb_augmentation=(
                    getattr(cfg, "rgb_augmentation", True)
                    and not cfg.train.rgb_aug_device
                ),
            ), repeat)
        )
    val_sets = []
    val_scene_ds = None
    for ds_name, repeat in getattr(cfg, "val_ds_names", ()):
        scene_ds = make_scene_dataset(ds_name, ds_root=args.ds_root)
        if val_scene_ds is None:
            val_scene_ds = scene_ds
        val_sets.append((PoseDataset(scene_ds, resize=resize,
                                     apply_rgb_augmentation=False), repeat))

    # default in-training eval bundle over the first val dataset
    # (ref: training/train_pose.py:76-185 make_eval_bundle/run_eval)
    eval_callback = None
    if val_scene_ds is not None and not args.no_eval_bundle:
        from ..evaluation.eval_bundle import make_eval_bundle
        from ..models.pose_predictor import PosePredictor

        pp = PosePredictor(cfg.train.predictor)
        eval_callback = make_eval_bundle(cfg, pp, mesh_db, val_scene_ds)

    train_pose(
        cfg,
        scene_datasets={"train": train_sets, "val": val_sets},
        mesh_db=mesh_db,
        resume=args.resume,
        pretrain_run_id=args.pretrain_run_id,
        eval_callback=eval_callback,
    )


if __name__ == "__main__":
    main()
