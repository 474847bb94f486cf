"""Diagnostic: can the refiner OVERFIT rotation on a single fixed batch?

Isolates learning dynamics from data/schedule: one batch from the solo tier,
one fixed noise rng (same input poses every step), full-model training. If
loss_orn cannot go below its identity floor here, the rotation pathway is
structurally broken (bug); if it can, the full-data failure is a dynamics /
initialization problem.

Usage: python scripts/diag_rot_overfit.py [--steps 300] [--config NAME]
       [--head-init-scale S] [--cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument(
        "--config", default="procedural-diag-lr0.003-solo-rot-flat-lev0.25-ep8"
    )
    parser.add_argument("--head-init-scale", type=float, default=None)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--log-every", type=int, default=20)
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/cosypose_tpu_train_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from cosypose_tpu.data.datasets_cfg import make_object_dataset, make_scene_dataset
    from cosypose_tpu.data.pose_dataset import PoseDataset
    from cosypose_tpu.ops.mesh_db import build_mesh_db
    from cosypose_tpu.training.configs import make_cfg
    from cosypose_tpu.training.pose_training import (
        create_train_state, make_train_step,
    )

    cfg = make_cfg(args.config)
    tcfg = cfg.train
    tcfg = dataclasses.replace(tcfg, n_epochs_warmup=0)  # full lr from step 0
    if args.head_init_scale is not None:
        tcfg = dataclasses.replace(
            tcfg,
            predictor=dataclasses.replace(
                tcfg.predictor, head_init_scale=args.head_init_scale
            ),
        )

    obj_ds = make_object_dataset(cfg.object_ds_name)
    mesh_db = build_mesh_db(obj_ds.mesh_specs())
    scene_ds = make_scene_dataset(cfg.train_ds_names[0][0])
    pose_ds = PoseDataset(
        scene_ds, resize=tuple(cfg.input_resize), apply_rgb_augmentation=False
    )

    items = [pose_ds[i] for i in range(args.batch)]
    batch = PoseDataset.collate_fn(items)
    device_batch = dict(
        images=batch.images,
        K=batch.K,
        TCO=batch.TCO,
        bboxes=batch.bboxes,
        label_ids=np.asarray(mesh_db.ids_for(batch.labels), np.int32),
    )

    pp, state = create_train_state(tcfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(pp, tcfg, mesh_db)
    step_rng = jax.random.PRNGKey(42)  # FIXED: same noise every step

    print(f"config={args.config} head_init_scale={args.head_init_scale} "
          f"batch={args.batch} steps={args.steps}")
    t0 = time.time()
    for step in range(args.steps):
        state, metrics = step_fn(state, device_batch, step_rng)
        if step % args.log_every == 0 or step == args.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            print(
                f"step {step:4d} t={time.time()-t0:6.1f}s "
                f"loss={m['loss_total']:.5f} orn={m.get('loss_orn', 0):.5f} "
                f"xy={m.get('loss_xy', 0):.5f} z={m.get('loss_z', 0):.5f} "
                f"aux={m.get('loss_aux', 0):.5f} grad={m['grad_norm']:.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
