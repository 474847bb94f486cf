"""Multi-chip DP scaling measurement on the virtual device mesh.

The reference trains with 32-GPU DDP (ref: README.md:332-336,
cosypose/utils/distributed.py:55-69); the rebuild's equivalent is a 1-D
'data' mesh with the batch sharded over devices and XLA inserting the
gradient all-reduce over ICI (training/pose_training.py:make_train_step).

Real multi-chip hardware is not attached here, so this benchmark measures
what CAN be measured without it, and models the rest:

* measured: per-step wall time of the full pjit'd train step at
  n_devices ∈ {1,2,4,8} on a virtual CPU mesh with a FIXED GLOBAL BATCH.
  The host has one physical core, so virtual devices add no silicon —
  ideal behaviour is a FLAT step time (each device runs 1/n of the batch,
  serialized), and any rise over n=1 is pure partitioning/collective
  overhead added by the sharded program. This bounds the non-ICI cost of
  the DP sharding.
* modeled: the gradient all-reduce cost on real v5e ICI from the measured
  gradient pytree size — ring all-reduce moves 2·G·(n-1)/n bytes per chip
  per step; at the v5e's ~1600 Gbps (~200 GB/s aggregate, ~100 GB/s
  effective one-direction) per-chip ICI that is the t_comm against which
  the measured single-chip step time (BENCH_r*.json) amortizes.

Each device count runs in a fresh subprocess (jax_num_cpu_devices cannot
change after backend init).

  python -m cosypose_tpu.scripts.bench_scaling [--devices 1 2 4 8]
      [--batch 32] [--steps 8] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

# effective one-direction per-chip ICI bandwidth used for the analytic
# all-reduce model (v5e: 1600 Gbps aggregate interchip interconnect)
V5E_ICI_GBPS = 100.0


def _run_single(n_devices: int, batch: int, steps: int) -> dict:
    """Child: measure the sharded train step at one device count."""
    import jax

    from __graft_entry__ import _force_cpu_platform, _make_inputs, _sphere_mesh

    _force_cpu_platform(n_devices)
    jax.config.update("jax_enable_compilation_cache", False)

    import jax.numpy as jnp

    from cosypose_tpu.models import PosePredictorConfig
    from cosypose_tpu.ops.mesh_db import MeshSpec, build_mesh_db
    from cosypose_tpu.parallel import make_mesh, shard_batch
    from cosypose_tpu.training import (PoseTrainConfig, create_train_state,
                                       make_train_step)

    verts, faces = _sphere_mesh(n_theta=8, n_phi=12)
    # two objects: _make_inputs draws label_ids in {0, 1}
    specs = [
        MeshSpec(label="obj_000001", vertices=verts * 1000.0, faces=faces),
        MeshSpec(label="obj_000002", vertices=verts * 1500.0, faces=faces),
    ]

    mesh = make_mesh(n_devices)
    cfg = PoseTrainConfig(
        predictor=PosePredictorConfig(
            backbone="wide-resnet18",
            render_size=(32, 32),
            n_points_crop=32,
            raster_tile=(8, 32),
            raster_max_tris_per_tile=32,
            remat=False,
        ),
        n_iterations=1,
        n_points_loss=32,
        batch_size=batch,
        epoch_size=batch * steps,
        input_generator="gt+noise",
    )
    pp, state = create_train_state(cfg, jax.random.PRNGKey(0))
    mesh_db = build_mesh_db(specs)
    step_fn = make_train_step(pp, cfg, mesh_db, mesh=mesh)

    images, K, TCO, label_ids = _make_inputs(batch, H=64, W=64)
    K = K.at[:, 0, 2].set(32.0)
    K = K.at[:, 1, 2].set(32.0)
    bboxes = jnp.tile(jnp.asarray([20.0, 15.0, 45.0, 40.0]), (batch, 1))
    host_batch = dict(images=images, K=K, TCO=TCO, bboxes=bboxes,
                      label_ids=label_ids)
    dev_batch = shard_batch(mesh, host_batch)

    grad_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(state.params)
    )

    rng = jax.random.PRNGKey(1)
    # warm-up (compile) + 2 steady steps discarded
    for _ in range(3):
        state, metrics = step_fn(state, dev_batch, rng)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, dev_batch, rng)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / steps

    print(json.dumps(dict(
        n_devices=n_devices, batch=batch, step_ms=dt * 1e3,
        grad_bytes=grad_bytes, loss=float(metrics["loss_total"]),
    )))
    return {}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--json", default=None)
    parser.add_argument("--single", type=int, default=None,
                        help="internal: child mode for one device count")
    args = parser.parse_args(argv)

    if args.single is not None:
        _run_single(args.single, args.batch, args.steps)
        return None

    rows = []
    for n in args.devices:
        proc = subprocess.run(
            [sys.executable, "-m", "cosypose_tpu.scripts.bench_scaling",
             "--single", str(n), "--batch", str(args.batch),
             "--steps", str(args.steps)],
            capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"n={n} FAILED:\n{proc.stdout}\n{proc.stderr[-2000:]}",
                  file=sys.stderr)
            continue
        rows.append(json.loads(line[-1]))
        print(f"measured n={n}: {rows[-1]['step_ms']:.1f} ms/step")

    if not rows:
        raise SystemExit("no measurements")

    base = rows[0]["step_ms"]
    bw = V5E_ICI_GBPS * 1e9
    print(f"\nDP scaling, fixed global batch B={args.batch}, "
          f"virtual CPU mesh on {1} physical core "
          f"(ideal = flat step time; rise = partitioning overhead)")
    print(f"{'devices':>8s} {'step ms':>9s} {'overhead vs n=1':>16s} "
          f"{'modeled v5e all-reduce ms':>26s}")
    for r in rows:
        n = r["n_devices"]
        ar_ms = (2 * r["grad_bytes"] * (n - 1) / max(n, 1)) / bw * 1e3
        r["overhead_vs_1"] = r["step_ms"] / base
        r["modeled_ici_allreduce_ms"] = ar_ms
        print(f"{n:8d} {r['step_ms']:9.1f} {r['overhead_vs_1']:15.2f}x "
              f"{ar_ms:26.3f}")
    gb = rows[0]["grad_bytes"] / 1e6
    print(f"\ngrad pytree: {gb:.1f} MB -> ring all-reduce moves "
          f"2G(n-1)/n per chip per step over ICI "
          f"(@{V5E_ICI_GBPS:.0f} GB/s effective)")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(dict(batch=args.batch, rows=rows,
                           ici_gbps=V5E_ICI_GBPS), f, indent=2)
    return rows


if __name__ == "__main__":
    main()
