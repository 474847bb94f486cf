import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from cosypose_tpu.models import PosePredictor, PosePredictorConfig
from cosypose_tpu.models.pose_predictor import gather_mesh_data
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.ops.rasterizer_pallas import rasterize_pallas
from cosypose_tpu.ops.roi_align import roi_align
from __graft_entry__ import _demo_specs, _make_inputs

B = 64
cfg = PosePredictorConfig(backbone="efficientnet-b3")
pp = PosePredictor(cfg)
variables = pp.init(jax.random.PRNGKey(0))
mesh_db = build_mesh_db(_demo_specs())
images, K, TCO, label_ids = _make_inputs(B)
md = gather_mesh_data(mesh_db, label_ids, cfg.n_points_crop)
REPS = 20

def scan_timed(name, step):
    @jax.jit
    def run():
        def body(c, _):
            out = step(c)
            return c + 0 * out.ravel()[0].astype(c.dtype), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return c
    float(run())  # compile
    t0=time.perf_counter(); float(run()); dt=time.perf_counter()-t0
    print(f"{name}: {(dt - 0.04)/REPS*1000:.2f} ms/rep (device)", flush=True)

boxes = jnp.tile(jnp.asarray([100.,100.,400.,340.]),(B,1))
scan_timed("roi_align B=64", lambda c: roi_align(images + c, boxes, output_size=(240,320)))
scan_timed("pallas-raster B=64", lambda c: rasterize_pallas(md["tri_verts"], md["tri_valid"], TCO, K + 0*c, image_size=(240,320), colors=md["tri_colors"]).rgb)
x6 = jnp.zeros((B,240,320,6))
scan_timed("backbone-b3 B=64", lambda c: pp.net.apply(variables, x6 + c, train=False))
cfg16 = PosePredictorConfig(backbone="efficientnet-b3", compute_dtype=jnp.bfloat16)
pp16 = PosePredictor(cfg16); v16 = pp16.init(jax.random.PRNGKey(0))
scan_timed("backbone-b3-bf16 B=64", lambda c: pp16.net.apply(v16, x6 + c, train=False))
scan_timed("full-iter B=64", lambda c: pp.forward(variables, md, images + 0*c, K, TCO, n_iterations=1)["TCO_final"])
