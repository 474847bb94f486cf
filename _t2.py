import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from cosypose_tpu.models import PosePredictor, PosePredictorConfig
from cosypose_tpu.models.pose_predictor import gather_mesh_data
from cosypose_tpu.ops.mesh_db import build_mesh_db
from __graft_entry__ import _demo_specs, _make_inputs

B = 32
cfg = PosePredictorConfig(backbone="efficientnet-b3")
pp = PosePredictor(cfg)
variables = pp.init(jax.random.PRNGKey(0))
mesh_db = build_mesh_db(_demo_specs())
images, K, TCO, label_ids = _make_inputs(B)

# eager gather (python-level dispatch)
md_eager = gather_mesh_data(mesh_db, label_ids, cfg.n_points_crop)
md_np = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), md_eager)

fwd = jax.jit(lambda v, md, im, K, T: pp.forward(v, md, im, K, T, n_iterations=1)["TCO_final"])

def timed(name, f, reps=10):
    o = f(); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(reps): o = f()
    jax.block_until_ready(o)
    print(name, round((time.perf_counter()-t0)/reps*1000,2), "ms", flush=True)

timed("fwd-eager-md", lambda: fwd(variables, md_eager, images, K, TCO))
timed("fwd-np-md", lambda: fwd(variables, md_np, images, K, TCO))

# rasterize alone with both
from cosypose_tpu.ops.rasterizer import rasterize
rast = jax.jit(lambda tv, tva, T, K: rasterize(tv, tva, T, K, image_size=(240,320)).rgb)
timed("rast-eager", lambda: rast(md_eager["tri_verts"], md_eager["tri_valid"], TCO, K))
timed("rast-np", lambda: rast(md_np["tri_verts"], md_np["tri_valid"], TCO, K))
