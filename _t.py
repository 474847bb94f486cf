import time, sys, numpy as np, jax, jax.numpy as jnp
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

gather = jax.jit(lambda ids: gather_mesh_data(mesh_db, ids, cfg.n_points_crop))
fwd = jax.jit(lambda v, md, im, K, T: pp.forward(v, md, im, K, T, n_iterations=1)["TCO_final"])

def timed(name, f, reps=10):
    o = f(); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(reps): o = f()
    jax.block_until_ready(o)
    print(name, round((time.perf_counter()-t0)/reps*1000,2), "ms", flush=True)

timed("gather-only", lambda: gather(label_ids))
md = gather(label_ids)
timed("fwd-only", lambda: fwd(variables, md, images, K, TCO))
timed("two-jit", lambda: fwd(variables, gather(label_ids), images, K, TCO))

@jax.jit
def fused_barrier(v, ids, im, K, T):
    md = jax.lax.optimization_barrier(gather_mesh_data(mesh_db, ids, cfg.n_points_crop))
    return pp.forward(v, md, im, K, T, n_iterations=1)["TCO_final"]
t0 = time.perf_counter()
o = fused_barrier(variables, label_ids, images, K, TCO); jax.block_until_ready(o)
print("fused_barrier compile+first", round(time.perf_counter()-t0,1), flush=True)
timed("fused-barrier", lambda: fused_barrier(variables, label_ids, images, K, TCO))
