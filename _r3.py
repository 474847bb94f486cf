import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from cosypose_tpu.models import PosePredictor, PosePredictorConfig
from cosypose_tpu.models.pose_predictor import gather_mesh_data
from cosypose_tpu.ops.mesh_db import build_mesh_db
from __graft_entry__ import _demo_specs, _make_inputs

cfg = PosePredictorConfig(backbone="efficientnet-b3")
pp = PosePredictor(cfg)
variables = pp.init(jax.random.PRNGKey(0))
mesh_db = build_mesh_db(_demo_specs())

def timed(name, f, work, reps=10):
    float(jnp.asarray(f()).sum())
    t0=time.perf_counter()
    outs=[f() for _ in range(reps)]
    for o in outs: jax.block_until_ready(o)
    float(jnp.asarray(outs[-1]).sum())
    dt=(time.perf_counter()-t0)/reps
    print(f"{name}: {dt*1000:.1f} ms/call → {work/dt:.0f} crop-iters/s", flush=True)

for B, n_iter in [(32,1),(64,1),(64,4),(128,4)]:
    images, K, TCO, label_ids = _make_inputs(B)
    md = gather_mesh_data(mesh_db, label_ids, cfg.n_points_crop)
    fwd = jax.jit(lambda v, md, im, K, T, n=n_iter: pp.forward(v, md, im, K, T, n_iterations=n)["TCO_final"])
    timed(f"B={B} iters={n_iter}", lambda: fwd(variables, md, images, K, TCO), B*n_iter)
