import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from cosypose_tpu.models import PosePredictor, PosePredictorConfig
from cosypose_tpu.models.pose_predictor import gather_mesh_data
from cosypose_tpu.ops.mesh_db import build_mesh_db
from __graft_entry__ import _demo_specs, _make_inputs

B = 64
mesh_db = build_mesh_db(_demo_specs())
images, K, TCO, label_ids = _make_inputs(B)
md = gather_mesh_data(mesh_db, label_ids, 2000)

def timed(name, f, work, reps=8):
    float(jnp.asarray(f()).sum())
    t0=time.perf_counter()
    outs=[f() for _ in range(reps)]
    for o in outs: jax.block_until_ready(o)
    float(jnp.asarray(outs[-1]).sum())
    dt=(time.perf_counter()-t0)/reps
    print(f"{name}: {dt*1000:.1f} ms/call → {work/dt:.0f} crop-iters/s", flush=True)

for dtype, name in [(jnp.float32, "fp32"), (jnp.bfloat16, "bf16")]:
    cfg = PosePredictorConfig(backbone="efficientnet-b3", compute_dtype=dtype)
    pp = PosePredictor(cfg); v = pp.init(jax.random.PRNGKey(0))
    fwd = jax.jit(lambda v, md, im, K, T: pp.forward(v, md, im, K, T, n_iterations=4)["TCO_final"])
    timed(f"fwd B=64 iters=4 {name}", lambda: fwd(v, md, images, K, TCO), B*4)
