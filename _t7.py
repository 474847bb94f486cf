import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from cosypose_tpu.models import PosePredictor, PosePredictorConfig
from cosypose_tpu.models.pose_predictor import gather_mesh_data
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.ops.rasterizer import rasterize
from __graft_entry__ import _demo_specs, _make_inputs

B = 32
mesh_db = build_mesh_db(_demo_specs())
images, K, TCO, label_ids = _make_inputs(B)
md = gather_mesh_data(mesh_db, label_ids, 2000)

def timed(name, f, reps=20):
    float(jnp.asarray(f()).sum())  # warm
    t0=time.perf_counter()
    outs = [f() for _ in range(reps)]
    s = float(jnp.asarray(outs[-1]).sum())  # one readback; queue drains
    for o in outs: jax.block_until_ready(o)
    dt = time.perf_counter()-t0
    print(name, round(dt/reps*1000,2), "ms/call (amortized)", flush=True)

# readback latency floor
zero = jax.jit(lambda x: x * 2.0)
xsmall = jnp.zeros((4,))
t0=time.perf_counter()
for _ in range(20): float(jnp.asarray(zero(xsmall)).sum())
print("readback-floor", round((time.perf_counter()-t0)/20*1000,2), "ms", flush=True)

timed("rasterize", lambda: rasterize(md["tri_verts"], md["tri_valid"], TCO, K, image_size=(240,320), colors=md["tri_colors"]).rgb)
cfg = PosePredictorConfig(backbone="efficientnet-b3")
pp = PosePredictor(cfg); v = pp.init(jax.random.PRNGKey(0))
fwd = jax.jit(lambda v, md, im, K, T: pp.forward(v, md, im, K, T, n_iterations=1)["TCO_final"])
timed("fwd-full-fp32", lambda: fwd(v, md, images, K, TCO))
cfg16 = PosePredictorConfig(backbone="efficientnet-b3", compute_dtype=jnp.bfloat16)
pp16 = PosePredictor(cfg16); v16 = pp16.init(jax.random.PRNGKey(0))
fwd16 = jax.jit(lambda v, md, im, K, T: pp16.forward(v, md, im, K, T, n_iterations=1)["TCO_final"])
timed("fwd-full-bf16", lambda: fwd16(v16, md, images, K, TCO))
