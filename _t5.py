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

def timed(name, f, reps=5):
    s = float(jnp.asarray(f()).sum())
    t0=time.perf_counter()
    for _ in range(reps): s = float(jnp.asarray(f()).sum())
    print(name, round((time.perf_counter()-t0)/reps*1000,2), "ms", flush=True)

for tile, kcap in [((24,64),128),((16,32),64),((24,32),64),((48,64),256),((16,64),64),((24,64),64),((12,32),48)]:
    timed(f"rast tile={tile} K={kcap}",
          lambda tile=tile, kcap=kcap: rasterize(md["tri_verts"], md["tri_valid"], TCO, K,
              image_size=(240,320), colors=md["tri_colors"], tile=tile, max_tris_per_tile=kcap).rgb)

# bf16 backbone
cfg16 = PosePredictorConfig(backbone="efficientnet-b3", compute_dtype=jnp.bfloat16)
pp16 = PosePredictor(cfg16)
v16 = pp16.init(jax.random.PRNGKey(0))
x = jnp.zeros((B,240,320,6))
net16 = jax.jit(lambda v,x: pp16.net.apply(v,x,train=False))
timed("backbone_bf16", lambda: net16(v16, x))
fwd16 = jax.jit(lambda v, md, im, K, T: pp16.forward(v, md, im, K, T, n_iterations=1)["TCO_final"])
timed("fwd-full-bf16", lambda: fwd16(v16, md, images, K, TCO), reps=3)
