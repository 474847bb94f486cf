import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from cosypose_tpu.models.pose_predictor import gather_mesh_data
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.ops.rasterizer import rasterize
from cosypose_tpu.ops.rasterizer_pallas import rasterize_pallas
from __graft_entry__ import _demo_specs, _make_inputs

B = 32
mesh_db = build_mesh_db(_demo_specs())
images, K, TCO, label_ids = _make_inputs(B)
md = gather_mesh_data(mesh_db, label_ids, 2000)

def timed(name, f, reps=20):
    float(jnp.asarray(f()).sum())
    t0=time.perf_counter()
    outs = [f() for _ in range(reps)]
    for o in outs: jax.block_until_ready(o)
    s = float(jnp.asarray(outs[-1]).sum())
    print(name, round((time.perf_counter()-t0)/reps*1000,2), "ms/call", flush=True)

# correctness on real TPU first
ref = rasterize(md["tri_verts"], md["tri_valid"], TCO, K, image_size=(240,320), colors=md["tri_colors"])
pal = rasterize_pallas(md["tri_verts"], md["tri_valid"], TCO, K, image_size=(240,320), colors=md["tri_colors"])
d_err = float(jnp.abs(pal.depth - ref.depth).max())
r_err = float(jnp.abs(pal.rgb - ref.rgb).max())
print("max depth err", d_err, "max rgb err", r_err, flush=True)

timed("xla-raster", lambda: rasterize(md["tri_verts"], md["tri_valid"], TCO, K, image_size=(240,320), colors=md["tri_colors"]).rgb)
timed("pallas-raster", lambda: rasterize_pallas(md["tri_verts"], md["tri_valid"], TCO, K, image_size=(240,320), colors=md["tri_colors"]).rgb)
for tile, kcap in [((8,320),512),((16,320),512),((24,320),1024),((8,320),2208)]:
    timed(f"pallas tile={tile} K={kcap}", lambda tile=tile,kcap=kcap: rasterize_pallas(md["tri_verts"], md["tri_valid"], TCO, K, image_size=(240,320), colors=md["tri_colors"], tile=tile, max_tris_per_tile=kcap).rgb)
