import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from cosypose_tpu.models.pose_predictor import gather_mesh_data
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.ops.rasterizer import rasterize
from cosypose_tpu.ops.rasterizer_pallas import rasterize_pallas
from __graft_entry__ import _demo_specs, _make_inputs

B = 8
mesh_db = build_mesh_db(_demo_specs())
images, K, TCO, label_ids = _make_inputs(B)
md = gather_mesh_data(mesh_db, label_ids, 2000)

ref = rasterize(md["tri_verts"], md["tri_valid"], TCO, K, image_size=(240,320), colors=md["tri_colors"], tile=(24,64), max_tris_per_tile=2208)
pal = rasterize_pallas(md["tri_verts"], md["tri_valid"], TCO, K, image_size=(240,320), colors=md["tri_colors"], tile=(8,320), max_tris_per_tile=2208)
print("full-K: depth err", float(jnp.abs(pal.depth-ref.depth).max()),
      "rgb err", float(jnp.abs(pal.rgb-ref.rgb).max()),
      "mask diff", int((pal.mask != ref.mask).sum()))
refc = rasterize(md["tri_verts"], md["tri_valid"], TCO, K, image_size=(240,320), colors=md["tri_colors"])
print("xla K=128 drops:", int((refc.mask != ref.mask).sum()), "pixels vs full-K")
