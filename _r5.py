import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from cosypose_tpu.models.pose_predictor import gather_mesh_data
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.ops.rasterizer_pallas import rasterize_pallas
from __graft_entry__ import _demo_specs, _make_inputs

B = 64
mesh_db = build_mesh_db(_demo_specs())
images, K, TCO, label_ids = _make_inputs(B)
md = gather_mesh_data(mesh_db, label_ids, 2000)
REPS = 20

def scan_timed(name, step):
    @jax.jit
    def run():
        def body(c, _):
            out = step(c)
            return c + 0 * out.ravel()[0].astype(c.dtype), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return c
    float(run())
    t0=time.perf_counter(); float(run()); dt=time.perf_counter()-t0
    print(f"{name}: {(dt-0.04)/REPS*1000:.2f} ms/rep", flush=True)

for tile, kcap in [((24,320),256),((48,320),512),((80,320),1024),((120,320),2208),((40,320),512)]:
    scan_timed(f"tile={tile} K={kcap}",
        lambda c, tile=tile, kcap=kcap: rasterize_pallas(md["tri_verts"], md["tri_valid"], TCO, K+0*c,
            image_size=(240,320), colors=md["tri_colors"], tile=tile, max_tris_per_tile=kcap).rgb)
