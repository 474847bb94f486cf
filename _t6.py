import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from cosypose_tpu.models.pose_predictor import gather_mesh_data
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.ops import rasterizer as R
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

tri_verts, tri_valid, colors = md["tri_verts"], md["tri_valid"], md["tri_colors"]

@jax.jit
def planes_only(tri_verts, tri_valid, TCO, K, colors):
    tv_cam = jnp.einsum("bij,bfvj->bfvi", TCO[:, :3, :3], tri_verts, precision=jax.lax.Precision.HIGHEST) + TCO[:, None, None, :3, 3]
    planes = jax.vmap(R._triangle_planes, in_axes=(0,0,0,0,None))(tv_cam, tri_valid, K, colors, 0.05)
    return planes["bbox"]

timed("planes", lambda: planes_only(tri_verts, tri_valid, TCO, K, colors))

@jax.jit
def binning(tri_verts, tri_valid, TCO, K, colors):
    tv_cam = jnp.einsum("bij,bfvj->bfvi", TCO[:, :3, :3], tri_verts, precision=jax.lax.Precision.HIGHEST) + TCO[:, None, None, :3, 3]
    planes = jax.vmap(R._triangle_planes, in_axes=(0,0,0,0,None))(tv_cam, tri_valid, K, colors, 0.05)
    bbox, valid = planes["bbox"], planes["valid"]
    th, tw, nty, ntx = 24, 64, 10, 5
    ty = jnp.arange(nty); tx = jnp.arange(ntx)
    tile_x0 = jnp.tile(tx * tw, nty).astype(jnp.float32)
    tile_y0 = jnp.repeat(ty * th, ntx).astype(jnp.float32)
    tile_x1, tile_y1 = tile_x0 + tw, tile_y0 + th
    def bin_one(bbox_b, valid_b):
        ov = ((bbox_b[None,:,0] <= tile_x1[:,None]) & (bbox_b[None,:,2] >= tile_x0[:,None])
            & (bbox_b[None,:,1] <= tile_y1[:,None]) & (bbox_b[None,:,3] >= tile_y0[:,None])
            & valid_b[None,:])
        F = bbox_b.shape[0]
        key = jnp.where(ov, -jnp.arange(F, dtype=jnp.float32)[None,:], -jnp.inf)
        _, idx = jax.lax.top_k(key, 128)
        return idx
    return jax.vmap(bin_one)(bbox, valid)

timed("planes+binning", lambda: binning(tri_verts, tri_valid, TCO, K, colors))
timed("full-rast", lambda: R.rasterize(tri_verts, tri_valid, TCO, K, image_size=(240,320), colors=colors).rgb)
