import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from cosypose_tpu.models import PosePredictor, PosePredictorConfig
from cosypose_tpu.models.pose_predictor import gather_mesh_data
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.ops.camera import project_points_robust, boxes_from_uv, get_K_crop_resize
from cosypose_tpu.ops.cropping import deepim_crops
from cosypose_tpu.ops.rasterizer import rasterize
from __graft_entry__ import _demo_specs, _make_inputs

B = 32
cfg = PosePredictorConfig(backbone="efficientnet-b3")
pp = PosePredictor(cfg)
variables = pp.init(jax.random.PRNGKey(0))
mesh_db = build_mesh_db(_demo_specs())
images, K, TCO, label_ids = _make_inputs(B)
md = gather_mesh_data(mesh_db, label_ids, cfg.n_points_crop)

def timed(name, f, reps=5):
    o = f(); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(reps): o = f()
    jax.block_until_ready(o)
    print(name, round((time.perf_counter()-t0)/reps*1000,2), "ms", flush=True)

@jax.jit
def stage1(md, images, K, TCO):
    crop_points = md["crop_points"]
    uv = project_points_robust(crop_points, K, TCO)
    boxes_rend = boxes_from_uv(uv)
    boxes_crop, images_crop = deepim_crops(images, boxes_rend, K, TCO, crop_points, output_size=cfg.render_size, lamb=1.4)
    K_crop = get_K_crop_resize(K, boxes_crop, images.shape[-2:], cfg.render_size)
    return boxes_crop, images_crop, K_crop

timed("crop-stage", lambda: stage1(md, images, K, TCO))
boxes_crop, images_crop, K_crop = stage1(md, images, K, TCO)

timed("rasterize-Kcrop", lambda: rasterize(md["tri_verts"], md["tri_valid"], TCO, K_crop, image_size=(240,320), colors=md["tri_colors"]))
rend = rasterize(md["tri_verts"], md["tri_valid"], TCO, K_crop, image_size=(240,320), colors=md["tri_colors"]).rgb

@jax.jit
def stage3(variables, images_crop, rend):
    x = jnp.concatenate([images_crop, rend], axis=1)
    x = jnp.moveaxis(x, 1, -1)
    return pp.net.apply(variables, x, train=False)
timed("backbone-stage", lambda: stage3(variables, images_crop, rend))
