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
    # force full completion by pulling a scalar to host each call
    s = float(jnp.asarray(f()).sum())
    t0=time.perf_counter()
    for _ in range(reps):
        s = float(jnp.asarray(f()).sum())
    print(name, round((time.perf_counter()-t0)/reps*1000,2), "ms", flush=True)

@jax.jit
def stage1(md, images, K, TCO):
    crop_points = md["crop_points"]
    uv = project_points_robust(crop_points, K, TCO)
    boxes_rend = boxes_from_uv(uv)
    boxes_crop, images_crop = deepim_crops(images, boxes_rend, K, TCO, crop_points, output_size=cfg.render_size, lamb=1.4)
    K_crop = get_K_crop_resize(K, boxes_crop, images.shape[-2:], cfg.render_size)
    return images_crop

timed("crop-stage", lambda: stage1(md, images, K, TCO))
boxes = jnp.tile(jnp.asarray([100.,100.,400.,340.]),(B,1))
from cosypose_tpu.ops.roi_align import roi_align
timed("roi_align-only", lambda: roi_align(images, boxes, output_size=(240,320), sampling_ratio=4))
timed("rasterize", lambda: rasterize(md["tri_verts"], md["tri_valid"], TCO, K, image_size=(240,320), colors=md["tri_colors"]).rgb)

x = jnp.zeros((B,240,320,6))
net = jax.jit(lambda v, x: pp.net.apply(v, x, train=False))
timed("backbone", lambda: net(variables, x))

fwd = jax.jit(lambda v, md, im, K, T: pp.forward(v, md, im, K, T, n_iterations=1)["TCO_final"])
timed("fwd-full", lambda: fwd(variables, md, images, K, TCO), reps=3)
