import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from cosypose_tpu.ops.roi_align import roi_align, _axis_weights

B = 32
rng = np.random.RandomState(0)
images = jnp.asarray(rng.uniform(size=(B,3,480,640)).astype(np.float32))
boxes = jnp.asarray(np.tile(np.array([100.,80.,500.,380.],np.float32),(B,1)))

def timed(name, f, reps=20):
    float(jnp.asarray(f()).sum())
    t0=time.perf_counter()
    outs=[f() for _ in range(reps)]
    for o in outs: jax.block_until_ready(o)
    float(jnp.asarray(outs[-1]).sum())
    print(name, round((time.perf_counter()-t0)/reps*1000,2),"ms", flush=True)

wy = jax.jit(lambda b: _axis_weights(b[:,1], b[:,3]-b[:,1], 240, 4, 480))
wx = jax.jit(lambda b: _axis_weights(b[:,0], b[:,2]-b[:,0], 320, 4, 640))
timed("weights-y", lambda: wy(boxes))
timed("weights-x", lambda: wx(boxes))

Wy = wy(boxes); Wx = wx(boxes)
mm = jax.jit(lambda Wy, Wx, im: jnp.einsum("bxw,bcyw->bcyx", Wx, jnp.einsum("byh,bchw->bcyw", Wy, im)))
timed("matmuls", lambda: mm(Wy, Wx, images))
timed("roi_align-full", lambda: roi_align(images, boxes, output_size=(240,320)))

# bf16 matmul variant
mm16 = jax.jit(lambda Wy, Wx, im: jnp.einsum("bxw,bcyw->bcyx", Wx.astype(jnp.bfloat16),
    jnp.einsum("byh,bchw->bcyw", Wy.astype(jnp.bfloat16), im.astype(jnp.bfloat16),
    preferred_element_type=jnp.float32).astype(jnp.bfloat16), preferred_element_type=jnp.float32))
timed("matmuls-bf16", lambda: mm16(Wy, Wx, images))
