import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
small = jnp.zeros((8,))
f = jax.jit(lambda x: x + 1.0)
float(jnp.asarray(f(small)).sum())
t0=time.perf_counter()
outs=[f(small) for _ in range(100)]
for o in outs: jax.block_until_ready(o)
float(jnp.asarray(outs[-1]).sum())
print("trivial", round((time.perf_counter()-t0)/100*1000,3),"ms/call", flush=True)

big = jnp.zeros((32,3,480,640))
g = jax.jit(lambda x: x * 1.0001)
float(jnp.asarray(g(big)).sum())
t0=time.perf_counter()
outs=[g(big) for _ in range(50)]
for o in outs: jax.block_until_ready(o)
float(jnp.asarray(outs[-1]).sum())
print("copy-118MB", round((time.perf_counter()-t0)/50*1000,3),"ms/call", flush=True)
