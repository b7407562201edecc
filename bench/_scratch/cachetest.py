import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/gsedit_jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import jax, jax.numpy as jnp
import numpy as np
x = jnp.asarray(np.random.RandomState(0).randn(2048, 2048).astype(np.float32))
@jax.jit
def f(a):
    for _ in range(8):
        a = jnp.tanh(a @ a.T) * 0.001 + a
    return a.sum()
t0 = time.time()
print("result", float(f(x)), f"compile+run {time.time()-t0:.1f}s")
