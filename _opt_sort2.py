import time, numpy as np, jax, jax.numpy as jnp
R = 524288; C = 100_000
rng = np.random.RandomState(0)
tiles_touched = jnp.asarray(rng.randint(0, 8, C).astype(np.int32))

def slot_to_gauss_search(tt):
    incl = jnp.cumsum(tt)
    slots = jnp.arange(R, dtype=jnp.int32)
    return jnp.searchsorted(incl, slots, side="right").astype(jnp.int32)

def slot_to_gauss_repeat(tt):
    return jnp.repeat(jnp.arange(C, dtype=jnp.int32), tt, total_repeat_length=R)

for name, fn in [("searchsorted over 100k", slot_to_gauss_search),
                 ("repeat", slot_to_gauss_repeat)]:
    f = jax.jit(fn)
    r = f(tiles_touched); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(5): r = f(tiles_touched)
    jax.block_until_ready(r)
    print(name, f"{(time.time()-t0)/5*1000:.2f} ms")

# gathers of [R] from [C]
g = jnp.asarray((np.arange(R)%C).astype(np.int32))
src = jnp.asarray(rng.rand(C, 2).astype(np.float32))
f = jax.jit(lambda s, i: s[i])
r = f(src, g); jax.block_until_ready(r)
t0=time.time()
for _ in range(10): r = f(src, g)
jax.block_until_ready(r)
print("gather [524k,2] from [100k,2]:", f"{(time.time()-t0)/10*1000:.2f} ms")
