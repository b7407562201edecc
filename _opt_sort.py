import time, numpy as np, jax, jax.numpy as jnp
R = 524288; C = 100_000; NT = 1024
rng = np.random.RandomState(0)
tile = jnp.asarray(rng.randint(0, NT+1, R).astype(np.int32))
depth = jnp.asarray(rng.rand(R).astype(np.float32)*10)
gid = jnp.asarray(np.arange(R, dtype=np.int32) % C)

def two_key(t, d, g):
    return jax.lax.sort((t, d, g), num_keys=2, is_stable=True)
def fused_key(t, d, g):
    # depth > 0; f32 bits of positive floats are order-preserving.
    # key = tile * 2^22 | (depth_bits >> 10): 10 tile bits + 22 depth bits
    db = jax.lax.bitcast_convert_type(d, jnp.uint32) >> 10
    key = (t.astype(jnp.uint32) << 22) | db
    return jax.lax.sort((key, g), num_keys=1, is_stable=True)
def sort_u32(t, d, g):
    return jax.lax.sort((t, g), num_keys=1, is_stable=True)

for name, fn in [("two_key", two_key), ("fused", fused_key), ("single int", sort_u32)]:
    f = jax.jit(fn)
    r = f(tile, depth, gid); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(5): r = f(tile, depth, gid)
    jax.block_until_ready(r)
    print(name, f"{(time.time()-t0)/5*1000:.1f} ms")

# searchsorted vs repeat for slot->tile map
caps = jnp.asarray(rng.randint(0, 1000, NT).astype(np.int32))
R2 = 655360
def via_search(caps):
    start = jnp.cumsum(caps) - caps
    slots = jnp.arange(R2, dtype=jnp.int32)
    return jnp.searchsorted(start + caps, slots, side="right").astype(jnp.int32)
def via_repeat(caps):
    return jnp.repeat(jnp.arange(NT, dtype=jnp.int32), caps, total_repeat_length=R2)
for name, fn in [("searchsorted", via_search), ("repeat", via_repeat)]:
    f = jax.jit(fn)
    r = f(caps); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(10): r = f(caps)
    jax.block_until_ready(r)
    print(name, f"{(time.time()-t0)/10*1000:.2f} ms")
