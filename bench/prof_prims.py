"""Primitive-cost microbench on the real TPU: what do sort / scatter /
cumsum / gather actually cost at our sizes? Decides the binning design."""
import time
import numpy as np, jax, jax.numpy as jnp

N_IT = 30
OVERHEAD = None

def bench(name, body0, *args):
    global OVERHEAD
    def fn(*a):
        def body(i, acc):
            return acc * 0.5 + body0(i, *a)
        return jax.lax.fori_loop(0, N_IT, body, 0.0)
    f = jax.jit(fn)
    float(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(f(*args))
        best = min(best, time.perf_counter() - t0)
    if OVERHEAD is None:
        OVERHEAD = best
        print(f"{name}: total {best*1000:.2f} ms (baseline)", flush=True)
    else:
        print(f"{name}: {(best - OVERHEAD)/N_IT*1000:.3f} ms/iter", flush=True)

bench("EMPTY", lambda i: i.astype(jnp.float32))

rng = np.random.RandomState(0)
for n in (131072, 262144, 524288, 1179648):
    keys = jnp.asarray(rng.randint(0, 2**31, n).astype(np.uint32))
    pay = jnp.asarray(np.arange(n, dtype=np.int32))
    def srt(i, k, p):
        k = k ^ i.astype(jnp.uint32)
        sk, sp = jax.lax.sort((k, p), num_keys=1, is_stable=True)
        return jnp.sum(sp[::97].astype(jnp.float32)) + jnp.sum(sk[::101].astype(jnp.float32))
    bench(f"sort {n} (u32 key + i32 payload)", srt, keys, pay)

n = 1179648
keys = jnp.asarray(rng.randint(0, 2**31, n).astype(np.uint32))
def srt1(i, k):
    k = k ^ i.astype(jnp.uint32)
    (sk,) = jax.lax.sort((k,), num_keys=1, is_stable=False)
    return jnp.sum(sk[::101].astype(jnp.float32))
bench(f"sort {n} key-only unstable", srt1, keys)

idx = jnp.asarray(rng.randint(0, n, n).astype(np.int32))
vals = jnp.asarray(rng.rand(n).astype(np.float32))
def scat(i, ix, v):
    out = jnp.zeros((n,), jnp.float32).at[ix].set(v + i.astype(jnp.float32))
    return jnp.sum(out[::103])
bench(f"scatter-set 1D {n}", scat, idx, vals)

def gath(i, ix, v):
    out = v[(ix + i) % n]
    return jnp.sum(out[::103])
bench(f"gather 1D {n}", gath, idx, vals)

rows = jnp.asarray(rng.rand(n, 8).astype(np.float32))
def gathr(i, ix, v):
    out = v[(ix + i) % n]
    return jnp.sum(out[::103, :])
bench(f"gather rows [n,8] {n}", gathr, idx, rows)

def csum(i, v):
    return jnp.sum(jnp.cumsum(v + i.astype(jnp.float32))[::107])
bench(f"cumsum 1D {n}", csum, vals)

def cmax(i, v):
    return jnp.sum(jax.lax.cummax((v + i.astype(jnp.float32))))
bench(f"cummax 1D {n} (summed)", cmax, vals)

q = jnp.asarray(np.sort(rng.randint(0, n, 10368)).astype(np.int32))
skeys = jnp.asarray(np.sort(rng.randint(0, 2**31, n)).astype(np.int32))
def ssort(i, sk, qq):
    p = jnp.searchsorted(sk, qq + i)
    return jnp.sum(p.astype(jnp.float32))
bench(f"searchsorted {n} x 10368q", ssort, skeys, q)

# 2-D cumsum along axis 0: the block-histogram design's core op
h = jnp.asarray(rng.rand(9216, 1024).astype(np.float32))
def csum2(i, v):
    return jnp.sum(jnp.cumsum(v + i.astype(jnp.float32), axis=0)[::31, ::17])
bench("cumsum [9216,1024] axis0", csum2, h)
print("done", flush=True)
