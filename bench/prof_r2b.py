"""Micro-benchmarks for the v3 pipeline design decisions."""
import time
import numpy as np, jax, jax.numpy as jnp

R = 524288
R2 = R + 131072
C = 100_000
N = 10
rng = np.random.RandomState(0)

def _sq(x):
    x = x.astype(jnp.float32)
    return x * x + x


def bench(name, body0, *args):
    def fn(*a):
        def body(i, acc):
            return acc * 0.5 + body0(i, *a)
        return jax.lax.fori_loop(0, N, body, 0.0)
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter(); r = f(*args); jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/N*1000:.2f} ms", flush=True)

# production-like sorted-by-tile gids: instances grouped by tile, random within
gids_prod = np.concatenate([np.sort(rng.randint(0, C, R2//1024)) for _ in range(1024)])
gids_prod = jnp.asarray(gids_prod.astype(np.int32))
grows = jnp.asarray(rng.randn(16, R2).astype(np.float32))

def scat_prod(i, gr, gi):
    return jnp.sum(_sq(jnp.zeros((C+1, 16), jnp.float32).at[gi].add(gr.T + i*1e-9)))
bench("scatter-add [R2,16] prod-order gids", scat_prod, grows, gids_prod)

# scatter without the transpose: rows already [R2,16]
rows = jnp.asarray(rng.randn(R2, 16).astype(np.float32))
def scat_nt(i, r_, gi):
    return jnp.sum(_sq(jnp.zeros((C+1, 16), jnp.float32).at[gi].add(r_ + i*1e-9)))
bench("scatter-add [R2,16] no-transpose", scat_nt, rows, gids_prod)

# 1-D scatter-set of R int32 (inverse permutation build)
perm = jnp.asarray(rng.permutation(R).astype(np.int32))
def inv_scat(i, p):
    inv = jnp.zeros((R,), jnp.int32).at[p].set(jax.lax.iota(jnp.int32, R) + i)
    return jnp.sum(_sq(inv)).astype(jnp.float32)
bench("1-D scatter-set R int32 (inv perm)", inv_scat, perm)

# cumsum [R,16] axis=0
def cs(i, r_):
    return jnp.sum(_sq(jnp.cumsum(r_[:R] + i*1e-9, axis=0)[-1]))
bench("cumsum [R,16] axis0", cs, rows)

# cumsum [16, R] axis=1 (transposed layout)
def cs2(i, gr):
    return jnp.sum(_sq(jnp.cumsum(gr[:, :R] + i*1e-9, axis=1)[:, -1]))
bench("cumsum [16,R] axis1", cs2, grows)

# integer div/mod with variable divisor over R
tt = jnp.asarray(rng.randint(0, 1000, R).astype(np.int32))
ww = jnp.asarray(rng.randint(1, 9, R).astype(np.int32))
def idiv(i, t, w):
    q = (t + i) // w
    m = (t + i) % w
    return jnp.sum(_sq(q + m)).astype(jnp.float32)
bench("int div+mod [R] variable divisor", idiv, tt, ww)

def fdiv(i, t, w):
    tf = (t + i).astype(jnp.float32)
    q = jnp.floor(tf * (1.0 / w.astype(jnp.float32))).astype(jnp.int32)
    m = (t + i) - q * w
    return jnp.sum(_sq(q + m)).astype(jnp.float32)
bench("float-recip div+mod [R]", fdiv, tt, ww)

# 1-D gathers from [C] table, R indices
tab = jnp.asarray(rng.randn(C).astype(np.float32))
gidx = jnp.asarray(rng.randint(0, C, R).astype(np.int32))
def g1(i, t, gi):
    return jnp.sum(_sq(t[gi] + i*1e-9))
bench("1x 1-D gather [C] x R", g1, tab, gidx)

def g4(i, t, gi):
    return jnp.sum(_sq(t[gi] + t[gi+1] * 2.0 + t[jnp.minimum(gi+2, C-1)] + t[gi//2] + i*1e-9))
bench("4x 1-D gather [C] x R", g4, tab, gidx)

# jnp.repeat with total_repeat_length (the expansion)
tiles = rng.randint(0, 12, C).astype(np.int32)
tiles = jnp.asarray(tiles)
def rep(i, t):
    g = jnp.repeat(jax.lax.iota(jnp.int32, C), t + 0*i, total_repeat_length=R)
    return jnp.sum(_sq(g)).astype(jnp.float32)
bench("jnp.repeat C->R", rep, tiles)

# searchsorted: R sorted keys, 1024 queries (range extraction)
skeys = jnp.sort(jnp.asarray(rng.randint(0, 1025, R).astype(np.int32)))
q = jnp.arange(1024, dtype=jnp.int32)
def ss(i, k, qq):
    a = jnp.searchsorted(k, qq + 0*i, side="left")
    b = jnp.searchsorted(k, qq + 0*i, side="right")
    return jnp.sum(_sq(b - a)).astype(jnp.float32)
bench("searchsorted R keys x 1024 queries x2", ss, skeys, q)

# searchsorted the other way: C-sized sorted cumsum, R queries (repeat internals)
cums = jnp.cumsum(tiles)
slots = jnp.arange(R, dtype=jnp.int32)
def ss2(i, cs_, s):
    g = jnp.searchsorted(cs_, s + 0*i, side="right")
    return jnp.sum(_sq(g)).astype(jnp.float32)
bench("searchsorted C cumsum x R queries", ss2, cums, slots)

# one-hot histogram via matmul: [1024 tiles] counts from R tile ids
tids = jnp.asarray(rng.randint(0, 1024, R).astype(np.int32))
def hist_scat(i, t):
    h = jnp.zeros((1025,), jnp.int32).at[t + 0*i].add(1)
    return jnp.sum(_sq(h)).astype(jnp.float32)
bench("1-D scatter-add histogram R->1024", hist_scat, tids)

# gather rows [C,16] by R2 idx WITHOUT transpose afterwards
gtab16 = jnp.asarray(rng.randn(C + 1, 16).astype(np.float32))
gidx2 = jnp.asarray(rng.randint(0, C, R2).astype(np.int32))
def gr16(i, t, gi):
    return jnp.sum(_sq(t[gi] + i*1e-9))
bench("row gather [C,16] x R2 (no T)", gr16, gtab16, gidx2)

# gather rows [C,128] by R2/8 idx (wider rows, fewer)
gtab128 = jnp.asarray(rng.randn(C + 1, 128).astype(np.float32))
gidx3 = jnp.asarray(rng.randint(0, C, R2 // 8).astype(np.int32))
def gr128(i, t, gi):
    return jnp.sum(_sq(t[gi] + i*1e-9))
bench("row gather [C,128] x R2/8", gr128, gtab128, gidx3)

# int64 single gather vs two int32 gathers
tab64 = jnp.asarray(rng.randint(0, 2**62, C).astype(np.int64))
def g64(i, t, gi):
    return jnp.sum(_sq(t[gi] + i)).astype(jnp.float32)
bench("1x 1-D int64 gather [C] x R", g64, tab64, gidx)
