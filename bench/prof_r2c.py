"""Micro-benchmarks v3 — index/multiplicative perturbation so XLA LICM
cannot hoist the body, with known-cost calibration ops."""
import time
import numpy as np, jax, jax.numpy as jnp

R = 524288
R2 = R + 131072
C = 100_000
N = 10
rng = np.random.RandomState(0)

def bench(name, body0, *args):
    def fn(*a):
        def body(i, acc):
            return acc * 0.5 + body0(i, *a)
        return jax.lax.fori_loop(0, N, body, 0.0)
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter(); r = f(*args); jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/N*1000:.2f} ms", flush=True)

# --- calibration: copy 32MB (expect ~0.08ms at 800GB/s r+w) ---
big = jnp.asarray(rng.randn(8_000_000).astype(np.float32))
def cal_copy(i, x):
    y = x * (1.0 + 1e-9 * i.astype(jnp.float32))
    return y[0] + y[-1] + jnp.sum(y[::1024])
bench("CAL copy/scale 32MB", cal_copy, big)

# --- calibration: [2048,2048]@[2048,2048] bf16 matmul = 17.2 GFLOP
a = jnp.asarray(rng.randn(2048, 2048).astype(np.float32)).astype(jnp.bfloat16)
def cal_mm(i, x):
    y = (x * (1.0 + 1e-3 * i.astype(jnp.bfloat16))) @ x
    return jnp.sum(y[0].astype(jnp.float32))
bench("CAL matmul 2048^3 bf16 (17.2GF)", cal_mm, a)

gids_rand = jnp.asarray(rng.randint(0, C, R2).astype(np.int32))
gids_prod = np.concatenate([np.sort(rng.randint(0, C, R2 // 1024)) for _ in range(1024)])
gids_prod = jnp.asarray(gids_prod.astype(np.int32))
rows = jnp.asarray(rng.randn(R2, 16).astype(np.float32))
grows = jnp.asarray(rng.randn(16, R2).astype(np.float32))

def mk_scat(gi_name):
    def scat(i, r_, gi):
        gi2 = jnp.where(gi + i < C, gi + i, gi)  # index perturbation
        acc = jnp.zeros((C + 1, 16), jnp.float32).at[gi2].add(r_)
        return acc[0, 0] + acc[C // 2, 3] + jnp.sum(acc[::517])
    return scat
bench("scatter-add [R2,16] RANDOM gids", mk_scat("r"), rows, gids_rand)
bench("scatter-add [R2,16] tile-sorted gids", mk_scat("p"), rows, gids_prod)

def scatT(i, gr, gi):
    gi2 = jnp.where(gi + i < C, gi + i, gi)
    acc = jnp.zeros((C + 1, 16), jnp.float32).at[gi2].add(gr.T)
    return acc[0, 0] + jnp.sum(acc[::517])
bench("scatter-add [16,R2].T RANDOM gids", scatT, grows, gids_rand)

# transpose alone
def tr(i, gr):
    t = (gr * (1.0 + 1e-9 * i.astype(jnp.float32))).T
    return t[0, 0] + t[-1, -1] + jnp.sum(t[::97, 3])
bench("transpose [16,R2]->[R2,16]", tr, grows)

# cumsum [R,16]
def cs(i, r_):
    x = r_[:R] * (1.0 + 1e-9 * i.astype(jnp.float32))
    c_ = jnp.cumsum(x, axis=0)
    return c_[-1, 0] + c_[R // 2, 5] + jnp.sum(c_[::1031])
bench("cumsum [R,16] axis0", cs, rows)

# 1-D gather: index perturbation
tab = jnp.asarray(rng.randn(C).astype(np.float32))
gidx = jnp.asarray(rng.randint(0, C - 16, R).astype(np.int32))
def g1(i, t, gi):
    v = t[gi + i]
    return v[0] + jnp.sum(v[::1031])
bench("1x 1-D gather [C] x R", g1, tab, gidx)

# row gather [C,16] x R2
gtab16 = jnp.asarray(rng.randn(C + 16, 16).astype(np.float32))
gidx2 = jnp.asarray(rng.randint(0, C, R2).astype(np.int32))
def gr16(i, t, gi):
    v = t[gi + i]
    return v[0, 0] + jnp.sum(v[::1031, 2])
bench("row gather [C,16] x R2", gr16, gtab16, gidx2)

# sort with index perturbation (key changes each iter)
k0 = jnp.asarray(rng.randint(0, 2**31 - 64, R).astype(np.uint32))
v0 = jnp.asarray(rng.randint(0, C, R).astype(np.int32))
def srt(i, k, v):
    sk, sv = jax.lax.sort((k + i.astype(jnp.uint32), v), num_keys=1, is_stable=True)
    return sv[0].astype(jnp.float32) + sk[R // 2].astype(jnp.float32) + jnp.sum(sv[::1031]).astype(jnp.float32)
bench("lax.sort R (u32 key + i32 payload)", srt, k0, v0)

def srt2(i, k, v):
    sk, sv, sv2 = jax.lax.sort((k + i.astype(jnp.uint32), v, v), num_keys=1, is_stable=True)
    return sv[0].astype(jnp.float32) + jnp.sum(sv2[::1031]).astype(jnp.float32)
bench("lax.sort R (u32 key + 2 payloads)", srt2, k0, v0)

# repeat with index perturbation on counts
tiles = rng.randint(0, 12, C).astype(np.int32)
tsum = int(tiles.sum())
tiles = jnp.asarray(tiles)
def rep(i, t):
    t2 = t.at[i].add(1)  # tiny change forces re-execution
    g = jnp.repeat(jax.lax.iota(jnp.int32, C), t2, total_repeat_length=R)
    return g[0].astype(jnp.float32) + jnp.sum(g[::1031]).astype(jnp.float32)
bench("jnp.repeat C->R", rep, tiles)

# searchsorted C cumsum x R queries
def ss2(i, t):
    cs_ = jnp.cumsum(t.at[i].add(1))
    g = jnp.searchsorted(cs_, jnp.arange(R, dtype=jnp.int32), side="right")
    return g[0].astype(jnp.float32) + jnp.sum(g[::1031]).astype(jnp.float32)
bench("cumsum+searchsorted C x R queries", ss2, tiles)

# int div/mod variable divisor
tt = jnp.asarray(rng.randint(0, 1000, R).astype(np.int32))
ww = jnp.asarray(rng.randint(1, 9, R).astype(np.int32))
def idiv(i, t, w):
    q = (t + i) // w
    m = (t + i) % w
    return q[0].astype(jnp.float32) + jnp.sum((q + m)[::1031]).astype(jnp.float32)
bench("int div+mod [R] var divisor", idiv, tt, ww)

def fdiv(i, t, w):
    tf = (t + i).astype(jnp.float32)
    q = jnp.floor(tf * (1.0 / w.astype(jnp.float32))).astype(jnp.int32)
    m = (t + i) - q * w
    return q[0].astype(jnp.float32) + jnp.sum((q + m)[::1031]).astype(jnp.float32)
bench("float-recip div+mod [R]", fdiv, tt, ww)
