"""Primitives for the v3 binning design (dense-K expansion)."""
import time
import numpy as np, jax, jax.numpy as jnp

C = 100_000
K = 9
R = C * K        # 900k dense instance grid
R2 = R + 131072  # aligned capacity
NC = R2 // 128
N = 50
rng = np.random.RandomState(0)
OVERHEAD = None

def bench(name, body0, *args):
    global OVERHEAD
    def fn(*a):
        def body(i, acc):
            return acc * 0.5 + body0(i, *a)
        return jax.lax.fori_loop(0, N, body, 0.0)
    f = jax.jit(fn)
    float(f(*args))  # warm + full sync (block_until_ready lies via relay)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(f(*args))
        best = min(best, time.perf_counter() - t0)
    if OVERHEAD is None:
        OVERHEAD = best
        print(f"{name}: total {best*1000:.2f} ms (baseline)", flush=True)
    else:
        print(f"{name}: {(best - OVERHEAD)/N*1000:.3f} ms/iter", flush=True)

bench("EMPTY", lambda i: i.astype(jnp.float32))

# 1. dense-K key construction: pure elementwise broadcast over [C, K]
rect_min_x = jnp.asarray(rng.randint(0, 28, C).astype(np.int32))
rect_min_y = jnp.asarray(rng.randint(0, 28, C).astype(np.int32))
rect_w = jnp.asarray(rng.randint(1, 4, C).astype(np.int32))
tiles_touched = jnp.asarray(rng.randint(0, K + 1, C).astype(np.int32))
depth = jnp.asarray((rng.rand(C) * 10 + 0.3).astype(np.float32))
def dense_keys(i, rx, ry, rw, tt, d):
    d2 = d * (1 + 1e-9 * i.astype(jnp.float32))
    j = jax.lax.broadcasted_iota(jnp.int32, (C, K), 1)
    rwf = rw.astype(jnp.float32)[:, None]
    jy = jnp.floor((j.astype(jnp.float32) + 0.5) / rwf).astype(jnp.int32)
    jx = j - jy * rw[:, None]
    tx = rx[:, None] + jx
    ty = ry[:, None] + jy
    tile = ty * 32 + tx
    valid = j < tt[:, None]
    tile = jnp.where(valid, tile, 1024)
    db = jax.lax.bitcast_convert_type(d2, jnp.uint32) >> 11
    key = (tile.astype(jnp.uint32) << 21) | db[:, None]
    kf = key.astype(jnp.float32)
    return jnp.sum(kf[::7] * kf[::7])
bench("dense-K key construction [C,9]", dense_keys, rect_min_x, rect_min_y,
      rect_w, tiles_touched, depth)

# 2. sort 900k u32 key + i32 payload
k9 = jnp.asarray(rng.randint(0, 2**31 - 64, R).astype(np.uint32))
v9 = jnp.asarray(rng.randint(0, C, R).astype(np.int32))
def srt9(i, k, v):
    sk, sv = jax.lax.sort((k + i.astype(jnp.uint32), v), num_keys=1, is_stable=True)
    return jnp.sum(sv[::7] * sv[::7]).astype(jnp.float32)
bench("lax.sort 900k u32+i32", srt9, k9, v9)

# 3. 1-D cumsum/cummax over [R]
x1 = jnp.asarray(rng.randn(R).astype(np.float32))
def cs1(i, x):
    c = jnp.cumsum(x * (1 + 1e-9 * i.astype(jnp.float32)))
    return jnp.sum(c[::1031] * c[::1031])
bench("cumsum 1-D [900k] f32", cs1, x1)

xi = jnp.asarray(rng.randint(0, R, R).astype(np.int32))
def cm1(i, x):
    c = jax.lax.cummax(x + (i % 3), axis=0)
    return jnp.sum((c[::1031] * c[::1031]).astype(jnp.float32))
bench("cummax 1-D [900k] i32", cm1, xi)

# 4. tiny scatter: 1025 values into [R2]
pos = jnp.sort(jnp.asarray((rng.choice(R2 - 8, 1025, replace=False)).astype(np.int32)))
vals = jnp.asarray(rng.randint(0, R, 1025).astype(np.int32))
def tscat(i, p, v):
    arr = jnp.full((R2,), -1, jnp.int32).at[p + (i % 3)].set(v)
    c = jax.lax.cummax(arr, axis=0)
    return jnp.sum((c[::1031]).astype(jnp.float32))
bench("scatter 1025 -> [R2] + cummax fill", tscat, pos, vals)

# 5. 1-D scatter-set 900k int32 (inverse permutation)
perm = jnp.asarray(rng.permutation(R).astype(np.int32))
def iscat(i, p):
    p2 = jnp.where(p + i < R, p + i, p)
    inv = jnp.zeros((R,), jnp.int32).at[p2].set(jax.lax.iota(jnp.int32, R))
    return jnp.sum((inv[::1031] * inv[::1031]).astype(jnp.float32))
bench("1-D scatter-set 900k int32 (inv perm)", iscat, perm)

# 6. row gather [R,16] at R2 indices (aligned relayout)
rows = jnp.asarray(rng.randn(R, 16).astype(np.float32))
src = jnp.asarray(rng.randint(0, R - 64, R2).astype(np.int32))
def rg(i, r_, s):
    v = r_[s + (i % 3)]
    return jnp.sum(v[::31] * v[::31])
bench("row gather [R,16] x R2", rg, rows, src)

# 6b. row gather from [C,16] at R indices (pack stage 1)
grows = jnp.asarray(rng.randn(C + 64, 16).astype(np.float32))
gidc = jnp.asarray(rng.randint(0, C, R).astype(np.int32))
def rg2(i, r_, s):
    v = r_[s + (i % 3)]
    return jnp.sum(v[::31] * v[::31])
bench("row gather [C,16] x R", rg2, grows, gidc)

# 7. reduce [C,K,16] -> [C,16] (backward per-gaussian reduction)
rk = jnp.asarray(rng.randn(C, K, 16).astype(np.float32))
def red(i, r_):
    s = jnp.sum(r_ * (1 + 1e-9 * i.astype(jnp.float32)), axis=1)
    return jnp.sum(s[::7] * s[::7])
bench("sum [C,9,16] -> [C,16]", red, rk)

# 8. transpose [R2,16] -> [16,R2]
rows2 = jnp.asarray(rng.randn(R2, 16).astype(np.float32))
def tr(i, r_):
    t = (r_ * (1 + 1e-9 * i.astype(jnp.float32))).T
    return jnp.sum(t[:, ::31] * t[:, ::31])
bench("transpose [R2,16]->[16,R2]", tr, rows2)

# 9. strided slice [R2] -> [NC]
def ssl(i, x):
    s = (x + (i % 3))[::128]
    return jnp.sum((s[::7] * s[::7]).astype(jnp.float32))
bench("strided slice [R2]->[NC]", ssl, jnp.asarray(rng.randint(0, 99, R2).astype(np.int32)))

# 10. compare: scatter-add rows [R2,16] -> [C,16] (old backward reduction)
gidx2 = jnp.asarray(rng.randint(0, C, R2).astype(np.int32))
def scat(i, r_, gi):
    acc = jnp.zeros((C + 64, 16), jnp.float32).at[gi + (i % 3)].add(r_)
    return jnp.sum(acc[::7] * acc[::7])
bench("OLD scatter-add [R2,16]->[C,16]", scat, rows2, gidx2)
