"""Overhead-corrected decomposition (dispatch through the axon tunnel is
~29 ms/call; use N=50 iterations and subtract an empty-loop baseline)."""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops.binning import bin_and_sort, align_ranges
from gaussianeditor_tpu.ops import pallas_composite as pc

n = 100_000; hw = 512; R = 524288
rng = np.random.RandomState(0)
quats = rng.randn(n,4).astype(np.float32); quats/=np.linalg.norm(quats,axis=1,keepdims=True)
params = GaussianParams(
    xyz=jnp.asarray(rng.uniform(-1,1,(n,3)).astype(np.float32)),
    features_dc=jnp.asarray(rng.randn(n,1,3).astype(np.float32)*0.3),
    features_rest=jnp.asarray(np.zeros((n,15,3),np.float32)),
    opacity_raw=jnp.asarray(rng.uniform(-1,1,(n,1)).astype(np.float32)),
    log_scales=jnp.asarray(np.log(rng.uniform(0.004,0.02,(n,3))).astype(np.float32)),
    quats=jnp.asarray(quats))
scene = GaussianScene.create(params, max_sh_degree=3, active_sh_degree=3)
cam = lookat_camera(np.array([0,0,-4.]), np.zeros(3), np.array([0,1.,0]), 0.8,0.8,hw,hw)
gx = gy = hw//TILE; nt = gx*gy; r2 = R + pc.CHUNK*nt
N = 50

OVERHEAD = None

def bench(name, body0, *args):
    global OVERHEAD
    def fn(*a):
        def body(i, acc):
            return acc * 0.5 + body0(i, *a)
        return jax.lax.fori_loop(0, N, body, 0.0)
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); r = f(*args); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    if OVERHEAD is None:
        OVERHEAD = best
        print(f"{name}: total {best*1000:.2f} ms (baseline)", flush=True)
    else:
        print(f"{name}: {(best - OVERHEAD)/N*1000:.3f} ms/iter", flush=True)

bench("EMPTY", lambda i: i.astype(jnp.float32))

pr0 = jax.jit(lambda s: preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
    s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
    active_sh_degree=s.active_sh_degree, max_sh_degree=3))(scene)
jax.block_until_ready(pr0)

def pre_f(i, s):
    p = preprocess(s.params.xyz * (1 + 1e-9 * i.astype(jnp.float32)),
        s.params.log_scales, s.params.quats,
        s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
        active_sh_degree=3, max_sh_degree=3)
    return jnp.sum(p.mean2d * p.color[:, :2]) + jnp.sum(p.conic)
bench("preprocess fwd", pre_f, scene)

def pre_g(i, s):
    def f(xyz, ls, q, op, sh):
        p = preprocess(xyz, ls, q, op, sh, cam, alive=s.alive,
                       active_sh_degree=3, max_sh_degree=3)
        return jnp.sum(p.mean2d * p.color[:, :2]) + jnp.sum(p.conic * p.conic) + jnp.sum(p.opacity * p.depth)
    g = jax.grad(f, argnums=(0,1,2,3,4))(
        scene.params.xyz * (1 + 1e-9 * i.astype(jnp.float32)),
        s.params.log_scales, s.params.quats, s.get_opacity[:,0], s.get_features)
    return jnp.sum(g[0] * g[0])
bench("preprocess fwd+vjp", pre_g, scene)

def keys_only(i, p):
    tiles = jnp.where(jax.lax.iota(jnp.int32, n) == i, p.tiles_touched, p.tiles_touched)
    tiles = tiles.at[i].set(tiles[i])  # force dependence on i
    incl = jnp.cumsum(tiles); excl = incl - tiles
    num_rendered = incl[-1]
    slots = jnp.arange(R, dtype=jnp.int32)
    g = jnp.repeat(jnp.arange(n, dtype=jnp.int32), tiles, total_repeat_length=R)
    t = slots - excl[g]
    rect_min = p.rect_min[g]
    rect_w = jnp.maximum(p.rect_max[g,0] - rect_min[:,0], 1)
    tile_x = rect_min[:,0] + t % rect_w
    tile_y = rect_min[:,1] + t // rect_w
    tile_id = tile_y * gx + tile_x
    valid = slots < num_rendered
    tile_id = jnp.where(valid, tile_id, nt).astype(jnp.int32)
    depth = jnp.where(valid, p.depth[g], jnp.inf).astype(jnp.float32)
    tile_bits = max((nt+1).bit_length(), 1); depth_bits = 32 - tile_bits
    dkey = jax.lax.bitcast_convert_type(depth, jnp.uint32) >> (32 - depth_bits)
    key = (tile_id.astype(jnp.uint32) << depth_bits) | dkey
    kf = key.astype(jnp.float32)
    return jnp.sum(kf * kf) + jnp.sum(g * t).astype(jnp.float32)
bench("binning: keys construction", keys_only, pr0)

def full_bin(i, p):
    b = bin_and_sort(p._replace(tiles_touched=p.tiles_touched.at[i].set(p.tiles_touched[i])), gx, gy, R)
    return (jnp.sum(b.gauss_id * b.gauss_id).astype(jnp.float32)
            + jnp.sum(b.tile_start * b.tile_end).astype(jnp.float32))
bench("binning: full bin_and_sort", full_bin, pr0)

# searchsorted isolated: R sorted keys, 1024 queries
sk = jnp.sort(jnp.asarray(rng.randint(0, nt, R).astype(np.int32)))
def ss(i, k):
    k2 = k.at[i].set(k[i])
    q = jnp.arange(nt, dtype=jnp.int32)
    a = jnp.searchsorted(k2, q, side="left")
    b = jnp.searchsorted(k2, q, side="right")
    return jnp.sum(a * b).astype(jnp.float32)
bench("searchsorted R x 1024 queries x2 (scan)", ss, sk)

def ss_sortm(i, k):
    k2 = k.at[i].set(k[i])
    q = jnp.arange(nt, dtype=jnp.int32)
    a = jnp.searchsorted(k2, q, side="left", method="sort")
    b = jnp.searchsorted(k2, q, side="right", method="sort")
    return jnp.sum(a * b).astype(jnp.float32)
bench("searchsorted R x 1024 x2 (method=sort)", ss_sortm, sk)

# boundary-scatter range extraction: start[t] = min index with tile t
def ranges_scatter(i, k):
    k2 = k.at[i].set(k[i])
    idx = jnp.arange(R, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), k2[1:] != k2[:-1]])
    starts = jnp.full((nt + 1,), R, jnp.int32).at[
        jnp.where(first, k2, nt)].min(idx)
    return jnp.sum(starts * starts).astype(jnp.float32)
bench("range extraction via boundary scatter-min", ranges_scatter, sk)

b0 = jax.jit(lambda p: bin_and_sort(p, gx, gy, R))(pr0)
jax.block_until_ready(b0)
def align_only(i, b):
    b2 = b._replace(gauss_id=b.gauss_id.at[i].set(b.gauss_id[i]))
    ab = align_ranges(b2, nt, pc.CHUNK)
    return (jnp.sum(ab.gauss_id * ab.gauss_id).astype(jnp.float32)
            + jnp.sum(ab.tile_start * ab.tile_len).astype(jnp.float32))
bench("align_ranges", align_only, b0)

# scatter-add variants with index perturbation
rows = jnp.asarray(rng.randn(r2, 16).astype(np.float32))
gids_rand = jnp.asarray(rng.randint(0, n - 64, r2).astype(np.int32))
gp = np.concatenate([np.sort(rng.randint(0, n - 64, r2 // 1024)) for _ in range(1024)])
gids_prod = jnp.asarray(gp.astype(np.int32))
def scat(i, r_, gi):
    acc = jnp.zeros((n + 64, 16), jnp.float32).at[gi + (i % 3)].add(r_)
    return jnp.sum(acc[::7] * acc[::7])
bench("scatter-add [R2,16] RANDOM gids", scat, rows, gids_rand)
bench("scatter-add [R2,16] tile-sorted gids", scat, rows, gids_prod)

# fully-sorted gids + segment_sum
gids_sorted = jnp.sort(gids_rand)
def seg(i, r_, gi):
    acc = jax.ops.segment_sum(r_, gi + (i % 3), num_segments=n + 64,
                              indices_are_sorted=True)
    return jnp.sum(acc[::7] * acc[::7])
bench("segment_sum SORTED gids (hint)", seg, rows, gids_sorted)

# cumsum-based segment reduction: cumsum [R2,16] + boundary gather diff
bounds = jnp.sort(jnp.asarray(rng.randint(0, r2 - 8, n).astype(np.int32)))
def cseg(i, r_, b_):
    cs_ = jnp.cumsum(r_, axis=0)
    hi = cs_[b_ + (i % 3)]
    acc = jnp.diff(hi, axis=0, prepend=jnp.zeros((1, 16)))
    return jnp.sum(acc[::7] * acc[::7])
bench("cumsum+boundary-diff segment reduce", cseg, rows, bounds)

# 1-D gathers
tab = jnp.asarray(rng.randn(n).astype(np.float32))
gidx = jnp.asarray(rng.randint(0, n - 64, R).astype(np.int32))
def g1(i, t, gi):
    v = t[gi + (i % 3)]
    return jnp.sum(v * v)
bench("1x 1-D gather [C] x R", g1, tab, gidx)

gtab16 = jnp.asarray(rng.randn(n + 64, 16).astype(np.float32))
gidx2 = jnp.asarray(rng.randint(0, n, r2).astype(np.int32))
def gr16(i, t, gi):
    v = t[gi + (i % 3)]
    return jnp.sum(v * v)
bench("row gather [C,16] x R2", gr16, gtab16, gidx2)

# transpose [R2,16] -> [16,R2]
def tr(i, r_):
    t = (r_ * (1 + 1e-9 * i.astype(jnp.float32))).T
    return jnp.sum(t[:, ::7] * t[:, ::7])
bench("transpose [R2,16]->[16,R2]", tr, rows)

# sort
k0 = jnp.asarray(rng.randint(0, 2**31 - 64, R).astype(np.uint32))
v0 = jnp.asarray(rng.randint(0, n, R).astype(np.int32))
def srt(i, k, v):
    sk, sv = jax.lax.sort((k + i.astype(jnp.uint32), v), num_keys=1, is_stable=True)
    return jnp.sum(sv[::7] * sv[::7]).astype(jnp.float32)
bench("lax.sort R u32+i32", srt, k0, v0)

def rep(i, t):
    t2 = t.at[i % n].set(t[i % n])
    g = jnp.repeat(jnp.arange(n, dtype=jnp.int32), t2, total_repeat_length=R)
    return jnp.sum(g[::7] * g[::7]).astype(jnp.float32)
bench("jnp.repeat C->R", rep, pr0.tiles_touched)

tt = jnp.asarray(rng.randint(0, 1000, R).astype(np.int32))
ww = jnp.asarray(rng.randint(1, 9, R).astype(np.int32))
def idiv(i, t, w):
    q = (t + i) // w
    m = (t + i) % w
    return jnp.sum(q[::7] * m[::7]).astype(jnp.float32)
bench("int div+mod [R] var divisor", idiv, tt, ww)
