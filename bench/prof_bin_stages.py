"""Cumulative stage timing of dense_bin + pack on the real TPU."""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops import binning_dense as bd

n = 100_000; hw = 512; K = 12
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
gx = gy = hw//TILE
num_tiles = gx*gy
C = scene.capacity
R, R2, NC = bd.dense_capacities(C, K, num_tiles)
CHUNK = bd.CHUNK
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
    tag = " (baseline)" if OVERHEAD is None else f": {(best-OVERHEAD)/N_IT*1000:.3f} ms/iter"
    if OVERHEAD is None:
        OVERHEAD = best
    print(f"{name}{tag}", flush=True)

bench("EMPTY", lambda i: i.astype(jnp.float32))

def pre(s, i):
    s = s.replace(params=s.params.replace(
        xyz=s.params.xyz * (1 + 1e-9 * i.astype(jnp.float32))))
    return preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
        s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
        active_sh_degree=3, max_sh_degree=3)

def mk_keys(p):
    tiles = p.tiles_touched
    j = jax.lax.broadcasted_iota(jnp.int32, (C, K), 1)
    rect_w = jnp.maximum(p.rect_max[:, 0] - p.rect_min[:, 0], 1)
    inv_w = (1.0 / rect_w.astype(jnp.float32))[:, None]
    jy = jnp.floor((j.astype(jnp.float32) + 0.5) * inv_w).astype(jnp.int32)
    jx = j - jy * rect_w[:, None]
    tile = ((p.rect_min[:, 1:2] + jy) * gx + (p.rect_min[:, 0:1] + jx))
    valid = j < tiles[:, None]
    tile_bits = max((num_tiles + 1).bit_length(), 1)
    depth_bits = 32 - tile_bits
    depth = jax.lax.stop_gradient(p.depth.astype(jnp.float32))
    dkey = jax.lax.bitcast_convert_type(depth, jnp.uint32) >> (32 - depth_bits)
    key = (tile.astype(jnp.uint32) << depth_bits) | dkey[:, None]
    key = jnp.where(valid, key, jnp.uint32(0xFFFFFFFF))
    slot = jax.lax.broadcasted_iota(jnp.int32, (C, K), 0) * K + j
    return key, slot, depth_bits

def s_keys(i, s):
    p = pre(s, i)
    key, slot, _ = mk_keys(p)
    return jnp.sum(key[::97].astype(jnp.float32)) + jnp.sum(slot[::101].astype(jnp.float32))
bench("pre+keys", s_keys, scene)

def s_sort(i, s):
    p = pre(s, i)
    key, slot, db_ = mk_keys(p)
    skey, sslot = jax.lax.sort((key.reshape(-1), slot.reshape(-1)), num_keys=1, is_stable=True)
    return jnp.sum(skey[::97].astype(jnp.float32)) + jnp.sum(sslot[::101].astype(jnp.float32))
bench("pre+keys+sort", s_sort, scene)

def s_scans(i, s):
    p = pre(s, i)
    key, slot, depth_bits = mk_keys(p)
    skey, sslot = jax.lax.sort((key.reshape(-1), slot.reshape(-1)), num_keys=1, is_stable=True)
    stile = (skey >> depth_bits).astype(jnp.int32)
    pp = jnp.arange(R, dtype=jnp.int32)
    is_b = jnp.concatenate([jnp.ones((1,), bool), stile[1:] != stile[:-1]])
    tstart = jax.lax.cummax(jnp.where(is_b, pp, -1))
    off = pp - tstart
    tprev = jnp.concatenate([jnp.zeros((1,), jnp.int32), tstart[:-1]])
    u = jnp.where(is_b & (pp > 0), bd._pad_chunk(pp - tprev), 0)
    astart = jnp.cumsum(u)
    a = astart + off
    return jnp.sum(a[::97].astype(jnp.float32)) + jnp.sum(tstart[::89].astype(jnp.float32))
bench("pre+keys+sort+scans", s_scans, scene)

def s_ss(i, s):
    p = pre(s, i)
    key, slot, depth_bits = mk_keys(p)
    skey, sslot = jax.lax.sort((key.reshape(-1), slot.reshape(-1)), num_keys=1, is_stable=True)
    stile = (skey >> depth_bits).astype(jnp.int32)
    pp = jnp.arange(R, dtype=jnp.int32)
    is_b = jnp.concatenate([jnp.ones((1,), bool), stile[1:] != stile[:-1]])
    tstart = jax.lax.cummax(jnp.where(is_b, pp, -1))
    off = pp - tstart
    tprev = jnp.concatenate([jnp.zeros((1,), jnp.int32), tstart[:-1]])
    u = jnp.where(is_b & (pp > 0), bd._pad_chunk(pp - tprev), 0)
    astart = jnp.cumsum(u)
    a = astart + off
    cpos = jnp.arange(NC, dtype=jnp.int32) * CHUNK
    p0 = jnp.searchsorted(a, cpos, side="left").astype(jnp.int32)
    return jnp.sum(p0.astype(jnp.float32))
bench("... + searchsorted[NC]", s_ss, scene)

def s_scatter(i, s):
    p = pre(s, i)
    key, slot, depth_bits = mk_keys(p)
    skey, sslot = jax.lax.sort((key.reshape(-1), slot.reshape(-1)), num_keys=1, is_stable=True)
    stile = (skey >> depth_bits).astype(jnp.int32)
    pp = jnp.arange(R, dtype=jnp.int32)
    is_b = jnp.concatenate([jnp.ones((1,), bool), stile[1:] != stile[:-1]])
    tstart = jax.lax.cummax(jnp.where(is_b, pp, -1))
    off = pp - tstart
    tprev = jnp.concatenate([jnp.zeros((1,), jnp.int32), tstart[:-1]])
    u = jnp.where(is_b & (pp > 0), bd._pad_chunk(pp - tprev), 0)
    astart = jnp.cumsum(u)
    a = astart + off
    a_of_s = jnp.zeros((R,), jnp.int32).at[sslot].set(a)
    return jnp.sum(a_of_s[::97].astype(jnp.float32))
bench("... + a_of_s scatter (no searchsorted)", s_scatter, scene)

# pack gathers in isolation (static db)
p0 = jax.jit(lambda s: pre(s, jnp.int32(0)))(scene)
db0 = jax.jit(lambda p: bd.dense_bin(p, gx, gy, K))(p0)
g8 = jnp.concatenate([p0.mean2d, p0.conic, p0.opacity[:,None], p0.depth[:,None], p0.color], axis=1)
g8 = jnp.pad(g8, ((0,0),(0, 16-g8.shape[1])))

def s_g1(i, g, sg):
    rows = g[sg]
    return jnp.sum(rows[::97, :]) * (1 + 0*i.astype(jnp.float32))
bench("pack gather1 g[sorted_g] [R,16]", s_g1, g8, db0.sorted_g)

def s_g2(i, g, sg, cp0, nv):
    rows = jnp.pad(g[sg], ((0,1),(0,0)))
    lane = jax.lax.broadcasted_iota(jnp.int32, (NC, CHUNK), 1)
    src = cp0[:, None] + lane
    src = jnp.where(lane < nv[:, None], src, R)
    inst = rows[src.reshape(-1)]
    return jnp.sum(inst[::97, :]) * (1 + 0*i.astype(jnp.float32))
bench("pack gather1+2 (aligned) [R2,16]", s_g2, g8, db0.sorted_g, db0.chunk_p0, db0.chunk_nvalid)

def s_gT(i, g, sg, cp0, nv):
    rows = jnp.pad(g[sg], ((0,1),(0,0)))
    lane = jax.lax.broadcasted_iota(jnp.int32, (NC, CHUNK), 1)
    src = cp0[:, None] + lane
    src = jnp.where(lane < nv[:, None], src, R)
    inst = rows[src.reshape(-1)].T
    return jnp.sum(inst[:, ::97]) * (1 + 0*i.astype(jnp.float32))
bench("pack gathers + transpose [16,R2]", s_gT, g8, db0.sorted_g, db0.chunk_p0, db0.chunk_nvalid)

# multi-operand sort: rows as payloads
key0 = jnp.asarray(rng.randint(0, 2**31, R).astype(np.uint32))
cols = [jnp.asarray(rng.rand(R).astype(np.float32)) for _ in range(8)]
def s_msort(i, k, *cs):
    k = k ^ i.astype(jnp.uint32)
    out = jax.lax.sort((k,) + cs, num_keys=1, is_stable=True)
    return sum(jnp.sum(o[::101].astype(jnp.float32)) for o in out)
bench("sort R x (key + 8 f32 payloads)", s_msort, key0, *cols)

def s_msort4(i, k, *cs):
    k = k ^ i.astype(jnp.uint32)
    out = jax.lax.sort((k,) + cs[:4], num_keys=1, is_stable=True)
    return sum(jnp.sum(o[::101].astype(jnp.float32)) for o in out)
bench("sort R x (key + 4 f32 payloads)", s_msort4, key0, *cols)
print("done", flush=True)
