"""Round-2 perf: cumulative sub-stage timing of dense_bin (v4) on TPU.

Each bench adds one pipeline stage; the marginal cost of a stage is the
difference between consecutive lines. Also times candidate replacements
(searchsorted method='sort', scatter-based inversion) side by side.
"""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops import binning_dense as bd

n = 100_000; hw = 512; MI = 524_288
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
R, R2, NC = bd.dense_capacities(MI, num_tiles)
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

def chk(*xs):
    acc = 0.0
    for x in xs:
        acc = acc + jnp.sum(x[::97].astype(jnp.float32))
    return acc

tile_bits = max((num_tiles + 1).bit_length(), 1)
depth_bits = 32 - tile_bits

def stage_expand(p):
    tt = p.tiles_touched
    b_incl = jnp.cumsum(tt, dtype=jnp.int32)
    b_prev = b_incl - tt
    total = b_incl[-1]
    first_rank = jnp.where(tt > 0, b_prev, R)
    mark = jnp.full((R,), -1, jnp.int32).at[first_rank].max(
        jnp.arange(C, dtype=jnp.int32))
    gsrc = jnp.maximum(jax.lax.cummax(mark), 0)
    return tt, b_incl, b_prev, total, gsrc

def stage_key(p):
    tt, b_incl, b_prev, total, gsrc = stage_expand(p)
    depth = jax.lax.stop_gradient(p.depth.astype(jnp.float32))
    dkey32 = (jax.lax.bitcast_convert_type(depth, jnp.uint32)
              >> (32 - depth_bits)).astype(jnp.int32)
    table = jnp.stack([b_prev, tt, p.rect_min[:, 0], p.rect_min[:, 1],
        jnp.maximum(p.rect_max[:, 0] - p.rect_min[:, 0], 1), dkey32], axis=1)
    rows = table[gsrc]
    g_bprev, g_tt = rows[:, 0], rows[:, 1]
    g_rx, g_ry, rect_w, g_dkey = rows[:, 2], rows[:, 3], rows[:, 4], rows[:, 5]
    q = jnp.arange(R, dtype=jnp.int32)
    j = q - g_bprev
    live = (q < total) & (j >= 0) & (j < g_tt)
    jy = jnp.floor((j.astype(jnp.float32) + 0.5)
                   * (1.0 / rect_w.astype(jnp.float32))).astype(jnp.int32)
    jx = j - jy * rect_w
    tile = (g_ry + jy) * gx + (g_rx + jx)
    key = ((tile.astype(jnp.uint32) << depth_bits) | g_dkey.astype(jnp.uint32))
    key = jnp.where(live, key, jnp.uint32(0xFFFFFFFF))
    return key, gsrc, q, b_incl, total

def stage_sort(p):
    key, gsrc, q, b_incl, total = stage_key(p)
    skey, sg, srank = jax.lax.sort((key, gsrc, q), num_keys=1, is_stable=True)
    return skey, sg, srank, b_incl, total

def stage_align(p):
    skey, sg, srank, b_incl, total = stage_sort(p)
    stile = (skey >> depth_bits).astype(jnp.int32)
    pp = jnp.arange(R, dtype=jnp.int32)
    is_b = jnp.concatenate([jnp.ones((1,), bool), stile[1:] != stile[:-1]])
    tstart = jax.lax.cummax(jnp.where(is_b, pp, -1))
    off = pp - tstart
    tprev = jnp.concatenate([jnp.zeros((1,), jnp.int32), tstart[:-1]])
    u = jnp.where(is_b & (pp > 0), bd._pad_chunk(pp - tprev), 0)
    astart = jnp.cumsum(u)
    a = astart + off
    nb = jnp.where(is_b, pp, R)
    nxt_incl = jax.lax.cummin(nb[::-1])[::-1]
    nxt = jnp.concatenate([nxt_incl[1:], jnp.full((1,), R, jnp.int32)])
    return a, astart, tstart, stile, nxt, sg, srank, b_incl, total

def stage_chunkmeta(p, method):
    a, astart, tstart, stile, nxt, sg, srank, b_incl, total = stage_align(p)
    cpos = jnp.arange(NC, dtype=jnp.int32) * CHUNK
    p0 = jnp.searchsorted(a, cpos, side="left", method=method).astype(jnp.int32)
    p0c = jnp.minimum(p0, R - 1)
    st0 = stile[p0c]; as0 = astart[p0c]; ts0 = tstart[p0c]
    rlen0 = nxt[p0c] - ts0
    alive_c = (p0 < R) & (as0 <= cpos) & (st0 < num_tiles)
    offset_c = jnp.where(alive_c, cpos - as0, 0)
    nvalid_c = jnp.where(alive_c, jnp.clip(rlen0 - offset_c, 0, CHUNK), 0)
    return p0c, offset_c, nvalid_c, alive_c, st0, sg, srank, a, b_incl

def stage_invert(p, how):
    p0c, offset_c, nvalid_c, alive_c, st0, sg, srank, a, b_incl = \
        stage_chunkmeta(p, "scan")
    if how == "sort":
        _, a_by_rank = jax.lax.sort((srank, a), num_keys=1, is_stable=True)
    else:
        a_by_rank = jnp.zeros((R,), jnp.int32).at[srank].set(
            a, mode="drop", unique_indices=True)
    return a_by_rank, p0c, nvalid_c

bench("preprocess only", lambda i, s: chk(pre(s, i).mean2d), scene)
bench("+expand (cumsum/scatter/cummax)",
      lambda i, s: chk(*stage_expand(pre(s, i))[1:3],
                       stage_expand(pre(s, i))[4]), scene)
bench("+key (table gather + rect walk)",
      lambda i, s: chk(*stage_key(pre(s, i))[:2]), scene)
bench("+sort (key + 2 payloads)",
      lambda i, s: chk(*stage_sort(pre(s, i))[:3]), scene)
bench("+align scans",
      lambda i, s: chk(*stage_align(pre(s, i))[:3]), scene)
bench("+chunkmeta searchsorted scan",
      lambda i, s: chk(*stage_chunkmeta(pre(s, i), "scan")[:3]), scene)
bench("+chunkmeta searchsorted sort",
      lambda i, s: chk(*stage_chunkmeta(pre(s, i), "sort")[:3]), scene)
bench("+invert via pair sort",
      lambda i, s: chk(*stage_invert(pre(s, i), "sort")), scene)
bench("+invert via scatter",
      lambda i, s: chk(*stage_invert(pre(s, i), "scatter")), scene)

def full(i, s):
    p = pre(s, i)
    db = bd.dense_bin(p, gx, gy, MI)
    return chk(db.sorted_g, db.a_by_rank, db.chunk_nvalid)
bench("dense_bin full (as shipped)", full, scene)
print("done", flush=True)
