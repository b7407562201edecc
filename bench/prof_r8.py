"""Granular v4-pipeline stage profiler (round 2): dense_bin internals,
pack, fwd kernel, bwd kernel, bwd reduction — each isolated by
subtractive timing inside one jitted fori_loop."""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops.binning_dense import (
    dense_bin, dense_capacities, CHUNK)
from gaussianeditor_tpu.ops.pallas_composite import (
    make_pallas_compositor_dense, make_forward, make_backward, _pad8)

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
ntiles = gx*gy
R, R2, NC = dense_capacities(MI, ntiles)
print(f"R={R} R2={R2} NC={NC} ntiles={ntiles}", flush=True)
N = 30
OVERHEAD = None

def bench(name, body0, *args):
    global OVERHEAD
    def fn(*a):
        def body(i, acc):
            return acc * 0.5 + body0(i, *a)
        return jax.lax.fori_loop(0, N, body, 0.0)
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
        print(f"{name}: {(best - OVERHEAD)/N*1000:.3f} ms/iter", flush=True)

bench("EMPTY", lambda i: i.astype(jnp.float32))

def perturb(s, i):
    return s.replace(params=s.params.replace(
        xyz=s.params.xyz * (1 + 1e-9 * i.astype(jnp.float32))))

def pre(s):
    return preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
        s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
        active_sh_degree=3, max_sh_degree=3)

p0 = jax.jit(lambda s: pre(s))(scene)
p0 = jax.tree.map(jax.lax.stop_gradient, p0)

def pp(i, p):
    # tiny i-dependent perturbation on float fields; int fields get +0*i
    f = 1 + 1e-9 * i.astype(jnp.float32)
    z = (i * 0).astype(jnp.int32)
    return p._replace(
        mean2d=p.mean2d * f, depth=p.depth * f, conic=p.conic * f,
        color=p.color * f, opacity=p.opacity * f,
        tiles_touched=p.tiles_touched + z, rect_min=p.rect_min + z,
        rect_max=p.rect_max + z)


# ---- dense_bin internals, run standalone on the fixed preprocess ----
tile_bits = max((ntiles + 1).bit_length(), 1)
depth_bits = 32 - tile_bits

def stage_expand(i, p):
    p = pp(i, p)
    tt = p.tiles_touched
    b_incl = jnp.cumsum(tt, dtype=jnp.int32)
    b_prev = b_incl - tt
    first_rank = jnp.where(tt > 0, b_prev, R)
    mark = jnp.full((R,), -1, jnp.int32).at[first_rank].max(
        jnp.arange(n, dtype=jnp.int32))
    gsrc = jnp.maximum(jax.lax.cummax(mark), 0)
    return jnp.sum(gsrc[::17]).astype(jnp.float32) * (1 + 0*i)
bench("bin.expand (scatter+cummax)", stage_expand, p0)

def _table(p):
    tt = p.tiles_touched
    b_incl = jnp.cumsum(tt, dtype=jnp.int32)
    b_prev = b_incl - tt
    depth = p.depth.astype(jnp.float32)
    dkey32 = (jax.lax.bitcast_convert_type(depth, jnp.uint32)
              >> (32 - depth_bits)).astype(jnp.int32)
    return jnp.stack([b_prev, tt, p.rect_min[:,0], p.rect_min[:,1],
        jnp.maximum(p.rect_max[:,0]-p.rect_min[:,0],1), dkey32], axis=1), b_incl

def stage_gather_tile(i, p):
    p = pp(i, p)
    table, b_incl = _table(p)
    tt = p.tiles_touched
    b_prev = b_incl - tt
    first_rank = jnp.where(tt > 0, b_prev, R)
    mark = jnp.full((R,), -1, jnp.int32).at[first_rank].max(
        jnp.arange(n, dtype=jnp.int32))
    gsrc = jnp.maximum(jax.lax.cummax(mark), 0)
    rows = table[gsrc]
    return jnp.sum(rows[::23, :]).astype(jnp.float32) * (1 + 0*i)
bench("bin.expand + [C,6] gather", stage_gather_tile, p0)

def _tokey(p):
    table, b_incl = _table(p)
    tt = p.tiles_touched
    b_prev = b_incl - tt
    first_rank = jnp.where(tt > 0, b_prev, R)
    mark = jnp.full((R,), -1, jnp.int32).at[first_rank].max(
        jnp.arange(n, dtype=jnp.int32))
    gsrc = jnp.maximum(jax.lax.cummax(mark), 0)
    rows = table[gsrc]
    g_bprev, g_tt = rows[:,0], rows[:,1]
    g_rx, g_ry, rect_w, g_dkey = rows[:,2], rows[:,3], rows[:,4], rows[:,5]
    q = jnp.arange(R, dtype=jnp.int32)
    j = q - g_bprev
    total = b_incl[-1]
    live = (q < total) & (j >= 0) & (j < g_tt)
    jy = jnp.floor((j.astype(jnp.float32)+0.5) * (1.0/rect_w.astype(jnp.float32))).astype(jnp.int32)
    jx = j - jy*rect_w
    tile = (g_ry+jy)*gx + (g_rx+jx)
    key = ((tile.astype(jnp.uint32) << depth_bits) | g_dkey.astype(jnp.uint32))
    key = jnp.where(live, key, jnp.uint32(0xFFFFFFFF))
    return key, gsrc, q

def stage_key(i, p):
    p = pp(i, p)
    key, gsrc, q = _tokey(p)
    return jnp.sum(key[::31].astype(jnp.float32)) * (1 + 0*i)
bench("bin.through key build", stage_key, p0)

def stage_sort(i, p):
    p = pp(i, p)
    key, gsrc, q = _tokey(p)
    skey, sg, srank = jax.lax.sort((key, gsrc, q), num_keys=1, is_stable=True)
    return (jnp.sum(sg[::31].astype(jnp.float32))
            + jnp.sum(srank[::37].astype(jnp.float32))) * (1 + 0*i)
bench("bin.through sort (key+2 payloads)", stage_sort, p0)

def stage_sort1(i, p):
    p = pp(i, p)
    key, gsrc, q = _tokey(p)
    skey, sg = jax.lax.sort((key, gsrc), num_keys=1, is_stable=True)
    return jnp.sum(sg[::31].astype(jnp.float32)) * (1 + 0*i)
bench("bin.through sort (key+1 payload)", stage_sort1, p0)

def stage_full(i, p):
    p = pp(i, p)
    db = dense_bin(p, gx, gy, MI)
    return (jnp.sum(db.sorted_g[::31].astype(jnp.float32))
            + jnp.sum(db.a_by_rank[::37].astype(jnp.float32))
            + jnp.sum(db.chunk_nvalid).astype(jnp.float32)) * (1 + 0*i)
bench("bin.full dense_bin", stage_full, p0)

def stage_full_noinv(i, p):
    p = pp(i, p)
    db = dense_bin(p, gx, gy, MI)
    # a_by_rank unused -> its sort should be DCE'd
    return (jnp.sum(db.sorted_g[::31].astype(jnp.float32))
            + jnp.sum(db.chunk_nvalid).astype(jnp.float32)) * (1 + 0*i)
bench("bin.dense_bin w/o a_by_rank (DCE)", stage_full_noinv, p0)

# ---- pack + kernels on a fixed binning ----
db0 = jax.jit(lambda p: dense_bin(p, gx, gy, MI))(p0)
F = _pad8(7 + 3)
GF = _pad8(6 + 4)

def _packed(p, db):
    g = jnp.concatenate([p.mean2d, p.conic, p.opacity[:,None],
                         p.depth[:,None], p.color], axis=1)
    g = jnp.pad(g, ((0,1),(0,F-g.shape[1])))
    sg = jnp.pad(db.sorted_g, (0,1), constant_values=n)
    lane = jax.lax.broadcasted_iota(jnp.int32, (NC, CHUNK), 1)
    src = db.chunk_p0[:,None] + lane
    src = jnp.where(lane < db.chunk_nvalid[:,None], src, R)
    gidx = sg[src]
    inst = g[gidx]
    return jnp.swapaxes(inst, 1, 2)

def stage_pack(i, p, db):
    p = pp(i, p)
    inst = _packed(p, db)
    return jnp.sum(inst[::13, 0, :]) * (1 + 0*i)
bench("pack (gathers only)", stage_pack, p0, db0)

fwd_call = make_forward(ntiles, gx, 3, NC)

def stage_fwdk(i, p, db):
    p = pp(i, p)
    inst = _packed(p, db)
    (out,) = fwd_call(db.chunk_tile, db.chunk_first, db.chunk_nvalid,
                      db.chunk_offset, inst)
    return jnp.sum(out[::7, ::11, 0]) * (1 + 0*i)
bench("pack + fwd kernel", stage_fwdk, p0, db0)

comp = make_pallas_compositor_dense(ntiles, gx, 3, scene.capacity, MI)

def stage_comp_fwd(i, p, db):
    p = pp(i, p)
    out = comp(p.mean2d, p.conic, p.opacity, p.color, p.depth, db)
    return jnp.sum(out.color[::3, ::5]) + jnp.sum(out.depth[::7]) * (1+0*i)
bench("compositor fwd (pack+kernel+mask)", stage_comp_fwd, p0, db0)

def stage_comp_fb(i, p, db):
    def loss(m2, con, op, col, dep):
        out = comp(m2, con, op, col, dep, db)
        return jnp.sum(out.color) + jnp.sum(out.depth)
    g = jax.grad(loss, argnums=(0,1,2,3,4))(
        p.mean2d * (1+1e-9*i.astype(jnp.float32)), p.conic, p.opacity,
        p.color, p.depth)
    return jnp.sum(g[0]) + jnp.sum(g[2])
bench("compositor fwd+bwd", stage_comp_fb, p0, db0)

# bwd reduction alone: gather rows_al by a_by_rank + cumsum + diff
rows_al0 = jnp.asarray(rng.randn(R2, GF).astype(np.float32))
abr = db0.a_by_rank
b_incl0 = db0.b_incl

def stage_reduce(i, rows_al):
    rows_al = rows_al * (1 + 1e-9*i.astype(jnp.float32))
    rows_rank = rows_al[abr]
    colmean = jnp.mean(rows_rank, axis=0, keepdims=True)
    S = jnp.cumsum(rows_rank - colmean, axis=0, dtype=jnp.float32)
    S = jnp.concatenate([jnp.zeros((1,GF), jnp.float32), S], axis=0)
    b_hi = jnp.minimum(b_incl0, R)
    b_lo = jnp.minimum(jnp.concatenate([jnp.zeros((1,), b_incl0.dtype),
                                        b_incl0[:-1]]), R)
    d = (S[b_hi] - S[b_lo] + colmean * (b_hi-b_lo)[:,None].astype(jnp.float32))
    return jnp.sum(d[::7]) * (1 + 0*i)
bench("bwd reduce (rank gather+cumsum+diff)", stage_reduce, rows_al0)

def stage_reduce_gather(i, rows_al):
    rows_al = rows_al * (1 + 1e-9*i.astype(jnp.float32))
    rows_rank = rows_al[abr]
    return jnp.sum(rows_rank[::13]) * (1 + 0*i)
bench("bwd reduce: rank row-gather only", stage_reduce_gather, rows_al0)

print("done", flush=True)
