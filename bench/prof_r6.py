"""Round-2 perf: decompose the backward compositor chain on TPU.

Isolates: fwd pack, fwd kernel, bwd kernel, and the per-Gaussian
gradient reduction; then times candidate replacements for the two
permutation-heavy steps (pack gather; reduction rank-gather).
"""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops.binning_dense import dense_bin, dense_capacities, CHUNK
from gaussianeditor_tpu.ops import pallas_composite as pc

n = 100_000; hw = 512; MI = 524_288
rng = np.random.RandomState(0)
quats = rng.randn(n, 4).astype(np.float32)
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
params = GaussianParams(
    xyz=jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32)),
    features_dc=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32)*0.3),
    features_rest=jnp.asarray(np.zeros((n, 15, 3), np.float32)),
    opacity_raw=jnp.asarray(rng.uniform(-1, 1, (n, 1)).astype(np.float32)),
    log_scales=jnp.asarray(np.log(rng.uniform(0.004, 0.02, (n, 3))).astype(np.float32)),
    quats=jnp.asarray(quats))
scene = GaussianScene.create(params, max_sh_degree=3, active_sh_degree=3)
cam = lookat_camera(np.array([0, 0, -4.]), np.zeros(3), np.array([0, 1., 0]),
                    0.8, 0.8, hw, hw)
gx = gy = hw // TILE
ntiles = gx * gy
C = scene.capacity
R, R2, NC = dense_capacities(MI, ntiles)
ch = 3; CH1 = 4
F = pc._pad8(7 + ch)
GF = pc._pad8(6 + CH1)

proc = jax.jit(lambda s: preprocess(
    s.params.xyz, s.params.log_scales, s.params.quats, s.get_opacity[:, 0],
    s.get_features, cam, alive=s.alive, active_sh_degree=3,
    max_sh_degree=3))(scene)
db = jax.jit(lambda p: dense_bin(p, gx, gy, MI))(proc)
db = jax.tree.map(jax.device_get, db)
db = jax.tree.map(jnp.asarray, db)

fwd_call = pc.make_forward(ntiles, gx, ch, NC)
bwd_call = pc.make_backward(ntiles, gx, ch, NC)

N_IT = 20
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

def chk(*xs):
    acc = 0.0
    for x in xs:
        acc = acc + jnp.sum(x[::97].astype(jnp.float32))
    return acc

bench("EMPTY", lambda i: i.astype(jnp.float32))

mean2d, conic, opac, color, depth = (proc.mean2d, proc.conic, proc.opacity,
                                     proc.color, proc.depth)

def pack(m2d):
    g = jnp.concatenate(
        [m2d, conic, opac[:, None], depth[:, None], color], axis=1)
    g = jnp.pad(g, ((0, 1), (0, F - g.shape[1])))
    sg = jnp.pad(db.sorted_g, (0, 1), constant_values=C)
    lane = jax.lax.broadcasted_iota(jnp.int32, (NC, CHUNK), 1)
    src = db.chunk_p0[:, None] + lane
    src = jnp.where(lane < db.chunk_nvalid[:, None], src, R)
    gidx = sg[src]
    inst = g[gidx]
    return jnp.swapaxes(inst, 1, 2)

def vary(i):
    return mean2d * (1 + 1e-9 * i.astype(jnp.float32))

bench("pack only", lambda i: chk(pack(vary(i))))

def fwdk(i):
    inst = pack(vary(i))
    (out,) = fwd_call(db.chunk_tile, db.chunk_first, db.chunk_nvalid,
                      db.chunk_offset, inst)
    return out, inst
bench("pack + fwd kernel", lambda i: chk(fwdk(i)[0]))

def bwdk(i):
    out, inst = fwdk(i)
    acc = out[..., :CH1]
    t_fin = out[..., CH1]
    nc = out[..., CH1 + 1]
    gall = jnp.concatenate(
        [jnp.ones_like(acc), acc, jnp.ones_like(t_fin)[..., None],
         t_fin[..., None], nc[..., None]], axis=-1)
    max_nc = jnp.max(nc, axis=-1)
    active = ((db.chunk_nvalid > 0)
              & (db.chunk_offset.astype(jnp.float32)
                 < max_nc[db.chunk_tile])).astype(jnp.int32)
    (grows,) = bwd_call(db.chunk_tile, db.chunk_first, db.chunk_nvalid,
                        db.chunk_offset, active, inst, gall)
    return grows
bench("pack + fwd + bwd kernel", lambda i: chk(bwdk(i)))

def reduce_rank(i):
    grows = bwdk(i)
    rows_al = jnp.swapaxes(grows, 1, 2).reshape(-1, GF)
    rows_rank = rows_al[db.a_by_rank]
    colmean = jnp.mean(rows_rank, axis=0, keepdims=True)
    S = jnp.cumsum(rows_rank - colmean, axis=0, dtype=jnp.float32)
    S = jnp.concatenate([jnp.zeros((1, GF), jnp.float32), S], axis=0)
    b_hi = jnp.minimum(db.b_incl, R)
    b_lo = jnp.minimum(
        jnp.concatenate([jnp.zeros((1,), db.b_incl.dtype),
                         db.b_incl[:-1]]), R)
    d = (S[b_hi] - S[b_lo]
         + colmean * (b_hi - b_lo)[:, None].astype(jnp.float32))
    return d
bench("+ reduce rank-gather+cumsum (current)", lambda i: chk(reduce_rank(i)))

def reduce_scatter(i):
    grows = bwdk(i)
    rows_al = jnp.swapaxes(grows, 1, 2).reshape(-1, GF)
    sg = jnp.pad(db.sorted_g, (0, 1), constant_values=C)
    lane = jax.lax.broadcasted_iota(jnp.int32, (NC, CHUNK), 1)
    src = db.chunk_p0[:, None] + lane
    src = jnp.where(lane < db.chunk_nvalid[:, None], src, R)
    gid = sg[src].reshape(-1)
    d = jnp.zeros((C + 1, GF), jnp.float32).at[gid].add(rows_al)
    return d[:C]
bench("+ reduce direct scatter-add", lambda i: chk(reduce_scatter(i)))
print("done", flush=True)
