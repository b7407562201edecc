"""Pack + reduce restructuring candidates on the REAL pipeline shapes.

Hypothesis from prof_r10b: XLA row gathers (even random) run at ~500 GB/s;
the v4 pack's 10 ms comes from the scalar 1-D gather `sg[src]` and/or the
2-D-indexed composed gather `g[gidx]`. Variants:
  A: widen sg to [R+1, 8] so the id lookup is a row gather, then flat
     row gather + reshape.
  B: two row gathers — srows = g[sorted_g] (random), aligned =
     srows[src_flat] (monotone).
Also re-times the bwd rank reduction as flat row gathers + cumsum.
"""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops.binning_dense import dense_bin, dense_capacities, CHUNK
from gaussianeditor_tpu.ops.pallas_composite import _pad8

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
gx = gy = hw//TILE; ntiles = gx*gy
R, R2, NC = dense_capacities(MI, ntiles)
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

def pre(s):
    return preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
        s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
        active_sh_degree=3, max_sh_degree=3)

p0 = jax.jit(pre)(scene)
p0 = jax.tree.map(jax.lax.stop_gradient, p0)
db0 = jax.jit(lambda p: dense_bin(p, gx, gy, MI))(p0)
F = _pad8(7 + 3)

def dep(i):
    return jnp.where(i < 0, 1, 0).astype(jnp.int32)

def fdep(i):
    return 1 + 1e-9 * i.astype(jnp.float32)

def gtable(p, i):
    g = jnp.concatenate([p.mean2d, p.conic, p.opacity[:,None],
                         p.depth[:,None], p.color], axis=1) * fdep(i)
    return jnp.pad(g, ((0,1),(0,F-g.shape[1])))

def pack_v4(i, p, db):
    g = gtable(p, i)
    sg = jnp.pad(db.sorted_g, (0,1), constant_values=n)
    lane = jax.lax.broadcasted_iota(jnp.int32, (NC, CHUNK), 1)
    src = db.chunk_p0[:,None] + lane
    src = jnp.where(lane < db.chunk_nvalid[:,None], src, R)
    gidx = sg[src]
    inst = g[gidx]
    return jnp.sum(jnp.swapaxes(inst, 1, 2))
bench("pack v4 (sg[src] + g[gidx] 2-D)", pack_v4, p0, db0)

def pack_A(i, p, db):
    g = gtable(p, i)
    sgw = jnp.pad(db.sorted_g, (0,1), constant_values=n)[:, None]
    sgw = jnp.broadcast_to(sgw, (R+1, 8))
    lane = jax.lax.broadcasted_iota(jnp.int32, (NC, CHUNK), 1)
    src = db.chunk_p0[:,None] + lane
    src = jnp.where(lane < db.chunk_nvalid[:,None], src, R).reshape(-1)
    gidx = sgw[src][:, 0]
    inst = g[gidx].reshape(NC, CHUNK, F)
    return jnp.sum(jnp.swapaxes(inst, 1, 2))
bench("pack A (widened id rows)", pack_A, p0, db0)

def pack_B(i, p, db):
    g = gtable(p, i)
    srows = g[db.sorted_g]                       # [R, F] random row gather
    srows = jnp.pad(srows, ((0, CHUNK), (0, 0)))  # zero pad rows >= R
    lane = jax.lax.broadcasted_iota(jnp.int32, (NC, CHUNK), 1)
    src = db.chunk_p0[:,None] + lane
    src = jnp.where(lane < db.chunk_nvalid[:,None], src, R).reshape(-1)
    inst = srows[src].reshape(NC, CHUNK, F)      # monotone row gather
    return jnp.sum(jnp.swapaxes(inst, 1, 2))
bench("pack B (two row gathers)", pack_B, p0, db0)

def pack_B1(i, p, db):
    g = gtable(p, i)
    srows = g[db.sorted_g]
    return jnp.sum(srows)
bench("pack B stage1 only (g[sorted_g])", pack_B1, p0, db0)

# --- bwd reduce variants ---
GF = _pad8(6 + 4)
rows_al0 = jnp.asarray(rng.randn(R2, GF).astype(np.float32))
abr = db0.a_by_rank
b_incl0 = db0.b_incl

def red_gather(i, rows_al):
    rows_rank = (rows_al * fdep(i))[abr + dep(i)]
    return jnp.sum(rows_rank)
bench("reduce: rank row gather only", red_gather, rows_al0)

def red_full(i, rows_al):
    rows_rank = (rows_al * fdep(i))[abr + dep(i)]
    colmean = jnp.mean(rows_rank, axis=0, keepdims=True)
    S = jnp.cumsum(rows_rank - colmean, axis=0, dtype=jnp.float32)
    S = jnp.concatenate([jnp.zeros((1,GF), jnp.float32), S], axis=0)
    b_hi = jnp.minimum(b_incl0, R)
    b_lo = jnp.minimum(jnp.concatenate([jnp.zeros((1,), b_incl0.dtype),
                                        b_incl0[:-1]]), R)
    d = S[b_hi] - S[b_lo] + colmean * (b_hi-b_lo)[:,None].astype(jnp.float32)
    return jnp.sum(d)
bench("reduce: gather+cumsum+diff (v4)", red_full, rows_al0)

def red_cumsum_only(i, rows_al):
    S = jnp.cumsum(rows_al[:R] * fdep(i), axis=0, dtype=jnp.float32)
    return jnp.sum(S)
bench("reduce: xla cumsum [R,16] only", red_cumsum_only, rows_al0)

# [C,8] int-ish gather used in dense_bin key path
tblC = jnp.asarray(rng.randn(n + 1, 8).astype(np.float32))
gsrc0 = np.sort(rng.randint(0, n, R)).astype(np.int32)
gsrc0 = jnp.asarray(gsrc0)

def c8_gather(i, tbl):
    rows = (tbl * fdep(i))[gsrc0]
    return jnp.sum(rows)
bench("[C+1,8] monotone gather -> [R,8]", c8_gather, tblC)

tblC6 = jnp.asarray(rng.randn(n, 6).astype(np.float32))
def c6_gather(i, tbl):
    rows = (tbl * fdep(i))[gsrc0]
    return jnp.sum(rows)
bench("[C,6] monotone gather -> [R,6]", c6_gather, tblC6)

print("done", flush=True)
