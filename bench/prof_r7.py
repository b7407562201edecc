"""Round-2 perf: honest pack/permutation variant timings on TPU.

Defeats XLA LICM/gather-commuting by alternating between two source
buffers with `lax.dynamic_index_in_dim(srcs, i % 2)` — the gather/sort
then genuinely re-runs every iteration. All index/payload distributions
come from the real 100k-Gaussian pipeline.
"""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops.binning_dense import dense_bin, dense_capacities, CHUNK

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

proc = jax.jit(lambda s: preprocess(
    s.params.xyz, s.params.log_scales, s.params.quats, s.get_opacity[:, 0],
    s.get_features, cam, alive=s.alive, active_sh_degree=3,
    max_sh_degree=3))(scene)
db = jax.jit(lambda p: dense_bin(p, gx, gy, MI))(proc)

# host-side realistic index arrays
sorted_g = np.asarray(db.sorted_g)
chunk_p0 = np.asarray(db.chunk_p0)
chunk_nv = np.asarray(db.chunk_nvalid)
a_by_rank = np.asarray(db.a_by_rank)
lane = np.arange(CHUNK, dtype=np.int32)[None, :]
src = chunk_p0[:, None] + lane
src = np.where(lane < chunk_nv[:, None], src, R)
sgp = np.concatenate([sorted_g, [C]]).astype(np.int32)
gidx = sgp[np.minimum(src, R)]                      # [NC, 128] tile-order ids
gidx_j = jnp.asarray(gidx)
key_np = np.asarray(
    jax.jit(lambda d: jax.lax.bitcast_convert_type(d, jnp.uint32))(proc.depth))

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

def pick(i, duo):
    return jax.lax.dynamic_index_in_dim(duo, i % 2, 0, keepdims=False)

bench("EMPTY", lambda i: i.astype(jnp.float32))

g16 = rng.rand(2, C + 1, 16).astype(np.float32)
g16_j = jnp.asarray(g16)
g8_j = jnp.asarray(g16[:, :, :8].copy())

bench("A row-gather [C,16]->[NC,128,16] tile-order",
      lambda i: chk(pick(i, g16_j)[gidx_j]))
bench("B = A + swapaxes to [NC,16,128]",
      lambda i: chk(jnp.swapaxes(pick(i, g16_j)[gidx_j], 1, 2)))
bench("D row-gather [C,8] tile-order",
      lambda i: chk(pick(i, g8_j)[gidx_j]))

gsrc_rank = np.sort(rng.randint(0, C, R)).astype(np.int32)  # monotone ids
gsrc_j = jnp.asarray(gsrc_rank)
bench("G row-gather [C,16] monotone (rank order)",
      lambda i: chk(pick(i, g16_j)[gsrc_j]))

rows2 = rng.rand(2, R2, 16).astype(np.float32)
rows2_j = jnp.asarray(rows2)
abr_j = jnp.asarray(a_by_rank)
bench("H row-gather [R2,16]->[R,16] by a_by_rank",
      lambda i: chk(pick(i, rows2_j)[abr_j]))

rowsR = jnp.asarray(rng.rand(2, R, 16).astype(np.float32))
a_pos = np.minimum(a_by_rank, R2 - 1).astype(np.int32)
a_j = jnp.asarray(a_pos)
bench("F row-scatter [R,16]->[R2,16] by a",
      lambda i: chk(jnp.zeros((R2, 16), jnp.float32).at[a_j].set(
          pick(i, rowsR), mode="drop", unique_indices=True)))

def cumsum_seg(i):
    rr = pick(i, rowsR)
    S = jnp.cumsum(rr, axis=0, dtype=jnp.float32)
    S = jnp.concatenate([jnp.zeros((1, 16), jnp.float32), S], axis=0)
    b_hi = jnp.minimum(db.b_incl, R)
    b_lo = jnp.minimum(jnp.concatenate(
        [jnp.zeros((1,), db.b_incl.dtype), db.b_incl[:-1]]), R)
    return chk(S[b_hi] - S[b_lo])
bench("I cumsum [R,16] + segment diff", cumsum_seg)

# sorts with increasing payload counts
keys2 = jnp.asarray(np.stack([key_np, key_np ^ 1]).astype(np.uint32))
key_full = np.asarray(jnp.tile(jnp.asarray(key_np), R // C + 1)[:R])
keysR = jnp.asarray(np.stack([key_full, key_full ^ 1]))
payR = [jnp.asarray(rng.rand(R).astype(np.float32)) for _ in range(12)]

def srt(i, npay):
    k = pick(i, keysR)
    out = jax.lax.sort((k,) + tuple(payR[:npay]), num_keys=1,
                       is_stable=True)
    return chk(*out[:3])
bench("S sort R keys + 2 payloads", lambda i: srt(i, 2))
bench("S sort R keys + 6 payloads", lambda i: srt(i, 6))
bench("S sort R keys + 12 payloads", lambda i: srt(i, 12))

# transpose cost in isolation
big2 = jnp.asarray(rng.rand(2, NC, CHUNK, 16).astype(np.float32))
bench("T swapaxes [NC,128,16]->[NC,16,128] alone",
      lambda i: chk(jnp.swapaxes(pick(i, big2), 1, 2)))
print("done", flush=True)
