"""Forward kernel standalone cost decomposition (TPU).

Times make_forward's pallas_call on prepacked REAL bench-scene data,
then with n_valid=0 everywhere (all compute skipped -> pure grid+DMA
overhead), then with a half grid, to locate where the ms go."""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops.binning_dense import dense_bin, dense_capacities
from gaussianeditor_tpu.ops import pallas_composite as pc

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
ch = 3; CH1 = 4; F = pc._pad8(7+ch)
N = 30

# host-side: build real packed inputs once
proc = jax.jit(lambda s: preprocess(
    s.params.xyz, s.params.log_scales, s.params.quats, s.get_opacity[:,0],
    s.get_features, cam, alive=s.alive, active_sh_degree=3, max_sh_degree=3))(scene)
db = jax.jit(lambda p: dense_bin(p, gx, gy, MI))(proc)
print("num_rendered:", int(db.num_rendered), "of budget", R, flush=True)

g = jnp.concatenate([proc.mean2d, proc.conic, proc.opacity[:,None],
                     proc.depth[:,None], proc.color], axis=1)
g = jnp.pad(g, ((0,0),(0,F-g.shape[1])))
rows_sorted = jnp.pad(g[db.sorted_g], ((0,1),(0,0)))
lane = jax.lax.broadcasted_iota(jnp.int32, (NC, 128), 1)
src = jnp.where(lane < db.chunk_nvalid[:,None], db.chunk_p0[:,None]+lane, R)
inst = jax.device_put(rows_sorted[src.reshape(-1)].T)  # [F, R2]

fwd_call = pc.make_forward(ntiles, gx, ch, NC)

def bench(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/N*1000:.3f} ms/iter", flush=True)

def loop_kernel(inst, ct, cf, nv, co):
    def body(i, acc):
        (out,) = fwd_call(ct, cf, nv, co,
                          inst * (1.0 + 1e-9 * i.astype(jnp.float32)))
        return acc + jnp.sum(out[::64, ::31, 0])
    return jax.lax.fori_loop(0, N, body, 0.0)

bench("fwd kernel real", loop_kernel, inst, db.chunk_tile, db.chunk_first,
      db.chunk_nvalid, db.chunk_offset)
bench("fwd kernel all-skip", loop_kernel, inst, db.chunk_tile,
      db.chunk_first, jnp.zeros_like(db.chunk_nvalid), db.chunk_offset)

# half-capacity variant: same data truncated to NC2 chunks
MIh = MI // 2
Rh, R2h, NCh = dense_capacities(MIh, ntiles)
fwd_h = pc.make_forward(ntiles, gx, ch, NCh)
insth = inst[:, :NCh*128]
def loop_h(inst, ct, cf, nv, co):
    def body(i, acc):
        (out,) = fwd_h(ct[:NCh], cf[:NCh], nv[:NCh], co[:NCh],
                       inst * (1.0 + 1e-9 * i.astype(jnp.float32)))
        return acc + jnp.sum(out[::64, ::31, 0])
    return jax.lax.fori_loop(0, N, body, 0.0)
bench("fwd kernel half-grid", loop_h, insth, db.chunk_tile, db.chunk_first,
      db.chunk_nvalid, db.chunk_offset)

# pack alone
def loop_pack(g, sorted_g, p0, nv):
    def body(i, acc):
        gs = g * (1.0 + 1e-9 * i.astype(jnp.float32))
        rows = jnp.pad(gs[sorted_g], ((0,1),(0,0)))
        lane = jax.lax.broadcasted_iota(jnp.int32, (NC, 128), 1)
        src = jnp.where(lane < nv[:,None], p0[:,None]+lane, R)
        out = rows[src.reshape(-1)].T
        return acc + jnp.sum(out[:, ::997])
    return jax.lax.fori_loop(0, N, body, 0.0)
bench("pack alone", loop_pack, g, db.sorted_g, db.chunk_p0, db.chunk_nvalid)
print("done", flush=True)
