"""Definitive decomposition of the current compositor cost."""
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
N = 10

# fixed (precomputed) binning so we isolate pack/kernels
pr0 = jax.jit(lambda s: preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
    s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
    active_sh_degree=s.active_sh_degree, max_sh_degree=3))(scene)
ab = jax.jit(lambda p: align_ranges(bin_and_sort(p, gx, gy, R), nt, pc.CHUNK))(pr0)
jax.block_until_ready(ab)
comp = pc.make_pallas_compositor(nt, gx, 3, r2, scene.capacity)
meta = jax.jit(lambda a: pc.make_chunk_meta(a, r2 // pc.CHUNK))(ab)
jax.block_until_ready(meta)

CH1 = 4; F = 16
def pack(m2, con, op, col, dep):
    g = jnp.concatenate([m2, con, op[:,None], dep[:,None], col], axis=1)
    g = jnp.pad(g, ((0,1),(0,F-g.shape[1])))
    gid_safe = jnp.where(ab.valid, ab.gauss_id, g.shape[0]-1)
    return g[gid_safe].T

fwd_call = pc.make_forward(nt, gx, 3, r2 // pc.CHUNK)

def bench(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    t0=time.time(); r=f(*args); jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/N*1000:.1f} ms")

def only_pack(pr):
    def body(i, acc):
        inst = pack(pr.mean2d + i*1e-9, pr.conic, pr.opacity, pr.color, pr.depth)
        return acc + inst[0, 0] + inst[5, 1000]
    return jax.lax.fori_loop(0, N, body, 0.0)

def pack_fwd(pr):
    def body(i, acc):
        inst = pack(pr.mean2d + i*1e-9, pr.conic, pr.opacity, pr.color, pr.depth)
        (out,) = fwd_call(meta.tile, meta.first, meta.n_valid, meta.offset, inst)
        return acc + jnp.sum(out[..., :CH1])
    return jax.lax.fori_loop(0, N, body, 0.0)

def full_grad(pr):
    def loss(m2, con, op, col, dep):
        t = comp(m2, con, op, col, dep, ab.gauss_id, ab.valid, ab.tile_start, ab.tile_len)
        return jnp.sum(t.color)+jnp.sum(t.depth)+jnp.sum(t.final_T)
    def body(i, acc):
        g = jax.grad(loss, argnums=(0,1,2,3,4))(pr.mean2d+i*1e-9, pr.conic, pr.opacity, pr.color, pr.depth)
        return acc + jnp.sum(g[0])
    return jax.lax.fori_loop(0, N, body, 0.0)

bench("pack only", only_pack, pr0)
bench("pack+fwd kernel", pack_fwd, pr0)
bench("pack+fwd+bwd (custom_vjp)", full_grad, pr0)
