"""Decompose fwd+bwd cost: preprocess VJP vs compositor VJP."""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops.binning import bin_and_sort, align_ranges
from gaussianeditor_tpu.ops.pallas_composite import make_pallas_compositor, CHUNK
from gaussianeditor_tpu.ops.render import render

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
gx = gy = hw//TILE; nt = gx*gy
N = 10

def bench(name, fn):
    f = jax.jit(fn)
    r = f(scene); jax.block_until_ready(r)
    t0=time.time(); r=f(scene); jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/N*1000:.1f} ms")

def prep(s):
    return preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
        s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
        active_sh_degree=s.active_sh_degree, max_sh_degree=3)

def g_preprocess_only(s):
    def loss(p):
        pr = prep(s.replace(params=p))
        return jnp.sum(pr.mean2d) + jnp.sum(pr.conic) + jnp.sum(pr.color) + jnp.sum(pr.opacity)
    def body(i, acc):
        g = jax.grad(loss)(s.params.replace(opacity_raw=s.params.opacity_raw+i*1e-6))
        return acc + jnp.sum(g.xyz)
    return jax.lax.fori_loop(0, N, body, 0.0)

def g_compositor_only(s):
    pr = prep(s)
    b = bin_and_sort(pr, gx, gy, R)
    ab = align_ranges(b, nt, CHUNK)
    comp = make_pallas_compositor(nt, gx, 3, R+CHUNK*nt, s.capacity)
    def loss(m2, con, op, col, dep):
        t = comp(m2, con, op, col, dep, ab.gauss_id, ab.valid, ab.tile_start, ab.tile_len)
        return jnp.sum(t.color) + jnp.sum(t.depth) + jnp.sum(t.final_T)
    def body(i, acc):
        g = jax.grad(loss, argnums=(0,1,2,3,4))(pr.mean2d+i*0.0, pr.conic, pr.opacity, pr.color, pr.depth)
        return acc + jnp.sum(g[0])
    return jax.lax.fori_loop(0, N, body, 0.0)

def g_full(s):
    def loss(p):
        out = render(s.replace(params=p), cam, jnp.zeros(3), impl="pallas", max_instances=R)
        return jnp.sum(out.color)+jnp.sum(out.depth)
    def body(i, acc):
        g = jax.grad(loss)(s.params.replace(opacity_raw=s.params.opacity_raw+i*1e-6))
        return acc + jnp.sum(g.xyz)
    return jax.lax.fori_loop(0, N, body, 0.0)

bench("grad(preprocess only)", g_preprocess_only)
bench("grad(compositor only)", g_compositor_only)
bench("grad(full render)", g_full)
