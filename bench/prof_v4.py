"""Stage-by-stage timing of the v4 compact-binning pallas path on TPU.
float()-synced; N iters inside one jit; EMPTY baseline subtracted."""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops.binning_dense import dense_bin, dense_capacities
from gaussianeditor_tpu.ops.pallas_composite import (
    make_pallas_compositor_dense, make_forward, _pad8)
from gaussianeditor_tpu.ops.render import render

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

def pre_f(i, s):
    p = pre(perturb(s, i))
    return jnp.sum(p.mean2d * p.color[:, :2]) + jnp.sum(p.conic * p.conic)
bench("preprocess fwd", pre_f, scene)

def dbin(i, s):
    p = pre(perturb(s, i))
    db = dense_bin(p, gx, gy, MI)
    return (jnp.sum((db.sorted_g[::7]).astype(jnp.float32))
            + jnp.sum((db.a_by_rank[::13]).astype(jnp.float32))
            + jnp.sum(db.chunk_nvalid).astype(jnp.float32))
bench("preprocess + dense_bin", dbin, scene)

comp = make_pallas_compositor_dense(ntiles, gx, 3, scene.capacity, MI)

def fwdonly(i, s):
    p = pre(perturb(s, i))
    db = dense_bin(p, gx, gy, MI)
    out = comp(p.mean2d, p.conic, p.opacity, p.color, p.depth, db)
    return jnp.sum(out.color[::3, ::5]) + jnp.sum(out.depth[::7])
bench("pre + bin + pack + fwd kernel", fwdonly, scene)

def fwdrender(i, s):
    out = render(perturb(s, i), cam, jnp.zeros(3), impl="pallas",
                 max_instances=MI)
    return jnp.sum(out.color[::3, ::5]) + jnp.sum(out.depth[::7, ::7])
bench("render fwd full", fwdrender, scene)

def fb(i, s):
    s = perturb(s, i)
    def loss(pp):
        out = render(s.replace(params=pp), cam, jnp.zeros(3), impl="pallas",
                     max_instances=MI)
        return jnp.sum(out.color) + jnp.sum(out.depth)
    g = jax.grad(loss)(s.params)
    return jnp.sum(g.xyz * g.xyz) + jnp.sum(g.opacity_raw)
bench("render fwd+bwd full", fb, scene)
print("done", flush=True)
