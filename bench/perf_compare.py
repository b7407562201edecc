"""Compare Pallas vs scan compositor throughput on the current backend
(amortized: N frames per dispatch to mask tunnel dispatch overhead)."""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.render import render

n = 100_000; hw = 512
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
N_ITER = 20

def bench(name, make_fn):
    f = jax.jit(make_fn)
    r = f(scene); jax.block_until_ready(r)   # compile
    t0 = time.time(); r = f(scene); jax.block_until_ready(r)
    dt = (time.time() - t0) / N_ITER * 1000
    mp = hw*hw/ (dt/1000) / 1e6
    print(f"{name}: {dt:.2f} ms/frame  ({mp:.1f} Mpix/s)")

def fwd_loop_pallas(s):
    def body(i, acc):
        out = render(s.replace(params=s.params.replace(
            opacity_raw=s.params.opacity_raw + i*1e-6)), cam, jnp.zeros(3),
            impl="pallas", max_instances=524288)
        return acc + jnp.sum(out.color)
    return jax.lax.fori_loop(0, N_ITER, body, 0.0)

def fwdbwd_loop_pallas(s):
    def loss(p):
        out = render(s.replace(params=p), cam, jnp.zeros(3),
                     impl="pallas", max_instances=524288)
        return jnp.sum(out.color)+jnp.sum(out.depth)
    def body(i, acc):
        g = jax.grad(loss)(s.params.replace(
            opacity_raw=s.params.opacity_raw + i*1e-6))
        return acc + jnp.sum(g.xyz)
    return jax.lax.fori_loop(0, N_ITER, body, 0.0)

def fwd_loop_tiled(s):
    def body(i, acc):
        out = render(s.replace(params=s.params.replace(
            opacity_raw=s.params.opacity_raw + i*1e-6)), cam, jnp.zeros(3),
            impl="tiled", max_instances=524288, tile_cap=1024, chunk=128)
        return acc + jnp.sum(out.color)
    return jax.lax.fori_loop(0, N_ITER, body, 0.0)

bench("pallas fwd", fwd_loop_pallas)
bench("pallas fwd+bwd", fwdbwd_loop_pallas)
bench("tiled fwd", fwd_loop_tiled)
