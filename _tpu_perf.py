import time
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices())
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

for impl in ("pallas", "tiled"):
    kw = dict(impl=impl, max_instances=524288, tile_cap=2048, chunk=128)
    f = jax.jit(lambda s: render(s, cam, jnp.zeros(3), **kw).color)
    def loss(p):
        out = render(scene.replace(params=p), cam, jnp.zeros(3), **kw)
        return jnp.sum(out.color)+jnp.sum(out.depth)
    fb = jax.jit(jax.grad(loss))
    t0=time.time(); r = f(scene); jax.block_until_ready(r); print(impl, f"fwd compile: {time.time()-t0:.1f}s")
    t0=time.time()
    for _ in range(10): r = f(scene)
    jax.block_until_ready(r); fwd_ms=(time.time()-t0)/10*1000
    t0=time.time(); g = fb(scene.params); jax.block_until_ready(g.xyz); print(impl, f"fwd+bwd compile: {time.time()-t0:.1f}s")
    t0=time.time()
    for _ in range(10): g = fb(scene.params)
    jax.block_until_ready(g.xyz); fb_ms=(time.time()-t0)/10*1000
    print(f"{impl}: fwd {fwd_ms:.1f} ms | fwd+bwd {fb_ms:.1f} ms | {hw*hw/fb_ms/1000:.2f} Mpix/s fwd+bwd")
    print("   color mean", float(r.mean()))
