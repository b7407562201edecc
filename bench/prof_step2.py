import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.core.cameras import orbit_cameras
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.ops.render import render
from gaussianeditor_tpu.train.losses import l1_loss

n=100_000; hw=512; B=2
rng=np.random.RandomState(0)
quats=rng.randn(n,4).astype(np.float32); quats/=np.linalg.norm(quats,axis=1,keepdims=True)
params=GaussianParams(xyz=jnp.asarray(rng.uniform(-1,1,(n,3)).astype(np.float32)),
 features_dc=jnp.asarray(rng.randn(n,1,3).astype(np.float32)*0.3),
 features_rest=jnp.asarray(np.zeros((n,15,3),np.float32)),
 opacity_raw=jnp.asarray(rng.uniform(-1,1,(n,1)).astype(np.float32)),
 log_scales=jnp.asarray(np.log(rng.uniform(0.004,0.02,(n,3))).astype(np.float32)),
 quats=jnp.asarray(quats))
scene=GaussianScene.create(params, max_sh_degree=3, active_sh_degree=3)
cams=orbit_cameras(B,4.0,0.8,0.8,hw,hw)
targets=jnp.asarray(rng.rand(B,hw,hw,3).astype(np.float32))
N=10; R=524_288

def unrolled(s):
    def loss(p):
        sc = s.replace(params=p)
        total = 0.0
        for b, cam in enumerate(cams):
            out = render(sc, cam, jnp.zeros(3), impl="pallas", max_instances=R)
            total = total + l1_loss(out.color, targets[b])
        return total / B
    def body(i, acc):
        g = jax.grad(loss)(s.params.replace(opacity_raw=s.params.opacity_raw + i*1e-9))
        return acc + jnp.sum(g.xyz)
    return jax.lax.fori_loop(0, N, body, 0.0)

f = jax.jit(unrolled)
r = f(scene); jax.block_until_ready(r)
t0=time.perf_counter(); r=f(scene); jax.block_until_ready(r)
print(f"unrolled 2-view grad: {(time.perf_counter()-t0)/N*1000:.1f} ms")
