"""Decompose the edit train step cost."""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.core.cameras import orbit_cameras
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.ops.render import render
from gaussianeditor_tpu.train.anchors import anchor_loss
from gaussianeditor_tpu.train.losses import l1_loss
from gaussianeditor_tpu.train.optim import GaussianAdam, OptimConfig
from gaussianeditor_tpu.train.trainer import LossWeights, init_train_state, make_train_step, stack_cameras

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
cam_batch=stack_cameras(cams)
targets=jnp.asarray(rng.rand(B,hw,hw,3).astype(np.float32))
N=10
R=524_288

def bench(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    t0=time.perf_counter(); r=f(*args); jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/N*1000:.1f} ms")

cam_leaves, cam_treedef = jax.tree_util.tree_flatten(cam_batch)

def renders_only_grad(s):
    def loss(p):
        sc = s.replace(params=p)
        def per_view(carry, xs):
            leaves, target = xs
            cam = jax.tree_util.tree_unflatten(cam_treedef, leaves)
            out = render(sc, cam, jnp.zeros(3), impl="pallas", max_instances=R)
            return carry, l1_loss(out.color, target)
        _, l1s = jax.lax.scan(per_view, 0.0, (tuple(cam_leaves), targets))
        return jnp.mean(l1s)
    def body(i, acc):
        g = jax.grad(loss)(s.params.replace(opacity_raw=s.params.opacity_raw + i*1e-9))
        return acc + jnp.sum(g.xyz)
    return jax.lax.fori_loop(0, N, body, 0.0)

def renders_probe_grad(s):
    """+ the mean2d offset probe (like the real step)"""
    def loss(p, offsets):
        sc = s.replace(params=p)
        def per_view(carry, xs):
            leaves, target, off = xs
            cam = jax.tree_util.tree_unflatten(cam_treedef, leaves)
            out = render(sc, cam, jnp.zeros(3), mean2d_offset_ndc=off, impl="pallas", max_instances=R)
            rmax, vany = carry
            return (jnp.maximum(rmax, out.radii), vany | out.visible), l1_loss(out.color, target)
        (rm, va), l1s = jax.lax.scan(per_view, (jnp.zeros((n,),jnp.int32), jnp.zeros((n,),bool)), (tuple(cam_leaves), targets, offsets))
        return jnp.mean(l1s)
    def body(i, acc):
        offs = jnp.zeros((B, n, 2), jnp.float32)
        g, og = jax.grad(loss, argnums=(0,1))(s.params.replace(opacity_raw=s.params.opacity_raw + i*1e-9), offs)
        return acc + jnp.sum(g.xyz) + jnp.sum(og)
    return jax.lax.fori_loop(0, N, body, 0.0)

optim = GaussianAdam(config=OptimConfig())
step = make_train_step(optim, LossWeights(), max_instances=R)
def full_step(s0):
    st = init_train_state(s0, optim)
    return jax.lax.fori_loop(0, N, lambda i, st_: step(st_, cam_batch, targets)[0], st).scene.params.xyz.sum()

bench("2-view renders grad", renders_only_grad, scene)
bench("+probe/radii harvest", renders_probe_grad, scene)
bench("full train step", full_step, scene)
