"""Edit-step glue profile: what do the non-render parts cost?"""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.core.cameras import orbit_cameras
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.train.optim import GaussianAdam, OptimConfig
from gaussianeditor_tpu.train.trainer import (
    LossWeights, init_train_state, make_train_step, stack_cameras)
from gaussianeditor_tpu.train.losses import l1_loss
from gaussianeditor_tpu.train.anchors import anchor_loss
from gaussianeditor_tpu.train.densify import add_densification_stats

n = 100_000; hw = 512; batch = 2
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
cams = orbit_cameras(batch, 4.0, 0.8, 0.8, hw, hw)
cam_batch = stack_cameras(cams)
targets = jnp.asarray(rng.rand(batch, hw, hw, 3).astype(np.float32))
optim = GaussianAdam(config=OptimConfig())
state = init_train_state(scene, optim)

N = 20
OVERHEAD = None

def bench(name, body0, *args):
    global OVERHEAD
    def fn(*a):
        def body(i, acc):
            return jax.tree.map(lambda x: x, body0(i, *a)) if False else (
                acc * 0.5 + body0(i, *a))
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

def fdep(i):
    return 1 + 1e-9 * i.astype(jnp.float32)

def st_anchor(i):
    s = scene.replace(params=scene.params.replace(
        xyz=scene.params.xyz * fdep(i)))
    def loss(p):
        a = anchor_loss(s.replace(params=p))
        return (a["loss_anchor_color"] + a["loss_anchor_geo"]
                + a["loss_anchor_scale"] + a["loss_anchor_opacity"])
    g = jax.grad(loss)(s.params)
    return jnp.sum(g.xyz) + jnp.sum(g.opacity_raw)


def st_optim(i):
    g = jax.tree.map(lambda x: x * (1e-9 * i.astype(jnp.float32)),
                     scene.params)
    p2, _ = optim.step(scene.params, g, state.opt_state,
                       grad_mask=scene.mask, step_override=state.step)
    return jnp.sum(p2.xyz) + jnp.sum(p2.quats)


def st_stats(i):
    vnorm = jnp.abs(scene.params.xyz[:, 0]) * fdep(i)
    radii = (scene.params.xyz[:, 1] * 100).astype(jnp.int32)
    vis = scene.params.xyz[:, 2] > 0
    st = add_densification_stats(state.stats, vnorm, radii, vis)
    return jnp.sum(st.xyz_gradient_accum) + jnp.sum(st.max_radii2d)
bench("densification stats", st_stats)

def st_l1(i):
    x = targets * fdep(i)
    def loss(x):
        return l1_loss(x[0], targets[1])
    g = jax.grad(loss)(x)
    return jnp.sum(g)
bench("l1 512^2 fwd+bwd", st_l1)

step = make_train_step(optim, LossWeights(), max_instances=393_216)

def st_step(i):
    t2 = targets * fdep(i)
    st2, metrics = step(state, cam_batch, t2)
    return metrics["loss"] + jnp.sum(st2.scene.params.xyz[::63, 0])
bench("full train step (batch 2)", st_step)
print("done", flush=True)
