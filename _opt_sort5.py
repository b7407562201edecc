import time, numpy as np, jax, jax.numpy as jnp
R = 524288; C = 100_000
rng = np.random.RandomState(0)
def bench(name, f, *args):
    r = f(*args); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(5): r = f(*args)
    jax.block_until_ready(r)
    print(name, f"{(time.time()-t0)/5*1000:.2f} ms")

tt_synth = jnp.asarray(rng.randint(0, 8, C).astype(np.int32))
def slot_map(tt):
    incl = jnp.cumsum(tt)
    slots = jnp.arange(R, dtype=jnp.int32)
    return jnp.searchsorted(incl, slots, side="right").astype(jnp.int32)
f = jax.jit(slot_map)
bench("synthetic tt", f, tt_synth)

# real proc tiles_touched
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess
n = C
quats = rng.randn(n,4).astype(np.float32); quats/=np.linalg.norm(quats,axis=1,keepdims=True)
params = GaussianParams(
    xyz=jnp.asarray(rng.uniform(-1,1,(n,3)).astype(np.float32)),
    features_dc=jnp.asarray(rng.randn(n,1,3).astype(np.float32)*0.3),
    features_rest=jnp.asarray(np.zeros((n,15,3),np.float32)),
    opacity_raw=jnp.asarray(rng.uniform(-1,1,(n,1)).astype(np.float32)),
    log_scales=jnp.asarray(np.log(rng.uniform(0.004,0.02,(n,3))).astype(np.float32)),
    quats=jnp.asarray(quats))
scene = GaussianScene.create(params, max_sh_degree=3, active_sh_degree=3)
cam = lookat_camera(np.array([0,0,-4.]), np.zeros(3), np.array([0,1.,0]), 0.8,0.8,512,512)
pre = jax.jit(lambda s: preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
    s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
    active_sh_degree=s.active_sh_degree, max_sh_degree=3))
proc = pre(scene); jax.block_until_ready(proc)
tt_real = proc.tiles_touched
bench("real tt (device array)", f, tt_real)
tt_real_copy = jnp.asarray(np.asarray(tt_real))
bench("real tt (fresh copy)", f, tt_real_copy)
bench("synthetic again", f, tt_synth)

tiny = jnp.ones((8,))
ftiny = jax.jit(lambda x: x + 1)
bench("tiny op", ftiny, tiny)
del proc, scene, params
import gc; gc.collect()
bench("tiny op after gc", ftiny, tiny)
bench("synthetic after gc", f, tt_synth)
