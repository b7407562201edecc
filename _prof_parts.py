import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops.binning import bin_and_sort, align_ranges
from gaussianeditor_tpu.ops.pallas_composite import make_pallas_compositor, CHUNK

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

def stage_pre(s):
    return preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
        s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
        active_sh_degree=s.active_sh_degree, max_sh_degree=3)
def stage_bin(s):
    p = stage_pre(s)
    return bin_and_sort(p, gx, gy, R)
def stage_align(s):
    b = stage_bin(s)
    return align_ranges(b, nt, CHUNK)
def stage_full(s):
    p = stage_pre(s)
    b = bin_and_sort(p, gx, gy, R)
    ab = align_ranges(b, nt, CHUNK)
    comp = make_pallas_compositor(nt, gx, 3, R + CHUNK*nt, s.capacity)
    t = comp(p.mean2d, p.conic, p.opacity, p.color, p.depth,
             ab.gauss_id, ab.valid, ab.tile_start, ab.tile_len)
    return t.color

for name, fn in [("preprocess", stage_pre), ("(+)binning", stage_bin),
                 ("(+)align", stage_align), ("(+)pallas fwd", stage_full)]:
    f = jax.jit(fn)
    r = f(scene); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(5): r = f(scene)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/5*1000:.1f} ms")
b = jax.jit(stage_bin)(scene)
print("num_rendered:", int(b.num_rendered))
