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
N = 10

def amortize(name, stage):
    def run(s):
        def body(i, acc):
            out = stage(s.replace(params=s.params.replace(
                opacity_raw=s.params.opacity_raw + i*1e-6)))
            return acc + out
        return jax.lax.fori_loop(0, N, body, 0.0)
    f = jax.jit(run)
    r = f(scene); jax.block_until_ready(r)
    t0=time.time(); r = f(scene); jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/N*1000:.1f} ms")

def s_pre(s):
    p = preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
        s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
        active_sh_degree=s.active_sh_degree, max_sh_degree=3)
    return jnp.sum(p.mean2d) + jnp.sum(p.depth)
def s_bin(s):
    p = preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
        s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
        active_sh_degree=s.active_sh_degree, max_sh_degree=3)
    b = bin_and_sort(p, gx, gy, R)
    return jnp.sum(b.gauss_id) * 1.0
def s_align(s):
    p = preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
        s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
        active_sh_degree=s.active_sh_degree, max_sh_degree=3)
    b = bin_and_sort(p, gx, gy, R)
    ab = align_ranges(b, nt, CHUNK)
    return jnp.sum(ab.gauss_id) * 1.0
def s_full(s):
    p = preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
        s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
        active_sh_degree=s.active_sh_degree, max_sh_degree=3)
    b = bin_and_sort(p, gx, gy, R)
    ab = align_ranges(b, nt, CHUNK)
    comp = make_pallas_compositor(nt, gx, 3, R + CHUNK*nt, s.capacity)
    t = comp(p.mean2d, p.conic, p.opacity, p.color, p.depth,
             ab.gauss_id, ab.valid, ab.tile_start, ab.tile_len)
    return jnp.sum(t.color)

amortize("preprocess", s_pre)
amortize("+bin", s_bin)
amortize("+align", s_align)
amortize("+pallas", s_full)

from gaussianeditor_tpu.ops.pallas_composite import _pad8
def s_pack(s):
    p = preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
        s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
        active_sh_degree=s.active_sh_degree, max_sh_degree=3)
    b = bin_and_sort(p, gx, gy, R)
    ab = align_ranges(b, nt, CHUNK)
    gid = ab.gauss_id
    vf = ab.valid.astype(jnp.float32)
    rows = [p.mean2d[gid,0], p.mean2d[gid,1], p.conic[gid,0], p.conic[gid,1],
            p.conic[gid,2], p.opacity[gid]*vf, p.depth[gid]] + \
           [p.color[gid,c] for c in range(3)]
    packed = jnp.stack(rows, axis=0)
    packed = jnp.pad(packed, ((0, 6), (0, 0)))
    return jnp.sum(packed)
amortize("+pack(no kernel)", s_pack)

def s_kernel_only(s):
    p = preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
        s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
        active_sh_degree=s.active_sh_degree, max_sh_degree=3)
    b = bin_and_sort(p, gx, gy, R)
    ab = align_ranges(b, nt, CHUNK)
    gid = ab.gauss_id
    vf = ab.valid.astype(jnp.float32)
    rows = [p.mean2d[gid,0], p.mean2d[gid,1], p.conic[gid,0], p.conic[gid,1],
            p.conic[gid,2], p.opacity[gid]*vf, p.depth[gid]] + \
           [p.color[gid,c] for c in range(3)]
    inst = jnp.pad(jnp.stack(rows, axis=0), ((0, 6), (0, 0)))
    from gaussianeditor_tpu.ops.pallas_composite import make_forward
    fwd = make_forward(nt, gx, 3, R + CHUNK*nt)
    def body(i, acc):
        out = fwd(ab.tile_start, ab.tile_len, inst + i*0.0)
        return acc + jnp.sum(out[0])
    return jax.lax.fori_loop(0, N, body, 0.0)

f = jax.jit(s_kernel_only)
r = f(scene); jax.block_until_ready(r)
import time as _t
t0=_t.time(); r = f(scene); jax.block_until_ready(r)
print(f"kernel-only loop: {(_t.time()-t0)/N*1000:.1f} ms")
