import time, numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops.binning import bin_and_sort, align_ranges
from gaussianeditor_tpu.ops.pallas_composite import CHUNK

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

pre = jax.jit(lambda s: preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
    s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
    active_sh_degree=s.active_sh_degree, max_sh_degree=3))
proc = pre(scene); jax.block_until_ready(proc)

fb = jax.jit(lambda p: bin_and_sort(p, gx, gy, R))
b = fb(proc); jax.block_until_ready(b)
t0=time.time()
for _ in range(5): b = fb(proc)
jax.block_until_ready(b); print(f"bin_and_sort alone: {(time.time()-t0)/5*1000:.1f} ms")

fa = jax.jit(lambda bb: align_ranges(bb, nt, CHUNK))
ab = fa(b); jax.block_until_ready(ab)
t0=time.time()
for _ in range(5): ab = fa(b)
jax.block_until_ready(ab); print(f"align alone: {(time.time()-t0)/5*1000:.1f} ms")

# piecewise bisect of bin_and_sort
def piece_a(p):  # slot->gaussian map
    tiles = p.tiles_touched.astype(jnp.int32)
    incl = jnp.cumsum(tiles)
    slots = jnp.arange(R, dtype=jnp.int32)
    g = jnp.searchsorted(incl, slots, side="right").astype(jnp.int32)
    return g, incl
def piece_b(p):  # tile ids
    g, incl = piece_a(p)
    excl = incl - p.tiles_touched.astype(jnp.int32)
    g2 = jnp.minimum(g, n-1)
    t = jnp.arange(R, dtype=jnp.int32) - excl[g2]
    rect_min = p.rect_min[g2]
    rect_w = jnp.maximum(p.rect_max[g2,0]-rect_min[:,0], 1)
    tile_x = rect_min[:,0] + t % rect_w
    tile_y = rect_min[:,1] + t // rect_w
    tile_id = tile_y * gx + tile_x
    valid = jnp.arange(R, dtype=jnp.int32) < incl[-1]
    tile_id = jnp.where(valid, tile_id, nt).astype(jnp.int32)
    depth = jnp.where(valid, p.depth[g2], jnp.inf).astype(jnp.float32)
    return tile_id, depth, g2
def piece_c(p):  # + sort
    tile_id, depth, g2 = piece_b(p)
    return jax.lax.sort((tile_id, depth, g2), num_keys=2, is_stable=True)
def piece_d(p):  # + range searchsorted
    st, sd, sg = piece_c(p)
    tid = jnp.arange(nt, dtype=jnp.int32)
    return jnp.searchsorted(st, tid, side="left"), jnp.searchsorted(st, tid, side="right"), sg

for name, fn in [("a slot->gauss", piece_a), ("b tile ids", piece_b), ("c sort", piece_c), ("d ranges", piece_d)]:
    f = jax.jit(fn)
    r = f(proc); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(5): r = f(proc)
    jax.block_until_ready(r)
    print(name, f"{(time.time()-t0)/5*1000:.1f} ms")
