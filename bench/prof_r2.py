"""Round-2 fine-grained decomposition: binning internals, preprocess vjp,
backward scatter."""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops.binning import bin_and_sort, align_ranges
from gaussianeditor_tpu.ops import pallas_composite as pc

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
gx = gy = hw//TILE; nt = gx*gy; r2 = R + pc.CHUNK*nt
N = 10

pr0 = jax.jit(lambda s: preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
    s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
    active_sh_degree=s.active_sh_degree, max_sh_degree=3))(scene)
jax.block_until_ready(pr0)

def bench(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    t0=time.perf_counter(); r=f(*args); jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/N*1000:.2f} ms", flush=True)

def loop(body0):
    def fn(*args):
        def body(i, acc):
            return acc + body0(i, *args)
        return jax.lax.fori_loop(0, N, body, 0.0)
    return fn

# 1. preprocess forward only
def pre_f(i, s):
    p = preprocess(s.params.xyz + i*1e-9, s.params.log_scales, s.params.quats,
        s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
        active_sh_degree=3, max_sh_degree=3)
    return jnp.sum(p.mean2d) + jnp.sum(p.color)
bench("preprocess fwd", loop(pre_f), scene)

# 2. preprocess fwd+vjp
def pre_g(i, s):
    def f(xyz, ls, q, op, sh):
        p = preprocess(xyz, ls, q, op, sh, cam, alive=s.alive,
                       active_sh_degree=3, max_sh_degree=3)
        return jnp.sum(p.mean2d) + jnp.sum(p.color) + jnp.sum(p.conic) + jnp.sum(p.opacity) + jnp.sum(p.depth)
    g = jax.grad(f, argnums=(0,1,2,3,4))(s.params.xyz + i*1e-9, s.params.log_scales,
        s.params.quats, s.get_opacity[:,0], s.get_features)
    return jnp.sum(g[0])
bench("preprocess fwd+vjp", loop(pre_g), scene)

# 3a. key construction only (repeat + gathers + key)
def keys_only(i, p):
    tiles = p.tiles_touched.astype(jnp.int32)
    incl = jnp.cumsum(tiles); excl = incl - tiles
    num_rendered = incl[-1]
    C = tiles.shape[0]
    slots = jnp.arange(R, dtype=jnp.int32)
    g = jnp.repeat(jnp.arange(C, dtype=jnp.int32), tiles, total_repeat_length=R)
    t = slots - excl[g]
    rect_min = p.rect_min[g]
    rect_w = jnp.maximum(p.rect_max[g,0] - rect_min[:,0], 1)
    tile_x = rect_min[:,0] + t % rect_w
    tile_y = rect_min[:,1] + t // rect_w
    tile_id = tile_y * gx + tile_x
    valid = slots < num_rendered
    tile_id = jnp.where(valid, tile_id, nt).astype(jnp.int32)
    depth = jnp.where(valid, p.depth[g] + i*1e-9, jnp.inf).astype(jnp.float32)
    tile_bits = max((nt+1).bit_length(), 1); depth_bits = 32 - tile_bits
    dkey = jax.lax.bitcast_convert_type(depth, jnp.uint32) >> (32 - depth_bits)
    key = (tile_id.astype(jnp.uint32) << depth_bits) | dkey
    return jnp.sum(key.astype(jnp.float32)) + jnp.sum(g)
bench("binning: keys only", loop(keys_only), pr0)

# 3b. keys + sort
def keys_sort(i, p):
    b = bin_and_sort(p._replace(depth=p.depth + i*1e-9), gx, gy, R)
    return jnp.sum(b.gauss_id) + jnp.sum(b.tile_start)
bench("binning: full bin_and_sort", loop(keys_sort), pr0)

# 3c. raw lax.sort of R random uint32 keys + payload
k0 = jnp.asarray(rng.randint(0, 2**31, R).astype(np.uint32))
v0 = jnp.asarray(rng.randint(0, n, R).astype(np.int32))
def raw_sort(i, k, v):
    sk, sv = jax.lax.sort((k + i, v), num_keys=1, is_stable=True)
    return jnp.sum(sv).astype(jnp.float32)
bench(f"raw lax.sort R={R}", loop(raw_sort), k0, v0)

kc = jnp.asarray(rng.randint(0, 2**31, n).astype(np.uint32))
vc = jnp.asarray(rng.randint(0, n, n).astype(np.int32))
def raw_sort_c(i, k, v):
    sk, sv = jax.lax.sort((k + i, v), num_keys=1, is_stable=True)
    return jnp.sum(sv).astype(jnp.float32)
bench(f"raw lax.sort C={n}", loop(raw_sort_c), kc, vc)

# batched small sorts: [4096, 128] along last axis
kb = jnp.asarray(rng.randint(0, 2**31, (R//128, 128)).astype(np.uint32))
vb = jnp.asarray(rng.randint(0, n, (R//128, 128)).astype(np.int32))
def raw_sort_b(i, k, v):
    sk, sv = jax.lax.sort((k + i, v), dimension=1, num_keys=1, is_stable=True)
    return jnp.sum(sv).astype(jnp.float32)
bench("batched lax.sort [4096,128]", loop(raw_sort_b), kb, vb)
kb2 = kb.reshape(R//1024, 1024)
vb2 = vb.reshape(R//1024, 1024)
def raw_sort_b2(i, k, v):
    sk, sv = jax.lax.sort((k + i, v), dimension=1, num_keys=1, is_stable=True)
    return jnp.sum(sv).astype(jnp.float32)
bench("batched lax.sort [512,1024]", loop(raw_sort_b2), kb2, vb2)

# 4. align_ranges
b0 = jax.jit(lambda p: bin_and_sort(p, gx, gy, R))(pr0)
jax.block_until_ready(b0)
def align_only(i, b):
    ab = align_ranges(b._replace(gauss_id=b.gauss_id + 0*i), nt, pc.CHUNK)
    return jnp.sum(ab.gauss_id).astype(jnp.float32) + jnp.sum(ab.tile_start)
bench("align_ranges", loop(align_only), b0)

# 5. scatter-add: [R2,16] rows into [C+1,16]
GF = 16
grows = jnp.asarray(rng.randn(GF, r2).astype(np.float32))
gids = jnp.asarray(rng.randint(0, n, r2).astype(np.int32))
def scat(i, gr, gi):
    acc = jnp.zeros((n+1, GF), jnp.float32).at[gi].add(gr.T + i*1e-9)
    return jnp.sum(acc)
bench("bwd scatter-add [R2,16]->[C,16]", loop(scat), grows, gids)

# 6. segment-sum formulation of the same reduction (sorted ids)
gids_sorted = jnp.sort(gids)
def seg(i, gr, gi):
    acc = jax.ops.segment_sum(gr.T + i*1e-9, gi, num_segments=n+1)
    return jnp.sum(acc)
bench("segment_sum sorted ids", loop(seg), grows, gids_sorted)

# 7. the pack transpose alone: [R2,16] -> [16,R2]
rows = jnp.asarray(rng.randn(r2, 16).astype(np.float32))
def tr(i, r_):
    return jnp.sum((r_ + i*1e-9).T[0])
bench("transpose [R2,16]->[16,R2]", loop(tr), rows)

# 8. the pack gather alone: g[gid] rows
gtab = jnp.asarray(rng.randn(n+1, 16).astype(np.float32))
def gath(i, g_, gi):
    return jnp.sum(g_[gi] + i*1e-9)
bench("row gather [C,16] x R2", loop(gath), gtab, gids)
