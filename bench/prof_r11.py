"""Stage profile of the v5 sorted-payload pipeline on TPU."""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops import binning_sorted as bs
from gaussianeditor_tpu.ops.pallas_composite import (
    make_pallas_compositor_sorted, make_forward_sorted, _pad8)
from gaussianeditor_tpu.ops.render import render

n = 100_000; hw = 512; MI = 524_288
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
gx = gy = hw//TILE; ntiles = gx*gy
R, NB, NC = bs.sorted_capacities(MI, ntiles)
print(f"R={R} NB={NB} NC={NC}", flush=True)
N = 30
OVERHEAD = None

def bench(name, body0, *args):
    global OVERHEAD
    def fn(*a):
        def body(i, acc):
            return acc * 0.5 + body0(i, *a)
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

def pre(s):
    return preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
        s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
        active_sh_degree=3, max_sh_degree=3)

p0 = jax.jit(pre)(scene)
p0 = jax.tree.map(jax.lax.stop_gradient, p0)

def pp(i, p):
    f = 1 + 1e-9 * i.astype(jnp.float32)
    z = jnp.where(i < 0, 1, 0).astype(jnp.int32)
    return p._replace(
        mean2d=p.mean2d * f, depth=p.depth * f, conic=p.conic * f,
        color=p.color * f, opacity=p.opacity * f,
        tiles_touched=p.tiles_touched + z, rect_min=p.rect_min + z,
        rect_max=p.rect_max + z)

# reimplement sorted_bin stagewise so intermediate outputs can be timed
num_tiles = ntiles
tile_bits = max((num_tiles + 1).bit_length(), 1)
depth_bits = 32 - tile_bits
C = n

def _tab(p):
    tt = p.tiles_touched
    b_incl = jnp.cumsum(tt, dtype=jnp.int32)
    b_prev = b_incl - tt
    total = b_incl[-1]
    first_rank = jnp.where(tt > 0, b_prev, R)
    mark = jnp.full((R,), -1, jnp.int32).at[first_rank].max(
        jnp.arange(C, dtype=jnp.int32))
    gsrc = jnp.maximum(jax.lax.cummax(mark), 0)
    depth = p.depth.astype(jnp.float32)
    dkey32 = (jax.lax.bitcast_convert_type(depth, jnp.uint32)
              >> (32 - depth_bits)).astype(jnp.int32)
    cols = [b_prev.astype(jnp.float32), tt.astype(jnp.float32),
            p.rect_min[:, 0].astype(jnp.float32),
            p.rect_min[:, 1].astype(jnp.float32),
            jnp.maximum(p.rect_max[:, 0]-p.rect_min[:, 0],1).astype(jnp.float32),
            dkey32.astype(jnp.float32),
            p.mean2d[:, 0], p.mean2d[:, 1],
            p.conic[:, 0], p.conic[:, 1], p.conic[:, 2],
            p.opacity, depth, p.color[:,0], p.color[:,1], p.color[:,2]]
    table = jnp.stack(cols, axis=1)
    table = jnp.pad(table, ((0, 1), (0, 0)))
    return table, gsrc, total, b_incl

def st_gather(i, p):
    p = pp(i, p)
    table, gsrc, total, b_incl = _tab(p)
    rows = table[jnp.minimum(gsrc, C)]
    return jnp.sum(rows)
bench("v5 table+expand+gather", st_gather, p0)

def st_key(i, p):
    p = pp(i, p)
    table, gsrc, total, b_incl = _tab(p)
    rows = table[jnp.minimum(gsrc, C)]
    key_call = bs._make_key_kernel(R, gx, depth_bits)
    key, rt = key_call(jnp.asarray([0], jnp.int32) + total, rows)
    return jnp.sum(key.astype(jnp.float32)) + jnp.sum(rt[::3, ::1023])
bench("v5 + key kernel", st_key, p0)

def st_sort(i, p):
    p = pp(i, p)
    table, gsrc, total, b_incl = _tab(p)
    rows = table[jnp.minimum(gsrc, C)]
    key_call = bs._make_key_kernel(R, gx, depth_bits)
    key, rt = key_call(jnp.asarray([0], jnp.int32) + total, rows)
    q = jnp.arange(R, dtype=jnp.int32)
    ops = (key,) + tuple(rt[6 + i_] for i_ in range(10)) + (gsrc, q)
    so = jax.lax.sort(ops, num_keys=1, is_stable=True)
    return sum(jnp.sum(o.astype(jnp.float32)) for o in so[1:])
bench("v5 + fat sort", st_sort, p0)

def st_blocks(i, p):
    p = pp(i, p)
    table, gsrc, total, b_incl = _tab(p)
    rows = table[jnp.minimum(gsrc, C)]
    key_call = bs._make_key_kernel(R, gx, depth_bits)
    key, rt = key_call(jnp.asarray([0], jnp.int32) + total, rows)
    q = jnp.arange(R, dtype=jnp.int32)
    ops = (key,) + tuple(rt[6 + i_] for i_ in range(10)) + (gsrc, q)
    so = jax.lax.sort(ops, num_keys=1, is_stable=True)
    scols = so[1:11]
    nbr = NB * bs.CHUNK - R
    blocks = jnp.stack(
        [jnp.pad(c_, (0, nbr)).reshape(NB, bs.CHUNK) for c_ in scols]
        + [jnp.zeros((NB, bs.CHUNK), jnp.float32)] * 6, axis=1)
    return jnp.sum(blocks)
bench("v5 + blocks stack", st_blocks, p0)

def st_bin(i, p):
    p = pp(i, p)
    sb = bs.sorted_bin(p, gx, gy, MI)
    return (jnp.sum(sb.blocks) + jnp.sum(sb.chunk_nvalid).astype(jnp.float32)
            + jnp.sum(sb.qblk).astype(jnp.float32))
bench("v5 sorted_bin full (no a_by_rank)", st_bin, p0)

def st_bin2(i, p):
    p = pp(i, p)
    sb = bs.sorted_bin(p, gx, gy, MI)
    return (jnp.sum(sb.blocks) + jnp.sum(sb.a_by_rank.astype(jnp.float32)))
bench("v5 sorted_bin full (+a_by_rank)", st_bin2, p0)

sb0 = jax.jit(lambda p: bs.sorted_bin(p, gx, gy, MI))(p0)
comp = make_pallas_compositor_sorted(ntiles, gx, 3, scene.capacity, MI)

def st_fwdk(i, p):
    f = 1 + 1e-9 * i.astype(jnp.float32)
    sb = sb0._replace(blocks=sb0.blocks * f)
    out = comp(p.mean2d, p.conic, p.opacity, p.color, p.depth, sb)
    return jnp.sum(out.color) + jnp.sum(out.depth)
bench("v5 fwd kernel (fixed bin)", st_fwdk, p0)

def st_fb(i, p):
    f = 1 + 1e-9 * i.astype(jnp.float32)
    sb = sb0._replace(blocks=sb0.blocks * f)
    def loss(m2, con, op, col, dep):
        out = comp(m2, con, op, col, dep, sb)
        return jnp.sum(out.color) + jnp.sum(out.depth)
    g = jax.grad(loss, argnums=(0,1,2,3,4))(
        p.mean2d, p.conic, p.opacity, p.color, p.depth)
    return jnp.sum(g[0]) + jnp.sum(g[2])
bench("v5 fwd+bwd compositor (fixed bin)", st_fb, p0)

def st_render(i, s):
    s2 = s.replace(params=s.params.replace(
        xyz=s.params.xyz * (1 + 1e-9 * i.astype(jnp.float32))))
    out = render(s2, cam, jnp.zeros(3), impl="pallas", max_instances=MI)
    return jnp.sum(out.color) + jnp.sum(out.depth)
bench("v5 render fwd full", st_render, scene)

def st_rfb(i, s):
    s2 = s.replace(params=s.params.replace(
        xyz=s.params.xyz * (1 + 1e-9 * i.astype(jnp.float32))))
    def loss(pp_):
        out = render(s2.replace(params=pp_), cam, jnp.zeros(3),
                     impl="pallas", max_instances=MI)
        return jnp.sum(out.color) + jnp.sum(out.depth)
    g = jax.grad(loss)(s2.params)
    return jnp.sum(g.xyz * g.xyz) + jnp.sum(g.opacity_raw)
bench("v5 render fwd+bwd full", st_rfb, scene)
print("done", flush=True)
