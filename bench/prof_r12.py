"""Post-v5 stage profile: isolate the sorted bwd kernel and reduce."""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops import binning_sorted as bs
from gaussianeditor_tpu.ops.pallas_composite import (
    make_pallas_compositor_sorted, make_forward_sorted, make_backward_sorted,
    _pad8)

n = 100_000; hw = 512; MI = 393_216
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
sb0 = jax.jit(lambda p: bs.sorted_bin(p, gx, gy, MI))(p0)
comp = make_pallas_compositor_sorted(ntiles, gx, 3, scene.capacity, MI)
CH1 = 4
GF = _pad8(6 + CH1)

fwd_call = make_forward_sorted(ntiles, gx, 3, NC, NB)
bwd_call = make_backward_sorted(ntiles, gx, 3, NC, NB)

def fdep(i):
    return 1 + 1e-9 * i.astype(jnp.float32)

def st_bin(i, p):
    f = fdep(i)
    p = p._replace(mean2d=p.mean2d*f, depth=p.depth*f, conic=p.conic*f,
                   color=p.color*f, opacity=p.opacity*f)
    sb = bs.sorted_bin(p, gx, gy, MI)
    return jnp.sum(sb.blocks) + jnp.sum(sb.a_by_rank.astype(jnp.float32))
bench("sorted_bin full", st_bin, p0)

def st_fwdk(i):
    sb = sb0._replace(blocks=sb0.blocks * fdep(i))
    (out,) = fwd_call(sb.chunk_tile, sb.chunk_first, sb.chunk_nvalid,
                      sb.chunk_offset, sb.qblk, sb.shift, sb.blocks, sb.blocks)
    return jnp.sum(out)
bench("fwd kernel only", st_fwdk)

# fixed forward residuals for isolating the bwd kernel
out0 = jax.jit(lambda: comp(p0.mean2d, p0.conic, p0.opacity, p0.color,
                            p0.depth, sb0))()
acc0 = jnp.concatenate([out0.color, out0.depth[..., None]], axis=-1)
gall0 = jnp.concatenate(
    [jnp.ones_like(acc0), acc0, jnp.ones_like(out0.final_T)[..., None],
     out0.final_T[..., None],
     out0.n_contrib.astype(jnp.float32)[..., None]], axis=-1)
max_nc0 = jnp.max(out0.n_contrib, axis=-1)
active0 = ((sb0.chunk_nvalid > 0)
           & (sb0.chunk_offset < max_nc0[sb0.chunk_tile])).astype(jnp.int32)
print("live chunks:", int(jnp.sum(sb0.chunk_nvalid > 0)),
      "active bwd chunks:", int(jnp.sum(active0)), flush=True)

def st_bwdk(i):
    blocks = sb0.blocks * fdep(i)
    (grows,) = bwd_call(sb0.chunk_tile, sb0.chunk_first, sb0.chunk_nvalid,
                        sb0.chunk_offset, sb0.qblk, sb0.shift, active0,
                        blocks, blocks, gall0 * fdep(i))
    return jnp.sum(grows)
bench("bwd kernel only", st_bwdk)

rows_al0 = jnp.asarray(rng.randn(NC * 128, GF).astype(np.float32))

def st_gather(i):
    rows_rank = (rows_al0 * fdep(i))[sb0.a_by_rank]
    return jnp.sum(rows_rank)
bench("reduce: rank gather", st_gather)


def st_fb(i, p):
    sb = sb0._replace(blocks=sb0.blocks * fdep(i))
    def loss(m2, con, op, col, dep):
        out = comp(m2, con, op, col, dep, sb)
        return jnp.sum(out.color) + jnp.sum(out.depth)
    g = jax.grad(loss, argnums=(0,1,2,3,4))(
        p.mean2d, p.conic, p.opacity, p.color, p.depth)
    return jnp.sum(g[0]) + jnp.sum(g[2])
bench("compositor fwd+bwd", st_fb, p0)

from gaussianeditor_tpu.ops.render import render

def st_rfb(i, s):
    s2 = s.replace(params=s.params.replace(
        xyz=s.params.xyz * fdep(i)))
    def loss(pp_):
        out = render(s2.replace(params=pp_), cam, jnp.zeros(3),
                     impl="pallas", max_instances=MI)
        return jnp.sum(out.color) + jnp.sum(out.depth)
    g = jax.grad(loss)(s2.params)
    return jnp.sum(g.xyz * g.xyz) + jnp.sum(g.opacity_raw)
bench("render fwd+bwd full", st_rfb, scene)
print("done", flush=True)
