"""Round-3 bisect of the remaining fwd+bwd buckets after the a-map fix
(bench: 23.0 ms / 11.4 Mpix/s; binning backward-deps 7.5):

  1. preprocess forward alone, and its vjp
  2. fwd / bwd pallas kernels alone (fixed metadata, perturbed payload)
  3. tiles_to_image x4 + gall concat assembly at production shapes
  4. rank reduce: blocked scan (current, materializes S) vs a
     no-materialize 4-lookup variant

    PYTHONPATH=/root/.axon_site:/root/repo python bench/prof_r21.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops import binning_sorted as bs
from gaussianeditor_tpu.ops import pallas_composite as pc
from gaussianeditor_tpu.ops.composite import tiles_to_image

n = 100_000
hw = 512
MI = 393_216
rng = np.random.RandomState(0)
quats = rng.randn(n, 4).astype(np.float32)
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
params = GaussianParams(
    xyz=jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32)),
    features_dc=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32) * 0.3),
    features_rest=jnp.asarray(np.zeros((n, 15, 3), np.float32)),
    opacity_raw=jnp.asarray(rng.uniform(-1, 1, (n, 1)).astype(np.float32)),
    log_scales=jnp.asarray(np.log(rng.uniform(0.004, 0.02, (n, 3))).astype(np.float32)),
    quats=jnp.asarray(quats))
scene = GaussianScene.create(params, max_sh_degree=3, active_sh_degree=3)
cam = lookat_camera(np.array([0, 0, -4.]), np.zeros(3), np.array([0, 1., 0]),
                    0.8, 0.8, hw, hw)
gx = gy = hw // TILE
ntiles = gx * gy
R, NB, NC = bs.sorted_capacities(MI, ntiles)
R2 = NC * 128
N = 20
CH = 3
CH1 = CH + 1
GF = 16

print(f"R={R} NB={NB} NC={NC}", flush=True)


def timeit(name, fn, *args):
    jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / N * 1000:.3f} ms/iter", flush=True)
    return best / N


def proc_of(p):
    s = scene.replace(params=p)
    return preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
                      s.get_opacity[:, 0], s.get_features, cam,
                      alive=s.alive, active_sh_degree=s.active_sh_degree,
                      max_sh_degree=s.max_sh_degree)


@jax.jit
def pre_fwd(p):
    def body(i, acc):
        pr = proc_of(p.replace(xyz=p.xyz * (1 + 1e-9 * i)))
        return (acc * 0.5 + jnp.sum(pr.mean2d) + jnp.sum(pr.conic)
                + jnp.sum(pr.color) + jnp.sum(pr.depth)
                + jnp.sum(pr.tiles_touched).astype(jnp.float32))
    return jax.lax.fori_loop(0, N, body, 0.0)


@jax.jit
def pre_grad(p):
    def lossp(pp):
        pr = proc_of(pp)
        return (jnp.sum(pr.mean2d) + jnp.sum(pr.conic) + jnp.sum(pr.color)
                + jnp.sum(pr.depth) + jnp.sum(pr.opacity))

    def body(i, acc):
        g = jax.grad(lossp)(p.replace(xyz=p.xyz * (1 + 1e-9 * i)))
        return acc + jnp.sum(g.xyz)
    return jax.lax.fori_loop(0, N, body, 0.0)


timeit("preprocess fwd", pre_fwd, scene.params)
timeit("preprocess fwd+vjp", pre_grad, scene.params)

# fixed binning (host once), perturbed payload -> kernel-only timings
sb0 = jax.jit(lambda p: bs.sorted_bin(proc_of(p), gx, gy, MI))(scene.params)
sb0 = jax.tree.map(jax.block_until_ready, sb0)
fwd_call = pc.make_forward_sorted(ntiles, gx, CH, NC, NB)
bwd_call = pc.make_backward_sorted(ntiles, gx, CH, NC, NB)


@jax.jit
def fwd_kernel_only(sb):
    def body(i, acc):
        blk = sb.blocks * (1 + 1e-9 * i)
        (out,) = fwd_call(sb.chunk_tile, sb.chunk_first, sb.chunk_nvalid,
                          sb.chunk_offset, sb.qblk, sb.shift, blk, blk)
        return acc * 0.5 + jnp.sum(out)
    return jax.lax.fori_loop(0, N, body, 0.0)


timeit("fwd kernel only", fwd_kernel_only, sb0)

gall0 = jnp.asarray(np.random.RandomState(7).rand(
    ntiles, 256, 2 * CH1 + 3).astype(np.float32))
act0 = (sb0.chunk_nvalid > 0).astype(jnp.int32)


@jax.jit
def bwd_kernel_only(sb, gall):
    def body(i, acc):
        blk = sb.blocks * (1 + 1e-9 * i)
        (grows,) = bwd_call(sb.chunk_tile, sb.chunk_first, sb.chunk_nvalid,
                            sb.chunk_offset, sb.qblk, sb.shift, act0,
                            blk, blk, gall)
        return acc * 0.5 + jnp.sum(grows)
    return jax.lax.fori_loop(0, N, body, 0.0)


timeit("bwd kernel only (all chunks active)", bwd_kernel_only, sb0, gall0)

# assembly: 4x tiles_to_image + bg add (fwd side)
tiles_c = jnp.asarray(np.random.RandomState(8).rand(
    ntiles, 256, CH1 + 2).astype(np.float32))


@jax.jit
def assemble(tb):
    def body(i, acc):
        t = tb * (1 + 1e-9 * i)
        color = tiles_to_image(t[..., :CH], gx, gy, hw, hw)
        depth = tiles_to_image(t[..., CH], gx, gy, hw, hw)
        fT = tiles_to_image(t[..., CH1], gx, gy, hw, hw)
        ncb = tiles_to_image(t[..., CH1 + 1], gx, gy, hw, hw)
        color = color + fT[..., None] * 0.5
        return (acc * 0.5 + jnp.sum(color) + jnp.sum(depth) + jnp.sum(fT)
                + jnp.sum(ncb))
    return jax.lax.fori_loop(0, N, body, 0.0)


timeit("assembly: 4x tiles_to_image + bg", assemble, tiles_c)

# gall build (bwd side): image->tile retiling of cotangents + concat
gimg = jnp.asarray(np.random.RandomState(9).rand(
    hw, hw, CH1 + 1).astype(np.float32))


def image_to_tiles(img):
    t = img.reshape(gy, TILE, gx, TILE, -1)
    t = jnp.moveaxis(t, 1, 2)
    return t.reshape(ntiles, 256, -1)


@jax.jit
def gall_build(gimg, tb):
    def body(i, acc):
        g = gimg * (1 + 1e-9 * i)
        gt = image_to_tiles(g)
        gall = jnp.concatenate(
            [gt[..., :CH1], tb[..., :CH1], gt[..., CH1:],
             tb[..., CH1:CH1 + 1], tb[..., CH1 + 1:]], axis=-1)
        return acc * 0.5 + jnp.sum(gall)
    return jax.lax.fori_loop(0, N, body, 0.0)


timeit("gall build: retile + concat", gall_build, gimg, tiles_c)

# rank reduce: current vs no-materialize lookups
rows = jnp.asarray(np.random.RandomState(3).rand(R2, GF).astype(np.float32))
b_incl = jnp.asarray(np.sort(np.random.RandomState(6).randint(
    0, R2, scene.capacity)).astype(np.int32))


@jax.jit
def reduce_current(rows):
    def body(i, acc):
        rr = rows * (1 + 1e-9 * i)
        d = pc.rank_space_reduce(rr, b_incl, R2)
        return acc * 0.5 + jnp.sum(d)
    return jax.lax.fori_loop(0, N, body, 0.0)


def _tri_excl():
    j = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    return (j < k).astype(jnp.float32)


@jax.jit
def reduce_lookup(rows):
    def body(i, acc):
        rr = rows * (1 + 1e-9 * i)
        nblk = R2 // 128
        x = rr.reshape(nblk, 128, GF)
        ipx = jnp.einsum("kj,bkc->bjc", _tri_excl(), x,
                         precision=jax.lax.Precision.HIGHEST)
        P = ipx[:, 127, :] + x[:, 127, :]
        mu = jnp.mean(P, axis=0, keepdims=True)
        bpc = jnp.concatenate(
            [jnp.zeros((1, GF), jnp.float32),
             jnp.cumsum(P - mu, axis=0, dtype=jnp.float32)], axis=0)
        base = bpc + mu * jnp.arange(nblk + 1, dtype=jnp.float32)[:, None]
        ipxf = ipx.reshape(-1, GF)

        def ipx_at(b):
            # exclusive intra-block prefix at b; b == R2 (pad block lane 0)
            # is 0 by definition — masked instead of materializing a
            # padded copy of the 25 MB table
            v = ipxf[jnp.minimum(b, R2 - 1)]
            return jnp.where((b >= R2)[:, None], 0.0, v)

        b_hi = b_incl
        b_lo = jnp.concatenate([jnp.zeros((1,), jnp.int32), b_incl[:-1]])
        d = (base[b_hi // 128] - base[b_lo // 128]
             + ipx_at(b_hi) - ipx_at(b_lo))
        return acc * 0.5 + jnp.sum(d)
    return jax.lax.fori_loop(0, N, body, 0.0)


timeit("rank reduce: current (S materialized)", reduce_current, rows)
timeit("rank reduce: 4-lookup (no S)", reduce_lookup, rows)

# the rank gather feeding the reduce
idx = jnp.asarray(np.random.RandomState(4).randint(0, R2, R).astype(np.int32))


@jax.jit
def rank_gather(rows, idx):
    def body(i, acc):
        ix = idx + jnp.where(i < 0, 1, 0)
        return acc * 0.5 + jnp.sum(rows[ix])
    return jax.lax.fori_loop(0, N, body, 0.0)


timeit("rank gather [R2,16] -> [R,16]", rank_gather, rows, idx)
