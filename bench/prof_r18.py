"""Round-3 bisect after the bwd-kernel diet: where do the remaining
~24 ms go, and do the candidate glue cuts pay?

Candidates measured as raw primitives at production shapes:
  1. a_by_rank via 2-op sort (current) vs 1-D int scatter-set
  2. rank gather [R2,16] -> [R,16] (current) vs 10-col narrow gather
  3. cumsum width 16 vs 10
  4. alignment scans (cummax/cumsum/flip-cummin/searchsorted) total
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops import binning_sorted as bs
from gaussianeditor_tpu.ops.render import render

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


# full loss grad (reference point)
def loss(p):
    out = render(scene.replace(params=p), cam, jnp.zeros(3),
                 max_instances=MI)
    return jnp.sum(out.color) + jnp.sum(out.depth)


@jax.jit
def grad_loop(p):
    def body(i, acc):
        g = jax.grad(loss)(p.replace(xyz=p.xyz * (1.0 + i * 1e-9)))
        return acc + jnp.sum(g.xyz)
    return jax.lax.fori_loop(0, N, body, 0.0)


@jax.jit
def fwd_loop(p):
    def body(i, acc):
        return acc * 0.5 + loss(p.replace(xyz=p.xyz * (1.0 + i * 1e-9)))
    return jax.lax.fori_loop(0, N, body, 0.0)


timeit("full fwd+bwd", grad_loop, scene.params)
timeit("full fwd", fwd_loop, scene.params)


# binning alone (with and without a_by_rank consumption)
def proc_of(p):
    s = scene.replace(params=p)
    return preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
                      s.get_opacity[:, 0], s.get_features, cam,
                      alive=s.alive, active_sh_degree=s.active_sh_degree,
                      max_sh_degree=s.max_sh_degree)


@jax.jit
def bin_full(p):
    def body(i, acc):
        sb = bs.sorted_bin(proc_of(p.replace(xyz=p.xyz * (1 + 1e-9 * i))),
                           gx, gy, MI)
        return acc * 0.5 + jnp.sum(sb.blocks) + jnp.sum(
            sb.a_by_rank) + jnp.sum(sb.chunk_tile)
    return jax.lax.fori_loop(0, N, body, 0.0)


@jax.jit
def bin_no_abr(p):
    def body(i, acc):
        sb = bs.sorted_bin(proc_of(p.replace(xyz=p.xyz * (1 + 1e-9 * i))),
                           gx, gy, MI)
        return acc * 0.5 + jnp.sum(sb.blocks) + jnp.sum(sb.chunk_tile)
    return jax.lax.fori_loop(0, N, body, 0.0)


timeit("binning full", bin_full, scene.params)
timeit("binning w/o a_by_rank (DCE)", bin_no_abr, scene.params)

# primitive: permutation inversion — sort vs scatter
perm = np.random.RandomState(1).permutation(R).astype(np.int32)
a_vals = np.random.RandomState(2).randint(0, R2, R).astype(np.int32)
permj = jnp.asarray(perm)
aj = jnp.asarray(a_vals)


@jax.jit
def inv_sort(srank, a):
    def body(i, acc):
        sr = srank + jnp.where(i < 0, 1, 0)
        _, abr = jax.lax.sort((sr, a), num_keys=1, is_stable=True)
        return acc * 0.5 + jnp.sum(abr).astype(jnp.float32)
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))


@jax.jit
def inv_scatter(srank, a):
    def body(i, acc):
        sr = srank + jnp.where(i < 0, 1, 0)
        abr = jnp.zeros((R,), jnp.int32).at[sr].set(a, unique_indices=True)
        return acc * 0.5 + jnp.sum(abr).astype(jnp.float32)
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))


timeit("a_by_rank: int-pair sort", inv_sort, permj, aj)
timeit("a_by_rank: 1-D scatter-set", inv_scatter, permj, aj)

# primitive: rank gather wide vs narrow + cumsum widths
rows = jnp.asarray(np.random.RandomState(3).rand(R2, 16).astype(np.float32))
idx = jnp.asarray(np.random.RandomState(4).randint(0, R2, R).astype(np.int32))


def gather_w(rows, idx, width):
    @jax.jit
    def f(rows, idx):
        def body(i, acc):
            ix = idx + jnp.where(i < 0, 1, 0)
            rr = rows[ix][:, :width]
            return acc * 0.5 + jnp.sum(rr)
        return jax.lax.fori_loop(0, N, body, 0.0)
    return f


timeit("rank gather 16-col", gather_w(rows, idx, 16), rows, idx)
timeit("rank gather 10-col", gather_w(rows, idx, 10), rows, idx)


def cumsum_w(width):
    r10 = rows[:R, :width]

    @jax.jit
    def f(r):
        def body(i, acc):
            rr = r * (1 + 1e-9 * i)
            return acc * 0.5 + jnp.sum(jnp.cumsum(rr, axis=0))
        return jax.lax.fori_loop(0, N, body, 0.0)
    return f, r10


f16, r16 = cumsum_w(16)
f10, r10 = cumsum_w(10)
timeit("cumsum [R,16]", f16, r16)
timeit("cumsum [R,10]", f10, r10)

# alignment scans total (everything in sorted_bin after the fat sort)
stile = jnp.asarray(np.sort(np.random.RandomState(5).randint(
    0, ntiles, R)).astype(np.int32))


@jax.jit
def scans(stile):
    def body(i, acc):
        st = stile + jnp.where(i < 0, 1, 0)
        p = jnp.arange(R, dtype=jnp.int32)
        is_b = jnp.concatenate([jnp.ones((1,), bool), st[1:] != st[:-1]])
        tstart = jax.lax.cummax(jnp.where(is_b, p, -1))
        off = p - tstart
        tprev = jnp.concatenate([jnp.zeros((1,), jnp.int32), tstart[:-1]])
        u = jnp.where(is_b & (p > 0), ((p - tprev + 127) // 128) * 128, 0)
        astart = jnp.cumsum(u)
        a = astart + off
        cpos = jnp.arange(NC, dtype=jnp.int32) * 128
        p0 = jnp.searchsorted(a, cpos, side="left").astype(jnp.int32)
        nb_ = jnp.where(is_b, p, R)
        nxt_incl = jax.lax.cummin(nb_[::-1])[::-1]
        return (acc * 0.5 + (jnp.sum(a) + jnp.sum(p0)
                             + jnp.sum(nxt_incl)).astype(jnp.float32))
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))


timeit("alignment scans (XLA)", scans, stile)
