"""Round-3 after-measurement for the three glue rewrites landed with the
kernel diet:

  1. alignment maps: R-sized scans -> [T+1] searchsorted tables
  2. rank_space_reduce: XLA 1-D cumsum [R,16] -> blocked MXU two-level scan
  3. kernel elementwise diet (exclusive-prefix tri, masked-alpha folds)

Run with the ambient axon platform (one TPU job at a time):
    PYTHONPATH=/root/.axon_site:/root/repo python bench/prof_r19.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops import binning_sorted as bs
from gaussianeditor_tpu.ops import pallas_composite as pc
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


# full loss grad / fwd (headline reference points)
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


# binning alone (new table-based alignment maps)
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


timeit("binning full (tables)", bin_full, scene.params)

# primitive: table-based alignment maps alone vs the retired scans
stile = jnp.asarray(np.sort(np.random.RandomState(5).randint(
    0, ntiles, R)).astype(np.int32))


@jax.jit
def tables(stile):
    def body(i, acc):
        st = stile + jnp.where(i < 0, 1, 0)
        T = ntiles
        bounds = jnp.searchsorted(
            st, jnp.arange(T + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        cnt = bounds[1:] - bounds[:-1]
        pad_cnt = ((cnt + 127) // 128) * 128
        a_incl = jnp.cumsum(pad_cnt, dtype=jnp.int32)
        a_excl = jnp.concatenate([jnp.zeros((1,), jnp.int32), a_incl])
        cpos = jnp.arange(NC, dtype=jnp.int32) * 128
        owner = jnp.searchsorted(a_incl, cpos, side="right").astype(jnp.int32)
        p = jnp.arange(R, dtype=jnp.int32)
        stc = jnp.minimum(st, T)
        a = jnp.minimum(a_excl[stc] + (p - bounds[stc]), NC * 128 - 1)
        return acc * 0.5 + (jnp.sum(a) + jnp.sum(owner)).astype(jnp.float32)
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))


timeit("alignment maps (tables)", tables, stile)

# primitive: blocked two-level scan vs XLA cumsum at [R2,16]
rows = jnp.asarray(np.random.RandomState(3).rand(R2, 16).astype(np.float32))
b_incl = jnp.asarray(np.sort(np.random.RandomState(6).randint(
    0, R2, scene.capacity)).astype(np.int32))


@jax.jit
def reduce_blocked(rows):
    def body(i, acc):
        rr = rows * (1 + 1e-9 * i)
        d = pc.rank_space_reduce(rr, b_incl, R2)
        return acc * 0.5 + jnp.sum(d)
    return jax.lax.fori_loop(0, N, body, 0.0)


@jax.jit
def reduce_cumsum(rows):
    def body(i, acc):
        rr = rows * (1 + 1e-9 * i)
        colmean = jnp.mean(rr, axis=0, keepdims=True)
        S = jnp.cumsum(rr - colmean, axis=0, dtype=jnp.float32)
        S = jnp.concatenate([jnp.zeros((1, 16), jnp.float32), S], axis=0)
        b_hi = b_incl
        b_lo = jnp.concatenate([jnp.zeros((1,), jnp.int32), b_incl[:-1]])
        d = (S[b_hi] - S[b_lo]
             + colmean * (b_hi - b_lo)[:, None].astype(jnp.float32))
        return acc * 0.5 + jnp.sum(d)
    return jax.lax.fori_loop(0, N, body, 0.0)


timeit("rank reduce: blocked MXU scan", reduce_blocked, rows)
timeit("rank reduce: XLA cumsum (old)", reduce_cumsum, rows)
