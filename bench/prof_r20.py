"""Bisect the binning regression seen after the table-based alignment
maps landed (prof_r19: binning full 13.2 ms vs prof_r18's 7.6 on the
scan-based code). DCE-isolates sorted_bin stages by consuming subsets
of its outputs.

    PYTHONPATH=/root/.axon_site:/root/repo python bench/prof_r20.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops import binning_sorted as bs

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


def proc_of(p):
    s = scene.replace(params=p)
    return preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
                      s.get_opacity[:, 0], s.get_features, cam,
                      alive=s.alive, active_sh_degree=s.active_sh_degree,
                      max_sh_degree=s.max_sh_degree)


def bin_consume(consume):
    @jax.jit
    def f(p):
        def body(i, acc):
            sb = bs.sorted_bin(proc_of(p.replace(xyz=p.xyz * (1 + 1e-9 * i))),
                               gx, gy, MI)
            return acc * 0.5 + consume(sb)
        return jax.lax.fori_loop(0, N, body, 0.0)
    return f


timeit("bin: blocks+meta only (no a, no a_by_rank)",
       bin_consume(lambda sb: jnp.sum(sb.blocks)
                   + jnp.sum(sb.chunk_tile).astype(jnp.float32)),
       scene.params)
timeit("bin: + b_incl",
       bin_consume(lambda sb: jnp.sum(sb.blocks)
                   + (jnp.sum(sb.chunk_tile)
                      + jnp.sum(sb.b_incl)).astype(jnp.float32)),
       scene.params)
timeit("bin: + a_by_rank (full backward deps)",
       bin_consume(lambda sb: jnp.sum(sb.blocks)
                   + (jnp.sum(sb.chunk_tile) + jnp.sum(sb.b_incl)
                      + jnp.sum(sb.a_by_rank)).astype(jnp.float32)),
       scene.params)

# the inversion sort alone at production shape, fed by a cheap `a`
perm = jnp.asarray(np.random.RandomState(1).permutation(R).astype(np.int32))
aval = jnp.asarray(np.random.RandomState(2).randint(
    0, NC * 128, R).astype(np.int32))


@jax.jit
def inv_sort(srank, a):
    def body(i, acc):
        sr = srank + jnp.where(i < 0, 1, 0)
        _, abr = jax.lax.sort((sr, a), num_keys=1, is_stable=True)
        return acc * 0.5 + jnp.sum(abr).astype(jnp.float32)
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))


timeit("a_by_rank inversion sort alone", inv_sort, perm, aval)

# R-sized gather from a small table (the new `a` construction primitive)
tbl = jnp.asarray(np.random.RandomState(3).randint(
    0, 1 << 20, ntiles + 1).astype(np.int32))
stc = jnp.asarray(np.sort(np.random.RandomState(4).randint(
    0, ntiles, R)).astype(np.int32))


@jax.jit
def small_table_gather(tbl, stc):
    def body(i, acc):
        ix = stc + jnp.where(i < 0, 1, 0)
        return acc * 0.5 + (jnp.sum(tbl[ix])).astype(jnp.float32)
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))


timeit("R-sized gather from [T+1] table", small_table_gather, tbl, stc)
