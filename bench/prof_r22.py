"""Round-3 session-2 profiler: end-to-end stage split at production
shapes + candidate replacements for the backward gradient-reduction
apparatus, whose true cost is spread over binning AND backward:

  binning:  alignment-map scans (~0.9) + a_by_rank inversion sort (~?)
  backward: rows_al -> rows_rank gather (~1.2) + blocked scan reduce (~2.7)

Candidates measured here:
  1. current: gather to rank order + blocked MXU scan + boundary diff
  2. XLA scatter-add rows_al -> [C+1, GF]  (deterministic on TPU; if
     this is ~2 ms the whole rank apparatus including its binning-side
     maps can be deleted)
  3. scatter-set permutation inversion vs the int-pair sort
  4. sorted_bin total, fwd render total, fwd+bwd total (context)

    PYTHONPATH=/root/.axon_site:/root/repo python bench/prof_r22.py
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
GF = 16
C1 = n + 1

print(f"R={R} NB={NB} NC={NC} R2={R2}", flush=True)


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


# --- context: full pipeline splits ---
@jax.jit
def bin_total(p):
    def body(i, acc):
        sb = bs.sorted_bin(proc_of(p.replace(xyz=p.xyz * (1 + 1e-9 * i))),
                           gx, gy, MI)
        return (acc * 0.5 + jnp.sum(sb.blocks[0]) +
                jnp.sum(sb.a_by_rank % 7).astype(jnp.float32))
    return jax.lax.fori_loop(0, N, body, 0.0)


@jax.jit
def bin_fwd_only(p):
    # forward-only renders DCE a_by_rank; measures the fwd binning cost
    def body(i, acc):
        sb = bs.sorted_bin(proc_of(p.replace(xyz=p.xyz * (1 + 1e-9 * i))),
                           gx, gy, MI)
        return acc * 0.5 + jnp.sum(sb.blocks[0]) + jnp.sum(sb.qblk).astype(jnp.float32)
    return jax.lax.fori_loop(0, N, body, 0.0)


@jax.jit
def fwd_total(p):
    def body(i, acc):
        out = render(scene.replace(params=p.replace(xyz=p.xyz * (1 + 1e-9 * i))),
                     cam, jnp.zeros(3), max_instances=MI)
        return acc * 0.5 + jnp.sum(out.color) + jnp.sum(out.depth)
    return jax.lax.fori_loop(0, N, body, 0.0)


def loss(p):
    out = render(scene.replace(params=p), cam, jnp.zeros(3), max_instances=MI)
    return jnp.sum(out.color) + jnp.sum(out.depth)


@jax.jit
def fwdbwd_total(p):
    def body(i, acc):
        g = jax.grad(loss)(p.replace(xyz=p.xyz * (1 + 1e-9 * i)))
        return acc + jnp.sum(g.xyz)
    return jax.lax.fori_loop(0, N, body, 0.0)


timeit("binning total (with a_by_rank)", bin_total, scene.params)
timeit("binning fwd-only (a_by_rank DCE'd)", bin_fwd_only, scene.params)
timeit("fwd render total", fwd_total, scene.params)
timeit("fwd+bwd total", fwdbwd_total, scene.params)

# --- candidate: XLA scatter-add of aligned rows onto Gaussians ---
rows_al = jnp.asarray(np.random.RandomState(3).rand(R2, GF).astype(np.float32))
# realistic gid map: aligned slot -> gaussian (random-ish), dead slots -> C
gid_al = jnp.asarray(np.random.RandomState(5).randint(0, n, R2).astype(np.int32))


@jax.jit
def scatter_add(rows, gid):
    def body(i, acc):
        rr = rows * (1 + 1e-9 * i)
        d = jnp.zeros((C1, GF), jnp.float32).at[gid].add(rr)
        return acc * 0.5 + jnp.sum(d)
    return jax.lax.fori_loop(0, N, body, 0.0)


timeit("scatter-add [R2,16] -> [C+1,16]", scatter_add, rows_al, gid_al)

# --- candidate: segment-sum via sorted-by-gid assumption is what the
# rank path already is; measure the two inversion strategies ---
perm = np.random.RandomState(11).permutation(R).astype(np.int32)
srank = jnp.asarray(perm)
avals = jnp.asarray(np.arange(R, dtype=np.int32))


@jax.jit
def invert_sort(sr, av):
    def body(i, acc):
        sr2 = sr + jnp.where(i < 0, 1, 0)
        _, inv = jax.lax.sort((sr2, av), num_keys=1, is_stable=True)
        return acc * 0.5 + jnp.sum(inv % 7).astype(jnp.float32)
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))


@jax.jit
def invert_scatter(sr, av):
    def body(i, acc):
        sr2 = sr + jnp.where(i < 0, 1, 0)
        inv = jnp.zeros((R,), jnp.int32).at[sr2].set(av)
        return acc * 0.5 + jnp.sum(inv % 7).astype(jnp.float32)
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))


timeit("perm inversion: int-pair sort", invert_sort, srank, avals)
timeit("perm inversion: scatter-set", invert_scatter, srank, avals)

# --- candidate: fat sort carrying gradient-relevant vs current width ---
key = jnp.asarray(np.random.RandomState(13).randint(0, 2**31, R).astype(np.uint32))
cols12 = [jnp.asarray(np.random.RandomState(20 + i).rand(R).astype(np.float32))
          for i in range(12)]


@jax.jit
def fat_sort(key, *cols):
    def body(i, acc):
        k2 = key + jnp.uint32(0)
        s = jax.lax.sort((k2,) + cols, num_keys=1, is_stable=True)
        return acc * 0.5 + jnp.sum(s[1])
    return jax.lax.fori_loop(0, N, body, 0.0)


timeit("fat sort (key + 12 payloads)", fat_sort, key, *cols12)
