"""Composed backward-glue variants (the post-kernel XLA stages):

  grows [NC, GF, CHUNK]  --swapaxes/reshape-->  rows_al [R2, GF]
  --a_by_rank gather-->  rows_rank [R, GF]  --rank_space_reduce-->
  d [C, GF]

measured as ONE composed jit per variant (prof_r21 measured the stages
separately; composition lets XLA fuse transpose+gather etc.). Also an
honestly-forced permutation-inversion comparison (prof_r22's was
hoisted).

    PYTHONPATH=/root/.axon_site:/root/repo python bench/prof_r25.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from gaussianeditor_tpu.ops import binning_sorted as bs
from gaussianeditor_tpu.ops import pallas_composite as pc

MI = 393_216
ntiles = 1024
R, NB, NC = bs.sorted_capacities(MI, ntiles)
R2 = NC * 128
GF = 16
LIVE = 10
C = 100_000
N = 20
CHUNK = 128

print(f"R={R} NC={NC} R2={R2}", flush=True)

rng = np.random.RandomState(0)
grows0 = jnp.asarray(rng.rand(NC, GF, CHUNK).astype(np.float32))
a_by_rank = jnp.asarray(rng.permutation(R2)[:R].astype(np.int32))
b_incl = jnp.asarray(np.sort(rng.randint(0, R, C)).astype(np.int32))


def timeit(name, fn, *args):
    jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / N * 1000:.3f} ms/iter", flush=True)
    return best / N


def loop(fn):
    @jax.jit
    def run(grows):
        def body(i, acc):
            g = grows * (1 + 1e-9 * i)
            return acc * 0.5 + jnp.sum(fn(g))
        return jax.lax.fori_loop(0, N, body, 0.0)
    return run


def v_current(g):
    rows_al = jnp.swapaxes(g, 1, 2).reshape(-1, GF)
    rows_rank = rows_al[a_by_rank]
    return pc.rank_space_reduce(rows_rank, b_incl, R)


def v_slice10(g):
    rows_al = jnp.swapaxes(g[:, :LIVE], 1, 2).reshape(-1, LIVE)
    rows_rank = rows_al[a_by_rank]
    return pc.rank_space_reduce(rows_rank, b_incl, R)


def v_no_swap(g):
    # gather straight from the chunk-blocked layout with 2-axis indices
    rows_rank = g[a_by_rank // CHUNK, :, a_by_rank % CHUNK]
    return pc.rank_space_reduce(rows_rank, b_incl, R)


def _tri_excl():
    j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (j < k).astype(jnp.float32)


def v_xla_cumsum(g):
    rows_al = jnp.swapaxes(g, 1, 2).reshape(-1, GF)
    rows_rank = rows_al[a_by_rank]
    mu = jnp.mean(rows_rank, axis=0, keepdims=True)
    S = jnp.concatenate(
        [jnp.zeros((1, GF), jnp.float32),
         jnp.cumsum(rows_rank - mu, axis=0, dtype=jnp.float32)], axis=0)
    S = S + mu * jnp.arange(R + 1, dtype=jnp.float32)[:, None]
    b_lo = jnp.concatenate([jnp.zeros((1,), jnp.int32), b_incl[:-1]])
    return S[b_incl] - S[b_lo]


def v_4lookup(g):
    rows_al = jnp.swapaxes(g, 1, 2).reshape(-1, GF)
    x = rows_al[a_by_rank].reshape(-1, CHUNK, GF)
    nblk = R // CHUNK
    ipx = jnp.einsum("kj,bkc->bjc", _tri_excl(), x,
                     precision=jax.lax.Precision.HIGHEST)
    P = ipx[:, CHUNK - 1, :] + x[:, CHUNK - 1, :]
    mu = jnp.mean(P, axis=0, keepdims=True)
    bpc = jnp.concatenate(
        [jnp.zeros((1, GF), jnp.float32),
         jnp.cumsum(P - mu, axis=0, dtype=jnp.float32)], axis=0)
    base = bpc + mu * jnp.arange(nblk + 1, dtype=jnp.float32)[:, None]
    ipxf = ipx.reshape(-1, GF)

    def at(b):
        v = ipxf[jnp.minimum(b, R - 1)]
        return jnp.where((b >= R)[:, None], 0.0, v)

    b_lo = jnp.concatenate([jnp.zeros((1,), jnp.int32), b_incl[:-1]])
    return (base[b_incl // CHUNK] - base[b_lo // CHUNK]
            + at(b_incl) - at(b_lo))


for name, fn in [("current (swap+gather+blocked scan)", v_current),
                 ("10-col slice", v_slice10),
                 ("no-swap 2-axis gather", v_no_swap),
                 ("XLA 1-D cumsum", v_xla_cumsum),
                 ("4-lookup (no S materialization)", v_4lookup)]:
    timeit(name, loop(fn), grows0)

# honest permutation inversion: input depends on the loop index through
# a real data change (dynamic slice into a longer buffer)
perm_buf = jnp.asarray(
    np.stack([np.random.RandomState(s).permutation(R).astype(np.int32)
              for s in range(2)]))
avals = jnp.asarray(rng.randint(0, R2, R).astype(np.int32))


@jax.jit
def inv_sort(buf, av):
    def body(i, acc):
        sr = jax.lax.dynamic_index_in_dim(buf, i % 2, 0, keepdims=False)
        _, inv = jax.lax.sort((sr, av), num_keys=1, is_stable=True)
        return acc * 0.5 + jnp.sum(inv % 7).astype(jnp.float32)
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))


@jax.jit
def inv_scatter(buf, av):
    def body(i, acc):
        sr = jax.lax.dynamic_index_in_dim(buf, i % 2, 0, keepdims=False)
        inv = jnp.zeros((R,), jnp.int32).at[sr].set(av)
        return acc * 0.5 + jnp.sum(inv % 7).astype(jnp.float32)
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))


timeit("perm inversion: int-pair sort", inv_sort, perm_buf, avals)
timeit("perm inversion: scatter-set", inv_scatter, perm_buf, avals)
