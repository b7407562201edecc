"""Granular binning stage profile at production shapes (binning total
measured 6.9-7.3 ms in prof_r22 — round-2 estimate was 4.4-5.4).

Stages timed CUMULATIVELY (each returns a value depending on everything
up to that stage, with per-iteration xyz perturbation so nothing
hoists); per-stage cost = difference between consecutive rows.

    PYTHONPATH=/root/.axon_site:/root/repo python bench/prof_r23.py
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
CHUNK = bs.CHUNK
FTAB = bs.FTAB
KEY_BLK = bs.KEY_BLK

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


def stage(proc, upto):
    """Replicates sorted_bin up to a stage, returns a scalar probe."""
    grid_x, grid_y = gx, gy
    num_tiles = grid_x * grid_y
    C = proc.tiles_touched.shape[0]
    ch = proc.color.shape[-1]
    P = 7 + ch
    tile_bits = max((num_tiles + 1).bit_length(), 1)
    depth_bits = 32 - tile_bits
    key_depth_bits = min(depth_bits, 24)

    tt = proc.tiles_touched
    b_incl = jnp.cumsum(tt, dtype=jnp.int32)
    b_prev = b_incl - tt
    total = b_incl[-1]
    first_rank = jnp.where(tt > 0, b_prev, R)
    mark = jnp.full((R,), -1, jnp.int32).at[first_rank].max(
        jnp.arange(C, dtype=jnp.int32))
    gsrc = jnp.maximum(jax.lax.cummax(mark), 0)
    if upto == "gsrc":
        return jnp.sum(gsrc % 7).astype(jnp.float32)

    depth = jax.lax.stop_gradient(proc.depth.astype(jnp.float32))
    dkey32 = (jax.lax.bitcast_convert_type(depth, jnp.uint32)
              >> (32 - key_depth_bits)).astype(jnp.int32)
    stop = jax.lax.stop_gradient
    cols = [
        b_prev.astype(jnp.float32), tt.astype(jnp.float32),
        proc.rect_min[:, 0].astype(jnp.float32),
        proc.rect_min[:, 1].astype(jnp.float32),
        jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0], 1).astype(jnp.float32),
        dkey32.astype(jnp.float32),
        stop(proc.mean2d[:, 0]), stop(proc.mean2d[:, 1]),
        stop(proc.conic[:, 0]), stop(proc.conic[:, 1]), stop(proc.conic[:, 2]),
        stop(proc.opacity), depth,
    ] + [stop(proc.color[:, i]) for i in range(ch)]
    table = jnp.stack(cols, axis=1)
    if table.shape[1] < FTAB:
        table = jnp.pad(table, ((0, 0), (0, FTAB - table.shape[1])))
    table = jnp.pad(table, ((0, 1), (0, 0)))
    rows_rank = table[jnp.minimum(gsrc, C)]
    if upto == "gather":
        return jnp.sum(rows_rank[:, 0])

    Rk = bs._round_up(R, KEY_BLK)
    rows_k = rows_rank if Rk == R else jnp.pad(rows_rank, ((0, Rk - R), (0, 0)))
    key_call = bs._make_key_kernel(Rk, grid_x, key_depth_bits, P)
    key, rt = key_call(jnp.asarray([0], jnp.int32) + total, rows_k)
    if Rk != R:
        key = key[:R]
        rt = rt[:, :R]
    if upto == "keykernel":
        return jnp.sum(rt[0]) + jnp.sum(key % 7).astype(jnp.float32)

    q = jnp.arange(R, dtype=jnp.int32)
    ops = (key,) + tuple(rt[i] for i in range(P)) + (gsrc, q)
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=True)
    skey = sorted_ops[0]
    scols = sorted_ops[1:1 + P]
    sg = sorted_ops[1 + P]
    srank = sorted_ops[2 + P]
    stile = (skey >> key_depth_bits).astype(jnp.int32)
    if upto == "sort":
        return (jnp.sum(scols[0]) + jnp.sum(sg % 7).astype(jnp.float32)
                + jnp.sum(srank % 7).astype(jnp.float32)
                + jnp.sum(stile % 7).astype(jnp.float32))

    nbr = NB * CHUNK - R
    blocks = jnp.stack(
        [jnp.pad(c_, (0, nbr)).reshape(NB, CHUNK) for c_ in scols]
        + [jnp.zeros((NB, CHUNK), jnp.float32)] * (FTAB - P), axis=1)
    if upto == "blocks":
        return (jnp.sum(blocks[:, 0]) + jnp.sum(sg % 7).astype(jnp.float32)
                + jnp.sum(srank % 7).astype(jnp.float32)
                + jnp.sum(stile % 7).astype(jnp.float32))

    # payload-major alternative: [16, R + CHUNK]
    if upto == "blocks2":
        blocks2 = jnp.concatenate(
            [jnp.stack(scols, axis=0),
             jnp.zeros((FTAB - P, R), jnp.float32)], axis=0)
        blocks2 = jnp.pad(blocks2, ((0, 0), (0, CHUNK)))
        return (jnp.sum(blocks2[0]) + jnp.sum(sg % 7).astype(jnp.float32)
                + jnp.sum(srank % 7).astype(jnp.float32)
                + jnp.sum(stile % 7).astype(jnp.float32))

    T = num_tiles
    bounds = jnp.searchsorted(
        stile, jnp.arange(T + 1, dtype=jnp.int32), side="left").astype(jnp.int32)
    cnt = bounds[1:] - bounds[:-1]
    pad_cnt = bs._pad_chunk(cnt)
    a_incl = jnp.cumsum(pad_cnt, dtype=jnp.int32)
    a_excl = jnp.concatenate([jnp.zeros((1,), jnp.int32), a_incl])
    cpos = jnp.arange(NC, dtype=jnp.int32) * CHUNK
    owner = jnp.searchsorted(a_incl, cpos, side="right").astype(jnp.int32)
    ownc = jnp.minimum(owner, T - 1)
    offset_c = cpos - a_excl[ownc]
    nvalid_c = jnp.clip(cnt[ownc] - offset_c, 0, CHUNK)
    alive_c = (owner < T) & (nvalid_c > 0)
    offset_c = jnp.where(alive_c, offset_c, 0)
    nvalid_c = jnp.where(alive_c, nvalid_c, 0)
    row0 = jnp.where(alive_c, bounds[ownc] + offset_c, 0)
    if upto == "meta":
        return (jnp.sum(blocks[:, 0]) + jnp.sum(row0 % 7).astype(jnp.float32)
                + jnp.sum(nvalid_c).astype(jnp.float32)
                + jnp.sum(srank % 7).astype(jnp.float32))

    p = jnp.arange(R, dtype=jnp.int32)
    is_b = jnp.concatenate([jnp.ones((1,), bool), stile[1:] != stile[:-1]])
    tstart = jax.lax.cummax(jnp.where(is_b, p, -1))
    tprev = jnp.concatenate([jnp.zeros((1,), jnp.int32), tstart[:-1]])
    u = jnp.where(is_b & (p > 0), bs._pad_chunk(p - tprev), 0)
    a = jnp.cumsum(u) + (p - tstart)
    if upto == "amap":
        return (jnp.sum(blocks[:, 0]) + jnp.sum(row0 % 7).astype(jnp.float32)
                + jnp.sum(nvalid_c).astype(jnp.float32)
                + jnp.sum(a % 7).astype(jnp.float32)
                + jnp.sum(srank % 7).astype(jnp.float32))

    _, a_by_rank = jax.lax.sort((srank, a), num_keys=1, is_stable=True)
    return (jnp.sum(blocks[:, 0]) + jnp.sum(row0 % 7).astype(jnp.float32)
            + jnp.sum(nvalid_c).astype(jnp.float32)
            + jnp.sum(a_by_rank % 7).astype(jnp.float32))


def make_bench(upto):
    @jax.jit
    def run(p):
        def body(i, acc):
            pr = proc_of(p.replace(xyz=p.xyz * (1 + 1e-9 * i)))
            return acc * 0.5 + stage(pr, upto)
        return jax.lax.fori_loop(0, N, body, 0.0)
    return run


for name in ["gsrc", "gather", "keykernel", "sort", "blocks", "blocks2",
             "meta", "amap", "inv"]:
    timeit(f"upto {name}", make_bench(name), scene.params)
