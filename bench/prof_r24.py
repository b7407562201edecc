"""Kernel-only timings after the image-layout I/O change (bench showed
no end-to-end gain: 11.27 vs 11.29 Mpix/s) — did the strided
(TILE,TILE) image-block DMAs make the kernels themselves slower,
cancelling the removed tiles_to_image/retile passes?

    PYTHONPATH=/root/.axon_site:/root/repo python bench/prof_r24.py
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
CH = 3
CH1 = CH + 1
INC = 2 * CH1 + 3


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


sb0 = jax.jit(lambda p: bs.sorted_bin(proc_of(p), gx, gy, MI))(scene.params)
sb0 = jax.tree.map(jax.block_until_ready, sb0)
fwd_call = pc.make_forward_sorted(ntiles, gx, CH, NC, NB)
bwd_call = pc.make_backward_sorted(ntiles, gx, CH, NC, NB)


@jax.jit
def fwd_kernel_only(sb):
    def body(i, acc):
        blk = sb.blocks * (1 + 1e-9 * i)
        (out,) = fwd_call(sb.chunk_tile, sb.chunk_first, sb.chunk_last,
                          sb.chunk_nvalid, sb.chunk_offset, sb.qblk,
                          sb.shift, blk, blk)
        return acc * 0.5 + jnp.sum(out)
    return jax.lax.fori_loop(0, N, body, 0.0)


timeit("fwd kernel only (image layout)", fwd_kernel_only, sb0)

gall0 = jnp.asarray(np.random.RandomState(7).rand(
    hw, hw, INC).astype(np.float32))
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


timeit("bwd kernel only (image layout)", bwd_kernel_only, sb0, gall0)
