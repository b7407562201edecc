"""Round-3: batched vs unrolled edit step, post-kernel-diet.

Bisects: full step (both modes), render-only fwd, render fwd+bwd, and
the batched pipeline's stages (flatten, sort, kernels) to find why the
one-launch batch measured SLOWER than the unrolled pair (16.7 vs 18.2
it/s on arrival).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from gaussianeditor_tpu.core.cameras import orbit_cameras
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.train.optim import GaussianAdam, OptimConfig
from gaussianeditor_tpu.train.trainer import (
    LossWeights, init_train_state, make_train_step, stack_cameras,
)

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
cams = orbit_cameras(2, 4.0, 0.8, 0.8, hw, hw)
cam_batch = stack_cameras(cams)
targets = jnp.asarray(rng.rand(2, hw, hw, 3).astype(np.float32))
optim = GaussianAdam(config=OptimConfig())

N = 10


def timeit(name, fn, *args):
    jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / N * 1000:.2f} ms/iter", flush=True)
    return best / N


for name, batched in (("unrolled", False), ("batched", True)):
    step = make_train_step(optim, LossWeights(), max_instances=MI,
                           batched=batched, impl="pallas")
    state = init_train_state(scene, optim)

    @jax.jit
    def run_n(st, step=step):
        return jax.lax.fori_loop(
            0, N, lambda i, s: step(s, cam_batch, targets)[0], st)

    timeit(f"step {name}", run_n, state)

# render-only bisect: batched fwd / fwd+bwd vs 2x single
from gaussianeditor_tpu.ops.render import render
from gaussianeditor_tpu.ops.render_batched import render_batched


@jax.jit
def fwd_unrolled(p):
    s = scene.replace(params=p)
    acc = 0.0
    for cam in cams:
        out = render(s, cam, jnp.zeros(3), impl="pallas", max_instances=MI)
        acc += jnp.sum(out.color)
    return acc


@jax.jit
def fwd_batched(p):
    s = scene.replace(params=p)
    out = render_batched(s, cam_batch, jnp.zeros(3), max_instances=MI)
    return jnp.sum(out.color)


def loop(f):
    @jax.jit
    def g(p):
        def body(i, acc):
            return acc * 0.5 + f(p.replace(xyz=p.xyz * (1 + 1e-9 * i)))
        return jax.lax.fori_loop(0, N, body, 0.0)
    return g


timeit("fwd unrolled (2 views)", loop(fwd_unrolled), scene.params)
timeit("fwd batched  (2 views)", loop(fwd_batched), scene.params)

gu = jax.jit(jax.grad(lambda p: fwd_unrolled(p)))
gb = jax.jit(jax.grad(lambda p: fwd_batched(p)))


def gloop(g):
    @jax.jit
    def f(p):
        def body(i, acc):
            gr = g(p.replace(xyz=p.xyz * (1 + 1e-9 * i)))
            return acc * 0.5 + jnp.sum(gr.xyz)
        return jax.lax.fori_loop(0, N, body, 0.0)
    return f


timeit("fwd+bwd unrolled (2 views)", gloop(gu), scene.params)
timeit("fwd+bwd batched  (2 views)", gloop(gb), scene.params)

# stage bisect inside the batched pipeline
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops.binning_sorted import sorted_bin
from gaussianeditor_tpu.ops.render_batched import _flatten_procs

gx = gy = hw // TILE


def procs_of(p):
    s = scene.replace(params=p)
    return [preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
                       s.get_opacity[:, 0], s.get_features, cam,
                       alive=s.alive, active_sh_degree=s.active_sh_degree,
                       max_sh_degree=s.max_sh_degree)
            for cam in cams]


@jax.jit
def stage_flat(p):
    flat = _flatten_procs(procs_of(p), gy)
    return jnp.sum(flat.mean2d) + jnp.sum(flat.tiles_touched)


@jax.jit
def stage_bin_b(p):
    flat = _flatten_procs(procs_of(p), gy)
    sb = sorted_bin(flat, gx, 2 * gy, 2 * MI)
    return jnp.sum(sb.blocks) + jnp.sum(sb.a_by_rank)


@jax.jit
def stage_bin_u(p):
    acc = 0.0
    for proc in procs_of(p):
        sb = sorted_bin(proc, gx, gy, MI)
        acc += jnp.sum(sb.blocks) + jnp.sum(sb.a_by_rank)
    return acc


timeit("preprocess+flatten", loop(lambda pp: stage_flat(pp)), scene.params)
timeit("bin+sort batched (2R)", loop(lambda pp: stage_bin_b(pp)), scene.params)
timeit("bin+sort unrolled (2xR)", loop(lambda pp: stage_bin_u(pp)), scene.params)
