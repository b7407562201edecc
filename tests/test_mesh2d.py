"""2-D (view x tile) sharded train step vs the single-device step:
one step on a 2x4 virtual mesh must reproduce the unsharded update."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from gaussianeditor_tpu.core.cameras import orbit_cameras
from gaussianeditor_tpu.parallel.mesh2d import make_2d_train_step
from gaussianeditor_tpu.train.optim import GaussianAdam, OptimConfig
from gaussianeditor_tpu.train.trainer import (
    LossWeights,
    init_train_state,
    make_train_step,
    stack_cameras,
)
from tests.helpers import random_scene

MI = 8192


def test_2d_step_matches_single_device():
    scene = random_scene(100, seed=5)
    cams = orbit_cameras(2, 4.0, 0.8, 0.8, 64, 64)
    cam_batch = stack_cameras(cams)
    rng = np.random.RandomState(0)
    targets = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    weights = LossWeights()
    optim = GaussianAdam(config=OptimConfig())
    state = init_train_state(scene, optim)

    ref_step = make_train_step(optim, weights, perceptual=None,
                               impl="pallas", max_instances=MI)
    ref_state, ref_metrics = ref_step(state, cam_batch, targets)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("view", "tile"))
    step2d = make_2d_train_step(optim, weights, mesh, impl="pallas",
                                max_instances=MI)
    new_state, metrics = step2d(state, cam_batch, targets)

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-5)
    for f in ("xyz", "opacity_raw", "log_scales", "quats", "features_dc"):
        a = np.asarray(getattr(new_state.scene.params, f))
        b = np.asarray(getattr(ref_state.scene.params, f))
        np.testing.assert_allclose(a, b, atol=2e-5)
    # densify statistics reduced over both axes must agree too
    np.testing.assert_allclose(
        np.asarray(new_state.stats.xyz_gradient_accum),
        np.asarray(ref_state.stats.xyz_gradient_accum), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(new_state.stats.max_radii2d),
        np.asarray(ref_state.stats.max_radii2d))


def test_2d_step_full_objective_with_perceptual():
    """The round-2 limitation (L1+anchor only) is removed: with a
    window-crossing perceptual loss and lambda_p > 0 the 2-D step must
    still reproduce the single-device update — LPIPS/SSIM windows at
    strip boundaries included (parallel/halo.py)."""
    from gaussianeditor_tpu.train.losses import ssim

    def perceptual(pred, tgt):
        return 1.0 - ssim(pred, tgt)

    scene = random_scene(100, seed=6)
    cams = orbit_cameras(2, 4.0, 0.8, 0.8, 64, 64)
    cam_batch = stack_cameras(cams)
    rng = np.random.RandomState(1)
    targets = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    weights = LossWeights(lambda_p=10.0)
    optim = GaussianAdam(config=OptimConfig())
    state = init_train_state(scene, optim)

    ref_step = make_train_step(optim, weights, perceptual=perceptual,
                               impl="pallas", max_instances=MI)
    ref_state, ref_metrics = ref_step(state, cam_batch, targets)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("view", "tile"))
    step2d = make_2d_train_step(optim, weights, mesh, impl="pallas",
                                max_instances=MI, perceptual=perceptual)
    new_state, metrics = step2d(state, cam_batch, targets)

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-5)
    np.testing.assert_allclose(float(metrics["loss_p"]),
                               float(ref_metrics["loss_p"]), rtol=2e-5)
    assert not bool(metrics["overflow"])
    for f in ("xyz", "opacity_raw", "log_scales", "quats", "features_dc"):
        a = np.asarray(getattr(new_state.scene.params, f))
        b = np.asarray(getattr(ref_state.scene.params, f))
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_halo_ssim_exact_across_strips():
    """ssim_sharded (ppermute halo rows + rows-VALID map) == whole-image
    ssim, including the zero-padded true image edges."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from gaussianeditor_tpu.parallel.halo import ssim_sharded
    from gaussianeditor_tpu.train.losses import ssim

    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.rand(64, 48, 3).astype(np.float32))
    b = jnp.asarray((rng.rand(64, 48, 3) * 0.5 + np.asarray(a) * 0.5
                     ).astype(np.float32))
    mesh = Mesh(np.array(jax.devices()[:4]), ("tile",))

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=(P("tile"), P("tile")),
             out_specs=P(), check_vma=False)
    def sharded(a, b):
        return ssim_sharded(a, b, "tile")

    np.testing.assert_allclose(float(sharded(a, b)), float(ssim(a, b)),
                               rtol=1e-6)

    # gradients cross the halo exchange correctly
    @jax.jit
    def gs(a, b):
        return jax.grad(lambda x: sharded(x, b))(a)

    @jax.jit
    def gr(a, b):
        return jax.grad(lambda x: ssim(x, b))(a)

    np.testing.assert_allclose(np.asarray(gs(a, b)), np.asarray(gr(a, b)),
                               atol=1e-6)
