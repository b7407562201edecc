"""Multi-device tests on the 8-device virtual CPU mesh: the sharded
train step must produce the SAME result as the single-device step
(device-count independence of training, SURVEY.md section 2.6)."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianeditor_tpu.core.cameras import orbit_cameras
from gaussianeditor_tpu.parallel.mesh import make_mesh
from gaussianeditor_tpu.parallel.sharded_step import make_sharded_train_step
from gaussianeditor_tpu.train.optim import GaussianAdam, OptimConfig
from gaussianeditor_tpu.train.trainer import (
    LossWeights,
    init_train_state,
    make_train_step,
    stack_cameras,
)
from tests.helpers import random_scene


def _setup(n_views=8, hw=32):
    scene = random_scene(64, seed=0)
    cams = orbit_cameras(n_views, 4.0, 0.8, 0.8, hw, hw)
    optim = GaussianAdam(config=OptimConfig())
    rng = np.random.RandomState(0)
    targets = jnp.asarray(rng.rand(n_views, hw, hw, 3).astype(np.float32))
    return scene, cams, optim, targets


class TestShardedStep:
    def test_matches_single_device(self):
        scene, cams, optim, targets = _setup()
        weights = LossWeights()
        kwargs = dict(max_instances=4096, tile_cap=256, chunk=32)

        single = make_train_step(optim, weights, **kwargs)
        state0 = init_train_state(scene, optim)
        cam_batch = stack_cameras(cams)
        s1, m1 = single(state0, cam_batch, targets)

        mesh = make_mesh(8)
        sharded = make_sharded_train_step(optim, weights, mesh, **kwargs)
        s8, m8 = sharded(state0, cam_batch, targets)

        np.testing.assert_allclose(
            np.asarray(s8.scene.params.xyz), np.asarray(s1.scene.params.xyz),
            atol=1e-5, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(s8.stats.xyz_gradient_accum),
            np.asarray(s1.stats.xyz_gradient_accum), atol=1e-5, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(s8.stats.max_radii2d), np.asarray(s1.stats.max_radii2d)
        )
        np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                                   rtol=1e-5)

    def test_two_steps_stay_in_sync(self):
        scene, cams, optim, targets = _setup()
        mesh = make_mesh(8)
        sharded = make_sharded_train_step(
            optim, LossWeights(), mesh,
            max_instances=4096, tile_cap=256, chunk=32,
        )
        state = init_train_state(scene, optim)
        for _ in range(2):
            state, metrics = sharded(state, stack_cameras(cams), targets)
        assert int(state.step) == 2
        assert np.isfinite(float(metrics["loss"]))

    def test_mesh_construction(self):
        mesh = make_mesh(8)
        assert mesh.devices.shape == (8,)
        assert mesh.axis_names == ("data",)
