"""Overflow-policy tests (VERDICT round-1 weak #2/#3): no silent splat
loss — instance-buffer and per-tile-capacity overflow must be detected
and the host-side policy must recover by re-rendering at higher
capacity."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianeditor_tpu.ops.apply_weights import apply_weights
from gaussianeditor_tpu.ops.render import render, render_safe
from tests.helpers import make_camera, random_scene


def _dense_tile_scene(n=300, seed=0):
    """All Gaussians piled onto one spot -> one tile holds ~n instances."""
    scene = random_scene(n, seed=seed)
    pts = np.asarray(scene.params.xyz) * 0.01  # collapse to the center
    p = scene.params.replace(
        xyz=jnp.asarray(pts),
        opacity_raw=jnp.full_like(scene.params.opacity_raw, -3.0),  # low alpha
    )
    return scene.replace(params=p)


class TestTileCapOverflow:
    def test_tiled_impl_detects_tile_overflow(self):
        scene = _dense_tile_scene()
        cam = make_camera(32, 32)
        out_small = render(scene, cam, impl="tiled", tile_cap=64, chunk=32,
                           max_instances=4096)
        assert bool(out_small.overflow)
        out_big = render(scene, cam, impl="tiled", tile_cap=512, chunk=32,
                         max_instances=4096)
        assert not bool(out_big.overflow)
        # the truncation was real: images differ
        assert float(jnp.abs(out_small.color - out_big.color).max()) > 1e-4

    def test_instance_buffer_overflow_detected(self):
        scene = random_scene(200, seed=1)
        cam = make_camera(64, 64)
        out = render(scene, cam, impl="tiled", tile_cap=1024, chunk=64,
                     max_instances=128)
        assert bool(out.overflow)
        assert int(out.num_rendered) > 128

    def test_render_safe_recovers(self):
        scene = _dense_tile_scene()
        cam = make_camera(32, 32)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            out = render_safe(scene, cam, impl="tiled", tile_cap=64,
                              chunk=32, max_instances=4096)
        assert not bool(out.overflow)
        assert any("overflow" in str(w.message) for w in rec)
        ref = render(scene, cam, impl="tiled", tile_cap=1024, chunk=32,
                     max_instances=8192)
        np.testing.assert_allclose(np.asarray(out.color),
                                   np.asarray(ref.color), atol=1e-5)

    def test_no_false_positive(self):
        scene = random_scene(50, seed=2)
        cam = make_camera(32, 32)
        out = render(scene, cam, impl="tiled", tile_cap=512, chunk=32,
                     max_instances=8192)
        assert not bool(out.overflow)


class TestPallasBudgetOverflow:
    def test_pallas_budget_overflow(self):
        """The compact binning drops instances past the max_instances
        budget; exceeding it must trip overflow, and a sufficient budget
        must match the scan path exactly."""
        scene = random_scene(80, seed=3)
        cam = make_camera(64, 64)  # 16 tiles
        out_small = render(scene, cam, impl="pallas", max_instances=128,
                           tile_cap=512, chunk=64)
        assert bool(out_small.overflow)
        out_full = render(scene, cam, impl="pallas", max_instances=8192,
                          tile_cap=512, chunk=64)
        assert not bool(out_full.overflow)
        ref = render(scene, cam, impl="tiled", max_instances=8192,
                     tile_cap=512, chunk=64)
        np.testing.assert_allclose(np.asarray(out_full.color),
                                   np.asarray(ref.color), atol=2e-5)
        # truncation at the tiny budget was real
        assert float(jnp.abs(out_small.color - ref.color).max()) > 1e-4

    def test_render_safe_escalates_budget(self):
        # same geometry as test_pallas_budget_overflow: total instances
        # exceed the 128 budget (which is the CHUNK-rounding floor)
        scene = random_scene(80, seed=3)
        cam = make_camera(64, 64)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            out = render_safe(scene, cam, impl="pallas", max_instances=128,
                              tile_cap=512, chunk=32)
        assert not bool(out.overflow)
        assert any("overflow" in str(w.message) for w in rec)


class TestApplyWeightsOverflow:
    def test_apply_weights_detects_and_tracing_recovers(self):
        scene = _dense_tile_scene()
        cam = make_camera(32, 32)
        w = jnp.zeros((scene.capacity, 1))
        c = jnp.zeros((scene.capacity,), jnp.int32)
        ones = jnp.ones((32, 32, 1))
        _, _, over = apply_weights(scene, cam, ones, w, c, tile_cap=64,
                                   chunk=32, max_instances=4096)
        assert bool(over)
        _, _, over_big = apply_weights(scene, cam, ones, w, c, tile_cap=512,
                                       chunk=32, max_instances=4096)
        assert not bool(over_big)

        # the tracing accumulation escalates tile_cap on overflow and ends
        # up equal to the big-capacity result
        from gaussianeditor_tpu.edit.tracing import accumulate_view_weights

        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            w1, c1 = accumulate_view_weights(scene, [cam], [np.ones((32, 32))],
                                             tile_cap=64, chunk=32)
        assert any("overflow" in str(x.message) for x in rec)
        w2, c2, _ = apply_weights(scene, cam, ones, w, c, tile_cap=512,
                                  chunk=32)
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


class TestTrainStepOverflowMetric:
    def test_train_step_surfaces_overflow(self):
        """The jitted train step cannot re-render at higher capacity
        (static shapes), so it must surface `overflow` in its metrics
        for the host loop to act on (ops/render.py policy note)."""
        from gaussianeditor_tpu.core.cameras import orbit_cameras
        from gaussianeditor_tpu.train.optim import GaussianAdam, OptimConfig
        from gaussianeditor_tpu.train.trainer import (
            LossWeights, init_train_state, make_train_step, stack_cameras,
        )

        scene = random_scene(150, seed=11)
        cams = orbit_cameras(2, 4.0, 0.8, 0.8, 48, 48)
        cam_batch = stack_cameras(cams)
        targets = jnp.zeros((2, 48, 48, 3), jnp.float32)
        optim = GaussianAdam(config=OptimConfig())
        state = init_train_state(scene, optim)

        step_small = make_train_step(optim, LossWeights(), impl="pallas",
                                     max_instances=128)
        _, metrics = step_small(state, cam_batch, targets)
        assert bool(jax.device_get(metrics["overflow"]))

        step_big = make_train_step(optim, LossWeights(), impl="pallas",
                                   max_instances=8192)
        _, metrics = step_big(state, cam_batch, targets)
        assert not bool(jax.device_get(metrics["overflow"]))
