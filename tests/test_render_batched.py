"""Batched multi-view compositor parity: ONE kernel-pair launch for B
views must reproduce B independent per-view renders — forward images,
auxiliary outputs, and gradients (ops/render_batched.py).

The reference launches renderCUDA once per view (forward.cu:396); the
batched path is the TPU answer: one fat sort / kernel pair / backward
reduction over the union instance list, views stacked in tile space.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianeditor_tpu.core.cameras import orbit_cameras
from gaussianeditor_tpu.ops.render import render
from gaussianeditor_tpu.ops.render_batched import render_batched
from gaussianeditor_tpu.train.trainer import stack_cameras

from tests.helpers import random_scene

HW = 48
MAXI = 4096


@functools.lru_cache(maxsize=None)
def _jitted_pair():
    def single(scene, cam, offsets_b):
        return render(scene, cam, jnp.zeros(3), impl="pallas",
                      max_instances=MAXI, mean2d_offset_ndc=offsets_b)

    def batched(scene, cam_batch, offsets):
        return render_batched(scene, cam_batch, jnp.zeros(3),
                              max_instances=MAXI,
                              mean2d_offset_ndc=offsets)

    return jax.jit(single), jax.jit(batched)


def _setup(b=3, n=120, seed=7):
    scene = random_scene(n, seed=seed, max_sh_degree=1)
    cams = orbit_cameras(b, 3.5, 0.9, 0.9, HW, HW)
    return scene, cams, stack_cameras(cams)


class TestBatchedForwardParity:
    def test_images_match_per_view(self):
        scene, cams, cam_batch = _setup()
        single, batched = _jitted_pair()
        B = len(cams)
        offsets = jnp.zeros((B, scene.capacity, 2), jnp.float32)
        out_b = batched(scene, cam_batch, offsets)
        for v, cam in enumerate(cams):
            out_s = single(scene, cam, offsets[v])
            # bitwise equality is not owed: the batched key has one more
            # tile bit, so 20- vs 21-bit truncated depth keys can order
            # near-equal depths differently. Everything else is identical
            # math.
            np.testing.assert_allclose(
                np.asarray(out_b.color[v]), np.asarray(out_s.color),
                rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(out_b.depth[v]), np.asarray(out_s.depth),
                rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(out_b.final_T[v]), np.asarray(out_s.final_T),
                rtol=1e-5, atol=1e-5)
            np.testing.assert_array_equal(
                np.asarray(out_b.radii[v]), np.asarray(out_s.radii))
            np.testing.assert_array_equal(
                np.asarray(out_b.visible[v]), np.asarray(out_s.visible))

    def test_num_rendered_sums(self):
        scene, cams, cam_batch = _setup()
        single, batched = _jitted_pair()
        offsets = jnp.zeros((len(cams), scene.capacity, 2), jnp.float32)
        out_b = batched(scene, cam_batch, offsets)
        total = sum(
            int(single(scene, cam, offsets[v]).num_rendered)
            for v, cam in enumerate(cams)
        )
        assert int(out_b.num_rendered) == total
        assert not bool(out_b.overflow)


class TestBatchedGradParity:
    def test_param_grads_match_sum_of_views(self):
        scene, cams, cam_batch = _setup(b=2)
        B = len(cams)
        tgt = jnp.asarray(
            np.random.RandomState(0).rand(B, HW, HW, 3).astype(np.float32))

        @jax.jit
        def loss_batched(params, offsets):
            s = scene.replace(params=params)
            out = render_batched(s, cam_batch, jnp.zeros(3),
                                 max_instances=MAXI,
                                 mean2d_offset_ndc=offsets)
            return jnp.mean((out.color - tgt) ** 2) + 0.1 * jnp.mean(
                out.depth)

        @jax.jit
        def loss_unrolled(params, offsets):
            s = scene.replace(params=params)
            l2, dm = 0.0, 0.0
            for v, cam in enumerate(cams):
                out = render(s, cam, jnp.zeros(3), impl="pallas",
                             max_instances=MAXI,
                             mean2d_offset_ndc=offsets[v])
                l2 = l2 + jnp.mean((out.color - tgt[v]) ** 2) / B
                dm = dm + jnp.mean(out.depth) / B
            return l2 + 0.1 * dm

        offsets = jnp.zeros((B, scene.capacity, 2), jnp.float32)
        gb, gob = jax.grad(loss_batched, argnums=(0, 1))(scene.params,
                                                         offsets)
        gu, gou = jax.grad(loss_unrolled, argnums=(0, 1))(scene.params,
                                                          offsets)
        for a, b in zip(jax.tree_util.tree_leaves(gb),
                        jax.tree_util.tree_leaves(gu)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)
        # the viewspace densification probe: per-view cotangents
        np.testing.assert_allclose(np.asarray(gob), np.asarray(gou),
                                   rtol=2e-4, atol=2e-5)


class TestBatchedTrainStep:
    def test_batched_step_matches_unrolled(self):
        """The production edit step with batched=True must produce the
        same update as the round-2 unrolled per-view step."""
        from gaussianeditor_tpu.train.optim import GaussianAdam, OptimConfig
        from gaussianeditor_tpu.train.trainer import (
            LossWeights,
            init_train_state,
            make_train_step,
        )

        scene, cams, cam_batch = _setup(b=2, n=80, seed=3)
        optim = GaussianAdam(config=OptimConfig())
        targets = jnp.asarray(
            np.random.RandomState(1).rand(2, HW, HW, 3).astype(np.float32))

        def perc(a, b):
            return jnp.mean((a - b) ** 2)

        kw = dict(perceptual=perc, impl="pallas", max_instances=MAXI)
        step_b = make_train_step(optim, LossWeights(), batched=True, **kw)
        step_u = make_train_step(optim, LossWeights(), batched=False, **kw)

        st_b, m_b = step_b(init_train_state(scene, optim), cam_batch,
                           targets)
        st_u, m_u = step_u(init_train_state(scene, optim), cam_batch,
                           targets)
        np.testing.assert_allclose(float(m_b["loss"]), float(m_u["loss"]),
                                   rtol=1e-5)
        assert bool(m_b["overflow"]) == bool(m_u["overflow"]) is False
        for a, b in zip(jax.tree_util.tree_leaves(st_b.scene.params),
                        jax.tree_util.tree_leaves(st_u.scene.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(st_b.stats.xyz_gradient_accum),
            np.asarray(st_u.stats.xyz_gradient_accum),
            rtol=2e-4, atol=2e-5)
        np.testing.assert_array_equal(
            np.asarray(st_b.stats.max_radii2d),
            np.asarray(st_u.stats.max_radii2d))


class TestBatchedOverflow:
    def test_shared_budget_overflow_flags(self):
        scene, cams, cam_batch = _setup(b=2)

        @jax.jit
        def run(scene, cam_batch):
            return render_batched(scene, cam_batch, jnp.zeros(3),
                                  max_instances=128)

        out = run(scene, cam_batch)
        assert bool(out.overflow)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
