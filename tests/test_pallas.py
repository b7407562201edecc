"""Pallas compositor vs scan compositor vs oracle — forward and gradients.

On CPU these run the kernels in Pallas interpreter mode, so the exact
kernel logic (aligned DMA chunking, cumulative-product recurrences,
back-to-front gradient reconstruction) is exercised hermetically; the
same code compiles natively on TPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianeditor_tpu.ops.render import render
from tests.helpers import assert_images_close, make_camera, random_scene


@functools.lru_cache(maxsize=None)
def _jit_render(impl, mi):
    def f(scene, cam):
        return render(scene, cam, jnp.asarray([0.1, 0.2, 0.3]), impl=impl,
                      max_instances=mi, tile_cap=512, chunk=64)

    return jax.jit(f)


class TestPallasForward:
    @pytest.mark.parametrize("seed,hw", [(0, 64), (2, 48)])
    def test_matches_scan(self, seed, hw):
        scene = random_scene(150, seed=seed)
        cam = make_camera(hw, hw)
        out_p = _jit_render("pallas", 8192)(scene, cam)
        out_s = _jit_render("tiled", 8192)(scene, cam)
        assert_images_close(out_p.color, out_s.color, name="color")
        assert_images_close(out_p.depth, out_s.depth, loose=2e-2, name="depth")
        assert_images_close(out_p.final_T, out_s.final_T, name="final_T")

    def test_matches_oracle(self):
        scene = random_scene(120, seed=5)
        cam = make_camera(64, 64)
        out_p = _jit_render("pallas", 8192)(scene, cam)
        out_r = _jit_render("ref", 8192)(scene, cam)
        assert_images_close(out_p.color, out_r.color, name="color")

    def test_nonsquare_crop(self):
        scene = random_scene(100, seed=6)
        cam = make_camera(40, 72)
        out_p = _jit_render("pallas", 8192)(scene, cam)
        out_s = _jit_render("tiled", 8192)(scene, cam)
        assert_images_close(out_p.color, out_s.color, name="color")

    def test_n_contrib_matches_scan(self):
        scene = random_scene(150, seed=7)
        cam = make_camera(48, 48)
        out_p = _jit_render("pallas", 8192)(scene, cam)
        out_s = _jit_render("tiled", 8192)(scene, cam)
        assert int(out_p.num_rendered) == int(out_s.num_rendered)
        # per-pixel last-contributor positions (consumed by the backward
        # gating, backward.cu:441-447) must agree EXACTLY: both paths walk
        # the same depth-sorted per-tile order
        a = np.asarray(out_p.n_contrib)
        b = np.asarray(out_s.n_contrib)
        np.testing.assert_array_equal(a, b)
        assert a.max() > 0  # scene actually composites something


class TestPallasBackward:
    def test_gradients_match_scan(self):
        scene = random_scene(100, seed=8)
        cam = make_camera(48, 48)
        probe = jax.random.normal(jax.random.key(1), (48, 48, 3))

        def loss(params, impl):
            s = scene.replace(params=params)
            out = render(s, cam, jnp.zeros(3), impl=impl,
                         max_instances=8192, tile_cap=512, chunk=64)
            return (jnp.sum(out.color * probe) + 0.1 * jnp.sum(out.depth)
                    + 0.05 * jnp.sum(out.alpha))

        g_p = jax.jit(jax.grad(lambda p: loss(p, "pallas")))(scene.params)
        g_s = jax.jit(jax.grad(lambda p: loss(p, "tiled")))(scene.params)
        for name in ["xyz", "features_dc", "opacity_raw", "log_scales",
                     "quats"]:
            gp, gs = np.asarray(getattr(g_p, name)), np.asarray(getattr(g_s, name))
            np.testing.assert_allclose(
                gp, gs, atol=1e-3, rtol=1e-2, err_msg=f"grad mismatch: {name}"
            )

    def test_gradients_match_scan_bstep_restack(self):
        # 256^2 -> 256 tiles and max_instances 32768 (= BSTEP_ASM*CHUNK),
        # so binning's restack AND the backward reduce both take the
        # coarse 256-block-grid paths (binning_sorted BSTEP_ASM branch,
        # pallas_composite.composite_bwd BSTEP branch); the small
        # geometries above fall to the KEY_BLK/XLA fallbacks. Also the
        # regression geometry for the tile-local moment coordinates:
        # with global pixel coords the mean2d/conic gradients lose ~5
        # bits to xs*m0 - mx cancellation at image scale (was 1e-4 rel
        # error vs the dense oracle here; tolerances below caught it).
        scene = random_scene(300, seed=4)
        cam = make_camera(256, 256)
        probe = jax.random.normal(jax.random.key(2), (256, 256, 3))

        def loss(params, impl):
            s = scene.replace(params=params)
            out = render(s, cam, jnp.zeros(3), impl=impl,
                         max_instances=32768, tile_cap=512, chunk=64)
            return jnp.sum(out.color * probe) + 0.1 * jnp.sum(out.depth)

        g_p = jax.jit(jax.grad(lambda p: loss(p, "pallas")))(scene.params)
        g_s = jax.jit(jax.grad(lambda p: loss(p, "tiled")))(scene.params)
        for name in ["xyz", "features_dc", "opacity_raw", "log_scales",
                     "quats"]:
            gp = np.asarray(getattr(g_p, name))
            gs = np.asarray(getattr(g_s, name))
            np.testing.assert_allclose(
                gp, gs, atol=1e-3, rtol=1e-2, err_msg=f"grad mismatch: {name}"
            )

    def test_gradient_finite_differences(self):
        # seed 7 is FD-convergent (no Gaussian near a discrete rect/cutoff
        # boundary); seed 9 has a genuine discontinuity where FD diverges
        # identically for the scan path too.
        scene = random_scene(20, seed=7)
        cam = make_camera(32, 32)

        @jax.jit
        def loss(xyz):
            s = scene.replace(params=scene.params.replace(xyz=xyz))
            out = render(s, cam, impl="pallas", max_instances=4096)
            return jnp.sum(out.color)

        xyz0 = scene.params.xyz
        g = jax.jit(jax.grad(loss))(xyz0)
        v = jnp.asarray(np.random.RandomState(0).randn(*xyz0.shape)
                        .astype(np.float32))
        eps = 1e-3
        fd = (loss(xyz0 + eps * v) - loss(xyz0 - eps * v)) / (2 * eps)
        np.testing.assert_allclose(float(jnp.sum(g * v)), float(fd),
                                   rtol=5e-2, atol=1e-2)


class TestPallasDeterminism:
    def test_bitwise_repeatable_fwd_bwd(self):
        """The v5 path replaces CUDA's atomicAdd scatter with a stable
        sort + fixed-order rank reduction: identical inputs must give
        BITWISE identical outputs and gradients across runs."""
        scene = random_scene(140, seed=12)
        cam = make_camera(48, 48)

        def loss(params):
            out = render(scene.replace(params=params), cam, jnp.zeros(3),
                         impl="pallas", max_instances=8192)
            return jnp.sum(out.color * 1.7) + jnp.sum(out.depth)

        f = jax.jit(jax.value_and_grad(loss))
        v1, g1 = f(scene.params)
        v2, g2 = f(scene.params)
        assert np.asarray(v1).tobytes() == np.asarray(v2).tobytes()
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            assert np.asarray(a).tobytes() == np.asarray(b).tobytes()


class TestAssemblyKernel:
    def test_matches_xla_stack(self):
        """The Pallas payload-assembly kernel must reproduce the XLA
        pad/reshape/stack block layout bit-for-bit (incl. the trailing
        zero block and the FTAB-P zero rows)."""
        from gaussianeditor_tpu.ops import binning_sorted as bs

        R, ntiles, P = 4096, 12, 10
        _, NB, _ = bs.sorted_capacities(R, ntiles)
        rng = np.random.RandomState(0)
        scols = tuple(jnp.asarray(rng.rand(R).astype(np.float32))
                      for _ in range(P))
        kern = jax.jit(lambda *c: bs._make_assembly_kernel(R, NB, P)(*c)[:NB])
        blocks_k = kern(*scols)
        nbr = NB * bs.CHUNK - R
        blocks_x = jnp.stack(
            [jnp.pad(c_, (0, nbr)).reshape(NB, bs.CHUNK) for c_ in scols]
            + [jnp.zeros((NB, bs.CHUNK), jnp.float32)] * (bs.FTAB - P),
            axis=1)
        np.testing.assert_array_equal(np.asarray(blocks_k),
                                      np.asarray(blocks_x))


class TestSortedVsDensePaths:
    def test_v5_matches_v4_forward_and_grads(self):
        """The production sorted-payload path ('pallas') and the v4
        id-sort+gather path ('pallas4', kept for >3-channel feature
        renders) must agree on outputs and parameter gradients."""
        scene = random_scene(130, seed=15)
        cam = make_camera(64, 48)
        o5 = _jit_render("pallas", 8192)(scene, cam)
        o4 = _jit_render("pallas4", 8192)(scene, cam)
        assert int(o5.num_rendered) == int(o4.num_rendered)
        np.testing.assert_allclose(np.asarray(o5.color),
                                   np.asarray(o4.color), atol=2e-6)
        np.testing.assert_allclose(np.asarray(o5.final_T),
                                   np.asarray(o4.final_T), atol=2e-6)
        np.testing.assert_array_equal(np.asarray(o5.n_contrib),
                                      np.asarray(o4.n_contrib))

        probe = jax.random.normal(jax.random.key(3), (64, 48, 3))

        def loss(params, impl):
            s = scene.replace(params=params)
            out = render(s, cam, jnp.zeros(3), impl=impl,
                         max_instances=8192)
            return jnp.sum(out.color * probe) + 0.1 * jnp.sum(out.depth)

        g5 = jax.jit(jax.grad(lambda p: loss(p, "pallas")))(scene.params)
        g4 = jax.jit(jax.grad(lambda p: loss(p, "pallas4")))(scene.params)
        for a, b in zip(jax.tree.leaves(g5), jax.tree.leaves(g4)):
            a, b = np.asarray(a), np.asarray(b)
            if a.size == 0:
                continue
            den = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a / den, b / den, atol=3e-4)
