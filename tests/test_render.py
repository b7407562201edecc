"""Renderer tests: tiled production path vs the dense sequential oracle
(values AND gradients), plus sanity properties of preprocess/binning.
The oracle (`ops/refimpl.py`) transliterates the CUDA loop, so agreement
here is agreement with the reference semantics (forward.cu:261-379).

Everything runs under cached jax.jit (eager dispatch is ~300ms/op on CI).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianeditor_tpu.ops.binning import bin_and_sort
from gaussianeditor_tpu.ops.preprocess import TILE, preprocess
from gaussianeditor_tpu.ops.render import render
from tests.helpers import assert_images_close, random_scene, render_j, make_camera


@functools.lru_cache(maxsize=None)
def _jit_proc():
    def f(scene, cam):
        return preprocess(
            scene.params.xyz, scene.params.log_scales, scene.params.quats,
            scene.get_opacity[:, 0], scene.get_features, cam,
            alive=scene.alive, active_sh_degree=scene.active_sh_degree,
            max_sh_degree=scene.max_sh_degree,
        )

    return jax.jit(f)


def _proc(scene, cam):
    return _jit_proc()(scene, cam)


@functools.lru_cache(maxsize=None)
def _jit_bin(gx, gy, max_instances):
    def f(scene, cam):
        return bin_and_sort(_jit_proc()(scene, cam), gx, gy, max_instances)

    return jax.jit(f)


class TestPreprocess:
    def test_behind_camera_culled(self):
        scene = random_scene(10, seed=0)
        cam = make_camera()
        xyz = scene.params.xyz.at[:, 2].set(-10.0)  # behind camera (z<0.2)
        scene = scene.replace(params=scene.params.replace(xyz=xyz))
        proc = _proc(scene, cam)
        assert not bool(jnp.any(proc.visible))
        assert int(jnp.sum(proc.radius)) == 0

    def test_center_gaussian_projects_to_center(self):
        scene = random_scene(10, seed=1)
        xyz = scene.params.xyz.at[0].set(jnp.zeros(3))
        scene = scene.replace(params=scene.params.replace(xyz=xyz))
        cam = make_camera(64, 64)
        proc = _proc(scene, cam)
        # ndc 0 -> pixel (S-1)/2 = 31.5
        np.testing.assert_allclose(np.asarray(proc.mean2d[0]), [31.5, 31.5], atol=1e-4)
        assert bool(proc.visible[0])

    def test_lowpass_filter_floor(self):
        # Tiny Gaussian: 2D covariance diagonal >= 0.3 -> radius >= 2
        scene = random_scene(10, seed=2)
        scene = scene.replace(
            params=scene.params.replace(
                xyz=scene.params.xyz.at[0].set(jnp.zeros(3)),
                log_scales=scene.params.log_scales.at[0].set(np.log(1e-5)),
            )
        )
        proc = _proc(scene, make_camera())
        assert int(proc.radius[0]) >= 2

    def test_tight_rect_is_output_exact(self):
        """The per-axis opacity-aware rect must (a) bin strictly fewer
        instances than CUDA's isotropic 3-sigma square on an
        anisotropic/low-opacity scene, and (b) change NOTHING in the
        composited output: every excluded (pixel, instance) pair fails
        the alpha < 1/255 gate (forward.cu:346-353). Verified against
        the CUDA-transliterated dense oracle run on both rects."""
        from gaussianeditor_tpu.ops.refimpl import composite_dense

        scene = random_scene(80, seed=7)
        # anisotropic scales + a low-opacity band incl. op < 1/256
        rng = np.random.RandomState(3)
        ls = np.log(rng.uniform(0.01, 0.3, (80, 3)).astype(np.float32))
        op_raw = rng.uniform(-7.0, 2.0, (80, 1)).astype(np.float32)
        scene = scene.replace(params=scene.params.replace(
            log_scales=jnp.asarray(ls), opacity_raw=jnp.asarray(op_raw)))
        cam = make_camera(64, 64)
        proc = _proc(scene, cam)

        # reconstruct the reference's isotropic rect from the reported
        # radius (which deliberately keeps CUDA's 3*sqrt(lambda_max))
        gx = gy = 64 // TILE
        r = proc.radius.astype(jnp.float32)
        mxs, mys = proc.mean2d[:, 0], proc.mean2d[:, 1]
        rminx = jnp.clip(((mxs - r) / TILE).astype(jnp.int32), 0, gx)
        rminy = jnp.clip(((mys - r) / TILE).astype(jnp.int32), 0, gy)
        rmaxx = jnp.clip(((mxs + r + TILE - 1) / TILE).astype(jnp.int32),
                         0, gx)
        rmaxy = jnp.clip(((mys + r + TILE - 1) / TILE).astype(jnp.int32),
                         0, gy)
        tiles = jnp.where(proc.visible,
                          (rmaxx - rminx) * (rmaxy - rminy), 0)
        proc_wide = proc._replace(
            rect_min=jnp.stack([rminx, rminy], axis=-1),
            rect_max=jnp.stack([rmaxx, rmaxy], axis=-1),
            tiles_touched=tiles.astype(jnp.int32),
        )
        n_tight = int(jnp.sum(proc.tiles_touched))
        n_wide = int(jnp.sum(proc_wide.tiles_touched))
        assert n_tight < n_wide, (
            f"tight rect did not shrink binning ({n_tight} vs {n_wide}); "
            "scene not anisotropic enough for the test"
        )

        bg = jnp.zeros(3)
        dense = jax.jit(lambda p: composite_dense(p, 64, 64, bg))
        ct, dt_, tt = dense(proc)
        cw, dw, tw = dense(proc_wide)
        np.testing.assert_array_equal(np.asarray(ct), np.asarray(cw))
        np.testing.assert_array_equal(np.asarray(dt_), np.asarray(dw))
        np.testing.assert_array_equal(np.asarray(tt), np.asarray(tw))


class TestBinning:
    def test_instances_match_tiles_touched(self):
        scene = random_scene(64, seed=3)
        cam = make_camera(64, 64)
        proc = _proc(scene, cam)
        g = 64 // TILE
        b = _jit_bin(g, g, 8192)(scene, cam)
        assert int(b.num_rendered) == int(jnp.sum(proc.tiles_touched))
        assert not bool(b.overflow)
        total = int(jnp.sum(b.tile_end - b.tile_start))
        assert total == int(b.num_rendered)

    def test_depth_sorted_within_tile(self):
        scene = random_scene(128, seed=4)
        cam = make_camera(64, 64)
        proc = _proc(scene, cam)
        g = 64 // TILE
        b = _jit_bin(g, g, 8192)(scene, cam)
        depth = np.asarray(proc.depth)
        gid = np.asarray(b.gauss_id)
        for t in range(g * g):
            s, e = int(b.tile_start[t]), int(b.tile_end[t])
            d = depth[gid[s:e]]
            assert np.all(np.diff(d) >= 0)

    def test_overflow_flag(self):
        scene = random_scene(64, seed=3)
        cam = make_camera(64, 64)
        g = 64 // TILE
        b = _jit_bin(g, g, 8)(scene, cam)
        assert bool(b.overflow)


class TestTiledVsOracle:
    @pytest.mark.parametrize("seed,hw", [(0, 64), (2, 80)])
    def test_forward_allclose(self, seed, hw):
        scene = random_scene(200, seed=seed)
        cam = make_camera(hw, hw)
        bg = jnp.asarray([0.1, 0.2, 0.3])
        out_t = render_j(scene, cam, bg, tile_cap=512, chunk=64)
        out_r = render_j(scene, cam, bg, impl="ref")
        assert_images_close(out_t.color, out_r.color, name="color")
        assert_images_close(out_t.depth, out_r.depth, loose=2e-2, name="depth")
        assert_images_close(out_t.final_T, out_r.final_T, name="final_T")
        assert not bool(out_t.overflow)

    def test_forward_nonsquare(self):
        scene = random_scene(150, seed=5)
        cam = make_camera(40, 72)  # exercises tile padding + crop
        out_t = render_j(scene, cam, tile_cap=512, chunk=32)
        out_r = render_j(scene, cam, impl="ref")
        assert_images_close(out_t.color, out_r.color, name="color")

    def test_gradients_match_oracle(self):
        scene = random_scene(100, seed=6)
        cam = make_camera(48, 48)
        bg = jnp.zeros(3)
        probe = jax.random.normal(jax.random.key(0), (48, 48, 3))

        def loss(params, impl):
            s = scene.replace(params=params)
            out = render(s, cam, bg, impl=impl, tile_cap=512, chunk=64)
            return jnp.sum(out.color * probe) + 0.1 * jnp.sum(out.depth)

        g_t = jax.jit(jax.grad(lambda p: loss(p, "tiled")))(scene.params)
        g_r = jax.jit(jax.grad(lambda p: loss(p, "ref")))(scene.params)
        for name in ["xyz", "features_dc", "opacity_raw", "log_scales", "quats"]:
            gt, gr = getattr(g_t, name), getattr(g_r, name)
            np.testing.assert_allclose(
                np.asarray(gt), np.asarray(gr), atol=5e-4, rtol=5e-3,
                err_msg=f"grad mismatch: {name}",
            )

    def test_gradients_finite_differences(self):
        scene = random_scene(20, seed=7)
        cam = make_camera(32, 32)

        @jax.jit
        def loss(xyz):
            s = scene.replace(params=scene.params.replace(xyz=xyz))
            return jnp.sum(render(s, cam, impl="tiled", tile_cap=256, chunk=32).color)

        xyz0 = scene.params.xyz
        g = jax.jit(jax.grad(loss))(xyz0)
        rng = np.random.RandomState(0)
        v = jnp.asarray(rng.randn(*xyz0.shape).astype(np.float32))
        eps = 1e-3
        fd = (loss(xyz0 + eps * v) - loss(xyz0 - eps * v)) / (2 * eps)
        analytic = jnp.sum(g * v)
        np.testing.assert_allclose(float(fd), float(analytic), rtol=5e-2, atol=1e-2)

    def test_mean2d_offset_probe(self):
        """The NDC offset probe must receive nonzero gradient (densification
        stats depend on it) and a zero offset must not change the image."""
        scene = random_scene(50, seed=8)
        cam = make_camera(32, 32)
        zeros = jnp.zeros((scene.capacity, 2))
        base = render_j(scene, cam)
        withp = render_j(scene, cam, mean2d_offset_ndc=zeros)
        # adding the zero offset changes XLA fusion slightly; ~1e-6 noise
        np.testing.assert_allclose(base.color, withp.color, atol=1e-5)

        @jax.jit
        def gradf(off):
            def loss(o):
                out = render(scene, cam, mean2d_offset_ndc=o, impl="tiled",
                             tile_cap=256, chunk=32)
                return jnp.sum(out.color**2)

            return jax.grad(loss)(off)

        g = gradf(zeros)
        vis = np.asarray(base.visible)
        assert np.any(np.abs(np.asarray(g)[vis]) > 0)


class TestRenderFeatures:
    def test_override_color(self):
        scene = random_scene(80, seed=9)
        cam = make_camera(32, 32)
        ones = jnp.ones((scene.capacity, 1))
        out = render_j(scene, cam, jnp.zeros(1), override_color=ones)
        # composited "mask" channel equals alpha when all colors are 1
        np.testing.assert_allclose(
            np.asarray(out.color[..., 0]), np.asarray(out.alpha), atol=1e-5
        )

    def test_bg_composited_where_empty(self):
        scene = random_scene(5, seed=10, spread=0.05)
        cam = make_camera(64, 64)
        bg = jnp.asarray([0.25, 0.5, 0.75])
        out = render_j(scene, cam, bg, tile_cap=128)
        corner = np.asarray(out.color[0, 0])
        np.testing.assert_allclose(corner, np.asarray(bg), atol=1e-5)

    def test_dead_slots_do_not_render(self):
        s_full = random_scene(50, seed=11, capacity=100)
        out_padded = render_j(s_full, make_camera())
        s_compact = s_full.compact()
        out_compact = render_j(s_compact, make_camera())
        np.testing.assert_allclose(out_padded.color, out_compact.color, atol=1e-6)
