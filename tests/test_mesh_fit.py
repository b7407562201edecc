"""Photometric mesh->GS fit for colorless meshes (VERDICT round-2
missing #3 / next-round #8): the software Lambertian rasterizer and the
appearance fit against its renders (train_from_mesh.py:115-139 role).
"""

import numpy as np
import pytest

from gaussianeditor_tpu.core.cameras import lookat_camera, orbit_cameras
from gaussianeditor_tpu.edit.mesh_to_gs import (
    fit_colorless_mesh,
    photometric_fit,
    render_mesh_lambertian,
    sample_mesh_surface,
)


def _octahedron(r=0.5):
    v = np.array([[r, 0, 0], [-r, 0, 0], [0, r, 0], [0, -r, 0],
                  [0, 0, r], [0, 0, -r]], np.float32)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    return v, f


class TestLambertianRasterizer:
    def test_triangle_coverage_and_background(self):
        cam = lookat_camera(np.array([0, 0, -3.0]), np.zeros(3),
                            np.array([0, 1.0, 0]), 0.8, 0.8, 64, 64)
        v = np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0, 0.6, 0]],
                     np.float32)
        f = np.array([[0, 1, 2]], np.int32)
        img = render_mesh_lambertian(v, f, cam)
        assert img.shape == (64, 64, 3)
        # background is white, triangle interior is shaded darker
        assert img[1, 1].min() > 0.99
        center = img[28:36, 28:36]
        assert center.max() < 0.99
        assert np.isfinite(img).all()

    def test_zbuffer_orders_triangles(self):
        cam = lookat_camera(np.array([0, 0, -3.0]), np.zeros(3),
                            np.array([0, 1.0, 0]), 0.8, 0.8, 64, 64)
        # near triangle (z=0 plane) occludes far one (z=+1, farther from
        # the camera at z=-3)
        v = np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0, 0.6, 0],
                      [-0.6, -0.6, 1], [0.6, -0.6, 1], [0, 0.7, 1]],
                     np.float32)
        f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        red = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        img = render_mesh_lambertian(v, f, cam, face_colors=red,
                                     ambient=1.0)
        c = img[32, 32]
        assert c[0] > 0.9 and c[2] < 0.1, f"far triangle won z-test: {c}"

    def test_two_tone_shading_from_geometry(self):
        """A colorless octahedron under a directional light renders with
        genuinely different tones on differently-oriented faces."""
        v, f = _octahedron()
        cam = lookat_camera(np.array([0, 0.4, -2.0]), np.zeros(3),
                            np.array([0, 1.0, 0]), 0.8, 0.8, 64, 64)
        img = render_mesh_lambertian(v, f, cam)
        fg = img[img[..., 0] < 0.99]
        assert len(fg) > 100
        assert fg.max() - fg.min() > 0.1, "no shading contrast"


class TestPhotometricFit:
    def test_colorless_mesh_gets_nontrivial_appearance(self):
        v, f = _octahedron()
        scene = fit_colorless_mesh(
            (v, f), n_samples=400, n_views=6, hw=48, steps=80,
            max_instances=8192,
        )
        # the fitted features moved away from the uniform 0.5-gray init
        dc = np.asarray(scene.params.features_dc)[np.asarray(scene.alive)]
        spread = dc.std()
        assert spread > 0.01, f"appearance stayed uniform ({spread})"

        # and the fitted renders approximate the rasterizer's shading
        # better than the gray init does
        import jax
        import jax.numpy as jnp

        from gaussianeditor_tpu.models.gaussians import GaussianScene
        from gaussianeditor_tpu.ops.render import render

        center = v.mean(axis=0)
        cams = orbit_cameras(6, 2.5 * 0.5, 0.8, 0.8, 48, 48, center=center)
        tgt = render_mesh_lambertian(v, f, cams[0], bg=0.0)
        pts, cols = sample_mesh_surface(v, f, 400, None, 0)
        gray = GaussianScene.from_points(pts, cols, max_sh_degree=0)

        rfn = jax.jit(lambda s, c: render(
            s, c, jnp.zeros(3), max_instances=8192).color)
        err_fit = float(jnp.mean(jnp.abs(rfn(scene, cams[0]) - tgt)))
        err_gray = float(jnp.mean(jnp.abs(rfn(gray, cams[0]) - tgt)))
        assert err_fit < err_gray * 0.9, (err_fit, err_gray)

    def test_geometry_frozen_during_fit(self):
        v, f = _octahedron()
        pts, cols = sample_mesh_surface(v, f, 300, None, 0)
        from gaussianeditor_tpu.models.gaussians import GaussianScene

        scene = GaussianScene.from_points(pts, cols, max_sh_degree=0)
        cams = orbit_cameras(4, 1.5, 0.8, 0.8, 32, 32,
                             center=v.mean(axis=0))
        targets = np.stack([render_mesh_lambertian(v, f, c) for c in cams])
        fitted = photometric_fit(scene, cams, targets, steps=10,
                                 max_instances=4096)
        np.testing.assert_array_equal(np.asarray(fitted.params.xyz),
                                      np.asarray(scene.params.xyz))
        np.testing.assert_array_equal(np.asarray(fitted.params.log_scales),
                                      np.asarray(scene.params.log_scales))
        np.testing.assert_array_equal(np.asarray(fitted.params.quats),
                                      np.asarray(scene.params.quats))
        np.testing.assert_array_equal(np.asarray(fitted.params.opacity_raw),
                                      np.asarray(scene.params.opacity_raw))
        assert (np.asarray(fitted.params.features_dc)
                != np.asarray(scene.params.features_dc)).any()

    def test_burst_matches_per_step_fit(self):
        """dispatch_burst scan bursts draw the same view sequence and
        fit the same appearance as the per-step loop."""
        v, f = _octahedron()
        pts, cols = sample_mesh_surface(v, f, 300, None, 0)
        from gaussianeditor_tpu.models.gaussians import GaussianScene

        scene = GaussianScene.from_points(pts, cols, max_sh_degree=0)
        cams = orbit_cameras(4, 1.5, 0.8, 0.8, 32, 32,
                             center=v.mean(axis=0))
        targets = np.stack([render_mesh_lambertian(v, f, c) for c in cams])
        a = photometric_fit(scene, cams, targets, steps=11,
                            max_instances=4096)
        b = photometric_fit(scene, cams, targets, steps=11,
                            max_instances=4096, dispatch_burst=4)
        np.testing.assert_allclose(
            np.asarray(a.params.features_dc),
            np.asarray(b.params.features_dc), rtol=0, atol=2e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
