"""Unit tests for core math: SH, cameras, quaternion/covariance ops.

Oracles are tiny NumPy reimplementations checked against the reference's
published formulas (sh_utils.py, graphics_utils.py, general_utils.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianeditor_tpu.core import sh as shlib
from gaussianeditor_tpu.core.cameras import (
    Camera,
    fov2focal,
    focal2fov,
    get_projection_matrix,
    get_world2view,
    lookat_camera,
)
from gaussianeditor_tpu.core.transforms import (
    build_covariance,
    quat_multiply,
    quat_normalize,
    quat_to_rotmat,
    rotmat_to_quat,
)


class TestSH:
    def test_constant_term(self):
        sh = np.zeros((5, 1, 3), np.float32)
        sh[:, 0, :] = 1.0
        dirs = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (5, 1))
        out = shlib.eval_sh(0, jnp.asarray(sh), jnp.asarray(dirs))
        np.testing.assert_allclose(out, shlib.C0, rtol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.asarray(np.random.RandomState(0).rand(10, 3).astype(np.float32))
        np.testing.assert_allclose(shlib.sh2rgb(shlib.rgb2sh(rgb)), rgb, atol=1e-6)

    @pytest.mark.parametrize("deg", [1, 2, 3, 4])
    def test_band_count_and_gating(self, deg):
        k = shlib.num_sh_bases(deg)
        rng = np.random.RandomState(deg)
        sh = jnp.asarray(rng.randn(7, k, 3).astype(np.float32))
        dirs = rng.randn(7, 3).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        dirs = jnp.asarray(dirs)
        full = shlib.eval_sh(deg, sh, dirs)
        gated0 = shlib.eval_sh(deg, sh, dirs, active_degree=jnp.asarray(0))
        np.testing.assert_allclose(
            gated0, shlib.C0 * sh[:, 0, :], rtol=1e-5, atol=1e-6
        )
        gated_full = shlib.eval_sh(deg, sh, dirs, active_degree=jnp.asarray(deg))
        np.testing.assert_allclose(gated_full, full, rtol=1e-6)

    def test_degree1_matches_closed_form(self):
        # eval_sh deg 1: C0*sh0 - C1*y*sh1 + C1*z*sh2 - C1*x*sh3
        rng = np.random.RandomState(3)
        sh = rng.randn(4, 4, 1).astype(np.float32)
        d = rng.randn(4, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        expect = (
            shlib.C0 * sh[:, 0]
            - shlib.C1 * d[:, 1:2] * sh[:, 1]
            + shlib.C1 * d[:, 2:3] * sh[:, 2]
            - shlib.C1 * d[:, 0:1] * sh[:, 3]
        )
        out = shlib.eval_sh(1, jnp.asarray(sh), jnp.asarray(d))
        np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


class TestCameras:
    def test_fov_focal_roundtrip(self):
        assert abs(focal2fov(fov2focal(0.9, 640), 640) - 0.9) < 1e-9

    def test_projection_matrix_corners(self):
        P = get_projection_matrix(0.01, 100.0, 0.8, 0.6)
        # point on the near plane at the frustum corner maps to ndc +-1, z=0
        import math

        x = math.tan(0.4) * 0.01
        y = math.tan(0.3) * 0.01
        p = P @ np.array([x, y, 0.01, 1.0])
        p = p / p[3]
        np.testing.assert_allclose(p[:3], [1.0, 1.0, 0.0], atol=1e-5)
        # far plane maps to z=1
        p = P @ np.array([0.0, 0.0, 100.0, 1.0])
        assert abs(p[2] / p[3] - 1.0) < 1e-5

    def test_world2view_inverse_has_camera_center(self):
        rng = np.random.RandomState(1)
        q = rng.randn(4)
        R = np.asarray(quat_to_rotmat(jnp.asarray(q[None])))[0]
        t = rng.randn(3)
        W = get_world2view(R, t)
        C = np.linalg.inv(W)[:3, 3]
        # camera center maps to origin in camera frame
        np.testing.assert_allclose((W @ np.append(C, 1.0))[:3], 0.0, atol=1e-5)

    def test_lookat_points_camera_at_target(self):
        cam = lookat_camera(
            np.array([0, 0, -5.0]), np.zeros(3), np.array([0, 1.0, 0]),
            0.8, 0.8, 32, 32,
        )
        # target projects to image center, positive depth
        p_view = np.asarray(cam.world_view) @ np.array([0, 0, 0, 1.0])
        assert p_view[2] > 0
        p = np.asarray(cam.full_proj) @ np.array([0, 0, 0, 1.0])
        np.testing.assert_allclose(p[:2] / p[3], 0.0, atol=1e-6)

    def test_camera_is_pytree(self):
        cam = lookat_camera(
            np.array([0, 0, -5.0]), np.zeros(3), np.array([0, 1.0, 0]),
            0.8, 0.8, 32, 32,
        )
        leaves = jax.tree_util.tree_leaves(cam)
        assert len(leaves) == 5  # world_view, full_proj, cam_pos, tan_fovx/y
        jax.jit(lambda c: c.full_proj @ jnp.ones(4))(cam)


class TestTransforms:
    def test_quat_to_rotmat_orthonormal(self):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(16, 4).astype(np.float32))
        R = quat_to_rotmat(q)
        eye = jnp.eye(3)[None]
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), np.tile(eye, (16, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_identity_quat(self):
        R = quat_to_rotmat(jnp.asarray([[1.0, 0, 0, 0]]))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-7)

    def test_rotmat_quat_roundtrip(self):
        rng = np.random.RandomState(5)
        for _ in range(8):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            R = np.asarray(quat_to_rotmat(jnp.asarray(q[None], jnp.float32)))[0]
            q2 = rotmat_to_quat(R)
            # q and -q are the same rotation
            sign = np.sign(np.dot(q, q2))
            np.testing.assert_allclose(sign * q2, q, atol=1e-4)

    def test_quat_multiply_matches_rotation_compose(self):
        rng = np.random.RandomState(7)
        qa = quat_normalize(jnp.asarray(rng.randn(4).astype(np.float32)))
        qb = quat_normalize(jnp.asarray(rng.randn(4).astype(np.float32)))
        Rab = quat_to_rotmat(quat_multiply(qa, qb)[None])[0]
        np.testing.assert_allclose(
            Rab, quat_to_rotmat(qa[None])[0] @ quat_to_rotmat(qb[None])[0], atol=1e-5
        )

    def test_covariance_psd_and_eigvals(self):
        # axis-aligned: covariance eigenvalues == squared scales
        scales = jnp.asarray([[0.1, 0.2, 0.3]])
        quats = jnp.asarray([[1.0, 0, 0, 0]])
        cov = build_covariance(scales, quats)
        np.testing.assert_allclose(
            np.diag(np.asarray(cov[0])), np.asarray(scales[0]) ** 2, atol=1e-6
        )
        # rotated: eigenvalues preserved
        q = quat_normalize(jnp.asarray(np.random.RandomState(2).randn(4).astype(np.float32)))
        cov_r = build_covariance(scales, q[None])
        ev = np.sort(np.linalg.eigvalsh(np.asarray(cov_r[0])))
        np.testing.assert_allclose(ev, np.sort(np.asarray(scales[0]) ** 2), atol=1e-6)
