"""Quaternion / covariance math and rigid Gaussian transforms.

Parity targets: `gaussiansplatting/utils/general_utils.py:64-110`
(`build_rotation`, `build_scaling_rotation`, `strip_symmetric`) and
`threestudio/utils/transform.py:6-33` (scale/rotate/translate gaussians).
Quaternions are stored (w, x, y, z) and are *not* assumed normalized —
normalization happens at use sites, matching the reference
(`scene/gaussian_model.py:57`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quat_normalize(q: jnp.ndarray, eps: float = 1e-24) -> jnp.ndarray:
    """Gradient-safe normalization. `q / max(||q||, eps)` NaNs in the
    backward pass at q == 0 (d||q||/dq = q/||q|| = 0/0 before `maximum`
    masks it); taking rsqrt of the *clamped squared* norm keeps every
    intermediate gradient finite — dead capacity slots carry zero quats."""
    norm2 = jnp.sum(q * q, axis=-1, keepdims=True)
    return q * jax.lax.rsqrt(jnp.maximum(norm2, eps))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w,x,y,z) unnormalized quaternion -> [..., 3, 3] rotation.

    Matches `build_rotation` (general_utils.py:78-99): normalizes first.
    """
    q = quat_normalize(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def build_scaling_rotation(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s) — reference `build_scaling_rotation`
    (general_utils.py:101-110)."""
    R = quat_to_rotmat(quats)
    return R * scales[..., None, :]


def build_covariance(scales: jnp.ndarray, quats: jnp.ndarray,
                     scale_modifier: float = 1.0) -> jnp.ndarray:
    """3D covariance Sigma = L L^T, L = R diag(mod*s).

    Matches `build_covariance_from_scaling_rotation`
    (gaussian_model.py:44-49) / `computeCov3D` (forward.cu:118-152).
    Returns the full symmetric [..., 3, 3].
    """
    L = build_scaling_rotation(scales * scale_modifier, quats)
    return L @ jnp.swapaxes(L, -1, -2)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 6] upper triangle (xx,xy,xz,yy,yz,zz);
    reference `strip_lowerdiag` (general_utils.py:64-76)."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]],
        axis=-1,
    )


def unstrip_symmetric(c6: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `strip_symmetric`."""
    xx, xy, xz, yy, yz, zz = (c6[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of (w,x,y,z) quaternions, broadcastable."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """[3,3] rotation -> (w,x,y,z) quaternion (host-side, numpy)."""
    R = np.asarray(R, dtype=np.float64)
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z])
    return (q / np.linalg.norm(q)).astype(np.float32)


# --- rigid transforms of whole Gaussian clouds (reference transform.py) ---

def translate_xyz(xyz: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    return xyz + offset


def scale_gaussians(xyz: jnp.ndarray, log_scales: jnp.ndarray, factor: float,
                    origin: jnp.ndarray):
    """Uniform scale about `origin`; log-scales shift by log(factor).
    Reference: transform.py `scale_gaussians` (scales stored in log space)."""
    new_xyz = (xyz - origin) * factor + origin
    new_log_scales = log_scales + jnp.log(factor)
    return new_xyz, new_log_scales


def rotate_gaussians(xyz: jnp.ndarray, quats: jnp.ndarray, R: jnp.ndarray,
                     rot_quat: jnp.ndarray, origin: jnp.ndarray):
    """Rotate positions about `origin` by R and compose quaternions
    (q' = rot_quat * q). Reference: transform.py `rotate_gaussians`."""
    new_xyz = (xyz - origin) @ R.T + origin
    new_quats = quat_multiply(rot_quat, quats)
    return new_xyz, new_quats


def default_model_rotation() -> np.ndarray:
    """-90deg about x: generated-object frame -> scene frame
    (reference transform.py `default_model_mtx`)."""
    c, s = 0.0, -1.0
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=np.float32)
