"""Per-Gaussian preprocessing: cull, project, EWA splat, SH -> color.

TPU-native equivalent of `preprocessCUDA` + helpers
(`cuda_rasterizer/forward.cu:74-256`, `auxiliary.h:139-164`). Plain
vectorized jnp — XLA fuses this whole stage into a handful of kernels,
and `jax.vjp` reproduces the hand-written CUDA backward
(`backward.cu:144-396`) automatically; only the sequential compositing
loop needs custom kernels.

All shapes are static over the full capacity C; dead/culled Gaussians are
carried with `visible=False` and zeroed radii rather than compacted.

Exact constants preserved: near-plane cull z<=0.2, 1.3*tanfov frustum
clamp in the EWA Jacobian, +0.3 px^2 low-pass on the 2D covariance
diagonal, radius = ceil(3*sqrt(max eigenvalue)) with the 0.1 floor inside
the sqrt, ndc2Pix convention ((v+1)*S-1)/2, w-denominator epsilon 1e-7.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gaussianeditor_tpu.core.cameras import Camera
from gaussianeditor_tpu.core.sh import eval_sh
from gaussianeditor_tpu.core.transforms import build_covariance

TILE = 16  # pixels per tile side (config.h:15-17 BLOCK_X/BLOCK_Y; 8x8
# tiles measured slower on TPU: instance duplication outweighs the
# reduced per-chunk pixel work)


class ProcessedGaussians(NamedTuple):
    mean2d: jnp.ndarray      # [C, 2] pixel-space center
    depth: jnp.ndarray       # [C] camera-space z
    conic: jnp.ndarray       # [C, 3] inverse 2D covariance (xx, xy, yy)
    color: jnp.ndarray       # [C, ch] per-Gaussian feature to composite
    opacity: jnp.ndarray     # [C] activated opacity
    radius: jnp.ndarray      # [C] int32 screen-space radius (0 = culled)
    visible: jnp.ndarray     # [C] bool
    rect_min: jnp.ndarray    # [C, 2] int32 (tx, ty) inclusive
    rect_max: jnp.ndarray    # [C, 2] int32 (tx, ty) exclusive
    tiles_touched: jnp.ndarray  # [C] int32


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """auxiliary.h:41-44."""
    return ((v + 1.0) * size - 1.0) * 0.5


def compute_cov2d(
    xyz: jnp.ndarray,
    cov3d: jnp.ndarray,
    world_view: jnp.ndarray,
    focal_x: jnp.ndarray,
    focal_y: jnp.ndarray,
    tan_fovx: jnp.ndarray,
    tan_fovy: jnp.ndarray,
) -> jnp.ndarray:
    """EWA projection of the 3D covariance to screen space.

    Math parity with `computeCov2D` (forward.cu:74-113): cov2d =
    J V Sigma V^T J^T with the frustum-clamped Jacobian, then +0.3 on the
    diagonal. Returns [C, 3] (xx, xy, yy).
    """
    R = world_view[:3, :3]
    t = xyz @ R.T + world_view[:3, 3]
    tz = t[..., 2]

    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txtz = t[..., 0] / tz
    tytz = t[..., 1] / tz
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz

    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    zeros = jnp.zeros_like(tz)
    # J: [C, 2, 3]
    J = jnp.stack(
        [
            jnp.stack([focal_x * inv_tz, zeros, -focal_x * tx * inv_tz2], axis=-1),
            jnp.stack([zeros, focal_y * inv_tz, -focal_y * ty * inv_tz2], axis=-1),
        ],
        axis=-2,
    )
    JW = J @ R  # [C, 2, 3]
    cov = JW @ cov3d @ jnp.swapaxes(JW, -1, -2)  # [C, 2, 2]
    return jnp.stack(
        [cov[..., 0, 0] + 0.3, cov[..., 0, 1], cov[..., 1, 1] + 0.3], axis=-1
    )


def preprocess(
    xyz: jnp.ndarray,
    log_scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacity: jnp.ndarray,
    sh: Optional[jnp.ndarray],
    camera: Camera,
    *,
    alive: Optional[jnp.ndarray] = None,
    active_sh_degree=None,
    max_sh_degree: int = 3,
    scale_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    mean2d_offset_ndc: Optional[jnp.ndarray] = None,
) -> ProcessedGaussians:
    """Project all Gaussians into `camera`.

    `mean2d_offset_ndc` [C, 2] is the densification-gradient probe: an
    all-zeros array added to the NDC projection whose cotangent equals the
    reference's `screenspace_points` viewspace gradient
    (`gaussian_renderer/__init__.py:60-69`, NDC scaling as in
    backward.cu:460-461).
    """
    C = xyz.shape[0]
    W, H = camera.width, camera.height

    # Projection (forward.cu:197-200 + in_frustum auxiliary.h:139-164).
    ones = jnp.ones((C, 1), xyz.dtype)
    p_hom = jnp.concatenate([xyz, ones], axis=-1) @ camera.full_proj.T
    p_w = 1.0 / (p_hom[..., 3] + 1e-7)
    p_proj = p_hom[..., :3] * p_w[..., None]
    p_view_z = xyz @ camera.world_view[2, :3] + camera.world_view[2, 3]
    in_frustum = p_view_z > 0.2

    if mean2d_offset_ndc is not None:
        p_xy_ndc = p_proj[..., :2] + mean2d_offset_ndc
    else:
        p_xy_ndc = p_proj[..., :2]
    mean2d = jnp.stack(
        [ndc2pix(p_xy_ndc[..., 0], W), ndc2pix(p_xy_ndc[..., 1], H)], axis=-1
    )

    # Covariance chain (forward.cu:118-152 + 74-113).
    cov3d = build_covariance(jnp.exp(log_scales), quats, scale_modifier)
    cov2d = compute_cov2d(
        xyz, cov3d, camera.world_view,
        camera.focal_x, camera.focal_y, camera.tan_fovx, camera.tan_fovy,
    )

    det = cov2d[..., 0] * cov2d[..., 2] - cov2d[..., 1] * cov2d[..., 1]
    det_valid = det != 0.0
    det_inv = 1.0 / jnp.where(det_valid, det, 1.0)
    conic = jnp.stack(
        [cov2d[..., 2] * det_inv, -cov2d[..., 1] * det_inv, cov2d[..., 0] * det_inv],
        axis=-1,
    )

    mid = 0.5 * (cov2d[..., 0] + cov2d[..., 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, mid - disc)))
    radius_f = jax.lax.stop_gradient(radius_f)

    # Tile rect (auxiliary.h getRect), grid in tiles.
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    m2d = jax.lax.stop_gradient(mean2d)
    rect_min = jnp.stack(
        [
            jnp.clip(((m2d[..., 0] - radius_f) / TILE).astype(jnp.int32), 0, grid_x),
            jnp.clip(((m2d[..., 1] - radius_f) / TILE).astype(jnp.int32), 0, grid_y),
        ],
        axis=-1,
    )
    rect_max = jnp.stack(
        [
            jnp.clip(
                ((m2d[..., 0] + radius_f + TILE - 1) / TILE).astype(jnp.int32),
                0, grid_x,
            ),
            jnp.clip(
                ((m2d[..., 1] + radius_f + TILE - 1) / TILE).astype(jnp.int32),
                0, grid_y,
            ),
        ],
        axis=-1,
    )
    tiles = (rect_max[..., 0] - rect_min[..., 0]) * (rect_max[..., 1] - rect_min[..., 1])

    visible = in_frustum & det_valid & (tiles > 0)
    if alive is not None:
        visible = visible & alive
    tiles_touched = jnp.where(visible, tiles, 0).astype(jnp.int32)
    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    # Color: SH -> RGB (+0.5, clamp at 0; forward.cu:20-71) or override.
    if override_color is not None:
        color = override_color
    else:
        assert sh is not None
        dirs = xyz - camera.cam_pos
        # gradient-safe normalization (see core/transforms.quat_normalize)
        dn2 = jnp.sum(dirs * dirs, axis=-1, keepdims=True)
        dirs = dirs * jax.lax.rsqrt(jnp.maximum(dn2, 1e-24))
        color = jnp.maximum(
            eval_sh(max_sh_degree, sh, dirs, active_degree=active_sh_degree) + 0.5,
            0.0,
        )

    return ProcessedGaussians(
        mean2d=mean2d,
        depth=p_view_z,
        conic=conic,
        color=color,
        opacity=opacity,
        radius=radius,
        visible=visible,
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=tiles_touched,
    )
