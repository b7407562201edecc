"""Per-Gaussian preprocessing: cull, project, EWA splat, SH -> color.

TPU-native equivalent of `preprocessCUDA` + helpers
(`cuda_rasterizer/forward.cu:74-256`, `auxiliary.h:139-164`). Plain
vectorized jnp — XLA fuses this whole stage into a handful of kernels,
and `jax.vjp` reproduces the hand-written CUDA backward
(`backward.cu:144-396`) automatically; only the sequential compositing
loop needs custom kernels.

Layout: every intermediate is a 1-D [C] array ("structure of arrays",
capacity on the 128-lane axis). The AoS formulation ([C, 3] points,
[C, 3, 3] batched covariance matmuls, [C, 16, 3] SH contractions) puts
a 2-4 element dimension on the lanes and runs ~30-100x below the VPU
roofline; the SoA rewrite measured 4.65 ms -> ~0.05 ms for the full
stage at C=100k on a v5e chip (bench/prof_r4.py). Small [C, k] stacks
are emitted only at the output boundary.

All shapes are static over the full capacity C; dead/culled Gaussians are
carried with `visible=False` and zeroed radii rather than compacted.

Exact constants preserved: near-plane cull z<=0.2, 1.3*tanfov frustum
clamp in the EWA Jacobian, +0.3 px^2 low-pass on the 2D covariance
diagonal, radius = ceil(3*sqrt(max eigenvalue)) with the 0.1 floor inside
the sqrt, ndc2Pix convention ((v+1)*S-1)/2, w-denominator epsilon 1e-7.

One deliberate improvement over CUDA's getRect: the BINNING rect uses
per-axis opacity-aware radii min(3*sqrt(lambda_max),
sqrt(2*ln(256*op)*Sigma_axis)) — output-exact (every excluded
(pixel, instance) pair fails the compositor's alpha < 1/255 gate; see
the derivation at the rect computation below) while binning 20-50%
fewer tile instances for anisotropic/low-opacity Gaussians. The
reported `radius` stays the isotropic CUDA one (densification
screen-size semantics, gaussian_model.py:811-815).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gaussianeditor_tpu.core.cameras import Camera
from gaussianeditor_tpu.core.sh import C0, C1, C2, C3, C4, num_sh_bases

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


def _eval_sh_soa(max_degree, shT, x, y, z, active_degree):
    """SH basis combination in SoA layout.

    shT: [K, ch, C] coefficients; x/y/z: [C] unit direction components.
    Same basis constants and band order as core/sh.eval_sh (parity with
    `sh_utils.py:57-130` / `forward.cu:20-71`); returns [ch, C].
    """

    def gate(deg, val):
        if active_degree is None:
            return val
        return jnp.where(deg <= active_degree, val, jnp.zeros_like(val))

    res = C0 * shT[0]
    if max_degree == 0:
        return res
    band1 = (-C1 * y) * shT[1] + (C1 * z) * shT[2] + (-C1 * x) * shT[3]
    res = res + gate(1, band1)
    if max_degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        band2 = (
            (C2[0] * xy) * shT[4]
            + (C2[1] * yz) * shT[5]
            + (C2[2] * (2.0 * zz - xx - yy)) * shT[6]
            + (C2[3] * xz) * shT[7]
            + (C2[4] * (xx - yy)) * shT[8]
        )
        res = res + gate(2, band2)
    if max_degree >= 3:
        band3 = (
            (C3[0] * y * (3 * xx - yy)) * shT[9]
            + (C3[1] * xy * z) * shT[10]
            + (C3[2] * y * (4 * zz - xx - yy)) * shT[11]
            + (C3[3] * z * (2 * zz - 3 * xx - 3 * yy)) * shT[12]
            + (C3[4] * x * (4 * zz - xx - yy)) * shT[13]
            + (C3[5] * z * (xx - yy)) * shT[14]
            + (C3[6] * x * (xx - 3 * yy)) * shT[15]
        )
        res = res + gate(3, band3)
    if max_degree >= 4:
        band4 = (
            (C4[0] * xy * (xx - yy)) * shT[16]
            + (C4[1] * yz * (3 * xx - yy)) * shT[17]
            + (C4[2] * xy * (7 * zz - 1)) * shT[18]
            + (C4[3] * yz * (7 * zz - 3)) * shT[19]
            + (C4[4] * (zz * (35 * zz - 30) + 3)) * shT[20]
            + (C4[5] * xz * (7 * zz - 3)) * shT[21]
            + (C4[6] * (xx - yy) * (7 * zz - 1)) * shT[22]
            + (C4[7] * xz * (xx - 3 * yy)) * shT[23]
            + (C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy))) * shT[24]
        )
        res = res + gate(4, band4)
    return res


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
    tile_row_range=None,
) -> ProcessedGaussians:
    """Project all Gaussians into `camera`.

    `mean2d_offset_ndc` [C, 2] is the densification-gradient probe: an
    all-zeros array added to the NDC projection whose cotangent equals the
    reference's `screenspace_points` viewspace gradient
    (`gaussian_renderer/__init__.py:60-69`, NDC scaling as in
    backward.cu:460-461).
    """
    W, H = camera.width, camera.height
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]

    # Projection (forward.cu:197-200 + in_frustum auxiliary.h:139-164).
    P = camera.full_proj
    hx = P[0, 0] * x + P[0, 1] * y + P[0, 2] * z + P[0, 3]
    hy = P[1, 0] * x + P[1, 1] * y + P[1, 2] * z + P[1, 3]
    hw = P[3, 0] * x + P[3, 1] * y + P[3, 2] * z + P[3, 3]
    p_w = 1.0 / (hw + 1e-7)
    WV = camera.world_view
    tz = WV[2, 0] * x + WV[2, 1] * y + WV[2, 2] * z + WV[2, 3]
    in_frustum = tz > 0.2

    ndc_x = hx * p_w
    ndc_y = hy * p_w
    if mean2d_offset_ndc is not None:
        ndc_x = ndc_x + mean2d_offset_ndc[:, 0]
        ndc_y = ndc_y + mean2d_offset_ndc[:, 1]
    mx = ndc2pix(ndc_x, W)
    my = ndc2pix(ndc_y, H)

    # Covariance chain (forward.cu:118-152: Sigma = L L^T, L = R diag(s)).
    sc = jnp.exp(log_scales) * scale_modifier
    sx, sy, sz = sc[:, 0], sc[:, 1], sc[:, 2]
    q = quats
    # gradient-safe normalization (see core/transforms.quat_normalize)
    qn2 = q[:, 0] ** 2 + q[:, 1] ** 2 + q[:, 2] ** 2 + q[:, 3] ** 2
    qinv = jax.lax.rsqrt(jnp.maximum(qn2, 1e-24))
    qr, qi, qj, qk = (q[:, 0] * qinv, q[:, 1] * qinv,
                      q[:, 2] * qinv, q[:, 3] * qinv)
    R00 = 1 - 2 * (qj * qj + qk * qk)
    R01 = 2 * (qi * qj - qr * qk)
    R02 = 2 * (qi * qk + qr * qj)
    R10 = 2 * (qi * qj + qr * qk)
    R11 = 1 - 2 * (qi * qi + qk * qk)
    R12 = 2 * (qj * qk - qr * qi)
    R20 = 2 * (qi * qk - qr * qj)
    R21 = 2 * (qj * qk + qr * qi)
    R22 = 1 - 2 * (qi * qi + qj * qj)
    L00, L01, L02 = R00 * sx, R01 * sy, R02 * sz
    L10, L11, L12 = R10 * sx, R11 * sy, R12 * sz
    L20, L21, L22 = R20 * sx, R21 * sy, R22 * sz
    S00 = L00 * L00 + L01 * L01 + L02 * L02
    S01 = L00 * L10 + L01 * L11 + L02 * L12
    S02 = L00 * L20 + L01 * L21 + L02 * L22
    S11 = L10 * L10 + L11 * L11 + L12 * L12
    S12 = L10 * L20 + L11 * L21 + L12 * L22
    S22 = L20 * L20 + L21 * L21 + L22 * L22

    # EWA projection (computeCov2D, forward.cu:74-113): cov2d =
    # J W Sigma W^T J^T with the frustum-clamped Jacobian, +0.3 diagonal.
    tx = WV[0, 0] * x + WV[0, 1] * y + WV[0, 2] * z + WV[0, 3]
    ty = WV[1, 0] * x + WV[1, 1] * y + WV[1, 2] * z + WV[1, 3]
    limx = 1.3 * camera.tan_fovx
    limy = 1.3 * camera.tan_fovy
    txc = jnp.clip(tx / tz, -limx, limx) * tz
    tyc = jnp.clip(ty / tz, -limy, limy) * tz
    itz = 1.0 / tz
    itz2 = itz * itz
    J00 = camera.focal_x * itz
    J02 = -camera.focal_x * txc * itz2
    J11 = camera.focal_y * itz
    J12 = -camera.focal_y * tyc * itz2
    # T = J @ W (first two rows; the third row of J is zero)
    T00 = J00 * WV[0, 0] + J02 * WV[2, 0]
    T01 = J00 * WV[0, 1] + J02 * WV[2, 1]
    T02 = J00 * WV[0, 2] + J02 * WV[2, 2]
    T10 = J11 * WV[1, 0] + J12 * WV[2, 0]
    T11 = J11 * WV[1, 1] + J12 * WV[2, 1]
    T12 = J11 * WV[1, 2] + J12 * WV[2, 2]
    A0 = T00 * S00 + T01 * S01 + T02 * S02
    A1 = T00 * S01 + T01 * S11 + T02 * S12
    A2 = T00 * S02 + T01 * S12 + T02 * S22
    B0 = T10 * S00 + T11 * S01 + T12 * S02
    B1 = T10 * S01 + T11 * S11 + T12 * S12
    B2 = T10 * S02 + T11 * S12 + T12 * S22
    c_xx = A0 * T00 + A1 * T01 + A2 * T02 + 0.3
    c_xy = A0 * T10 + A1 * T11 + A2 * T12
    c_yy = B0 * T10 + B1 * T11 + B2 * T12 + 0.3

    det = c_xx * c_yy - c_xy * c_xy
    det_valid = det != 0.0
    det_inv = 1.0 / jnp.where(det_valid, det, 1.0)
    conic_a = c_yy * det_inv
    conic_b = -c_xy * det_inv
    conic_c = c_xx * det_inv

    mid = 0.5 * (c_xx + c_yy)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, mid - disc)))
    radius_f = jax.lax.stop_gradient(radius_f)

    # Per-axis opacity-aware rect radii — an EXACT-output tightening of
    # CUDA's isotropic 3*sqrt(lambda_max) square rect (auxiliary.h
    # getRect): for the PD quadratic q with covariance Sigma (the +0.3
    # LPF'd one the compositor's conic inverts), min over dy of q(dx, dy)
    # = dx^2 / Sigma_xx (Schur marginal), so every pixel with |dx| >
    # sqrt(2*ln(256*op)*Sigma_xx) has alpha = op*exp(-q/2) <= 1/256 <
    # ALPHA_MIN and is dropped by the compositor's per-pair gate anyway
    # (forward.cu:346-353 semantics). 256 (not 255) buys a strict margin
    # against f32 rounding of q. Capped at the CUDA radius: instance
    # lists only ever shrink, and only by pairs that contribute exactly
    # nothing. Anisotropic and low-opacity Gaussians bin far fewer
    # instances; radii/visible keep the reference semantics (the 3-sigma
    # isotropic radius still feeds densification's screen-size rule).
    # One documented divergence: a Gaussian whose opacity can never
    # reach ALPHA_MIN anywhere (op <= 1/256) gets an empty rect and is
    # reported invisible, where the reference keeps it visible-but-
    # contributing-nothing; such Gaussians are below min_opacity 0.005
    # and are pruned by the next densify pass in both frameworks.
    ln_op = jnp.log(256.0 * jnp.maximum(opacity, 1e-12))
    two_ln = 2.0 * jnp.maximum(ln_op, 0.0)
    rx_f = jax.lax.stop_gradient(
        jnp.minimum(radius_f, jnp.ceil(jnp.sqrt(two_ln * c_xx))))
    ry_f = jax.lax.stop_gradient(
        jnp.minimum(radius_f, jnp.ceil(jnp.sqrt(two_ln * c_yy))))
    dead_op = jax.lax.stop_gradient(ln_op <= 0.0)

    # Tile rect (auxiliary.h getRect), grid in tiles.
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    mxs = jax.lax.stop_gradient(mx)
    mys = jax.lax.stop_gradient(my)
    rminx = jnp.clip(((mxs - rx_f) / TILE).astype(jnp.int32), 0, grid_x)
    rminy = jnp.clip(((mys - ry_f) / TILE).astype(jnp.int32), 0, grid_y)
    # Upper tile bound: CUDA's floor((p + r + TILE-1)/TILE) only covers
    # pixels <= p + r - 1 (a pixel at exactly p + r can land one tile
    # past it), so the tightened radius needs +TILE to keep every
    # pixel within rx included; capped at the reference's own bound so
    # the rect never exceeds CUDA's (rx_f <= radius_f always).
    rmaxx = jnp.clip(
        jnp.minimum((mxs + radius_f + TILE - 1) / TILE,
                    (mxs + rx_f + TILE) / TILE).astype(jnp.int32),
        0, grid_x,
    )
    rmaxy = jnp.clip(
        jnp.minimum((mys + radius_f + TILE - 1) / TILE,
                    (mys + ry_f + TILE) / TILE).astype(jnp.int32),
        0, grid_y,
    )
    if tile_row_range is not None:
        # tile-sharded strip render (docs/tile_sharding.md): keep only
        # tile rows [ty0, ty1) and emit STRIP-LOCAL rect coordinates.
        # ty0/ty1 may be traced (per-shard values under shard_map).
        ty0, ty1 = tile_row_range
        rminy = jnp.clip(rminy, ty0, ty1) - ty0
        rmaxy = jnp.clip(rmaxy, ty0, ty1) - ty0
    tiles = jnp.where(dead_op, 0, (rmaxx - rminx) * (rmaxy - rminy))

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
        assert sh.shape[-2] == num_sh_bases(max_sh_degree)
        dx = x - camera.cam_pos[0]
        dy = y - camera.cam_pos[1]
        dz = z - camera.cam_pos[2]
        dn = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-24))
        dx, dy, dz = dx * dn, dy * dn, dz * dn
        shT = jnp.transpose(sh, (1, 2, 0))  # [K, ch, C]
        res = _eval_sh_soa(max_sh_degree, shT, dx, dy, dz, active_sh_degree)
        color = jnp.maximum(res + 0.5, 0.0).T  # [C, ch]

    return ProcessedGaussians(
        mean2d=jnp.stack([mx, my], axis=-1),
        depth=tz,
        conic=jnp.stack([conic_a, conic_b, conic_c], axis=-1),
        color=color,
        opacity=opacity,
        radius=radius,
        visible=visible,
        rect_min=jnp.stack([rminx, rminy], axis=-1),
        rect_max=jnp.stack([rmaxx, rmaxy], axis=-1),
        tiles_touched=tiles_touched,
    )
