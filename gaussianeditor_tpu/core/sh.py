"""Real spherical harmonics evaluation (degrees 0-4).

Behavioral parity with `gaussiansplatting/utils/sh_utils.py:57-130`
(`eval_sh`, `RGB2SH`, `SH2RGB`) and the rasterizer's `computeColorFromSH`
(`cuda_rasterizer/forward.cu:20-71`): same basis constants, same
"+0.5 then clamp at 0" color convention (the clamp lives in the renderer,
not here). Vectorized over leading batch dims; degree is gated with
`jnp.where` so a single jitted program supports progressive SH activation
(`active_sh_degree`, reference gaussian_model.py:389-392) without
recompilation.
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def rgb2sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """Reference: sh_utils.py RGB2SH."""
    return (rgb - 0.5) / C0


def sh2rgb(sh: jnp.ndarray) -> jnp.ndarray:
    """Reference: sh_utils.py SH2RGB."""
    return sh * C0 + 0.5


def eval_sh(max_degree: int, sh: jnp.ndarray, dirs: jnp.ndarray,
            active_degree=None) -> jnp.ndarray:
    """Evaluate SH at unit directions.

    Args:
      max_degree: static SH degree the coefficient array holds (0..4).
      sh: [..., (max_degree+1)^2, C] coefficients.
      dirs: [..., 3] unit directions.
      active_degree: optional dynamic (traced) degree <= max_degree; bands
        above it contribute zero. None means all bands active.

    Returns [..., C].
    """
    assert 0 <= max_degree <= 4
    assert sh.shape[-2] == num_sh_bases(max_degree)

    result = C0 * sh[..., 0, :]
    if max_degree == 0:
        return result

    def band_gate(deg: int, val: jnp.ndarray) -> jnp.ndarray:
        if active_degree is None:
            return val
        return jnp.where(deg <= active_degree, val, jnp.zeros_like(val))

    x = dirs[..., 0:1]
    y = dirs[..., 1:2]
    z = dirs[..., 2:3]

    band1 = -C1 * y * sh[..., 1, :] + C1 * z * sh[..., 2, :] - C1 * x * sh[..., 3, :]
    result = result + band_gate(1, band1)
    if max_degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        band2 = (
            C2[0] * xy * sh[..., 4, :]
            + C2[1] * yz * sh[..., 5, :]
            + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
            + C2[3] * xz * sh[..., 7, :]
            + C2[4] * (xx - yy) * sh[..., 8, :]
        )
        result = result + band_gate(2, band2)
    if max_degree >= 3:
        band3 = (
            C3[0] * y * (3 * xx - yy) * sh[..., 9, :]
            + C3[1] * xy * z * sh[..., 10, :]
            + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11, :]
            + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12, :]
            + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13, :]
            + C3[5] * z * (xx - yy) * sh[..., 14, :]
            + C3[6] * x * (xx - 3 * yy) * sh[..., 15, :]
        )
        result = result + band_gate(3, band3)
    if max_degree >= 4:
        band4 = (
            C4[0] * xy * (xx - yy) * sh[..., 16, :]
            + C4[1] * yz * (3 * xx - yy) * sh[..., 17, :]
            + C4[2] * xy * (7 * zz - 1) * sh[..., 18, :]
            + C4[3] * yz * (7 * zz - 3) * sh[..., 19, :]
            + C4[4] * (zz * (35 * zz - 30) + 3) * sh[..., 20, :]
            + C4[5] * xz * (7 * zz - 3) * sh[..., 21, :]
            + C4[6] * (xx - yy) * (7 * zz - 1) * sh[..., 22, :]
            + C4[7] * xz * (xx - 3 * yy) * sh[..., 23, :]
            + C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)) * sh[..., 24, :]
        )
        result = result + band_gate(4, band4)
    return result
