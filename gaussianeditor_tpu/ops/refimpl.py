"""Reference (oracle) rasterizer — dense, per-Gaussian sequential scan.

A direct transliteration of the CUDA per-pixel loop
(`forward.cu:261-379`) with no tiling, no chunking, and no vectorized
cumprod tricks: Gaussians are globally depth-sorted and folded one at a
time over all pixels with the exact (T, done) recurrence. O(P * H * W) —
for tests and tiny scenes only. Differentiable via JAX autodiff; serves
as the correctness oracle for the production tiled/Pallas paths
(SURVEY.md section 4's test strategy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussianeditor_tpu.ops.composite import ALPHA_MAX, ALPHA_MIN, T_MIN
from gaussianeditor_tpu.ops.preprocess import ProcessedGaussians


def composite_dense(proc: ProcessedGaussians, height: int, width: int,
                    bg: jnp.ndarray):
    """Sequential front-to-back compositing over ALL Gaussians, every pixel."""
    order = jnp.argsort(jnp.where(proc.visible, proc.depth, jnp.inf))
    xy = proc.mean2d[order]
    conic = proc.conic[order]
    opacity = proc.opacity[order]
    color = proc.color[order]
    depth = proc.depth[order]
    visible = proc.visible[order]
    rect_min = proc.rect_min[order]
    rect_max = proc.rect_max[order]

    ys, xs = jnp.mgrid[0:height, 0:width]
    pixf = jnp.stack([xs, ys], axis=-1).reshape(-1, 2).astype(jnp.float32)
    # CUDA composites a Gaussian only into pixels of tiles inside its rect
    # (getRect, auxiliary.h:46-56) — the footprint is tile-quantized, and
    # because exp(-0.5*3^2)=0.011 > alpha_min=1/255 that quantization is
    # observable. The oracle must reproduce it.
    from gaussianeditor_tpu.ops.preprocess import TILE

    pix_tile = (pixf / TILE).astype(jnp.int32)  # [px, 2]
    n_px = height * width
    ch = color.shape[-1]

    def step(carry, inp):
        T, done, acc_c, acc_d = carry
        g_xy, g_conic, g_op, g_color, g_depth, g_vis, g_rmin, g_rmax = inp
        d = g_xy[None, :] - pixf  # [px, 2]
        power = (
            -0.5 * (g_conic[0] * d[:, 0] ** 2 + g_conic[2] * d[:, 1] ** 2)
            - g_conic[1] * d[:, 0] * d[:, 1]
        )
        alpha = jnp.minimum(ALPHA_MAX, g_op * jnp.exp(jnp.minimum(power, 0.0)))
        in_rect = jnp.all((pix_tile >= g_rmin[None]) & (pix_tile < g_rmax[None]),
                          axis=-1)
        skipped = (power > 0.0) | (alpha < ALPHA_MIN) | (~g_vis) | (~in_rect)
        test_T = T * (1.0 - alpha)
        crossing = (~skipped) & (test_T < T_MIN)
        contributes = (~done) & (~skipped) & (~crossing)
        w = jnp.where(contributes, alpha * T, 0.0)
        acc_c = acc_c + w[:, None] * g_color[None, :]
        acc_d = acc_d + w * g_depth
        T = jnp.where(contributes, test_T, T)
        done = done | ((~done) & crossing)
        return (T, done, acc_c, acc_d), None

    T0 = jnp.ones((n_px,), jnp.float32)
    done0 = jnp.zeros((n_px,), bool)
    acc_c0 = jnp.zeros((n_px, ch), jnp.float32)
    acc_d0 = jnp.zeros((n_px,), jnp.float32)
    (T_fin, _, acc_c, acc_d), _ = jax.lax.scan(
        step, (T0, done0, acc_c0, acc_d0),
        (xy, conic, opacity, color, depth, visible, rect_min, rect_max),
    )
    out_color = acc_c + T_fin[:, None] * bg[None, :]
    return (
        out_color.reshape(height, width, ch),
        acc_d.reshape(height, width),
        T_fin.reshape(height, width),
    )
