"""Tiled front-to-back alpha compositing — vectorized XLA implementation.

TPU-native equivalent of `renderCUDA` (`cuda_rasterizer/forward.cu:261-379`)
and, via JAX autodiff, of the hand-written backward
(`backward.cu:399-557`). One (H/16 x W/16) tile grid; per tile, the sorted
instance range is consumed in chunks under `lax.scan`.

The CUDA loop is sequential per pixel (transmittance recurrence with an
early-`done` cutoff *before* committing the crossing contribution).
That exact semantics vectorizes: with per-instance blend factors
f_j = 1 - alpha_j (skipped instances -> 1), the running product
P_j = prod_{k<=j} f_k is monotone non-increasing, so the CUDA `done`
trigger "T * (1 - alpha) < 1e-4" happens at the *first* j with
T_in * P_j < 1e-4 and stays triggered for every later j. Hence

    contributes_j = ~done_in & ~skipped_j & (T_in * P_j >= 1e-4)

reproduces the sequential loop exactly while the whole chunk is computed
with one cumprod — and the color/depth accumulation becomes a batched
(pixels x chunk) @ (chunk x channels) matmul that runs on the MXU.

Numerical cutoffs preserved: alpha cap 0.99, alpha floor 1/255, T floor
1e-4, `power > 0` skip (forward.cu:338-354).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianeditor_tpu.ops.binning import Binning
from gaussianeditor_tpu.ops.preprocess import TILE, ProcessedGaussians

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_MIN = 1e-4


class TileImages(NamedTuple):
    color: jnp.ndarray     # [num_tiles, TILE*TILE, ch] composited (pre-bg)
    depth: jnp.ndarray     # [num_tiles, TILE*TILE]
    final_T: jnp.ndarray   # [num_tiles, TILE*TILE]
    n_contrib: jnp.ndarray  # [num_tiles, TILE*TILE] int32


def _tile_pixel_coords(grid_x: int, grid_y: int) -> jnp.ndarray:
    """[num_tiles, TILE*TILE, 2] float pixel coords (x, y); pixel centers at
    integer coordinates, matching pixf in renderCUDA (forward.cu:283)."""
    tiles = jnp.arange(grid_x * grid_y)
    tx = (tiles % grid_x) * TILE
    ty = (tiles // grid_x) * TILE
    p = jnp.arange(TILE * TILE)
    px = p % TILE
    py = p // TILE
    x = tx[:, None] + px[None, :]
    y = ty[:, None] + py[None, :]
    return jnp.stack([x, y], axis=-1).astype(jnp.float32)


def composite_tiles(
    proc: ProcessedGaussians,
    binning: Binning,
    grid_x: int,
    grid_y: int,
    *,
    tile_cap: int = 1024,
    chunk: int = 128,
) -> TileImages:
    """Composite every tile's sorted instance range (up to `tile_cap`
    instances per tile, consumed `chunk` at a time)."""
    num_tiles = grid_x * grid_y
    n_px = TILE * TILE
    ch = proc.color.shape[-1]
    R = binning.gauss_id.shape[0]

    pixf = _tile_pixel_coords(grid_x, grid_y)  # [T, px, 2]
    n_steps = -(-tile_cap // chunk)

    # Instances beyond each tile's range (or beyond R) are masked invalid.
    start = binning.tile_start
    end = jnp.minimum(binning.tile_end, start + tile_cap)

    def step(carry, i):
        T_in, done_in, acc = carry
        # positions of this chunk's instances in the sorted flat list
        pos = start[:, None] + i * chunk + jnp.arange(chunk)[None, :]  # [T, chunk]
        in_range = pos < end[:, None]
        pos_c = jnp.clip(pos, 0, R - 1)
        gid = binning.gauss_id[pos_c]  # [T, chunk]

        xy = proc.mean2d[gid]          # [T, chunk, 2]
        conic = proc.conic[gid]        # [T, chunk, 3]
        op = proc.opacity[gid]         # [T, chunk]
        feat = proc.color[gid]         # [T, chunk, ch]
        depth_g = proc.depth[gid]      # [T, chunk]

        d = xy[:, None, :, :] - pixf[:, :, None, :]  # [T, px, chunk, 2]
        dx, dy = d[..., 0], d[..., 1]
        cx = conic[:, None, :, 0]
        cxy = conic[:, None, :, 1]
        cy = conic[:, None, :, 2]
        power = -0.5 * (cx * dx * dx + cy * dy * dy) - cxy * dx * dy
        # clamp the exponent: power > 0 is skipped anyway, and garbage
        # conics of culled/padding instances would overflow exp -> inf,
        # whose 0*inf products NaN the backward pass
        alpha = jnp.minimum(ALPHA_MAX,
                            op[:, None, :] * jnp.exp(jnp.minimum(power, 0.0)))

        skipped = (power > 0.0) | (alpha < ALPHA_MIN) | ~in_range[:, None, :]
        f = jnp.where(skipped, 1.0, 1.0 - alpha)  # [T, px, chunk]
        P_incl = jnp.cumprod(f, axis=-1)
        P_excl = P_incl / f  # f >= 0.01 when not skipped; ==1 when skipped
        TP = T_in[..., None] * P_incl
        contributes = (~done_in[..., None]) & (~skipped) & (TP >= T_MIN)
        done_out = done_in | jnp.any((~skipped) & (TP < T_MIN), axis=-1)

        w = jnp.where(contributes, alpha * T_in[..., None] * P_excl, 0.0)
        # [T, px, chunk] @ [T, chunk, ch+1] on the MXU
        feat_aug = jnp.concatenate([feat, depth_g[..., None]], axis=-1)
        acc = acc + jax.lax.dot_general(
            w, feat_aug,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        T_out = T_in * jnp.prod(jnp.where(contributes, f, 1.0), axis=-1)
        # last contributor's 1-based position within the tile range
        # (CUDA's n_contrib, forward.cu:330,365 — consumed by backward)
        pos = i * chunk + jnp.arange(chunk)[None, None, :] + 1
        n_new = jnp.max(jnp.where(contributes, pos, 0), axis=-1).astype(jnp.int32)
        return (T_out, done_out, acc), n_new

    T0 = jnp.ones((num_tiles, n_px), jnp.float32)
    done0 = jnp.zeros((num_tiles, n_px), bool)
    acc0 = jnp.zeros((num_tiles, n_px, ch + 1), jnp.float32)
    (T_fin, _, acc), n_steps_contrib = jax.lax.scan(
        step, (T0, done0, acc0), jnp.arange(n_steps)
    )
    n_contrib = jnp.max(n_steps_contrib, axis=0)

    return TileImages(
        color=acc[..., :ch],
        depth=acc[..., ch],
        final_T=T_fin,
        n_contrib=n_contrib,
    )


def tiles_to_image(tile_buf: jnp.ndarray, grid_x: int, grid_y: int,
                   height: int, width: int) -> jnp.ndarray:
    """[num_tiles, TILE*TILE, ...] -> [H, W, ...] (crop padding)."""
    trailing = tile_buf.shape[2:]
    img = tile_buf.reshape((grid_y, grid_x, TILE, TILE) + trailing)
    img = jnp.moveaxis(img, 2, 1)  # [gy, TILE, gx, TILE, ...]
    img = img.reshape((grid_y * TILE, grid_x * TILE) + trailing)
    return img[:height, :width]
