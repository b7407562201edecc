"""Tile binning + depth sort with static shapes.

TPU-native equivalent of `duplicateWithKeys` / `identifyTileRanges` /
CUB radix sort (`cuda_rasterizer/rasterizer_impl.cu:67-125, 229-270`).
Where CUDA resizes buffers to the data-dependent `num_rendered`, XLA needs
static shapes: a fixed instance capacity R with padding and an overflow
flag (the caller re-renders at higher capacity if it trips).

Design:
  * Instead of scattering each Gaussian's duplicates (dynamic fan-out),
    every one of the R instance *slots* looks up its source Gaussian via
    a vectorized searchsorted over the inclusive cumsum of
    `tiles_touched` — a gather, which XLA loves.
  * The 64-bit [tile<<32 | depth-bits] radix key becomes a two-key
    lexicographic `lax.sort` on (tile_id, depth) with the Gaussian id as
    payload; padding slots carry tile_id == num_tiles so they sort last.
  * Tile ranges come from two vectorized searchsorteds over the sorted
    tile ids (== identifyTileRanges).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianeditor_tpu.ops.preprocess import ProcessedGaussians


class Binning(NamedTuple):
    gauss_id: jnp.ndarray    # [R] int32, sorted by (tile, depth); pad slots
                             # hold an arbitrary id but are outside all ranges
    tile_start: jnp.ndarray  # [num_tiles] int32
    tile_end: jnp.ndarray    # [num_tiles] int32
    num_rendered: jnp.ndarray  # scalar int32 — true instance count
    overflow: jnp.ndarray      # scalar bool — num_rendered > R (slots dropped)


def bin_and_sort(
    proc: ProcessedGaussians,
    grid_x: int,
    grid_y: int,
    max_instances: int,
) -> Binning:
    num_tiles = grid_x * grid_y
    R = max_instances

    tiles = proc.tiles_touched.astype(jnp.int32)
    incl = jnp.cumsum(tiles)
    excl = incl - tiles
    num_rendered = incl[-1]

    # Slot -> source Gaussian (vectorized inverse of the CUDA duplicate
    # scatter, rasterizer_impl.cu:67-100).
    slots = jnp.arange(R, dtype=jnp.int32)
    g = jnp.searchsorted(incl, slots, side="right").astype(jnp.int32)
    g = jnp.minimum(g, tiles.shape[0] - 1)
    t = slots - excl[g]  # index within the Gaussian's tile rect

    rect_min = proc.rect_min[g]
    rect_w = jnp.maximum(proc.rect_max[g, 0] - rect_min[:, 0], 1)
    # y-outer, x-inner iteration order matches duplicateWithKeys (:81-95).
    tile_x = rect_min[:, 0] + t % rect_w
    tile_y = rect_min[:, 1] + t // rect_w
    tile_id = tile_y * grid_x + tile_x

    valid = slots < num_rendered
    tile_id = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)
    depth = jnp.where(valid, proc.depth[g], jnp.inf).astype(jnp.float32)
    depth = jax.lax.stop_gradient(depth)

    sorted_tile, _, sorted_gid = jax.lax.sort(
        (tile_id, depth, g), num_keys=2, is_stable=True
    )

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)

    return Binning(
        gauss_id=sorted_gid,
        tile_start=tile_start,
        tile_end=tile_end,
        num_rendered=num_rendered,
        overflow=num_rendered > R,
    )
