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
  * The 64-bit [tile<<32 | depth-bits] radix key becomes a single fused
    32-bit key (tile bits | truncated positive-float depth bits) sorted
    stably with the Gaussian id as the only payload; padding slots carry
    tile_id == num_tiles so they sort last.
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
    C = tiles.shape[0]

    # Slot -> source Gaussian (vectorized inverse of the CUDA duplicate
    # scatter, rasterizer_impl.cu:67-100). jnp.repeat with
    # total_repeat_length pads the tail with the LAST id — masked below.
    slots = jnp.arange(R, dtype=jnp.int32)
    g = jnp.repeat(jnp.arange(C, dtype=jnp.int32), tiles,
                   total_repeat_length=R)
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

    # Single fused 32-bit radix key, the XLA analog of CUDA's 64-bit
    # [tile | depth-bits] key (rasterizer_impl.cu:256-261): high bits =
    # tile id, low bits = the top bits of the positive-float depth
    # pattern (order-preserving for depth > 0). Depth ordering is exact
    # to ~2^-(22 - ceil(log2 num_tiles)) relative precision; equal-key
    # ties keep instance order (stable sort), matching CUB.
    tile_bits = max((num_tiles + 1).bit_length(), 1)
    depth_bits = 32 - tile_bits
    dkey = jax.lax.bitcast_convert_type(depth, jnp.uint32) >> (32 - depth_bits)
    key = (tile_id.astype(jnp.uint32) << depth_bits) | dkey
    sorted_key, sorted_gid = jax.lax.sort((key, g), num_keys=1, is_stable=True)
    # tile ids are the key's high bits — no need to carry them as payload
    sorted_tile = (sorted_key >> depth_bits).astype(jnp.int32)

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


class AlignedBinning(NamedTuple):
    """Chunk-aligned instance list for the Pallas compositor: every tile's
    range starts at a multiple of `chunk`, with dead padding slots between
    tiles, so per-tile DMA reads/writes never straddle tile boundaries
    (the backward kernel stores per-instance gradient rows in disjoint
    aligned blocks)."""

    gauss_id: jnp.ndarray    # [R2] int32 source Gaussian per slot
    valid: jnp.ndarray       # [R2] bool — False on padding slots
    tile_start: jnp.ndarray  # [num_tiles] int32, chunk-aligned
    tile_len: jnp.ndarray    # [num_tiles] int32 true (unpadded) length


def align_ranges(b: Binning, num_tiles: int, chunk: int) -> AlignedBinning:
    """Re-lay the sorted instance list with per-tile chunk alignment.
    Output capacity is the static bound R + chunk*num_tiles."""
    R = b.gauss_id.shape[0]
    R2 = R + chunk * num_tiles
    length = jnp.minimum(b.tile_end, R) - jnp.minimum(b.tile_start, R)
    cap = -(-length // chunk) * chunk  # per-tile padded capacity
    new_start = jnp.cumsum(cap) - cap  # exclusive prefix

    slots = jnp.arange(R2, dtype=jnp.int32)
    t = jnp.repeat(jnp.arange(num_tiles, dtype=jnp.int32), cap,
                   total_repeat_length=R2)
    off = slots - new_start[t]
    valid = off < length[t]
    src = jnp.clip(b.tile_start[t] + off, 0, R - 1)
    gid = jnp.where(valid, b.gauss_id[src], 0)
    return AlignedBinning(
        gauss_id=gid, valid=valid, tile_start=new_start.astype(jnp.int32),
        tile_len=length.astype(jnp.int32),
    )
