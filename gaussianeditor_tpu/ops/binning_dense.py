"""Compact tile binning — the TPU-fast path feeding the Pallas
compositor.

Replaces both the round-1 `bin_and_sort`+`align_ranges` pipeline and the
v3 dense [C, K] grid on the production path. Design driven by measured
primitive costs on TPU v5e (bench/prof_prims.py, bench/prof_bin_stages.py):

  sort (u32 key + i32 payload)   0.7 ms @ 512k   2.4 ms @ 1.2M
  1-D cumsum / cummax            ~0.2 ms @ 1.2M
  random 1-D scatter             5.6 ms @ 1.2M   (~0.5 ms @ 100k updates)
  searchsorted                   ~0.5 us / query
  row gather from a small table  ~0.1-0.4 ms (near-contiguous or <8 MB)

i.e. scans and sorts are cheap, R-sized scatters and R-query searches
are the enemy. CUDA's variable-fanout `duplicateWithKeys`
(rasterizer_impl.cu:67-100) writes each Gaussian's rect tiles with
data-dependent fan-out; the v4 XLA analog builds the same compact
instance list with O(C)-sized scatters only:

  * B = cumsum(tiles_touched) gives each Gaussian's instance range
    [B[g-1], B[g]) analytically — pure elementwise.
  * The rank->Gaussian map is ONE scatter of C boundary markers into the
    static instance budget R (dropped when out of range) + a `cummax`
    fill; rank->tile is then elementwise (y-major rect walk, float32
    reciprocal division — exact, see proof below).
  * One (key = tile|depth-bits, payloads = gaussian, rank) stable sort
    over R — the only R-log-R work in the pipeline.
  * Chunk-aligned layout (no chunk straddles a tile) via shifted-compare
    boundaries, `cummax` run starts, `cumsum` padding, and an [NC]-query
    searchsorted for per-chunk metadata — all 1-D scans.
  * The backward's aligned-row -> rank map is recovered with ONE int-pair
    sort (rank, aligned_pos) — ranks are the pre-sort positions, so
    sorting by them inverts the permutation at sort cost, not scatter
    cost.

Unlike v3 there is NO per-Gaussian tile cap: any footprint renders as
long as the total stays within `max_instances` (the same budget
semantics as CUDA's dynamically-resized buffer; `overflow` + the host
re-render-at-double policy replace the resize,
rasterizer_impl.cu:236-244).

The backward per-Gaussian gradient reduction uses the analytic ranges:
gradient rows gathered into rank order reduce with a cumsum +
boundary-difference — deterministic, no scatter-add (and none of the
atomicAdd nondeterminism of backward.cu:523-554).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianeditor_tpu.ops.preprocess import ProcessedGaussians

CHUNK = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class DenseBinning(NamedTuple):
    """Everything the Pallas compositor needs, fixed-shape.

    R = max_instances (rounded up to CHUNK); R2 = aligned capacity;
    NC = R2 // CHUNK; C = Gaussian capacity.
    """

    sorted_g: jnp.ndarray    # [R] int32 source Gaussian of each sorted row
    a_by_rank: jnp.ndarray   # [R] int32 aligned position of pre-sort rank q
    b_incl: jnp.ndarray      # [C] int32 inclusive cumsum of tiles_touched
    chunk_p0: jnp.ndarray    # [NC] int32 sorted index of each chunk's first row
    chunk_tile: jnp.ndarray  # [NC] int32 owning tile (clamped; dead -> 0)
    chunk_first: jnp.ndarray  # [NC] int32 1 iff first chunk of its tile
    chunk_nvalid: jnp.ndarray  # [NC] int32 live instances in chunk
    chunk_offset: jnp.ndarray  # [NC] int32 instance offset within the tile
    tile_nonempty: jnp.ndarray  # [num_tiles] bool
    num_rendered: jnp.ndarray  # scalar int32 (total expanded instances)
    overflow: jnp.ndarray      # scalar bool — total instances > budget


def dense_capacities(max_instances: int, num_tiles: int):
    """Static (R, R2, NC) for a given instance budget and tile grid."""
    R = _round_up(max_instances, CHUNK)
    R2 = R + CHUNK * (num_tiles + 1)
    return R, R2, R2 // CHUNK


def dense_bin(
    proc: ProcessedGaussians,
    grid_x: int,
    grid_y: int,
    max_instances: int,
) -> DenseBinning:
    num_tiles = grid_x * grid_y
    C = proc.tiles_touched.shape[0]
    R, R2, NC = dense_capacities(max_instances, num_tiles)

    tile_bits = max((num_tiles + 1).bit_length(), 1)
    depth_bits = 32 - tile_bits

    # --- compact rank->Gaussian expansion: one C-sized scatter ---
    tt = proc.tiles_touched  # int32, 0 for culled/dead
    b_incl = jnp.cumsum(tt, dtype=jnp.int32)
    b_prev = b_incl - tt
    total = b_incl[-1] if C > 0 else jnp.int32(0)
    # scatter each live Gaussian's id at its first rank; ranks >= R drop
    # (default JAX scatter OOB mode), dead Gaussians aim at R
    first_rank = jnp.where(tt > 0, b_prev, R)
    mark = jnp.full((R,), -1, jnp.int32).at[first_rank].max(
        jnp.arange(C, dtype=jnp.int32)
    )
    gsrc = jnp.maximum(jax.lax.cummax(mark), 0)

    # --- rank->tile: elementwise y-major rect walk ---
    # All per-Gaussian fields ride ONE [C, 8] row gather: gsrc is
    # monotone non-decreasing, so the access is near-contiguous and the
    # table is tiny (C*32 B) — measured ~10x cheaper than five separate
    # R-sized 1-D random gathers (bench/prof_prims.py).
    depth = jax.lax.stop_gradient(proc.depth.astype(jnp.float32))
    dkey32 = (jax.lax.bitcast_convert_type(depth, jnp.uint32)
              >> (32 - depth_bits)).astype(jnp.int32)
    table = jnp.stack(
        [
            b_prev,
            tt,
            proc.rect_min[:, 0],
            proc.rect_min[:, 1],
            jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0], 1),
            dkey32,
        ],
        axis=1,
    )  # [C, 6] int32
    rows = table[gsrc]  # [R, 6]
    g_bprev, g_tt = rows[:, 0], rows[:, 1]
    g_rx, g_ry, rect_w, g_dkey = rows[:, 2], rows[:, 3], rows[:, 4], rows[:, 5]

    q = jnp.arange(R, dtype=jnp.int32)
    j = q - g_bprev
    live = (q < total) & (j >= 0) & (j < g_tt)
    # Variable-divisor int div is slow on the VPU; j < num_tiles <= 2^20
    # and the true quotient is never within 0.5/(j+0.5) >= 4e-7 of an
    # integer at j<2^20, far above f32 eps, so floor((j+0.5)/w) is exact.
    jy = jnp.floor(
        (j.astype(jnp.float32) + 0.5) * (1.0 / rect_w.astype(jnp.float32))
    ).astype(jnp.int32)
    jx = j - jy * rect_w
    tile = (g_ry + jy) * grid_x + (g_rx + jx)

    key = ((tile.astype(jnp.uint32) << depth_bits)
           | g_dkey.astype(jnp.uint32))
    key = jnp.where(live, key, jnp.uint32(0xFFFFFFFF))

    skey, sg, srank = jax.lax.sort(
        (key, gsrc, q), num_keys=1, is_stable=True
    )
    stile = (skey >> depth_bits).astype(jnp.int32)  # invalid -> marker > T

    # --- alignment maps: 1-D scans only ---
    p = jnp.arange(R, dtype=jnp.int32)
    is_b = jnp.concatenate(
        [jnp.ones((1,), bool), stile[1:] != stile[:-1]]
    )
    tstart = jax.lax.cummax(jnp.where(is_b, p, -1))
    off = p - tstart
    tprev = jnp.concatenate([jnp.zeros((1,), jnp.int32), tstart[:-1]])
    # padded length of the run ENDING at each boundary
    u = jnp.where(
        is_b & (p > 0),
        _pad_chunk(p - tprev),
        0,
    )
    astart = jnp.cumsum(u)  # aligned start of the run containing p
    a = astart + off        # aligned position of sorted row p

    # --- per-chunk metadata via [NC]-query searchsorted + tiny gathers ---
    cpos = jnp.arange(NC, dtype=jnp.int32) * CHUNK
    p0 = jnp.searchsorted(a, cpos, side="left").astype(jnp.int32)
    p0c = jnp.minimum(p0, R - 1)
    st0 = stile[p0c]
    as0 = astart[p0c]
    ts0 = tstart[p0c]
    # run length: next boundary after p (reverse cummin of boundary pos)
    nb = jnp.where(is_b, p, R)
    nxt_incl = jax.lax.cummin(nb[::-1])[::-1]
    nxt = jnp.concatenate([nxt_incl[1:], jnp.full((1,), R, jnp.int32)])
    rlen0 = nxt[p0c] - ts0

    alive_c = (p0 < R) & (as0 <= cpos) & (st0 < num_tiles)
    offset_c = jnp.where(alive_c, cpos - as0, 0)
    nvalid_c = jnp.where(alive_c,
                         jnp.clip(rlen0 - offset_c, 0, CHUNK), 0)
    first_c = (alive_c & (offset_c == 0) & (nvalid_c > 0)).astype(jnp.int32)
    tile_c = jnp.where(alive_c, jnp.clip(st0, 0, num_tiles - 1), 0)

    tile_nonempty = (
        jnp.zeros((num_tiles,), jnp.int32)
        .at[tile_c].max(alive_c.astype(jnp.int32))
        .astype(bool)
    )

    # --- backward map: aligned position of each pre-sort rank ---
    # srank is a permutation of [0, R); sorting (srank, a) by srank
    # inverts it at int-pair-sort cost instead of R-scatter cost.
    _, a_by_rank = jax.lax.sort((srank, a), num_keys=1, is_stable=True)

    return DenseBinning(
        sorted_g=sg,
        a_by_rank=a_by_rank,
        b_incl=b_incl,
        chunk_p0=p0c,
        chunk_tile=tile_c.astype(jnp.int32),
        chunk_first=first_c,
        chunk_nvalid=nvalid_c.astype(jnp.int32),
        chunk_offset=offset_c.astype(jnp.int32),
        tile_nonempty=tile_nonempty,
        num_rendered=total,
        overflow=total > R,
    )


def _pad_chunk(x: jnp.ndarray) -> jnp.ndarray:
    return ((x + CHUNK - 1) // CHUNK) * CHUNK
