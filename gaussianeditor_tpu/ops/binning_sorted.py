"""v5 compact binning: payload-carrying sort ("fat sort") + block-
transposed sorted payload for direct kernel consumption.

The TPU-native successor of ops/binning_dense.py on the production path,
motivated by measured primitive costs on a v5e chip (bench/prof_r8.py,
bench/prof_r10.py):

  random row gather  [R2, 16]      ~5.6 ms   (the v4 pack)
  monotone row gather [C+1,16]->[R,16]  ~1.4 ms
  lax.sort u32 key + 12 f32/i32 payloads @ 524k  ~2.5 ms
  rank-space elementwise key build:  XLA ~1.8 ms, Pallas ~0.1 ms

i.e. carrying the per-instance payload THROUGH the radix sort is ~4x
cheaper than sorting ids and gathering the payload afterwards (the only
hardware-efficient way to apply a data-dependent permutation on TPU is
the sort network itself), and rank-space elementwise work belongs in a
Pallas kernel, not XLA 1-D ops.

Pipeline (all static shapes; C = Gaussian capacity, R = instance budget):
  1. gsrc [R]: rank -> source Gaussian via ONE C-sized boundary scatter
     + cummax (the vectorized inverse of CUDA's duplicateWithKeys
     fan-out, rasterizer_impl.cu:67-100).
  2. ONE monotone [C+1,16] -> [R,16] row gather of the combined table:
     6 int fields (encoded exactly in f32; all < 2^24) for the key
     kernel + the 7+ch f32 compositing payload.
  3. Pallas key kernel: per-rank tile walk (y-major rect order,
     duplicateWithKeys :81-95) -> fused [tile | depth-bits] 32-bit key
     (rasterizer_impl.cu:256-261) AND the transposed payload [16, R]
     whose rows are contiguous [R] sort operands.
  4. ONE stable lax.sort: key + payload columns + rank. This is the
     CUB radix-sort analog and now also performs the "pack".
  5. Chunk-aligned metadata via 1-D scans (as v4): chunks of 128 never
     straddle a tile; per-chunk (tile, first, n_valid, offset) plus the
     block/shift pair (qblk, shift) that lets the compositor kernels
     read sorted rows [p0, p0+128) from the 128-blocked payload with a
     dynamic lane roll — no aligned instance matrix is ever
     materialized.
  6. the pre-sort RANK rides the payload blocks (row P, f32-exact):
     the backward kernel re-emits it per gradient row, so the
     deterministic per-Gaussian reduction is ONE rank-keyed sort of the
     gradient rows + the analytic b_incl boundary differences — no
     aligned->rank gather, no alignment maps, no inversion sort.

No per-Gaussian tile cap; `overflow` + the host re-render-at-double
policy replace CUDA's dynamic buffer resize (rasterizer_impl.cu:236-244).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussianeditor_tpu.ops.preprocess import ProcessedGaussians

CHUNK = 128
FTAB = 16          # combined table width: 6 int fields + up to 10 payload
KEY_BLK = 2048     # rows per key-kernel grid step


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


class SortedBinning(NamedTuple):
    """Sorted instance payload (payload-major) + per-tile tables.

    R = instance budget (multiple of CHUNK). The payload is
    [FTAB, R + CHUNK] with LANES = sorted rows: rows 0..P-1 carry
    mean2d xy | conic | opacity | depth | color.., row P the pre-sort
    rank (f32-exact, R <= 2^24 guarded). Stacking the fat sort's flat
    output columns this way is a pure concatenation of contiguous
    buffers — the old block-major [NB, 16, CHUNK] layout needed a
    Pallas restack whose sublane-strided writes cost ~1.2 ms at R=354k
    (profiler --mode pipeline, round 4) — and the v6/v7 tile kernels
    DMA each chunk's [FTAB, CHUNK] slice at its dynamic lane offset
    directly, with no two-block read + roll. The trailing zero chunk
    keeps the final partial-chunk DMA of the last tile in bounds.

    NC (from sorted_capacities) still bounds the backward's gradient
    chunk count: R//CHUNK + num_tiles + 1 aligned chunks.
    """

    blocks: jnp.ndarray        # [FTAB, R+CHUNK] f32 payload-major
    tile_nonempty: jnp.ndarray  # [num_tiles] bool
    tile_bounds: jnp.ndarray   # [num_tiles+1] i32 first sorted row per tile
    b_incl: jnp.ndarray        # [C] i32 inclusive cumsum of tiles_touched
    num_rendered: jnp.ndarray  # scalar i32
    overflow: jnp.ndarray      # scalar bool


def sorted_capacities(max_instances: int, num_tiles: int):
    """Static (R, NB, NC) for a budget and tile grid. R rounds to CHUNK
    only (so small budgets keep their overflow semantics); the key
    kernel pads to KEY_BLK internally."""
    R = _round_up(max_instances, CHUNK)
    NB = R // CHUNK + 1
    NC = R // CHUNK + num_tiles + 1
    return R, NB, NC


@functools.lru_cache(maxsize=None)
def _make_key_kernel(R: int, grid_x: int, depth_bits: int, P: int):
    """key + payload-transpose kernel over [16, KEY_BLK] blocks (ranks on
    the LANE axis: the original [KEY_BLK, 16] row blocks ran every
    elementwise op at 16/128 lane utilization and paid an in-kernel
    [KEY_BLK, P] transpose — measured 1.0 ms; this layout is ~0.2 ms,
    bench/profiler.py round 4). Emits only the P payload rows
    (cols 6..6+P), not the six key-building int fields."""

    def kernel(tot_ref, rows_ref, key_ref, rt_ref):
        c = pl.program_id(0)
        r = rows_ref[0]                            # [16, KEY_BLK]
        q = c * KEY_BLK + jax.lax.broadcasted_iota(
            jnp.int32, (KEY_BLK,), 0)
        g_bprev = r[0].astype(jnp.int32)
        g_tt = r[1].astype(jnp.int32)
        g_rx = r[2].astype(jnp.int32)
        g_ry = r[3].astype(jnp.int32)
        rect_w = jnp.maximum(r[4].astype(jnp.int32), 1)
        g_dkey = r[5].astype(jnp.int32)
        j = q - g_bprev
        live = (q < tot_ref[0]) & (j >= 0) & (j < g_tt)
        # variable-divisor int div is slow on the VPU; floor((j+0.5)/w)
        # is exact for j < 2^20 (see ops/binning_dense.py proof)
        jy = jnp.floor((j.astype(jnp.float32) + 0.5)
                       * (1.0 / rect_w.astype(jnp.float32))).astype(jnp.int32)
        jx = j - jy * rect_w
        tile = (g_ry + jy) * grid_x + (g_rx + jx)
        key = ((tile.astype(jnp.uint32) << depth_bits)
               | g_dkey.astype(jnp.uint32))
        key_ref[...] = jnp.where(live, key, jnp.uint32(0xFFFFFFFF))
        rt_ref[...] = r[6:6 + P]                   # [P, KEY_BLK]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R // KEY_BLK,),
        in_specs=[pl.BlockSpec((1, FTAB, KEY_BLK), lambda c, t: (c, 0, 0))],
        out_specs=[pl.BlockSpec((KEY_BLK,), lambda c, t: (c,)),
                   pl.BlockSpec((P, KEY_BLK), lambda c, t: (0, c))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((R,), jnp.uint32),
                   jax.ShapeDtypeStruct((P, R), jnp.float32)],
        interpret=_interpret(),
    )


@functools.lru_cache(maxsize=None)
def _make_assembly_kernel(R: int, NB: int, P: int,
                          bpg: int = KEY_BLK // CHUNK):
    """Sorted payload columns -> [NB, 16, CHUNK] block layout in ONE
    Pallas pass (the XLA pad/reshape/stack equivalent measured 1.27 ms
    at R=393k — bench/profiler.py round 4). Grid steps cover
    bpg*CHUNK sorted rows = bpg payload blocks each; steps past the
    data (the grid rounds NB up, incl. the trailing zero block that
    keeps qblk+1 valid) emit zeros, as do the FTAB-P padding rows.
    Requires R % (bpg*CHUNK) == 0 (sorted_bin falls back to the XLA
    stack otherwise). The [n_grid*BPG, ...] output is sliced to NB by
    the caller (a view-to-copy slice of < one grid step's blocks).

    bpg: DMA-issue overhead, not bandwidth, dominates this kernel —
    at the default 16 blocks/step the backward's restack of 10 columns
    paid ~1.8 ms at R=393k for ~40 MB of traffic (profiler --mode
    kernels, round 4); callers whose column length can absorb the
    rounding pass bpg=256 (32k rows/step, ~12 steps)."""
    assert R % (bpg * CHUNK) == 0
    BPG = bpg                         # payload blocks per grid step
    n_data = R // (bpg * CHUNK)       # grid steps holding real data
    n_grid = -(-NB // BPG)            # total grid steps (>= n_data)

    def kernel(*refs):
        cols = refs[:P]
        out_ref = refs[P]
        c = pl.program_id(0)

        @pl.when(c >= n_data)
        def _tail():
            out_ref[...] = jnp.zeros((BPG, FTAB, CHUNK), jnp.float32)

        @pl.when(c < n_data)
        def _copy():
            for i, col in enumerate(cols):
                out_ref[:, i, :] = col[...]          # [BPG, CHUNK]
            out_ref[:, P:, :] = jnp.zeros((BPG, FTAB - P, CHUNK),
                                          jnp.float32)

    grid_spec = pl.GridSpec(
        grid=(n_grid,),
        in_specs=[pl.BlockSpec(
            (BPG, CHUNK), lambda c: (jnp.minimum(c, n_data - 1), 0))
            for _ in range(P)],
        out_specs=pl.BlockSpec((BPG, FTAB, CHUNK), lambda c: (c, 0, 0)),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_grid * BPG, FTAB, CHUNK),
                                       jnp.float32),
        interpret=_interpret(),
    )

    def apply(*cols):
        # [R] -> [R//CHUNK, CHUNK] views (row-major: free relayout)
        return call(*(c_.reshape(R // CHUNK, CHUNK) for c_ in cols))

    return apply


def sorted_bin(
    proc: ProcessedGaussians,
    grid_x: int,
    grid_y: int,
    max_instances: int,
) -> SortedBinning:
    """Bin, depth-sort and block-transpose the instance payload.

    All outputs are stop-gradient by construction (int metadata and a
    payload used only inside the compositor's custom_vjp, whose backward
    produces per-Gaussian gradients analytically at the b_incl
    boundaries — the sort never enters autodiff).
    """
    num_tiles = grid_x * grid_y
    C = proc.tiles_touched.shape[0]
    ch = proc.color.shape[-1]
    P = 7 + ch
    assert P <= FTAB - 6, f"channel count {ch} too wide for sorted path"
    R, NB, NC = sorted_capacities(max_instances, num_tiles)
    # the combined table carries b_prev through f32; only values < 2^24
    # are exact, and live ranks only ever read b_prev < R (gsrc skips
    # Gaussians whose first rank falls past the budget), so R bounds the
    # requirement. Bigger budgets must use the pallas4 id-sort path
    # (ops/render.py routes this automatically).
    assert R <= 2 ** 24, (
        f"sorted-bin instance budget {R} exceeds the exact-f32 integer "
        "range; use impl='pallas4' for budgets over 2^24"
    )

    tile_bits = max((num_tiles + 1).bit_length(), 1)
    depth_bits = 32 - tile_bits
    # the depth key also rides f32: cap it at 24 bits so the encoding is
    # exact. Truncation only coarsens depth TIES (monotone rounding never
    # reorders); ordering semantics match the reference's full-precision
    # radix sort except between depths equal in their top 24 mantissa/
    # exponent bits.
    key_depth_bits = min(depth_bits, 24)

    # --- rank -> source Gaussian: one C-sized scatter + cummax ---
    tt = proc.tiles_touched
    b_incl = jnp.cumsum(tt, dtype=jnp.int32)
    b_prev = b_incl - tt
    total = b_incl[-1] if C > 0 else jnp.int32(0)
    first_rank = jnp.where(tt > 0, b_prev, R)
    mark = jnp.full((R,), -1, jnp.int32).at[first_rank].max(
        jnp.arange(C, dtype=jnp.int32)
    )
    gsrc = jnp.maximum(jax.lax.cummax(mark), 0)

    # --- combined [C+1, 16] table; ints encoded exactly in f32 ---
    depth = jax.lax.stop_gradient(proc.depth.astype(jnp.float32))
    dkey32 = (jax.lax.bitcast_convert_type(depth, jnp.uint32)
              >> (32 - key_depth_bits)).astype(jnp.int32)
    stop = jax.lax.stop_gradient
    cols = [
        b_prev.astype(jnp.float32),
        tt.astype(jnp.float32),
        proc.rect_min[:, 0].astype(jnp.float32),
        proc.rect_min[:, 1].astype(jnp.float32),
        jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0],
                    1).astype(jnp.float32),
        dkey32.astype(jnp.float32),
        stop(proc.mean2d[:, 0]),
        stop(proc.mean2d[:, 1]),
        stop(proc.conic[:, 0]),
        stop(proc.conic[:, 1]),
        stop(proc.conic[:, 2]),
        stop(proc.opacity),
        depth,
    ] + [stop(proc.color[:, i]) for i in range(ch)]
    table = jnp.stack(cols, axis=1)
    if table.shape[1] < FTAB:
        table = jnp.pad(table, ((0, 0), (0, FTAB - table.shape[1])))
    table = jnp.pad(table, ((0, 1), (0, 0)))       # dummy row (tt=0)

    rows_rank = table[jnp.minimum(gsrc, C)]        # [R, 16] monotone

    # key kernel wants a KEY_BLK multiple; pad with dummy rows (tt=0 ->
    # dead) and slice the outputs back to R. The blocked transpose puts
    # ranks on the LANE axis (fuses into the gather, as the compositor
    # pack does — pallas_composite.pack_instances).
    Rk = _round_up(R, KEY_BLK)
    rows_k = (rows_rank if Rk == R
              else jnp.pad(rows_rank, ((0, Rk - R), (0, 0))))
    rows_b = jnp.swapaxes(rows_k.reshape(Rk // KEY_BLK, KEY_BLK, FTAB),
                          1, 2)
    key_call = _make_key_kernel(Rk, grid_x, key_depth_bits, P)
    key, rt = key_call(jnp.asarray([0], jnp.int32) + total, rows_b)
    if Rk != R:
        key = key[:R]
        rt = rt[:, :R]

    # --- the fat sort: key + payload columns + rank (gsrc is NOT
    # carried: the v5 backward reduces in rank space at the analytic
    # b_incl boundaries and never needs the per-row source id) ---
    q = jnp.arange(R, dtype=jnp.int32)
    ops = (key,) + tuple(rt[i] for i in range(P)) + (q,)
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=True)
    skey = sorted_ops[0]
    scols = sorted_ops[1:1 + P]
    srank = sorted_ops[1 + P]
    stile = (skey >> key_depth_bits).astype(jnp.int32)  # invalid -> marker > T

    # --- block-transposed payload [NB, 16, CHUNK] (last block zero).
    # Row P carries the pre-sort RANK (f32-exact, R <= 2^24 guarded
    # above): the backward kernel re-emits it per gradient row so the
    # per-Gaussian reduction can sort gradient rows straight into rank
    # order — replacing the old aligned->rank random row gather
    # (~3.1 ms) + alignment-map scans + inversion sort (see
    # pallas_composite.make_pallas_compositor_sorted). ---
    bcols = scols + (srank.astype(jnp.float32),)
    # payload-major [FTAB, R+CHUNK]: see SortedBinning docstring. The
    # pad fuses into the stack's concatenation; FTAB-P-1 zero rows keep
    # the kernels' [FTAB, CHUNK] DMA shape power-of-two.
    blocks = jnp.stack(
        [jnp.pad(c_, (0, CHUNK)) for c_ in bcols]
        + [jnp.zeros((R + CHUNK,), jnp.float32)] * (FTAB - P - 1),
        axis=0,
    )

    # --- per-tile tables ---
    # stile is SORTED (tile-major keys), so per-tile (first row, count)
    # come from ONE [T+1]-query searchsorted.
    T = num_tiles
    bounds = jnp.searchsorted(
        stile, jnp.arange(T + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)                         # [T+1]; bounds[T] = #live
    cnt = bounds[1:] - bounds[:-1]              # [T] rows per tile
    tile_nonempty = cnt > 0

    return SortedBinning(
        blocks=blocks,
        tile_nonempty=tile_nonempty,
        tile_bounds=bounds,
        b_incl=b_incl,
        num_rendered=total,
        overflow=total > R,
    )
