"""Pallas TPU compositing kernels — the production hot path.

TPU-native re-design of `renderCUDA` (forward.cu:261-379) and its
backward (backward.cu:399-557).

Architecture (v2 — chunk-grid):
  * The depth-sorted instance list is laid out in 128-instance chunks,
    aligned so no chunk straddles a tile (`binning.align_ranges`), and
    reshaped to [NUM_CHUNKS, F, 128].
  * The kernel grid iterates CHUNKS, not tiles: per-chunk metadata
    (owning tile, first/last flag, valid count, position) is
    scalar-prefetched and drives the BlockSpec index maps, so Mosaic's
    pipeline machinery streams instance blocks HBM->VMEM with automatic
    double buffering — no hand-rolled DMA, no data-dependent while loops,
    and no host-visible layout conversions (the v1 tile-grid design spent
    ~4x the kernel time converting the instance matrix to Mosaic's tiled
    layout and serializing DMAs).
  * Consecutive chunks of one tile map to the SAME output block
    (standard Pallas accumulation): the [256 px, ch+1] accumulator, the
    transmittance T and the last-contributor index live in VMEM-resident
    output blocks revisited across grid steps; `done` carries in scratch.
  * The sequential (T, done) recurrence is evaluated chunk-wise with the
    exact cumulative-product formulation proven in ops/composite.py —
    prefix sums of log(1-alpha) via a triangular MXU matmul (full-f32
    precision: the prefix sum feeds exp, where the bf16 MXU default
    visibly corrupts transmittance).
  * Backward iterates chunks in REVERSE, reconstructing transmittance
    from the saved final_T in log space (the chunk-wise analog of CUDA's
    per-instance T = T/(1-alpha), backward.cu:503) and gating
    contributors with the saved per-pixel last-contributor index
    n_contrib (backward.cu:441-447). Per-instance gradient rows are
    written to disjoint chunk blocks — replacing CUDA's nondeterministic
    atomicAdds (backward.cu:523-554) — then scatter-added onto Gaussians
    deterministically in XLA.

One documented deviation from CUDA: gradients are gated at the 0.99
alpha cap (matching JAX autodiff of the reference math); CUDA's
hand-written backward ignores the cap (backward.cu:470-480).

On CPU the kernels run in interpreter mode so the full test suite
exercises them hermetically; the same code compiles natively on TPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussianeditor_tpu.ops.binning import AlignedBinning
from gaussianeditor_tpu.ops.composite import ALPHA_MAX, ALPHA_MIN, T_MIN
from gaussianeditor_tpu.ops.preprocess import TILE

CHUNK = 128
PX = TILE * TILE  # pixels per tile


def _pad8(n: int) -> int:
    # Mosaic sublane counts want multiples of 8.
    return -(-n // 8) * 8


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pix_coords(tile_x, tile_y):
    """[PX, 1] float pixel coords of the tile (pixel centers at ints)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (PX, 1), 0)
    px = tile_x * TILE + p % TILE
    py = tile_y * TILE + p // TILE
    return px.astype(jnp.float32), py.astype(jnp.float32)


def _pix_coords_local():
    """[PX, 1] float pixel coords WITHIN a tile (0..TILE-1).

    The backward kernels compute their position moments in tile-LOCAL
    coordinates: every emitted quantity is a centered sum
    (sdx = sum_p dpower*(xs - px), sdxx = sum_p dpower*(xs - px)^2, ...)
    and is therefore invariant to shifting both xs and px by the tile
    origin. Shifting drops the moment magnitudes from O(image)^2 to
    O(TILE)^2, which removes the catastrophic `xs*m0 - mx` cancellation
    at image coordinate scale (measured ~1e-4 relative mean2d/conic
    gradient error at 256^2 vs the dense oracle with global coords) and
    shrinks the rank-reduction columns' RMS by the same factor. As a
    bonus the [6, PX] moment matrix P6 becomes tile-independent, i.e. a
    grid/loop invariant."""
    p = jax.lax.broadcasted_iota(jnp.int32, (PX, 1), 0)
    return ((p % TILE).astype(jnp.float32),
            (p // TILE).astype(jnp.float32))


def _tri_incl():
    """[CHUNK, CHUNK]: tri[j,k] = 1 if j <= k; x @ tri = inclusive prefix
    sum along lanes."""
    j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (j <= k).astype(jnp.float32)


def _tri_strict_after():
    """[CHUNK, CHUNK]: tri[j,k] = 1 if j > k; x @ tri = strict suffix sum
    along lanes."""
    j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (j > k).astype(jnp.float32)


def _tri_excl():
    """[CHUNK, CHUNK]: tri[j,k] = 1 if j < k; x @ tri = EXCLUSIVE prefix
    sum along lanes (saves the cum - x subtract per use)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (j < k).astype(jnp.float32)


def _dot(a, b, dims):
    # HIGHEST: full-f32 MXU passes. DEFAULT (single-pass bf16) visibly
    # corrupts the transmittance prefix sums; Precision.HIGH (bf16x3)
    # is not supported by the Mosaic kernel lowering.
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _dot3(a, b_exact):
    """`a @ b_exact` to full f32 accuracy in THREE single-pass bf16 MXU
    dots (vs HIGHEST's six): valid whenever `b_exact` is exactly
    representable in bf16 — the 0/1 triangular prefix masks are. `a`
    splits into three 8-bit mantissa slices a1+a2+a3 (exact for f32's
    24-bit mantissa); each slice-product is exact on the MXU with f32
    accumulation, so the sum reproduces the f32 matmul up to summation
    rounding. Measured -0.67 ms on the backward kernel's two tri dots
    (bench/prof_r26.py)."""
    a1 = a.astype(jnp.bfloat16)
    r1 = a - a1.astype(jnp.float32)
    a2 = r1.astype(jnp.bfloat16)
    a3 = (r1 - a2.astype(jnp.float32)).astype(jnp.bfloat16)
    bb = b_exact.astype(jnp.bfloat16)

    def d(x):
        return jax.lax.dot_general(
            x, bb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return d(a1) + d(a2) + d(a3)


def _dot_high(a, b, dims):
    """Generic-f32 matmul at Precision.HIGH accuracy (bf16x3) in THREE
    single-pass bf16 MXU dots — Mosaic does not lower Precision.HIGH,
    and HIGHEST's six passes measured +0.6 ms on the forward's
    accumulate dot alone (bench/_scratch/ablate2, round 5). Splitting
    both operands to (hi, lo) bf16 and dropping only the lo*lo term
    leaves relative error O(2^-16) — ample for the color/gradient
    accumulates (parity tolerances 1e-4+); transmittance prefix sums
    keep the exact `_dot3` path."""
    a1 = a.astype(jnp.bfloat16)
    ar = (a - a1.astype(jnp.float32)).astype(jnp.bfloat16)
    b1 = b.astype(jnp.bfloat16)
    br = (b - b1.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(x, y,
                                   dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=jnp.float32)

    return (d(a1, b1) + d(a1, br)) + d(ar, b1)


class ChunkMeta(NamedTuple):
    """Per-chunk scalar metadata (prefetched into SMEM)."""

    tile: jnp.ndarray      # [NC] owning tile id (tail chunks repeat the last)
    first: jnp.ndarray     # [NC] 1 iff first chunk of its tile (nonempty)
    last: jnp.ndarray      # [NC] 1 iff last chunk of its tile
    n_valid: jnp.ndarray   # [NC] number of real instances in this chunk
    offset: jnp.ndarray    # [NC] instance offset of this chunk in its tile


def make_chunk_meta(ab: AlignedBinning, num_chunks: int) -> ChunkMeta:
    caps = -(-ab.tile_len // CHUNK)  # chunks per tile
    tile = jnp.repeat(
        jnp.arange(caps.shape[0], dtype=jnp.int32), caps,
        total_repeat_length=num_chunks,
    )
    start_chunk = jnp.cumsum(caps) - caps
    pos = jnp.arange(num_chunks, dtype=jnp.int32) - start_chunk[tile]
    n_valid = jnp.clip(ab.tile_len[tile] - pos * CHUNK, 0, CHUNK)
    first = ((pos == 0) & (n_valid > 0)).astype(jnp.int32)
    last = ((pos == caps[tile] - 1) & (n_valid > 0)).astype(jnp.int32)
    return ChunkMeta(tile=tile, first=first, last=last,
                     n_valid=n_valid.astype(jnp.int32),
                     offset=(pos * CHUNK).astype(jnp.int32))


def make_forward(n_tiles: int, grid_x: int, ch: int, num_chunks: int):
    CH1 = ch + 1
    F = _pad8(7 + ch)

    OUTC = CH1 + 2  # acc columns, then T, then n_contrib (as f32)

    def kernel(ct_ref, cf_ref, nv_ref, co_ref, inst_ref, out_ref, done_sc):
        c = pl.program_id(0)
        tile = ct_ref[c]
        pixf_x, pixf_y = _pix_coords(tile % grid_x, tile // grid_x)

        @pl.when(cf_ref[c] == 1)
        def _init():
            out_ref[0] = jnp.concatenate(
                [jnp.zeros((PX, CH1), jnp.float32),   # accumulators
                 jnp.ones((PX, 1), jnp.float32),      # T starts at 1
                 jnp.zeros((PX, 1), jnp.float32)],    # n_contrib
                axis=1,
            )
            done_sc[:] = jnp.zeros((PX, 1), jnp.float32)

        n_valid = nv_ref[c]
        not_all_done = jnp.sum(done_sc[:]) < PX

        @pl.when((n_valid > 0) & not_all_done)
        def _compute():
            buf = inst_ref[0]           # [F, CHUNK]
            xs = buf[0:1, :]
            ys = buf[1:2, :]
            cxx = buf[2:3, :]
            cxy = buf[3:4, :]
            cyy = buf[4:5, :]
            op = buf[5:6, :]

            T = out_ref[0, :, CH1][:, None]    # [PX, 1]
            done = done_sc[:]

            dx = xs - pixf_x            # [PX, CHUNK]
            dy = ys - pixf_y
            power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
            # PD conic -> power <= 0 up to rounding; no exp clamp needed
            # (padding slots have conic = op = 0 -> alpha = 0, culled)
            alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            skipped = (power > 0.0) | (alpha < ALPHA_MIN) | (lane >= n_valid)

            alpha_s = jnp.where(skipped, 0.0, alpha)
            lf = jnp.log1p(-alpha_s)
            excl = _dot3(lf, _tri_excl())  # exclusive prefix
            TPx = T * jnp.exp(excl)
            TP = TPx * (1.0 - alpha_s)
            not_done_px = done < 0.5
            contributes = not_done_px & (~skipped) & (TP >= T_MIN)
            # TP is non-increasing along lanes (f_s <= 1, flat over
            # skipped lanes), so the last lane IS the minimum: one
            # compare replaces the any-reduce, exactly
            crossed = TP[:, CHUNK - 1:CHUNK] < T_MIN
            done_sc[:] = jnp.maximum(done, crossed.astype(jnp.float32))

            w = jnp.where(contributes, alpha * TPx, 0.0)
            featd = jnp.concatenate([buf[7:7 + ch, :], buf[6:7, :]], axis=0)
            acc_new = out_ref[0, :, :CH1] + _dot_high(w, featd, ((1,), (1,)))

            # T after the chunk = TP at the last contributing lane (all
            # non-skipped lanes before a contributing one contribute
            # too): a min-reduce replaces the sum+exp
            T_new = jnp.min(jnp.where(contributes, TP, T), axis=-1,
                            keepdims=True)
            pos1 = co_ref[c] + lane + 1
            nc_new = jnp.max(
                jnp.where(contributes, pos1, 0).astype(jnp.float32), axis=-1,
                keepdims=True,
            )
            nc_upd = jnp.maximum(out_ref[0, :, CH1 + 1][:, None], nc_new)
            out_ref[0] = jnp.concatenate([acc_new, T_new, nc_upd], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # tile, first, n_valid, offset
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((1, F, CHUNK), lambda c, ct, cf, nv, co: (c, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, PX, CH1 + 2),
                         lambda c, ct, cf, nv, co: (ct[c], 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((PX, 1), jnp.float32)],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, PX, CH1 + 2), jnp.float32),
        ],
        interpret=_interpret(),
    )


def make_backward(n_tiles: int, grid_x: int, ch: int, num_chunks: int):
    CH1 = ch + 1
    F = _pad8(7 + ch)
    # rows: dmean_x, dmean_y, dcxx, dcxy, dcyy, dop, dcolor..., ddepth, pad
    GF = _pad8(6 + CH1)

    INC = 2 * CH1 + 3  # g_acc | acc | g_T | t_fin | nc(f32)

    def kernel(ct_ref, cf_ref, nv_ref, co_ref, act_ref, inst_ref, gall_ref,
               grad_ref, logt_sc, s_sc, stot_sc):
        c = pl.program_id(0)
        tile = ct_ref[c]
        # tile-local coordinates: see _pix_coords_local
        pixl_x, pixl_y = _pix_coords_local()
        ox = (tile % grid_x * TILE).astype(jnp.float32)
        oy = (tile // grid_x * TILE).astype(jnp.float32)

        @pl.when(cf_ref[c] == 1)
        def _init():
            # FORWARD-order backward: T starts at 1 and the suffix sums
            # come from S_total - running prefix, where S_total(px) =
            # sum_ch g_acc * acc is known from the forward residuals.
            # (Reverse-order traversal with reversed BlockSpec index maps
            # measured no faster in Mosaic, but forward order shares the
            # forward kernel's streaming pattern and needs no final_T log.)
            logt_sc[:] = jnp.zeros((PX, 1), jnp.float32)
            s_sc[:] = jnp.zeros((PX, 1), jnp.float32)
            gall0 = gall_ref[0]
            stot_sc[:] = jnp.sum(
                gall0[:, :CH1] * gall0[:, CH1:2 * CH1], axis=-1, keepdims=True
            )

        n_valid = nv_ref[c]
        grad_ref[0] = jnp.zeros((GF, CHUNK), jnp.float32)

        # act gates out chunks past the tile's last contributor: every
        # pixel's m-mask is all-False there, so grads are zero and the
        # (logT, S) carries are unchanged — skipping is exact. This is
        # the backward analog of the forward early exit (the CUDA
        # backward skips until last_contributor, backward.cu:441-447).
        @pl.when(act_ref[c] == 1)
        def _compute():
            buf = inst_ref[0]
            xs = buf[0:1, :] - ox                  # tile-local mean2d
            ys = buf[1:2, :] - oy
            cxx = buf[2:3, :]
            cxy = buf[3:4, :]
            cyy = buf[4:5, :]
            op = buf[5:6, :]
            featd = jnp.concatenate([buf[7:7 + ch, :], buf[6:7, :]], axis=0)

            gall = gall_ref[0]                     # [PX, INC]
            g_acc = gall[:, :CH1]
            gT_term = (gall[:, 2 * CH1] * gall[:, 2 * CH1 + 1])[:, None]
            nc = gall[:, 2 * CH1 + 2][:, None]     # [PX, 1] (f32 positions)

            dx = xs - pixl_x
            dy = ys - pixl_y
            power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
            g_exp = jnp.exp(power)  # PD conic: no clamp (see forward)
            alpha_raw = op * g_exp
            alpha = jnp.minimum(ALPHA_MAX, alpha_raw)

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            pos = (co_ref[c] + lane).astype(jnp.float32)
            skipped = (power > 0.0) | (alpha < ALPHA_MIN) | (lane >= n_valid)
            m = (~skipped) & (pos < nc)  # contributed in forward

            # masked alpha absorbs the select into log1p(0) = 0 and
            # replaces every later mf multiply (see the sorted kernel)
            alpha_m = jnp.where(m, alpha, 0.0)
            lf = jnp.log1p(-alpha_m)
            excl = _dot3(lf, _tri_excl())
            total = excl[:, CHUNK - 1:CHUNK] + lf[:, CHUNK - 1:CHUNK]
            # T before instance k, reconstructed in log space going forward
            T_k = jnp.exp(logt_sc[:] + excl)

            c_hat = _dot_high(g_acc, featd, ((1,), (0,)))  # [PX, CHUNK]
            w = alpha_m * T_k
            u = w * c_hat
            # suffix sum over instances AFTER k: S_total - inclusive prefix
            Su = _dot3(u, _tri_incl())
            u_total = Su[:, CHUNK - 1:CHUNK]
            pre = stot_sc[:] - s_sc[:] + gT_term
            sterm = pre - Su

            f = 1.0 - alpha_m
            amc = jnp.where(alpha_raw < ALPHA_MAX, alpha_m, 0.0)
            dpower = amc * (T_k * c_hat - sterm / f)

            gfeat = _dot_high(g_acc, w, ((0,), (0,)))      # [CH1, CHUNK]

            # The six per-instance pixel reductions decompose through the
            # separability dx = xs(k) - px(p): every sum_p dpower * poly(dx,
            # dy) is a lane-wise combination of the moment rows
            # M = [1, px, py, px^2, py^2, px*py]^T @ dpower — ONE [6,256]x
            # [256,128] MXU matmul instead of six cross-sublane reductions.
            pxv = pixl_x[:, 0]
            pyv = pixl_y[:, 0]
            P6 = jnp.stack(
                [jnp.ones_like(pxv), pxv, pyv, pxv * pxv, pyv * pyv,
                 pxv * pyv],
                axis=0,
            )  # [6, PX] tile-local: a grid invariant
            M = _dot_high(P6, dpower, ((1,), (0,)))        # [6, CHUNK]
            m0, mx, my, mxx, myy, mxy = (M[i:i + 1, :] for i in range(6))
            # sum_p dpower * dx        = xs*m0 - mx   (dx = xs - px)
            sdx = xs * m0 - mx
            sdy = ys * m0 - my
            sdxx = xs * xs * m0 - 2.0 * xs * mx + mxx
            sdyy = ys * ys * m0 - 2.0 * ys * my + myy
            sdxy = xs * ys * m0 - xs * my - ys * mx + mxy
            # exact identity sum_p dac*g_exp = m0/op (see sorted kernel)
            dop_row = m0 * jnp.where(op > 0.0, 1.0 / op, 0.0)

            rows = jnp.concatenate(
                [
                    -(cxx * sdx + cxy * sdy),
                    -(cyy * sdy + cxy * sdx),
                    -0.5 * sdxx,
                    -sdxy,
                    -0.5 * sdyy,
                    dop_row,
                    gfeat,
                ],
                axis=0,
            )  # [6+CH1, CHUNK]
            pad = GF - (6 + CH1)
            if pad:
                rows = jnp.concatenate(
                    [rows, jnp.zeros((pad, CHUNK), jnp.float32)], axis=0
                )
            grad_ref[0] = rows

            logt_sc[:] = logt_sc[:] + total
            s_sc[:] = s_sc[:] + u_total

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # tile, first, n_valid, offset, active
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((1, F, CHUNK),
                         lambda c, ct, cf, nv, co, a: (c, 0, 0)),
            pl.BlockSpec((1, PX, 2 * CH1 + 3),
                         lambda c, ct, cf, nv, co, a: (ct[c], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, GF, CHUNK),
                         lambda c, ct, cf, nv, co, a: (c, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((PX, 1), jnp.float32),
            pltpu.VMEM((PX, 1), jnp.float32),
            pltpu.VMEM((PX, 1), jnp.float32),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_chunks, GF, CHUNK),
                                        jnp.float32)],
        interpret=_interpret(),
    )


def make_forward_tile(n_tiles: int, grid_x: int, ch: int):
    """v6/v8 forward: grid over TILES (not chunks), looping that tile's
    chunks in-kernel with hand-rolled double-buffered DMA from the
    payload-major [FTAB, R+CHUNK] sorted payload.

    Why tiles: the chunk-grid kernel paid ~556 ns of per-grid-step
    sequencing overhead — 2.1 ms of a 5.4 ms kernel at NC=3777
    (profiler --mode ablate, round 4). A 16x16-tile 512^2 frame has
    only 1024 tiles; one grid step per tile carries (acc, T, nc, done)
    in a fori_loop instead of revisiting output blocks. Chunk k's
    instances are the payload-major rows [row0 + k*CHUNK, +128); since
    Mosaic requires lane-dim slice offsets to be 128-aligned even on
    HBM refs (row0 is an arbitrary tile bound), the loop streams the
    two ALIGNED 128-blocks covering the window through a 3-slot ring
    (one new block DMA per chunk) and extracts the window with one
    dynamic pltpu.roll — the binning's Pallas restack to a block-major
    layout (~1.2 ms at R=354k) stays deleted.

    Scalar prefetch: bounds [T+1] (first sorted row per tile, from
    binning's searchsorted). Same math as the v5 chunk-grid kernel
    (spec: forward.cu:261-379)."""
    CH1 = ch + 1
    F = _pad8(7 + ch)
    OUTC = CH1 + 2

    def kernel(bounds_ref, hbm_ref, out_ref, buf_sc, sem):
        t = pl.program_id(0)
        pixf_x, pixf_y = _pix_coords(t % grid_x, t // grid_x)
        row0 = bounds_ref[t]
        cnt = bounds_ref[t + 1] - row0
        n_chunks = (cnt + CHUNK - 1) // CHUNK
        q0 = row0 // CHUNK
        shift = row0 - q0 * CHUNK

        def dma(b, slot):
            # aligned block q0+b; the payload's trailing zero chunk
            # keeps block q0+n_chunks in bounds (binning_sorted pads
            # blocks to R+CHUNK lanes)
            off = pl.multiple_of((q0 + b) * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                hbm_ref.at[:F, pl.ds(off, CHUNK)],
                buf_sc.at[slot], sem.at[slot])

        @pl.when(n_chunks > 0)
        def _start():
            dma(0, 0).start()
            dma(1, 1).start()

        init = (
            jnp.zeros((PX, CH1), jnp.float32),   # acc
            jnp.ones((PX, 1), jnp.float32),      # T
            jnp.zeros((PX, 1), jnp.float32),     # nc
            jnp.zeros((PX, 1), jnp.float32),     # done
        )

        # NOTE a whole-tile early exit (while_loop on `done`) measured
        # +0.6 ms on the bench scene (bench/_scratch/ab_fwd, round 5):
        # Mosaic sequences while bodies more conservatively than fori,
        # and tiles rarely saturate all 256 pixels mid-list. The done
        # mask still zeroes the work per pixel via `contributes`.
        def body(k, carry):
            acc, T, ncv, done = carry
            s0 = jax.lax.rem(k, 3)
            s1 = jax.lax.rem(k + 1, 3)
            s2 = jax.lax.rem(k + 2, 3)

            @pl.when(k + 2 <= n_chunks)
            def _prefetch():
                dma(k + 2, s2).start()

            @pl.when(k == 0)
            def _w0():
                dma(0, 0).wait()
            dma(k + 1, s1).wait()

            # chunk k = lanes [shift, shift+CHUNK) of blocks (k, k+1)
            x2 = jnp.concatenate([buf_sc[s0], buf_sc[s1]], axis=1)
            buf = pltpu.roll(x2, -shift, axis=1)[:, :CHUNK]
            n_valid = jnp.minimum(cnt - k * CHUNK, CHUNK)

            xs = buf[0:1, :]
            ys = buf[1:2, :]
            cxx = buf[2:3, :]
            cxy = buf[3:4, :]
            cyy = buf[4:5, :]
            op = buf[5:6, :]

            dx = xs - pixf_x
            dy = ys - pixf_y
            power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            skipped = (power > 0.0) | (alpha < ALPHA_MIN) | (lane >= n_valid)
            alpha_s = jnp.where(skipped, 0.0, alpha)
            lf = jnp.log1p(-alpha_s)
            excl = _dot3(lf, _tri_excl())
            TPx = T * jnp.exp(excl)
            TP = TPx * (1.0 - alpha_s)
            not_done_px = done < 0.5
            contributes = not_done_px & (~skipped) & (TP >= T_MIN)
            # see make_forward: last-lane TP == min TP, exactly
            crossed = TP[:, CHUNK - 1:CHUNK] < T_MIN
            done = jnp.maximum(done, crossed.astype(jnp.float32))
            w = jnp.where(contributes, alpha * TPx, 0.0)
            featd = jnp.concatenate([buf[7:7 + ch, :], buf[6:7, :]], axis=0)
            acc = acc + _dot_high(w, featd, ((1,), (1,)))
            T = jnp.min(jnp.where(contributes, TP, T), axis=-1,
                        keepdims=True)
            pos1 = k * CHUNK + lane + 1
            nc_new = jnp.max(
                jnp.where(contributes, pos1, 0).astype(jnp.float32),
                axis=-1, keepdims=True)
            ncv = jnp.maximum(ncv, nc_new)
            return acc, T, ncv, done

        acc, T, ncv, _ = jax.lax.fori_loop(0, n_chunks, body, init)
        out_ref[0] = jnp.concatenate([acc, T, ncv], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # bounds [T+1]
        grid=(n_tiles,),
        # pin to HBM: ANY lets Mosaic place the ~23 MB payload in VMEM,
        # where the unaligned dynamic lane-offset slice (row0 is an
        # arbitrary tile bound) fails the 128-divisibility proof
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[pl.BlockSpec((1, PX, OUTC), lambda t, b: (t, 0, 0))],
        scratch_shapes=[
            pltpu.VMEM((3, F, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, PX, OUTC), jnp.float32)],
        interpret=_interpret(),
    )


def make_backward_tile(n_tiles: int, grid_x: int, ch: int, num_chunks: int,
                       r_budget: int):
    """v7/v8 backward: grid over TILES, mirroring make_forward_tile.

    One grid step per tile streams its chunks' [F, CHUNK] payload
    slices through a 3-slot input DMA ring (offset-addressed from the
    payload-major [FTAB, R+CHUNK] layout, like the forward) and writes
    each chunk's gradient block to out[:, (cstart[t]+k)*CHUNK :] —
    payload-major [GF, NC*CHUNK] — through a 2-slot output DMA ring.
    This replaced the chunk grid's ~556 ns/step sequencing at NC=3777
    and its per-chunk re-DMA of the tile's cotangent block (gall is an
    auto-pipelined per-TILE input); the payload-major output makes the
    reduction's column extraction a free view instead of a strided
    relayout.

    Every chunk of every tile emits its rank row (dead lanes carry the
    R sentinel) so the rank-keyed reduction sort sees each live rank
    exactly once; chunks past the tile's last contributor
    (k*CHUNK >= max_nc[t]) skip the gradient math but still emit the
    rank row. The LAST grid step sentinel-fills the unwritten chunk
    range [cstart[T], NC) (zero gradient rows, R-sentinel rank row) so
    the caller feeds the buffer straight into the reduction sort — no
    host-side 11-stream masking pass.

    Scalar prefetch: bounds [T+1], cstart [T+1] (exclusive cumsum of
    per-tile chunk counts), max_nc [T] (per-tile last contributor).
    Spec: backward.cu:399-557."""
    CH1 = ch + 1
    P = 7 + ch
    F = _pad8(P + 1)
    GF = _pad8(6 + CH1 + 1)
    R_sent = float(r_budget)

    def kernel(bounds_ref, cstart_ref, maxnc_ref, hbm_ref, gall_ref,
               out_ref, buf_sc, osc_sc, logt_sc, s_sc, isem, osem):
        t = pl.program_id(0)
        # tile-local coordinates: see _pix_coords_local
        pixl_x, pixl_y = _pix_coords_local()
        ox = (t % grid_x * TILE).astype(jnp.float32)
        oy = (t // grid_x * TILE).astype(jnp.float32)
        row0 = bounds_ref[t]
        cnt = bounds_ref[t + 1] - row0
        n_chunks = (cnt + CHUNK - 1) // CHUNK
        c0 = cstart_ref[t]
        maxnc_t = maxnc_ref[t]
        q0 = row0 // CHUNK
        shift = row0 - q0 * CHUNK

        def dma(b, slot):
            # aligned-block ring + roll: see make_forward_tile
            off = pl.multiple_of((q0 + b) * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                hbm_ref.at[:F, pl.ds(off, CHUNK)],
                buf_sc.at[slot], isem.at[slot])

        def odma(j):
            slot = jax.lax.rem(j, 2)
            ooff = pl.multiple_of((c0 + j) * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                osc_sc.at[slot],
                out_ref.at[:, pl.ds(ooff, CHUNK)],
                osem.at[slot])

        @pl.when(n_chunks > 0)
        def _start():
            dma(0, 0).start()
            dma(1, 1).start()
            logt_sc[:] = jnp.zeros((PX, 1), jnp.float32)
            s_sc[:] = jnp.zeros((PX, 1), jnp.float32)

        # per-tile cotangents: read ONCE per tile (the chunk grid
        # re-DMA'd this block for every chunk)
        gall = gall_ref[0]
        g_acc = gall[:, :CH1]
        gT_term = (gall[:, 2 * CH1] * gall[:, 2 * CH1 + 1])[:, None]
        nc = gall[:, 2 * CH1 + 2][:, None]
        stot = jnp.sum(gall[:, :CH1] * gall[:, CH1:2 * CH1], axis=-1,
                       keepdims=True)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        pad = GF - (6 + CH1 + 1)

        def body(k, carry):
            s0 = jax.lax.rem(k, 3)
            s1 = jax.lax.rem(k + 1, 3)
            s2 = jax.lax.rem(k + 2, 3)
            oslot = jax.lax.rem(k, 2)

            @pl.when(k + 2 <= n_chunks)
            def _prefetch():
                dma(k + 2, s2).start()

            @pl.when(k == 0)
            def _w0():
                dma(0, 0).wait()
            dma(k + 1, s1).wait()

            # output slot k%2 was last used by chunk k-2: wait its copy
            @pl.when(k >= 2)
            def _wo():
                odma(k - 2).wait()

            # chunk k = lanes [shift, shift+CHUNK) of blocks (k, k+1)
            x2 = jnp.concatenate([buf_sc[s0], buf_sc[s1]], axis=1)
            buf = pltpu.roll(x2, -shift, axis=1)[:, :CHUNK]
            n_valid = jnp.minimum(cnt - k * CHUNK, CHUNK)
            srk = jnp.where(lane < n_valid, buf[P:P + 1], R_sent)
            active = k * CHUNK < maxnc_t

            @pl.when(~active)
            def _rank_only():
                osc_sc[oslot] = jnp.concatenate(
                    [jnp.zeros((6 + CH1, CHUNK), jnp.float32), srk,
                     jnp.zeros((pad, CHUNK), jnp.float32)], axis=0)

            @pl.when(active)
            def _compute():
                xs = buf[0:1, :] - ox              # tile-local mean2d
                ys = buf[1:2, :] - oy
                cxx = buf[2:3, :]
                cxy = buf[3:4, :]
                cyy = buf[4:5, :]
                op = buf[5:6, :]
                featd = jnp.concatenate([buf[7:7 + ch, :], buf[6:7, :]],
                                        axis=0)

                dx = xs - pixl_x
                dy = ys - pixl_y
                power = (-0.5 * (cxx * dx * dx + cyy * dy * dy)
                         - cxy * dx * dy)
                g_exp = jnp.exp(power)
                alpha_raw = op * g_exp
                alpha = jnp.minimum(ALPHA_MAX, alpha_raw)

                pos = (k * CHUNK + lane).astype(jnp.float32)
                skipped = ((power > 0.0) | (alpha < ALPHA_MIN)
                           | (lane >= n_valid))
                m = (~skipped) & (pos < nc)

                alpha_m = jnp.where(m, alpha, 0.0)
                lf = jnp.log1p(-alpha_m)
                excl = _dot3(lf, _tri_excl())
                total = excl[:, CHUNK - 1:CHUNK] + lf[:, CHUNK - 1:CHUNK]
                T_k = jnp.exp(logt_sc[:] + excl)

                c_hat = _dot_high(g_acc, featd, ((1,), (0,)))
                w = alpha_m * T_k
                u = w * c_hat
                Su = _dot3(u, _tri_incl())
                u_total = Su[:, CHUNK - 1:CHUNK]
                pre = stot - s_sc[:] + gT_term
                sterm = pre - Su

                f = 1.0 - alpha_m
                amc = jnp.where(alpha_raw < ALPHA_MAX, alpha_m, 0.0)
                dpower = amc * (T_k * c_hat - sterm / f)

                gfeat = _dot_high(g_acc, w, ((0,), (0,)))

                pxv = pixl_x[:, 0]
                pyv = pixl_y[:, 0]
                P6 = jnp.stack(
                    [jnp.ones_like(pxv), pxv, pyv, pxv * pxv, pyv * pyv,
                     pxv * pyv],
                    axis=0,
                )  # tile-local: a loop invariant
                M = _dot_high(P6, dpower, ((1,), (0,)))
                m0, mx, my, mxx, myy, mxy = (M[i:i + 1, :] for i in range(6))
                sdx = xs * m0 - mx
                sdy = ys * m0 - my
                sdxx = xs * xs * m0 - 2.0 * xs * mx + mxx
                sdyy = ys * ys * m0 - 2.0 * ys * my + myy
                sdxy = xs * ys * m0 - xs * my - ys * mx + mxy
                dop_row = m0 * jnp.where(op > 0.0, 1.0 / op, 0.0)

                rows = jnp.concatenate(
                    [
                        -(cxx * sdx + cxy * sdy),
                        -(cyy * sdy + cxy * sdx),
                        -0.5 * sdxx,
                        -sdxy,
                        -0.5 * sdyy,
                        dop_row,
                        gfeat,
                        srk,
                        jnp.zeros((pad, CHUNK), jnp.float32),
                    ],
                    axis=0,
                )
                osc_sc[oslot] = rows

                logt_sc[:] = logt_sc[:] + total
                s_sc[:] = s_sc[:] + u_total

            odma(k).start()
            return carry

        jax.lax.fori_loop(0, n_chunks, body, 0)

        @pl.when(n_chunks >= 2)
        def _drain2():
            odma(n_chunks - 2).wait()

        @pl.when(n_chunks >= 1)
        def _drain1():
            odma(n_chunks - 1).wait()

        @pl.when(t == n_tiles - 1)
        def _tail_fill():
            # sentinel-fill [cstart[T], NC): zero data + R-sentinel rank
            # (runs after the drains, so both ring slots are free).
            # Typically ~1 chunk (NC = R/CHUNK + T + 1 minus live); one
            # [GF, CHUNK] DMA each through the reused 2-slot ring.
            c_live = cstart_ref[n_tiles]
            fill = jnp.concatenate(
                [jnp.zeros((6 + CH1, CHUNK), jnp.float32),
                 jnp.full((1, CHUNK), R_sent, jnp.float32),
                 jnp.zeros((pad, CHUNK), jnp.float32)], axis=0)
            osc_sc[0] = fill
            osc_sc[1] = fill

            def fdma(j):
                slot = jax.lax.rem(j, 2)
                ooff = pl.multiple_of(j * CHUNK, CHUNK)
                return pltpu.make_async_copy(
                    osc_sc.at[slot],
                    out_ref.at[:, pl.ds(ooff, CHUNK)],
                    osem.at[slot])

            def fbody(j, _):
                @pl.when(j >= c_live + 2)
                def _w():
                    fdma(j - 2).wait()
                fdma(j).start()
                return 0

            jax.lax.fori_loop(c_live, num_chunks, fbody, 0)

            @pl.when(c_live <= num_chunks - 2)
            def _fd2():
                fdma(num_chunks - 2).wait()

            @pl.when(c_live <= num_chunks - 1)
            def _fd1():
                fdma(num_chunks - 1).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # bounds [T+1], cstart [T+1], max_nc [T]
        grid=(n_tiles,),
        in_specs=[
            # HBM-pinned: see make_forward_tile (unaligned dynamic slices)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, PX, 2 * CH1 + 3),
                         lambda t, b, c, m: (t, 0, 0)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        scratch_shapes=[
            pltpu.VMEM((3, F, CHUNK), jnp.float32),
            pltpu.VMEM((2, GF, CHUNK), jnp.float32),
            pltpu.VMEM((PX, 1), jnp.float32),
            pltpu.VMEM((PX, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((GF, num_chunks * CHUNK),
                                        jnp.float32)],
        interpret=_interpret(),
    )


class PallasTiles(NamedTuple):
    color: jnp.ndarray     # [n_tiles, PX, ch]
    depth: jnp.ndarray     # [n_tiles, PX]
    final_T: jnp.ndarray   # [n_tiles, PX]
    n_contrib: jnp.ndarray  # [n_tiles, PX] int32


def rank_space_reduce(rows_rank: jnp.ndarray, b_incl: jnp.ndarray,
                      R: int) -> jnp.ndarray:
    """Deterministic per-Gaussian sum of rank-ordered gradient rows.

    Each Gaussian's instances occupy the contiguous analytic rank range
    [b_incl[g-1], b_incl[g]); their row sum is computed as a
    mean-centered f32 cumsum + boundary difference — the deterministic
    replacement for CUDA's atomicAdd scatter (backward.cu:523-554).
    Mean-centering keeps the prefix sum a zero-drift random walk instead
    of a column-biased ramp, bounding the cancellation error of the
    difference. Measured at production scale vs a float64 scatter-add
    oracle (R=400k, adversarial few-huge + heavy-tailed-many rows,
    tests/test_reduce_accuracy.py): relative error max 8e-5 /
    p99.9 3e-5 / p99 3e-6 of the column RMS.

    rows_rank: [R, GF] f32 rows in pre-sort rank order (dead ranks all
    zero). b_incl: [C] inclusive cumsum of tiles_touched. Returns
    [C, GF].
    """
    GF = rows_rank.shape[1]
    assert R % CHUNK == 0
    nblk = R // CHUNK
    x = rows_rank.reshape(nblk, CHUNK, GF)
    # Two-level scan replacing XLA's 1-D cumsum (19 log-shift passes over
    # 25 MB, measured 2.1 ms at R=393k — bench/prof_r18.py): ONE batched
    # MXU tri-matmul gives every intra-block EXCLUSIVE prefix (its
    # flattened result is the intra-block prefix at every rank), and the
    # block-level prefix runs over nblk rows only. Mean-centering now
    # applies at the block-sum level: intra-block partials are <= CHUNK
    # uncentered rows (bounded), the centered block prefix is a
    # zero-drift walk of nblk steps instead of R.
    # 3-pass bf16 split (see _dot3): the tri mask is bf16-exact, so the
    # batched intra-block prefix matmul runs at half HIGHEST's passes
    # with the same f32 result up to summation rounding
    tri_b = _tri_excl().astype(jnp.bfloat16)
    x1 = x.astype(jnp.bfloat16)
    r1 = x - x1.astype(jnp.float32)
    x2 = r1.astype(jnp.bfloat16)
    x3 = (r1 - x2.astype(jnp.float32)).astype(jnp.bfloat16)

    def _pref(xs):
        return jnp.einsum("kj,bkc->bjc", tri_b, xs,
                          preferred_element_type=jnp.float32)

    ipx = _pref(x1) + _pref(x2) + _pref(x3)
    P = ipx[:, CHUNK - 1, :] + x[:, CHUNK - 1, :]      # block totals
    mu = jnp.mean(P, axis=0, keepdims=True)            # [1, GF]
    bpc = jnp.concatenate(
        [jnp.zeros((1, GF), jnp.float32),
         jnp.cumsum(P - mu, axis=0, dtype=jnp.float32)], axis=0
    )                                                  # [nblk+1, GF] excl
    base = bpc + mu * jnp.arange(nblk + 1, dtype=jnp.float32)[:, None]
    # S[b] = base[b // CHUNK] + ipx.flat[b]; fold base into the flat
    # prefix table with one broadcast add (padding block keeps b = R valid)
    S = (jnp.concatenate([ipx, jnp.zeros((1, CHUNK, GF), jnp.float32)])
         + base[:, None, :]).reshape(-1, GF)
    # b_lo[g] = b_hi[g-1] (segments tile the rank range): ONE gather +
    # a shifted difference replaces the two boundary gathers
    b_hi = jnp.minimum(b_incl, R)
    G = S[b_hi]
    return G - jnp.concatenate([jnp.zeros((1, GF), jnp.float32), G[:-1]])


def rank_space_reduce_blocked(xb: jnp.ndarray, live: int,
                              b_incl: jnp.ndarray, R: int) -> jnp.ndarray:
    """`rank_space_reduce` on COLUMN-BLOCKED input xb [nblk, 16, CHUNK]
    (xb[b, c, l] = column c of rank b*CHUNK + l; columns >= live are
    zero). The [R, GF] row layout puts GF=10-16 on the lane axis, which
    starves both the scan matmul and the XLA relayouts feeding it (the
    post-sort jnp.stack alone measured ~1.7 ms at R=352k); here the
    scan contracts the LANE (rank) axis with (block, col) as the MXU M
    dimension. Same mean-centered two-level scan + b_incl boundary
    difference; summation order per Gaussian is rank order, identical
    to rank_space_reduce."""
    assert R % CHUNK == 0
    nblk = R // CHUNK
    GF = xb.shape[1]
    tri_b = _tri_excl().astype(jnp.bfloat16)
    x1 = xb.astype(jnp.bfloat16)
    r1 = xb - x1.astype(jnp.float32)
    x2 = r1.astype(jnp.bfloat16)
    x3 = (r1 - x2.astype(jnp.float32)).astype(jnp.bfloat16)

    def _pref(xs):
        # [nblk, GF, k] @ [k, j]: contraction on lanes, (nblk, GF) = M
        return jnp.einsum("bck,kj->bcj", xs, tri_b,
                          preferred_element_type=jnp.float32)

    ipx = _pref(x1) + _pref(x2) + _pref(x3)        # exclusive prefixes
    P = ipx[:, :, CHUNK - 1] + xb[:, :, CHUNK - 1]  # [nblk, GF] block sums
    mu = jnp.mean(P, axis=0, keepdims=True)
    bpc = jnp.concatenate(
        [jnp.zeros((1, GF), jnp.float32),
         jnp.cumsum(P - mu, axis=0, dtype=jnp.float32)], axis=0)
    base = bpc + mu * jnp.arange(nblk + 1, dtype=jnp.float32)[:, None]
    # row-major S for the boundary lookup: a 2-axis gather straight off
    # the blocked layout measured 6.2 ms vs relayout + row gather 1.4
    # (bench/profiler.py --mode reduce); and since b_lo[g] = b_hi[g-1]
    # (segments tile the rank range), ONE gather + a shifted difference
    # replaces the two gathers.
    S_rows = jnp.swapaxes(
        jnp.concatenate([ipx, jnp.zeros((1, GF, CHUNK), jnp.float32)])
        + base[:, :, None], 1, 2).reshape(-1, GF)
    b_hi = jnp.minimum(b_incl, R)
    G = S_rows[b_hi]                               # [C, GF]
    d = G - jnp.concatenate([jnp.zeros((1, GF), jnp.float32), G[:-1]])
    return d[:, :live]


@functools.lru_cache(maxsize=None)
def make_pallas_compositor(n_tiles: int, grid_x: int, ch: int, r2: int,
                           capacity: int):
    """Build the differentiable Pallas compositor for a fixed geometry.

    composite(mean2d [C,2], conic [C,3], opacity [C], color [C,ch],
    depth [C], gid [R2], valid [R2], tile_start [T], tile_len [T])
    -> PallasTiles; all Gaussian-indexed inputs receive gradients.
    """
    assert r2 % CHUNK == 0
    CH1 = ch + 1
    F = _pad8(7 + ch)
    GF = _pad8(6 + CH1)
    num_chunks = r2 // CHUNK
    fwd_call = make_forward(n_tiles, grid_x, ch, num_chunks)
    bwd_call = make_backward(n_tiles, grid_x, ch, num_chunks)

    def pack_instances(mean2d, conic, opacity, color, depth, gid, valid):
        # one [C+1, F] per-Gaussian row matrix; padding slots gather the
        # all-zero dummy row (opacity 0 -> skipped, conic 0 -> power 0,
        # no inf). One row-gather + one transpose beats F separate
        # random-access gathers by ~10x.
        g = jnp.concatenate(
            [mean2d, conic, opacity[:, None], depth[:, None], color],
            axis=1,
        )  # [C, 7+ch]
        g = jnp.pad(g, ((0, 1), (0, F - g.shape[1])))  # [C+1, F]
        gid_safe = jnp.where(valid, gid, g.shape[0] - 1)
        inst = g[gid_safe]              # [R2, F]
        # chunk-blocked [NC, F, CHUNK]: per-chunk transposes fuse into
        # the gather; a global [R2, F] -> [F, R2] transpose does not
        return jnp.swapaxes(inst.reshape(num_chunks, CHUNK, F), 1, 2)

    def run_forward(args):
        mean2d, conic, opacity, color, depth, gid, valid, ts, tl = args
        ab = AlignedBinning(gauss_id=gid, valid=valid, tile_start=ts,
                            tile_len=tl)
        meta = make_chunk_meta(ab, num_chunks)
        inst = pack_instances(mean2d, conic, opacity, color, depth, gid,
                              valid)
        (out,) = fwd_call(meta.tile, meta.first, meta.n_valid,
                          meta.offset, inst)
        # tiles with zero instances are never visited by the kernel
        empty = (tl <= 0)[:, None]
        acc = jnp.where(empty[..., None], 0.0, out[..., :CH1])
        t_fin = jnp.where(empty, 1.0, out[..., CH1])
        nc = jnp.where(empty, 0.0, out[..., CH1 + 1]).astype(jnp.int32)
        return PallasTiles(
            color=acc[..., :ch], depth=acc[..., ch],
            final_T=t_fin, n_contrib=nc,
        ), (inst, meta)

    @jax.custom_vjp
    def composite(mean2d, conic, opacity, color, depth, gid, valid, ts, tl):
        out, _ = run_forward((mean2d, conic, opacity, color, depth, gid,
                              valid, ts, tl))
        return out

    def composite_fwd(mean2d, conic, opacity, color, depth, gid, valid,
                      ts, tl):
        out, (inst, meta) = run_forward(
            (mean2d, conic, opacity, color, depth, gid, valid, ts, tl)
        )
        acc = jnp.concatenate([out.color, out.depth[..., None]], axis=-1)
        return out, (inst, meta, gid, valid, acc, out.final_T,
                     out.n_contrib)

    def composite_bwd(res, g):
        inst, meta, gid, valid, acc, t_fin, nc = res
        # pack g_acc | acc | g_T | t_fin | nc into the single per-tile
        # stream (acc provides S_total for the forward-order suffix
        # reconstruction)
        gall = jnp.concatenate(
            [g.color, g.depth[..., None], acc, g.final_T[..., None],
             t_fin[..., None], nc.astype(jnp.float32)[..., None]],
            axis=-1,
        )  # [n_tiles, PX, 2*CH1+3]
        # chunks past the tile's last contributor have no gradient work
        max_nc = jnp.max(nc, axis=-1)  # [n_tiles]
        active = ((meta.n_valid > 0)
                  & (meta.offset < max_nc[meta.tile])).astype(jnp.int32)
        (grows,) = bwd_call(
            meta.tile, meta.first, meta.n_valid, meta.offset, active,
            inst, gall,
        )
        # one combined row-scatter: [R2, GF] rows add into [C+1, GF]
        # (the +1 dummy row swallows padding slots; where-mask would also
        # work but costs a 42MB select)
        ch = g.color.shape[-1]
        gid_safe = jnp.where(valid, gid, capacity)
        acc_rows = jnp.zeros((capacity + 1, GF), jnp.float32).at[
            gid_safe
        ].add(jnp.swapaxes(grows, 1, 2).reshape(-1, GF))
        d = acc_rows[:capacity]
        d_mean2d = d[:, 0:2]
        d_conic = d[:, 2:5]
        d_opacity = d[:, 5]
        d_color = d[:, 6:6 + ch]
        d_depth = d[:, 6 + ch]
        return (d_mean2d, d_conic, d_opacity, d_color, d_depth,
                None, None, None, None)

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


@functools.lru_cache(maxsize=None)
def make_pallas_compositor_dense(n_tiles: int, grid_x: int, ch: int,
                                 capacity: int, max_instances: int):
    """v4 compositor over the compact binning (ops/binning_dense.py).

    Same Pallas kernels as `make_pallas_compositor`; what changes is the
    host-graph plumbing around them:
      * packing = ONE row gather into sorted order + ONE broadcast-indexed
        row gather into the chunk-aligned layout (no jnp.repeat, no
        R-sized 1-D random gathers);
      * the backward per-Gaussian reduction = gradient rows gathered into
        pre-sort rank order (ranks of one Gaussian are contiguous), then
        a cumsum + analytic boundary-difference — deterministic, no XLA
        scatter-add. Rows are mean-centered first so the prefix sum stays
        a zero-drift random walk instead of accumulating column bias
        (bounds the cancellation error of the difference).

    composite(mean2d, conic, opacity, color, depth, db: DenseBinning)
    -> PallasTiles. The five leading args receive gradients.
    """
    from gaussianeditor_tpu.ops.binning_dense import (
        CHUNK as DCHUNK,
        dense_capacities,
    )

    assert DCHUNK == CHUNK
    CH1 = ch + 1
    F = _pad8(7 + ch)
    GF = _pad8(6 + CH1)
    R, R2, NC = dense_capacities(max_instances, n_tiles)
    fwd_call = make_forward(n_tiles, grid_x, ch, NC)
    bwd_call = make_backward(n_tiles, grid_x, ch, NC)

    def pack_instances(mean2d, conic, opacity, color, depth, db):
        g = jnp.concatenate(
            [mean2d, conic, opacity[:, None], depth[:, None], color],
            axis=1,
        )  # [C, 7+ch]
        g = jnp.pad(g, ((0, 1), (0, F - g.shape[1])))      # zero dummy C
        # aligned src map: chunk c's rows are sorted rows p0[c]..p0[c]+127,
        # live while lane < n_valid[c] — a pure broadcast, no searches.
        # ONE fused row gather (sorted_g composed in int space), emitted
        # chunk-blocked so the per-chunk transpose fuses into the gather.
        C_ = g.shape[0] - 1
        sg = jnp.pad(db.sorted_g, (0, 1), constant_values=C_)
        lane = jax.lax.broadcasted_iota(jnp.int32, (NC, CHUNK), 1)
        src = db.chunk_p0[:, None] + lane
        src = jnp.where(lane < db.chunk_nvalid[:, None], src, R)
        gidx = sg[src]                                     # [NC, CHUNK]
        inst = g[gidx]                                     # [NC, CHUNK, F]
        return jnp.swapaxes(inst, 1, 2)                    # [NC, F, CHUNK]

    def run_forward(args):
        mean2d, conic, opacity, color, depth, db = args
        inst = pack_instances(mean2d, conic, opacity, color, depth, db)
        (out,) = fwd_call(db.chunk_tile, db.chunk_first, db.chunk_nvalid,
                          db.chunk_offset, inst)
        empty = ~db.tile_nonempty[:, None]
        acc = jnp.where(empty[..., None], 0.0, out[..., :CH1])
        t_fin = jnp.where(empty, 1.0, out[..., CH1])
        nc = jnp.where(empty, 0.0, out[..., CH1 + 1]).astype(jnp.int32)
        return PallasTiles(
            color=acc[..., :ch], depth=acc[..., ch],
            final_T=t_fin, n_contrib=nc,
        ), inst

    @jax.custom_vjp
    def composite(mean2d, conic, opacity, color, depth, db):
        out, _ = run_forward((mean2d, conic, opacity, color, depth, db))
        return out

    def composite_fwd(mean2d, conic, opacity, color, depth, db):
        out, inst = run_forward((mean2d, conic, opacity, color, depth, db))
        acc = jnp.concatenate([out.color, out.depth[..., None]], axis=-1)
        return out, (inst, db, acc, out.final_T, out.n_contrib)

    def composite_bwd(res, g):
        inst, db, acc, t_fin, nc = res
        gall = jnp.concatenate(
            [g.color, g.depth[..., None], acc, g.final_T[..., None],
             t_fin[..., None], nc.astype(jnp.float32)[..., None]],
            axis=-1,
        )  # [n_tiles, PX, 2*CH1+3]
        max_nc = jnp.max(nc, axis=-1)
        active = ((db.chunk_nvalid > 0)
                  & (db.chunk_offset < max_nc[db.chunk_tile])).astype(jnp.int32)
        (grows,) = bwd_call(
            db.chunk_tile, db.chunk_first, db.chunk_nvalid, db.chunk_offset,
            active, inst, gall,
        )
        # deterministic reduction: aligned rows -> pre-sort rank order
        # (each Gaussian's ranks are the contiguous analytic range
        # [B[g-1], B[g]) ), then cumsum + boundary difference. Dead
        # chunks' rows are zeroed by the kernel, so ranks past
        # num_rendered contribute nothing.
        # row-major view of the chunk-blocked kernel output, then one row
        # gather into pre-sort rank order (measured faster than a
        # two-axis [chunk, :, lane] advanced-index gather)
        rows_al = jnp.swapaxes(grows, 1, 2).reshape(-1, GF)  # [R2, GF]
        rows_rank = rows_al[db.a_by_rank]                    # [R, GF]
        d = rank_space_reduce(rows_rank, db.b_incl, R)
        ch_ = ch
        return (d[:, 0:2], d[:, 2:5], d[:, 5], d[:, 6:6 + ch_],
                d[:, 6 + ch_], None)

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


@functools.lru_cache(maxsize=None)
def make_pallas_compositor_sorted(n_tiles: int, grid_x: int, ch: int,
                                  capacity: int, max_instances: int):
    """v5/v8 compositor over the fat-sort binning (ops/binning_sorted.py).

    There is no pack stage at all: the tile-grid kernels DMA each
    chunk's [F, CHUNK] slice of the payload-major sorted payload at its
    dynamic lane offset. The binning's payload values are stop-grad
    duplicates of the five differentiable arguments; gradients are
    produced analytically by the backward's rank-space cumsum-difference
    at the b_incl boundaries, so the sort never enters autodiff and the
    caller's `mean2d`/`conic`/`opacity`/`color`/`depth` receive exact
    cotangents.

    composite(mean2d, conic, opacity, color, depth, sb: SortedBinning)
    -> PallasTiles.
    """
    from gaussianeditor_tpu.ops.binning_sorted import (
        CHUNK as SCHUNK,
        sorted_capacities,
    )

    assert SCHUNK == CHUNK
    CH1 = ch + 1
    R, NB, NC = sorted_capacities(max_instances, n_tiles)
    fwd_call = make_forward_tile(n_tiles, grid_x, ch)
    bwd_call = make_backward_tile(n_tiles, grid_x, ch, NC, R)

    def run_forward(sb):
        (out,) = fwd_call(sb.tile_bounds, sb.blocks)
        empty = ~sb.tile_nonempty[:, None]
        acc = jnp.where(empty[..., None], 0.0, out[..., :CH1])
        t_fin = jnp.where(empty, 1.0, out[..., CH1])
        nc = jnp.where(empty, 0.0, out[..., CH1 + 1]).astype(jnp.int32)
        return PallasTiles(
            color=acc[..., :ch], depth=acc[..., ch],
            final_T=t_fin, n_contrib=nc,
        )

    @jax.custom_vjp
    def composite(mean2d, conic, opacity, color, depth, sb):
        del mean2d, conic, opacity, color, depth  # values live in sb.blocks
        return run_forward(sb)

    def composite_fwd(mean2d, conic, opacity, color, depth, sb):
        out = run_forward(sb)
        acc = jnp.concatenate([out.color, out.depth[..., None]], axis=-1)
        return out, (sb, acc, out.final_T, out.n_contrib)

    def composite_bwd(res, g):
        sb, acc, t_fin, nc = res
        gall = jnp.concatenate(
            [g.color, g.depth[..., None], acc, g.final_T[..., None],
             t_fin[..., None], nc.astype(jnp.float32)[..., None]],
            axis=-1,
        )  # [n_tiles, PX, 2*CH1+3]
        max_nc = jnp.max(nc, axis=-1).astype(jnp.int32)
        # per-tile chunk starts for the v7 tile-grid backward's manual
        # output DMA (exclusive cumsum of ceil(cnt / CHUNK))
        cnt = sb.tile_bounds[1:] - sb.tile_bounds[:-1]
        nck = (cnt + CHUNK - 1) // CHUNK
        cstart = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(nck, dtype=jnp.int32)])
        (grows,) = bwd_call(sb.tile_bounds, cstart, max_nc,
                            sb.blocks, gall)       # [GF, NC*CHUNK]
        # lanes past the dynamic total carry the kernel's sentinel fill
        # (zero data, R rank) — no host-side masking pass needed
        # deterministic rank-space reduction: ONE stable sort keyed by
        # the rank row the kernel emitted (row `live`; dead lanes carry
        # the R sentinel and fall past every live rank) puts the
        # gradient rows into pre-sort rank order, then the column-
        # blocked mean-centered scan + boundary difference at the
        # analytic b_incl ranges sums them per Gaussian. This replaced
        # the aligned->rank random row gather + alignment-map scans +
        # inversion sort (gather alone measured 3.1 ms at R=352k,
        # bench/profiler.py round 4); summation order per Gaussian is
        # identical (rank order), so gradients are bitwise-unchanged.
        # Column extraction is a FREE view off the payload-major output.
        live = 6 + CH1
        cols = tuple(grows[i] for i in range(live))
        skey = grows[live]                         # f32 rank | R sentinel
        sorted_ = jax.lax.sort((skey,) + cols, num_keys=1, is_stable=True)
        from gaussianeditor_tpu.ops.binning_sorted import (
            KEY_BLK,
            _make_assembly_kernel,
        )

        nblk = R // CHUNK
        # restack at 256-block grid steps when the sorted arrays have
        # enough slack rows to absorb the rounding (rows in [R, R_scan)
        # are sentinel-keyed zero-data rows, so the scan's prefix is
        # constant across them and the b_incl boundary differences are
        # unchanged). DMA-issue overhead dominates the restack: 16
        # blocks/step measured 1.8 ms vs ~40 MB of traffic.
        BSTEP = 256
        nblk_scan = -(-nblk // BSTEP) * BSTEP
        if nblk_scan <= NC:
            r_scan = nblk_scan * CHUNK
            scols = tuple(s[:r_scan] for s in sorted_[1:])
            xb = _make_assembly_kernel(r_scan, nblk_scan, live,
                                       bpg=BSTEP)(*scols)
            d = rank_space_reduce_blocked(xb, live, sb.b_incl, r_scan)
        elif R % KEY_BLK == 0:
            scols = tuple(s[:R] for s in sorted_[1:])
            xb = _make_assembly_kernel(R, nblk, live)(*scols)[:nblk]
            d = rank_space_reduce_blocked(xb, live, sb.b_incl, R)
        else:
            scols = tuple(s[:R] for s in sorted_[1:])
            pad_cols = list(scols) + [jnp.zeros((R,), jnp.float32)] * (
                16 - live)
            xb = jnp.swapaxes(
                jnp.stack(pad_cols, axis=1).reshape(nblk, CHUNK, 16), 1, 2)
            d = rank_space_reduce_blocked(xb, live, sb.b_incl, R)
        return (d[:, 0:2], d[:, 2:5], d[:, 5], d[:, 6:6 + ch],
                d[:, 6 + ch], None)

    composite.defvjp(composite_fwd, composite_bwd)
    return composite
