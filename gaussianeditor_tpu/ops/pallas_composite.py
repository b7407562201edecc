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

CHUNK = 128
PX = 256  # 16x16 pixels per tile


def _pad8(n: int) -> int:
    # Mosaic sublane counts want multiples of 8.
    return -(-n // 8) * 8


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pix_coords(tile_x, tile_y):
    """[PX, 1] float pixel coords of the tile (pixel centers at ints)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (PX, 1), 0)
    px = tile_x * 16 + p % 16
    py = tile_y * 16 + p // 16
    return px.astype(jnp.float32), py.astype(jnp.float32)


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


def _dot(a, b, dims):
    # HIGHEST: full-f32 MXU passes (see module docstring).
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


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

    def kernel(ct_ref, cf_ref, nv_ref, co_ref, inst_ref,
               acc_ref, t_ref, nc_ref, done_sc):
        c = pl.program_id(0)
        tile = ct_ref[c]
        pixf_x, pixf_y = _pix_coords(tile % grid_x, tile // grid_x)

        @pl.when(cf_ref[c] == 1)
        def _init():
            acc_ref[0] = jnp.zeros((PX, CH1), jnp.float32)
            t_ref[0, 0] = jnp.ones((PX,), jnp.float32)
            nc_ref[0, 0] = jnp.zeros((PX,), jnp.int32)
            done_sc[:] = jnp.zeros((PX, 1), jnp.float32)

        n_valid = nv_ref[c]
        not_all_done = jnp.sum(done_sc[:]) < PX

        @pl.when((n_valid > 0) & not_all_done)
        def _compute():
            buf = inst_ref[:]           # [F, CHUNK]
            xs = buf[0:1, :]
            ys = buf[1:2, :]
            cxx = buf[2:3, :]
            cxy = buf[3:4, :]
            cyy = buf[4:5, :]
            op = buf[5:6, :]

            T = t_ref[0, 0][:, None]    # [PX, 1]
            done = done_sc[:]

            dx = xs - pixf_x            # [PX, CHUNK]
            dy = ys - pixf_y
            power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
            # exponent clamp: power > 0 is skipped; garbage conics on
            # padding slots would overflow exp (0*inf -> NaN in grads)
            alpha = jnp.minimum(ALPHA_MAX,
                                op * jnp.exp(jnp.minimum(power, 0.0)))

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            skipped = (power > 0.0) | (alpha < ALPHA_MIN) | (lane >= n_valid)

            lf = jnp.where(skipped, 0.0, jnp.log1p(-alpha))
            cum = _dot(lf, _tri_incl(), ((1,), (0,)))  # inclusive prefix
            TP = T * jnp.exp(cum)
            not_done_px = done < 0.5
            contributes = not_done_px & (~skipped) & (TP >= T_MIN)
            crossed = jnp.any((~skipped) & (TP < T_MIN), axis=-1,
                              keepdims=True)
            done_sc[:] = jnp.maximum(done, crossed.astype(jnp.float32))

            w = jnp.where(contributes, alpha * T * jnp.exp(cum - lf), 0.0)
            featd = jnp.concatenate([buf[7:7 + ch, :], buf[6:7, :]], axis=0)
            acc_ref[0] = acc_ref[0] + _dot(w, featd, ((1,), (1,)))

            T_new = T * jnp.exp(
                jnp.sum(jnp.where(contributes, lf, 0.0), axis=-1,
                        keepdims=True)
            )
            t_ref[0, 0] = T_new[:, 0]
            pos1 = co_ref[c] + lane + 1
            nc_new = jnp.max(jnp.where(contributes, pos1, 0), axis=-1)
            nc_ref[0, 0] = jnp.maximum(nc_ref[0, 0], nc_new)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # tile, first, n_valid, offset
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((F, CHUNK), lambda c, ct, cf, nv, co: (0, c)),
        ],
        out_specs=[
            pl.BlockSpec((1, PX, CH1),
                         lambda c, ct, cf, nv, co: (ct[c], 0, 0)),
            pl.BlockSpec((1, 1, PX), lambda c, ct, cf, nv, co: (ct[c], 0, 0)),
            pl.BlockSpec((1, 1, PX), lambda c, ct, cf, nv, co: (ct[c], 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((PX, 1), jnp.float32)],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, PX, CH1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, PX), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, PX), jnp.int32),
        ],
        interpret=_interpret(),
    )


def make_backward(n_tiles: int, grid_x: int, ch: int, num_chunks: int):
    CH1 = ch + 1
    F = _pad8(7 + ch)
    # rows: dmean_x, dmean_y, dcxx, dcxy, dcyy, dop, dcolor..., ddepth, pad
    GF = _pad8(6 + CH1)

    def kernel(ct_ref, cl_ref, nv_ref, co_ref, inst_ref, gacc_ref, gt_ref,
               tfin_ref, nc_ref, grad_ref, logt_sc, s_sc):
        i = pl.program_id(0)
        c = num_chunks - 1 - i
        tile = ct_ref[c]
        pixf_x, pixf_y = _pix_coords(tile % grid_x, tile // grid_x)

        @pl.when(cl_ref[c] == 1)
        def _init():
            # T_fin >= T_MIN by construction; the log is safe
            logt_sc[:] = jnp.log(
                jnp.maximum(tfin_ref[0, 0], T_MIN)
            )[:, None]
            s_sc[:] = jnp.zeros((PX, 1), jnp.float32)

        n_valid = nv_ref[c]
        grad_ref[:] = jnp.zeros((GF, CHUNK), jnp.float32)

        @pl.when(n_valid > 0)
        def _compute():
            buf = inst_ref[:]
            xs = buf[0:1, :]
            ys = buf[1:2, :]
            cxx = buf[2:3, :]
            cxy = buf[3:4, :]
            cyy = buf[4:5, :]
            op = buf[5:6, :]
            featd = jnp.concatenate([buf[7:7 + ch, :], buf[6:7, :]], axis=0)

            g_acc = gacc_ref[0]                    # [PX, CH1]
            gT_term = (gt_ref[0, 0] * tfin_ref[0, 0])[:, None]  # [PX, 1]
            nc = nc_ref[0, 0][:, None]             # [PX, 1]

            dx = xs - pixf_x
            dy = ys - pixf_y
            power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
            g_exp = jnp.exp(jnp.minimum(power, 0.0))
            alpha_raw = op * g_exp
            alpha = jnp.minimum(ALPHA_MAX, alpha_raw)

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            pos = co_ref[c] + lane
            skipped = (power > 0.0) | (alpha < ALPHA_MIN) | (lane >= n_valid)
            m = (~skipped) & (pos < nc)  # contributed in forward

            lf = jnp.where(m, jnp.log1p(-alpha), 0.0)
            excl = _dot(lf, _tri_incl(), ((1,), (0,))) - lf
            total = jnp.sum(lf, axis=-1, keepdims=True)
            # log-space transmittance reconstruction (chunk-wise analog of
            # CUDA's T = T/(1-alpha)); exp(-total) alone can overflow
            logT_in = logt_sc[:] - total
            T_k = jnp.exp(logT_in + excl)

            c_hat = _dot(g_acc, featd, ((1,), (0,)))  # [PX, CHUNK]
            mf = m.astype(jnp.float32)
            u = mf * alpha * T_k * c_hat
            S_at = s_sc[:] + _dot(u, _tri_strict_after(), ((1,), (0,)))

            f = 1.0 - alpha
            dalpha = mf * (T_k * c_hat - (S_at + gT_term) / f)
            cap_gate = (alpha_raw < ALPHA_MAX).astype(jnp.float32)
            dop = dalpha * g_exp * cap_gate
            dpower = dalpha * alpha * cap_gate

            w = mf * alpha * T_k
            gfeat = _dot(g_acc, w, ((0,), (0,)))      # [CH1, CHUNK]

            def rsum(x):  # [PX, CHUNK] -> [1, CHUNK]
                return jnp.sum(x, axis=0, keepdims=True)

            rows = jnp.concatenate(
                [
                    rsum(dpower * (-(cxx * dx + cxy * dy))),
                    rsum(dpower * (-(cyy * dy + cxy * dx))),
                    rsum(dpower * (-0.5 * dx * dx)),
                    rsum(dpower * (-dx * dy)),
                    rsum(dpower * (-0.5 * dy * dy)),
                    rsum(dop),
                    gfeat,
                ],
                axis=0,
            )  # [6+CH1, CHUNK]
            pad = GF - (6 + CH1)
            if pad:
                rows = jnp.concatenate(
                    [rows, jnp.zeros((pad, CHUNK), jnp.float32)], axis=0
                )
            grad_ref[:] = rows

            logt_sc[:] = logT_in
            s_sc[:] = s_sc[:] + jnp.sum(u, axis=-1, keepdims=True)

    rev = num_chunks - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # tile, last, n_valid, offset
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((F, CHUNK),
                         lambda c, ct, cl, nv, co: (0, rev - c)),
            pl.BlockSpec((1, PX, CH1),
                         lambda c, ct, cl, nv, co: (ct[rev - c], 0, 0)),
            pl.BlockSpec((1, 1, PX),
                         lambda c, ct, cl, nv, co: (ct[rev - c], 0, 0)),
            pl.BlockSpec((1, 1, PX),
                         lambda c, ct, cl, nv, co: (ct[rev - c], 0, 0)),
            pl.BlockSpec((1, 1, PX),
                         lambda c, ct, cl, nv, co: (ct[rev - c], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((GF, CHUNK),
                         lambda c, ct, cl, nv, co: (0, rev - c)),
        ],
        scratch_shapes=[
            pltpu.VMEM((PX, 1), jnp.float32),
            pltpu.VMEM((PX, 1), jnp.float32),
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
        return inst.T                   # [F, R2]

    def run_forward(args):
        mean2d, conic, opacity, color, depth, gid, valid, ts, tl = args
        ab = AlignedBinning(gauss_id=gid, valid=valid, tile_start=ts,
                            tile_len=tl)
        meta = make_chunk_meta(ab, num_chunks)
        inst = pack_instances(mean2d, conic, opacity, color, depth, gid,
                              valid)
        acc, t_fin, nc = fwd_call(meta.tile, meta.first, meta.n_valid,
                                  meta.offset, inst)
        # tiles with zero instances are never visited by the kernel
        empty = tl <= 0
        acc = jnp.where(empty[:, None, None], 0.0, acc)
        t_fin = jnp.where(empty[:, None, None], 1.0, t_fin)
        nc = jnp.where(empty[:, None, None], 0, nc)
        return PallasTiles(
            color=acc[..., :ch], depth=acc[..., ch],
            final_T=t_fin[:, 0], n_contrib=nc[:, 0],
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
        return out, (inst, meta, gid, valid, out.final_T, out.n_contrib)

    def composite_bwd(res, g):
        inst, meta, gid, valid, t_fin, nc = res
        g_acc = jnp.concatenate([g.color, g.depth[..., None]], axis=-1)
        (grows,) = bwd_call(
            meta.tile, meta.last, meta.n_valid, meta.offset,
            inst, g_acc, g.final_T[:, None], t_fin[:, None], nc[:, None],
        )
        # one combined row-scatter: [R2, GF] rows add into [C+1, GF]
        # (the +1 dummy row swallows padding slots; where-mask would also
        # work but costs a 42MB select)
        ch = g.color.shape[-1]
        gid_safe = jnp.where(valid, gid, capacity)
        acc_rows = jnp.zeros((capacity + 1, GF), jnp.float32).at[
            gid_safe
        ].add(grows.T)
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
