"""v10 prototype: TILE-GROUP grid + global streaming DMA ring.

ablate_base measured the v8 tile-grid base cost as ~1.28 ms of pure
grid sequencing (1024 steps x ~1.25 us) with input DMA fully hidden.
Grouping G tiles per grid step cuts sequencing G-fold; the global
streaming ring (stream_fwd/stream_bwd) keeps input DMA hidden ACROSS
tiles inside a group (per-tile rings would expose tile-start latency
with no grid machinery to hide behind).

Usage: JAX_PLATFORMS=cpu python group_kernels.py         (parity)
       python group_kernels.py time [G]                  (chip timing)
"""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/bench")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussianeditor_tpu.ops import binning_sorted as bs
from gaussianeditor_tpu.ops import pallas_composite as pc
from gaussianeditor_tpu.ops.preprocess import TILE, preprocess
from gaussianeditor_tpu.ops.composite import ALPHA_MAX, ALPHA_MIN, T_MIN

CHUNK, PX = pc.CHUNK, pc.PX
S = 8
LA = 4
OS = 4


def make_forward_group(n_tiles: int, grid_x: int, ch: int, r_budget: int,
                       G: int):
    CH1 = ch + 1
    F = pc._pad8(7 + ch + 1)
    OUTC = CH1 + 2
    NBLK = r_budget // CHUNK + 1
    n_groups = -(-n_tiles // G)

    def kernel(bounds_ref, hbm_ref, out_ref, buf_sc, st_sc, sem):
        g = pl.program_id(0)

        def start_next():
            b = st_sc[0]
            slot = jax.lax.rem(b, S)
            off = pl.multiple_of(b * CHUNK, CHUNK)
            pltpu.make_async_copy(
                hbm_ref.at[:F, pl.ds(off, CHUNK)],
                buf_sc.at[slot], sem.at[slot]).start()
            st_sc[0] = b + 1

        def wait_next():
            b = st_sc[1]
            slot = jax.lax.rem(b, S)
            off = pl.multiple_of(b * CHUNK, CHUNK)
            pltpu.make_async_copy(
                hbm_ref.at[:F, pl.ds(off, CHUNK)],
                buf_sc.at[slot], sem.at[slot]).wait()
            st_sc[1] = b + 1

        @pl.when(g == 0)
        def _seed():
            st_sc[0] = bounds_ref[0] // CHUNK
            st_sc[1] = bounds_ref[0] // CHUNK

        def tile_body(i, _):
            t = g * G + i
            tc = jnp.minimum(t, n_tiles - 1)
            valid = t < n_tiles
            row0 = bounds_ref[tc]
            cnt = jnp.where(valid, bounds_ref[tc + 1] - row0, 0)
            n_chunks = (cnt + CHUNK - 1) // CHUNK
            q0 = row0 // CHUNK
            shift = row0 - q0 * CHUNK
            px_i = jax.lax.broadcasted_iota(jnp.int32, (PX, 1), 0)
            pixf_x = (tc % grid_x * TILE + px_i % TILE).astype(jnp.float32)
            pixf_y = (tc // grid_x * TILE + px_i // TILE).astype(jnp.float32)

            for _u in range(LA + 2):
                @pl.when((st_sc[0] < q0 + 2 + LA) & (st_sc[0] < NBLK)
                         & (n_chunks > 0))
                def _cu():
                    start_next()

            init = (
                jnp.zeros((PX, CH1), jnp.float32),
                jnp.ones((PX, 1), jnp.float32),
                jnp.zeros((PX, 1), jnp.float32),
                jnp.zeros((PX, 1), jnp.float32),
            )

            def body(k, carry):
                acc, T, ncv, done = carry
                @pl.when((st_sc[0] < q0 + k + 2 + LA) & (st_sc[0] < NBLK))
                def _pf():
                    start_next()
                for _u in range(2):
                    @pl.when(st_sc[1] < q0 + k + 2)
                    def _w():
                        wait_next()

                s0 = jax.lax.rem(q0 + k, S)
                s1 = jax.lax.rem(q0 + k + 1, S)
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
                power = (-0.5 * (cxx * dx * dx + cyy * dy * dy)
                         - cxy * dx * dy)
                alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
                skipped = ((power > 0.0) | (alpha < ALPHA_MIN)
                           | (lane >= n_valid))
                alpha_s = jnp.where(skipped, 0.0, alpha)
                lf = jnp.log1p(-alpha_s)
                excl = pc._dot3(lf, pc._tri_excl())
                TPx = T * jnp.exp(excl)
                TP = TPx * (1.0 - alpha_s)
                not_done_px = done < 0.5
                contributes = not_done_px & (~skipped) & (TP >= T_MIN)
                crossed = TP[:, CHUNK - 1:CHUNK] < T_MIN
                done = jnp.maximum(done, crossed.astype(jnp.float32))
                w = jnp.where(contributes, alpha * TPx, 0.0)
                featd = jnp.concatenate([buf[7:7 + ch, :], buf[6:7, :]],
                                        axis=0)
                acc = acc + pc._dot_high(w, featd, ((1,), (1,)))
                T = jnp.min(jnp.where(contributes, TP, T), axis=-1,
                            keepdims=True)
                pos1 = k * CHUNK + lane + 1
                nc_new = jnp.max(
                    jnp.where(contributes, pos1, 0).astype(jnp.float32),
                    axis=-1, keepdims=True)
                ncv = jnp.maximum(ncv, nc_new)
                return acc, T, ncv, done

            acc, T, ncv, _ = jax.lax.fori_loop(0, n_chunks, body, init)
            out_ref[0, i] = jnp.concatenate([acc, T, ncv], axis=1)
            return 0

        jax.lax.fori_loop(0, G, tile_body, 0)

        @pl.when(g == n_groups - 1)
        def _drain():
            for _u in range(LA + 2):
                @pl.when(st_sc[1] < st_sc[0])
                def _dw():
                    wait_next()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[pl.BlockSpec((1, G, PX, OUTC),
                                lambda g, b: (g, 0, 0, 0))],
        scratch_shapes=[
            pltpu.VMEM((S, F, CHUNK), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((S,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_groups, G, PX, OUTC),
                                        jnp.float32)],
        interpret=pc._interpret(),
    )


def make_backward_group(n_tiles: int, grid_x: int, ch: int,
                        num_chunks: int, r_budget: int, G: int):
    CH1 = ch + 1
    P = 7 + ch
    F = pc._pad8(P + 1)
    GF = pc._pad8(6 + CH1 + 1)
    R_sent = float(r_budget)
    NBLK = r_budget // CHUNK + 1
    n_groups = -(-n_tiles // G)

    def kernel(bounds_ref, cstart_ref, maxnc_ref, hbm_ref, gall_ref,
               out_ref, buf_sc, osc_sc, logt_sc, s_sc, st_sc, isem, osem):
        g = pl.program_id(0)
        pixl_x, pixl_y = pc._pix_coords_local()
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        pad = GF - (6 + CH1 + 1)

        def start_next():
            b = st_sc[0]
            slot = jax.lax.rem(b, S)
            off = pl.multiple_of(b * CHUNK, CHUNK)
            pltpu.make_async_copy(
                hbm_ref.at[:F, pl.ds(off, CHUNK)],
                buf_sc.at[slot], isem.at[slot]).start()
            st_sc[0] = b + 1

        def wait_next():
            b = st_sc[1]
            slot = jax.lax.rem(b, S)
            off = pl.multiple_of(b * CHUNK, CHUNK)
            pltpu.make_async_copy(
                hbm_ref.at[:F, pl.ds(off, CHUNK)],
                buf_sc.at[slot], isem.at[slot]).wait()
            st_sc[1] = b + 1

        def out_dma(x):
            slot = jax.lax.rem(x, OS)
            ooff = pl.multiple_of(x * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                osc_sc.at[slot],
                out_ref.at[:, pl.ds(ooff, CHUNK)],
                osem.at[slot])

        @pl.when(g == 0)
        def _seed():
            st_sc[0] = bounds_ref[0] // CHUNK
            st_sc[1] = bounds_ref[0] // CHUNK

        def tile_body(i, _):
            t = g * G + i
            tc = jnp.minimum(t, n_tiles - 1)
            valid = t < n_tiles
            ox = (tc % grid_x * TILE).astype(jnp.float32)
            oy = (tc // grid_x * TILE).astype(jnp.float32)
            row0 = bounds_ref[tc]
            cnt = jnp.where(valid, bounds_ref[tc + 1] - row0, 0)
            n_chunks = (cnt + CHUNK - 1) // CHUNK
            c0 = cstart_ref[tc]
            maxnc_t = maxnc_ref[tc]
            q0 = row0 // CHUNK
            shift = row0 - q0 * CHUNK

            for _u in range(LA + 2):
                @pl.when((st_sc[0] < q0 + 2 + LA) & (st_sc[0] < NBLK)
                         & (n_chunks > 0))
                def _cu():
                    start_next()

            @pl.when(n_chunks > 0)
            def _init():
                logt_sc[:] = jnp.zeros((PX, 1), jnp.float32)
                s_sc[:] = jnp.zeros((PX, 1), jnp.float32)

            gall = gall_ref[0, i]
            g_acc = gall[:, :CH1]
            gT_term = (gall[:, 2 * CH1] * gall[:, 2 * CH1 + 1])[:, None]
            nc = gall[:, 2 * CH1 + 2][:, None]
            stot = jnp.sum(gall[:, :CH1] * gall[:, CH1:2 * CH1], axis=-1,
                           keepdims=True)

            def body(k, carry):
                @pl.when((st_sc[0] < q0 + k + 2 + LA) & (st_sc[0] < NBLK))
                def _pf():
                    start_next()
                for _u in range(2):
                    @pl.when(st_sc[1] < q0 + k + 2)
                    def _w():
                        wait_next()

                x = c0 + k
                oslot = jax.lax.rem(x, OS)
                @pl.when(x >= OS)
                def _wo():
                    out_dma(x - OS).wait()

                s0 = jax.lax.rem(q0 + k, S)
                s1 = jax.lax.rem(q0 + k + 1, S)
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
                    xs = buf[0:1, :] - ox
                    ys = buf[1:2, :] - oy
                    cxx = buf[2:3, :]
                    cxy = buf[3:4, :]
                    cyy = buf[4:5, :]
                    op = buf[5:6, :]
                    featd = jnp.concatenate(
                        [buf[7:7 + ch, :], buf[6:7, :]], axis=0)

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
                    excl = pc._dot3(lf, pc._tri_excl())
                    total = (excl[:, CHUNK - 1:CHUNK]
                             + lf[:, CHUNK - 1:CHUNK])
                    T_k = jnp.exp(logt_sc[:] + excl)

                    c_hat = pc._dot_high(g_acc, featd, ((1,), (0,)))
                    w = alpha_m * T_k
                    u = w * c_hat
                    Su = pc._dot3(u, pc._tri_incl())
                    u_total = Su[:, CHUNK - 1:CHUNK]
                    pre = stot - s_sc[:] + gT_term
                    sterm = pre - Su

                    f = 1.0 - alpha_m
                    amc = jnp.where(alpha_raw < ALPHA_MAX, alpha_m, 0.0)
                    dpower = amc * (T_k * c_hat - sterm / f)

                    gfeat = pc._dot_high(g_acc, w, ((0,), (0,)))

                    pxv = pixl_x[:, 0]
                    pyv = pixl_y[:, 0]
                    P6 = jnp.stack(
                        [jnp.ones_like(pxv), pxv, pyv, pxv * pxv,
                         pyv * pyv, pxv * pyv],
                        axis=0,
                    )
                    M = pc._dot_high(P6, dpower, ((1,), (0,)))
                    m0, mx, my, mxx, myy, mxy = (
                        M[ii:ii + 1, :] for ii in range(6))
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

                out_dma(x).start()
                return carry

            jax.lax.fori_loop(0, n_chunks, body, 0)
            return 0

        jax.lax.fori_loop(0, G, tile_body, 0)

        @pl.when(g == n_groups - 1)
        def _tail():
            for _u in range(LA + 2):
                @pl.when(st_sc[1] < st_sc[0])
                def _dw():
                    wait_next()
            c_live = cstart_ref[n_tiles]
            fill = jnp.concatenate(
                [jnp.zeros((6 + CH1, CHUNK), jnp.float32),
                 jnp.full((1, CHUNK), R_sent, jnp.float32),
                 jnp.zeros((pad, CHUNK), jnp.float32)], axis=0)

            def fbody(x, _):
                oslot = jax.lax.rem(x, OS)
                @pl.when(x >= OS)
                def _w():
                    out_dma(x - OS).wait()
                osc_sc[oslot] = fill
                out_dma(x).start()
                return 0

            jax.lax.fori_loop(c_live, num_chunks, fbody, 0)
            for ii in range(OS):
                xx = num_chunks - OS + ii
                @pl.when(xx >= 0)
                def _do():
                    out_dma(xx).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec((1, G, PX, 2 * CH1 + 3),
                               lambda g, b, c, m: (g, 0, 0, 0))],
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        scratch_shapes=[
            pltpu.VMEM((S, F, CHUNK), jnp.float32),
            pltpu.VMEM((OS, GF, CHUNK), jnp.float32),
            pltpu.VMEM((PX, 1), jnp.float32),
            pltpu.VMEM((PX, 1), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((S,)),
            pltpu.SemaphoreType.DMA((OS,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((GF, num_chunks * CHUNK),
                                        jnp.float32)],
        interpret=pc._interpret(),
    )


def main():
    from profiler import make_scene, timer
    timing = len(sys.argv) > 1 and sys.argv[1] == "time"
    Gs = [int(a) for a in sys.argv[2:]] or [8]
    n = 100_000 if timing or jax.default_backend() != "cpu" else 20_000
    hw = 512 if n == 100_000 else 256
    mi = 354304 if hw == 512 else 65536
    scene, cam = make_scene(n, hw)
    gx = gy = hw // TILE
    ntiles = gx * gy
    ch = 3
    CH1 = ch + 1
    R, NB, NC = bs.sorted_capacities(mi, ntiles)

    proc = preprocess(scene.params.xyz, scene.params.log_scales,
                      scene.params.quats, scene.get_opacity[:, 0],
                      scene.get_features, cam, alive=scene.alive,
                      active_sh_degree=scene.active_sh_degree,
                      max_sh_degree=scene.max_sh_degree)
    sb = jax.block_until_ready(
        jax.jit(lambda p: bs.sorted_bin(p, gx, gy, mi))(proc))

    f8 = pc.make_forward_tile(ntiles, gx, ch)
    (o8,) = jax.jit(lambda b: f8(sb.tile_bounds, b))(sb.blocks)
    acc0 = o8[..., :CH1]
    t_fin0 = o8[..., CH1]
    nc0 = o8[..., CH1 + 1]
    gall0 = jnp.concatenate(
        [jnp.ones_like(acc0), acc0, jnp.ones_like(t_fin0)[..., None],
         t_fin0[..., None], nc0[..., None]], axis=-1)
    maxnc0 = jnp.max(nc0, axis=-1).astype(jnp.int32)
    cnt_t = sb.tile_bounds[1:] - sb.tile_bounds[:-1]
    nck = (cnt_t + 127) // 128
    cstart0 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nck, dtype=jnp.int32)])
    b8 = pc.make_backward_tile(ntiles, gx, ch, NC, R)
    (g8,) = jax.jit(lambda b, g: b8(sb.tile_bounds, cstart0, maxnc0, b, g))(
        sb.blocks, gall0)

    for G in Gs:
        ngr = -(-ntiles // G)
        f10 = make_forward_group(ntiles, gx, ch, R, G)
        (o10,) = jax.jit(lambda b: f10(sb.tile_bounds, b))(sb.blocks)
        o10f = o10.reshape(ngr * G, PX, CH1 + 2)[:ntiles]
        d = float(jnp.max(jnp.abs(o8 - o10f)))
        print(f"G={G} fwd parity max|d| = {d:.3e}", flush=True)
        assert d == 0.0

        # backward needs gall padded to the group grid
        gall_pad = jnp.zeros((ngr * G, PX, 2 * CH1 + 3), jnp.float32)
        gall_pad = gall_pad.at[:ntiles].set(gall0).reshape(
            ngr, G, PX, 2 * CH1 + 3)
        b10 = make_backward_group(ntiles, gx, ch, NC, R, G)
        (g10,) = jax.jit(
            lambda b, g: b10(sb.tile_bounds, cstart0, maxnc0, b, g))(
            sb.blocks, gall_pad)
        d = float(jnp.max(jnp.abs(g8 - g10)))
        print(f"G={G} bwd parity max|d| = {d:.3e}", flush=True)
        assert d == 0.0

        if timing:
            timeit = timer(20)
            @jax.jit
            def loopf(blocks):
                def body(i, a):
                    blk = blocks.at[0, 0].add(1e-9 * i)
                    (o,) = f10(sb.tile_bounds, blk)
                    return a * 0.5 + jnp.sum(o[0, 0, 0])
                return jax.lax.fori_loop(0, 20, body, 0.0)
            timeit(f"v10 fwd G={G}", loopf, sb.blocks)

            @jax.jit
            def loopb(blocks, gall):
                def body(i, a):
                    blk = blocks.at[0, 0].add(1e-9 * i)
                    (gg,) = b10(sb.tile_bounds, cstart0, maxnc0, blk, gall)
                    return a * 0.5 + jnp.sum(gg[0][::4096])
                return jax.lax.fori_loop(0, 20, body, 0.0)
            timeit(f"v10 bwd G={G}", loopb, sb.blocks, gall_pad)

    if timing:
        timeit = timer(20)
        @jax.jit
        def loopf8(blocks):
            def body(i, a):
                blk = blocks.at[0, 0].add(1e-9 * i)
                (o,) = f8(sb.tile_bounds, blk)
                return a * 0.5 + jnp.sum(o[0, 0])
            return jax.lax.fori_loop(0, 20, body, 0.0)
        timeit("v8 fwd per-tile", loopf8, sb.blocks)

        @jax.jit
        def loopb8(blocks, gall):
            def body(i, a):
                blk = blocks.at[0, 0].add(1e-9 * i)
                (gg,) = b8(sb.tile_bounds, cstart0, maxnc0, blk, gall)
                return a * 0.5 + jnp.sum(gg[0][::4096])
            return jax.lax.fori_loop(0, 20, body, 0.0)
        timeit("v8 bwd per-tile", loopb8, sb.blocks, gall0)


if __name__ == "__main__":
    main()
