"""Streaming-ring v9 backward prototype: global input ring (as in
stream_fwd) + GLOBAL sequential output ring. Output chunks are written
at strictly increasing global offsets (c0+j), so a 4-slot ring with a
single global index stream replaces the per-tile 2-slot ring and its
per-tile drains (2 exposed DMA waits x 1024 tiles). The tail sentinel
fill continues the same stream at the last tile.

Parity (interpret, CPU): v9 output == v8 output bitwise.
Usage: JAX_PLATFORMS=cpu python stream_bwd.py    (parity)
       python stream_bwd.py time                  (chip timing)
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
S = 8    # input ring slots
LA = 4   # input lookahead
OS = 4   # output ring slots


def make_backward_stream(n_tiles: int, grid_x: int, ch: int,
                         num_chunks: int, r_budget: int):
    CH1 = ch + 1
    P = 7 + ch
    F = pc._pad8(P + 1)
    GF = pc._pad8(6 + CH1 + 1)
    R_sent = float(r_budget)
    NBLK = r_budget // CHUNK + 1

    def kernel(bounds_ref, cstart_ref, maxnc_ref, hbm_ref, gall_ref,
               out_ref, buf_sc, osc_sc, logt_sc, s_sc, st_sc, isem, osem):
        t = pl.program_id(0)
        pixl_x, pixl_y = pc._pix_coords_local()
        ox = (t % grid_x * TILE).astype(jnp.float32)
        oy = (t // grid_x * TILE).astype(jnp.float32)
        row0 = bounds_ref[t]
        cnt = bounds_ref[t + 1] - row0
        n_chunks = (cnt + CHUNK - 1) // CHUNK
        c0 = cstart_ref[t]
        maxnc_t = maxnc_ref[t]
        q0 = row0 // CHUNK
        shift = row0 - q0 * CHUNK

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

        @pl.when(t == 0)
        def _seed():
            st_sc[0] = q0
            st_sc[1] = q0

        for _ in range(LA + 2):
            @pl.when((st_sc[0] < q0 + 2 + LA) & (st_sc[0] < NBLK)
                     & (n_chunks > 0))
            def _cu():
                start_next()

        @pl.when(n_chunks > 0)
        def _init():
            logt_sc[:] = jnp.zeros((PX, 1), jnp.float32)
            s_sc[:] = jnp.zeros((PX, 1), jnp.float32)

        gall = gall_ref[0]
        g_acc = gall[:, :CH1]
        gT_term = (gall[:, 2 * CH1] * gall[:, 2 * CH1 + 1])[:, None]
        nc = gall[:, 2 * CH1 + 2][:, None]
        stot = jnp.sum(gall[:, :CH1] * gall[:, CH1:2 * CH1], axis=-1,
                       keepdims=True)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        pad = GF - (6 + CH1 + 1)

        def body(k, carry):
            @pl.when((st_sc[0] < q0 + k + 2 + LA) & (st_sc[0] < NBLK))
            def _pf():
                start_next()
            for _ in range(2):
                @pl.when(st_sc[1] < q0 + k + 2)
                def _w():
                    wait_next()

            x = c0 + k              # global output chunk index
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
                excl = pc._dot3(lf, pc._tri_excl())
                total = excl[:, CHUNK - 1:CHUNK] + lf[:, CHUNK - 1:CHUNK]
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
                    [jnp.ones_like(pxv), pxv, pyv, pxv * pxv, pyv * pyv,
                     pxv * pyv],
                    axis=0,
                )
                M = pc._dot_high(P6, dpower, ((1,), (0,)))
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

            out_dma(x).start()
            return carry

        jax.lax.fori_loop(0, n_chunks, body, 0)

        @pl.when(t == n_tiles - 1)
        def _tail():
            # drain input lookahead
            for _ in range(LA + 2):
                @pl.when(st_sc[1] < st_sc[0])
                def _dw():
                    wait_next()
            # sentinel-fill [cstart[T], NC) continuing the output stream
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
            # drain the last OS output DMAs
            for i in range(OS):
                xx = num_chunks - OS + i
                @pl.when(xx >= 0)
                def _do():
                    out_dma(xx).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec((1, PX, 2 * CH1 + 3),
                               lambda t, b, c, m: (t, 0, 0))],
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

    fwd_tile = pc.make_forward_tile(ntiles, gx, ch)
    (out0,) = jax.jit(lambda b: fwd_tile(sb.tile_bounds, b))(sb.blocks)
    acc0 = out0[..., :CH1]
    t_fin0 = out0[..., CH1]
    nc0 = out0[..., CH1 + 1]
    gall0 = jnp.concatenate(
        [jnp.ones_like(acc0), acc0, jnp.ones_like(t_fin0)[..., None],
         t_fin0[..., None], nc0[..., None]], axis=-1)
    maxnc0 = jnp.max(nc0, axis=-1).astype(jnp.int32)
    cnt_t = sb.tile_bounds[1:] - sb.tile_bounds[:-1]
    nck = (cnt_t + 127) // 128
    cstart0 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nck, dtype=jnp.int32)])

    b8 = pc.make_backward_tile(ntiles, gx, ch, NC, R)
    b9 = make_backward_stream(ntiles, gx, ch, NC, R)
    (g8,) = jax.jit(lambda b, g: b8(sb.tile_bounds, cstart0, maxnc0, b, g))(
        sb.blocks, gall0)
    (g9,) = jax.jit(lambda b, g: b9(sb.tile_bounds, cstart0, maxnc0, b, g))(
        sb.blocks, gall0)
    d = float(jnp.max(jnp.abs(g8 - g9)))
    print(f"parity max|v8-v9| bwd = {d:.3e}", flush=True)
    assert d == 0.0, "v9 bwd must match v8 bitwise"

    if timing:
        timeit = timer(20)
        for name, call in [("v8 bwd per-tile", b8), ("v9 bwd stream", b9)]:
            @jax.jit
            def loop(blocks, gall):
                def body(i, a):
                    blk = blocks.at[0, 0].add(1e-9 * i)
                    (g,) = call(sb.tile_bounds, cstart0, maxnc0, blk, gall)
                    return a * 0.5 + jnp.sum(g[0][::4096])
                return jax.lax.fori_loop(0, 20, body, 0.0)
            timeit(name, loop, sb.blocks, gall0)


if __name__ == "__main__":
    main()
