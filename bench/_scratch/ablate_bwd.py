"""Cumulative ablation of the v8 backward tile kernel compute."""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/bench")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from profiler import make_scene, timer
from gaussianeditor_tpu.ops import binning_sorted as bs
from gaussianeditor_tpu.ops import pallas_composite as pc
from gaussianeditor_tpu.ops.preprocess import TILE, preprocess
from gaussianeditor_tpu.ops.composite import ALPHA_MAX, ALPHA_MIN, T_MIN

CHUNK, PX = pc.CHUNK, pc.PX
mi = 354304
n_iter = 20
scene, cam = make_scene(100_000, 512)
gx = gy = 512 // TILE
ntiles = gx * gy
ch = 3
CH1 = ch + 1
P = 7 + ch
F = pc._pad8(P + 1)
GF = pc._pad8(6 + CH1 + 1)
R, NB, NC = bs.sorted_capacities(mi, ntiles)
R_sent = float(R)
timeit = timer(n_iter)

proc = preprocess(scene.params.xyz, scene.params.log_scales,
                  scene.params.quats, scene.get_opacity[:, 0],
                  scene.get_features, cam, alive=scene.alive,
                  active_sh_degree=scene.active_sh_degree,
                  max_sh_degree=scene.max_sh_degree)
sb = jax.block_until_ready(jax.jit(lambda p: bs.sorted_bin(p, gx, gy, mi))(proc))

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
cstart0 = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(nck, dtype=jnp.int32)])

# levels: 1 dma+power  2 +alpha/masks/lf  3 +excl dot3 + T_k
#         4 +c_hat/w/u   5 +Su dot3+sterm/dpower  6 +gfeat  7 +moments  8 full
def make_variant(level):
    def kernel(bounds_ref, cstart_ref, maxnc_ref, hbm_ref, gall_ref,
               out_ref, buf_sc, osc_sc, logt_sc, s_sc, isem, osem):
        t = pl.program_id(0)
        pixl_x, pixl_y = pc._pix_coords_local()
        ox = (t % gx * TILE).astype(jnp.float32)
        oy = (t // gx * TILE).astype(jnp.float32)
        row0 = bounds_ref[t]
        cnt = bounds_ref[t + 1] - row0
        n_chunks = (cnt + CHUNK - 1) // CHUNK
        c0 = cstart_ref[t]
        maxnc_t = maxnc_ref[t]
        q0 = row0 // CHUNK
        shift = row0 - q0 * CHUNK

        def dma(b, slot):
            off = pl.multiple_of((q0 + b) * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                hbm_ref.at[:F, pl.ds(off, CHUNK)], buf_sc.at[slot], isem.at[slot])

        def odma(j):
            slot = jax.lax.rem(j, 2)
            ooff = pl.multiple_of((c0 + j) * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                osc_sc.at[slot], out_ref.at[:, pl.ds(ooff, CHUNK)], osem.at[slot])

        @pl.when(n_chunks > 0)
        def _start():
            dma(0, 0).start()
            dma(1, 1).start()
            logt_sc[:] = jnp.zeros((PX, 1), jnp.float32)
            s_sc[:] = jnp.zeros((PX, 1), jnp.float32)

        gall = gall_ref[0]
        g_acc = gall[:, :CH1]
        gT_term = (gall[:, 2 * CH1] * gall[:, 2 * CH1 + 1])[:, None]
        nc = gall[:, 2 * CH1 + 2][:, None]
        stot = jnp.sum(gall[:, :CH1] * gall[:, CH1:2 * CH1], axis=-1, keepdims=True)
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
            @pl.when(k >= 2)
            def _wo():
                odma(k - 2).wait()
            x2 = jnp.concatenate([buf_sc[s0], buf_sc[s1]], axis=1)
            buf = pltpu.roll(x2, -shift, axis=1)[:, :CHUNK]
            n_valid = jnp.minimum(cnt - k * CHUNK, CHUNK)
            srk = jnp.where(lane < n_valid, buf[P:P + 1], R_sent)
            xs = buf[0:1, :] - ox
            ys = buf[1:2, :] - oy
            cxx = buf[2:3, :]; cxy = buf[3:4, :]; cyy = buf[4:5, :]; op = buf[5:6, :]
            featd = jnp.concatenate([buf[7:7 + ch, :], buf[6:7, :]], axis=0)
            dx = xs - pixl_x; dy = ys - pixl_y
            power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
            def emit(rows_or_scalar, lvl):
                r = jnp.zeros((GF, CHUNK), jnp.float32) + rows_or_scalar * 1e-30
                osc_sc[oslot] = r
            if level == 1:
                emit(jnp.sum(power), 1)
                odma(k).start()
                return carry
            g_exp = jnp.exp(power)
            alpha_raw = op * g_exp
            alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
            pos = (k * CHUNK + lane).astype(jnp.float32)
            skipped = (power > 0.0) | (alpha < ALPHA_MIN) | (lane >= n_valid)
            m = (~skipped) & (pos < nc)
            alpha_m = jnp.where(m, alpha, 0.0)
            lf = jnp.log1p(-alpha_m)
            if level == 2:
                emit(jnp.sum(lf), 2)
                odma(k).start()
                return carry
            excl = pc._dot3(lf, pc._tri_excl())
            total = excl[:, CHUNK - 1:CHUNK] + lf[:, CHUNK - 1:CHUNK]
            T_k = jnp.exp(logt_sc[:] + excl)
            if level == 3:
                emit(jnp.sum(T_k), 3)
                logt_sc[:] = logt_sc[:] + total
                odma(k).start()
                return carry
            c_hat = pc._dot_high(g_acc, featd, ((1,), (0,)))
            w = alpha_m * T_k
            u = w * c_hat
            if level == 4:
                emit(jnp.sum(u), 4)
                logt_sc[:] = logt_sc[:] + total
                odma(k).start()
                return carry
            Su = pc._dot3(u, pc._tri_incl())
            u_total = Su[:, CHUNK - 1:CHUNK]
            pre = stot - s_sc[:] + gT_term
            sterm = pre - Su
            f = 1.0 - alpha_m
            amc = jnp.where(alpha_raw < ALPHA_MAX, alpha_m, 0.0)
            dpower = amc * (T_k * c_hat - sterm / f)
            if level == 5:
                emit(jnp.sum(dpower), 5)
                logt_sc[:] = logt_sc[:] + total
                s_sc[:] = s_sc[:] + u_total
                odma(k).start()
                return carry
            gfeat = pc._dot_high(g_acc, w, ((0,), (0,)))
            if level == 6:
                emit(jnp.sum(gfeat) + jnp.sum(dpower), 6)
                logt_sc[:] = logt_sc[:] + total
                s_sc[:] = s_sc[:] + u_total
                odma(k).start()
                return carry
            pxv = pixl_x[:, 0]; pyv = pixl_y[:, 0]
            P6 = jnp.stack([jnp.ones_like(pxv), pxv, pyv, pxv * pxv, pyv * pyv, pxv * pyv], axis=0)
            M = pc._dot_high(P6, dpower, ((1,), (0,)))
            m0, mx, my, mxx, myy, mxy = (M[i:i + 1, :] for i in range(6))
            sdx = xs * m0 - mx
            sdy = ys * m0 - my
            sdxx = xs * xs * m0 - 2.0 * xs * mx + mxx
            sdyy = ys * ys * m0 - 2.0 * ys * my + myy
            sdxy = xs * ys * m0 - xs * my - ys * mx + mxy
            dop_row = m0 * jnp.where(op > 0.0, 1.0 / op, 0.0)
            if level == 7:
                emit(jnp.sum(sdx + sdy + sdxx + sdyy + sdxy + dop_row) + jnp.sum(gfeat), 7)
                logt_sc[:] = logt_sc[:] + total
                s_sc[:] = s_sc[:] + u_total
                odma(k).start()
                return carry
            rows = jnp.concatenate(
                [-(cxx * sdx + cxy * sdy), -(cyy * sdy + cxy * sdx),
                 -0.5 * sdxx, -sdxy, -0.5 * sdyy, dop_row, gfeat, srk,
                 jnp.zeros((pad, CHUNK), jnp.float32)], axis=0)
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec((1, PX, 2 * CH1 + 3), lambda t, b, c, m: (t, 0, 0))],
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        scratch_shapes=[pltpu.VMEM((3, F, CHUNK), jnp.float32),
                        pltpu.VMEM((2, GF, CHUNK), jnp.float32),
                        pltpu.VMEM((PX, 1), jnp.float32),
                        pltpu.VMEM((PX, 1), jnp.float32),
                        pltpu.SemaphoreType.DMA((3,)),
                        pltpu.SemaphoreType.DMA((2,))])
    return pl.pallas_call(kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((GF, NC * CHUNK), jnp.float32)])

prev = 0.0
for level, name in [(1, "dma+power"), (2, "alpha/masks/lf"), (3, "excl+T_k"),
                    (4, "c_hat/w/u"), (5, "Su+dpower"), (6, "gfeat"),
                    (7, "moments"), (8, "full")]:
    call = make_variant(level)
    @jax.jit
    def loop(blocks, gall):
        def body(i, a):
            blk = blocks.at[0, 0].add(1e-9 * i)
            (g2,) = call(sb.tile_bounds, cstart0, maxnc0, blk, gall)
            return a * 0.5 + jnp.sum(g2[0][::4096])
        return jax.lax.fori_loop(0, n_iter, body, 0.0)
    ms = timeit(f"bwd level {level} {name}", loop, sb.blocks, gall0)
    print(f"{'':40s} (+{ms - prev:.3f})", flush=True)
    prev = ms
