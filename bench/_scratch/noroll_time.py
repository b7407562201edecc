"""Timing-only upper bound: v8 kernels with the concat+roll window
extraction replaced by a raw aligned-block read (WRONG VALUES — timing
only). Establishes the ceiling for an aligned-tile-layout redesign.
Also times a per-block-roll + lane-select variant (CORRECT values) that
halves roll lanes and drops the [16,256] concat materialization.
"""
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
scene, cam = make_scene(100_000, 512)
gx = gy = 512 // TILE
ntiles = gx * gy
ch = 3
CH1 = ch + 1
F = pc._pad8(7 + ch + 1)
OUTC = CH1 + 2
R, NB, NC = bs.sorted_capacities(mi, ntiles)
timeit = timer(20)

proc = preprocess(scene.params.xyz, scene.params.log_scales,
                  scene.params.quats, scene.get_opacity[:, 0],
                  scene.get_features, cam, alive=scene.alive,
                  active_sh_degree=scene.active_sh_degree,
                  max_sh_degree=scene.max_sh_degree)
sb = jax.block_until_ready(jax.jit(lambda p: bs.sorted_bin(p, gx, gy, mi))(proc))


def make_fwd(mode):
    """mode: 'roll' (production), 'none' (timing-only), 'select'
    (per-block roll + lane select, correct)."""

    def kernel(bounds_ref, hbm_ref, out_ref, buf_sc, rot_sc, sem):
        t = pl.program_id(0)
        pixf_x, pixf_y = pc._pix_coords(t % gx, t // gx)
        row0 = bounds_ref[t]
        cnt = bounds_ref[t + 1] - row0
        n_chunks = (cnt + CHUNK - 1) // CHUNK
        q0 = row0 // CHUNK
        shift = row0 - q0 * CHUNK

        def dma(b, slot):
            off = pl.multiple_of((q0 + b) * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                hbm_ref.at[:F, pl.ds(off, CHUNK)],
                buf_sc.at[slot], sem.at[slot])

        @pl.when(n_chunks > 0)
        def _start():
            dma(0, 0).start()
            dma(1, 1).start()

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        init = (
            jnp.zeros((PX, CH1), jnp.float32),
            jnp.ones((PX, 1), jnp.float32),
            jnp.zeros((PX, 1), jnp.float32),
            jnp.zeros((PX, 1), jnp.float32),
        )

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
                if mode == "select":
                    rot_sc[0] = pltpu.roll(buf_sc[0], -shift, axis=1)
            dma(k + 1, s1).wait()

            if mode == "roll":
                x2 = jnp.concatenate([buf_sc[s0], buf_sc[s1]], axis=1)
                buf = pltpu.roll(x2, -shift, axis=1)[:, :CHUNK]
            elif mode == "none":
                buf = buf_sc[s0][:, :CHUNK]
            else:  # select
                rot_sc[s1] = pltpu.roll(buf_sc[s1], -shift, axis=1)
                buf = jnp.where(lane < CHUNK - shift, rot_sc[s0],
                                rot_sc[s1])
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
            skipped = (power > 0.0) | (alpha < ALPHA_MIN) | (lane >= n_valid)
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
            featd = jnp.concatenate([buf[7:7 + ch, :], buf[6:7, :]], axis=0)
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
        out_ref[0] = jnp.concatenate([acc, T, ncv], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[pl.BlockSpec((1, PX, OUTC), lambda t, b: (t, 0, 0))],
        scratch_shapes=[
            pltpu.VMEM((3, F, CHUNK), jnp.float32),
            pltpu.VMEM((3, F, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ntiles, PX, OUTC), jnp.float32)],
        interpret=pc._interpret(),
    )


f_roll = make_fwd("roll")
f_none = make_fwd("none")
f_sel = make_fwd("select")
(o_roll,) = jax.jit(lambda b: f_roll(sb.tile_bounds, b))(sb.blocks)
(o_sel,) = jax.jit(lambda b: f_sel(sb.tile_bounds, b))(sb.blocks)
d = float(jnp.max(jnp.abs(o_roll - o_sel)))
print(f"select parity max|d| = {d:.3e}", flush=True)
assert d == 0.0

for name, call in [("fwd roll(prod)", f_roll), ("fwd NOROLL(bound)", f_none),
                   ("fwd block-roll+select", f_sel)]:
    @jax.jit
    def loop(blocks):
        def body(i, a):
            blk = blocks.at[0, 0].add(1e-9 * i)
            (o,) = call(sb.tile_bounds, blk)
            return a * 0.5 + jnp.sum(o[0, 0])
        return jax.lax.fori_loop(0, 20, body, 0.0)
    timeit(name, loop, sb.blocks)
