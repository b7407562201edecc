"""Cumulative ablation of the v8 forward tile kernel compute."""
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
F = pc._pad8(7 + ch)
R, NB, NC = bs.sorted_capacities(mi, ntiles)
timeit = timer(n_iter)

proc = preprocess(scene.params.xyz, scene.params.log_scales,
                  scene.params.quats, scene.get_opacity[:, 0],
                  scene.get_features, cam, alive=scene.alive,
                  active_sh_degree=scene.active_sh_degree,
                  max_sh_degree=scene.max_sh_degree)
sb = jax.block_until_ready(jax.jit(lambda p: bs.sorted_bin(p, gx, gy, mi))(proc))

# level: how much of the body to run
#  0 dma-only  1 +power  2 +exp/alpha/masks  3 +log1p  4 +dot3 prefix+exp
#  5 +featd dot (acc)    6 +T/crossed/nc bookkeeping (full)
def make_variant(level):
    OUTC = CH1 + 2
    def kernel(bounds_ref, hbm_ref, out_ref, buf_sc, sem):
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
                hbm_ref.at[:F, pl.ds(off, CHUNK)], buf_sc.at[slot], sem.at[slot])

        @pl.when(n_chunks > 0)
        def _start():
            dma(0, 0).start()
            dma(1, 1).start()

        init = (jnp.zeros((PX, CH1), jnp.float32), jnp.ones((PX, 1), jnp.float32),
                jnp.zeros((PX, 1), jnp.float32), jnp.zeros((PX, 1), jnp.float32))

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
            x2 = jnp.concatenate([buf_sc[s0], buf_sc[s1]], axis=1)
            buf = pltpu.roll(x2, -shift, axis=1)[:, :CHUNK]
            n_valid = jnp.minimum(cnt - k * CHUNK, CHUNK)
            xs = buf[0:1, :]; ys = buf[1:2, :]
            cxx = buf[2:3, :]; cxy = buf[3:4, :]; cyy = buf[4:5, :]; op = buf[5:6, :]
            dx = xs - pixf_x; dy = ys - pixf_y
            power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
            if level == 1:
                acc = acc + jnp.sum(power, axis=1, keepdims=True) * 1e-30
                return acc, T, ncv, done
            alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            skipped = (power > 0.0) | (alpha < ALPHA_MIN) | (lane >= n_valid)
            alpha_s = jnp.where(skipped, 0.0, alpha)
            if level == 2:
                acc = acc + jnp.sum(alpha_s, axis=1, keepdims=True) * 1e-30
                return acc, T, ncv, done
            lf = jnp.log1p(-alpha_s)
            if level == 3:
                acc = acc + jnp.sum(lf, axis=1, keepdims=True) * 1e-30
                return acc, T, ncv, done
            excl = pc._dot3(lf, pc._tri_excl())
            TPx = T * jnp.exp(excl)
            TP = TPx * (1.0 - alpha_s)
            if level == 4:
                acc = acc + jnp.sum(TP, axis=1, keepdims=True) * 1e-30
                return acc, T, ncv, done
            not_done_px = done < 0.5
            contributes = not_done_px & (~skipped) & (TP >= T_MIN)
            w = jnp.where(contributes, alpha * TPx, 0.0)
            featd = jnp.concatenate([buf[7:7 + ch, :], buf[6:7, :]], axis=0)
            acc = acc + pc._dot(w, featd, ((1,), (1,)))
            if level == 5:
                return acc, T, ncv, done
            crossed = jnp.any((~skipped) & (TP < T_MIN), axis=-1, keepdims=True)
            done = jnp.maximum(done, crossed.astype(jnp.float32))
            T = T * jnp.exp(jnp.sum(jnp.where(contributes, lf, 0.0), axis=-1, keepdims=True))
            pos1 = k * CHUNK + lane + 1
            nc_new = jnp.max(jnp.where(contributes, pos1, 0).astype(jnp.float32), axis=-1, keepdims=True)
            ncv = jnp.maximum(ncv, nc_new)
            return acc, T, ncv, done

        acc, T, ncv, _ = jax.lax.fori_loop(0, n_chunks, body, init)
        out_ref[0] = jnp.concatenate([acc, T, ncv], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[pl.BlockSpec((1, PX, OUTC), lambda t, b: (t, 0, 0))],
        scratch_shapes=[pltpu.VMEM((3, F, CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA((3,))])
    return pl.pallas_call(kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ntiles, PX, OUTC), jnp.float32)])

prev = 0.0
for level, name in [(1, "power"), (2, "exp+alpha+masks"), (3, "log1p"),
                    (4, "dot3prefix+exp"), (5, "featd dot+w"), (6, "full bookkeeping")]:
    call = make_variant(level)
    @jax.jit
    def loop(blocks):
        def body(i, a):
            blk = blocks.at[0, 0].add(1e-9 * i)
            (out,) = call(sb.tile_bounds, blk)
            return a * 0.5 + jnp.sum(out[..., :CH1])
        return jax.lax.fori_loop(0, n_iter, body, 0.0)
    ms = timeit(f"level {level} {name}", loop, sb.blocks)
    print(f"{'':40s} (+{ms - prev:.3f})", flush=True)
    prev = ms
