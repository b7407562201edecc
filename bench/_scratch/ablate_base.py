"""Decompose the v8 tile kernels' ~2.4 ms 'base' cost:
grid sequencing | chunk loop | input DMA ring | concat+roll | output DMA.

Tiles average only ~3 chunks (NC~2800 over 1024 tiles), so the per-tile
DMA ring never warms up: tile-start DMA latency may be exposed ~1024x.
This measures each layer cumulatively (backward-kernel structure).
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
timeit = timer(n_iter)

proc = preprocess(scene.params.xyz, scene.params.log_scales,
                  scene.params.quats, scene.get_opacity[:, 0],
                  scene.get_features, cam, alive=scene.alive,
                  active_sh_degree=scene.active_sh_degree,
                  max_sh_degree=scene.max_sh_degree)
sb = jax.block_until_ready(jax.jit(lambda p: bs.sorted_bin(p, gx, gy, mi))(proc))
cnt_t = sb.tile_bounds[1:] - sb.tile_bounds[:-1]
nck = (cnt_t + 127) // 128
cstart0 = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(nck, dtype=jnp.int32)])
print(f"tiles={ntiles} NC={NC} total_chunks={int(jnp.sum(nck))} "
      f"mean_chunks/tile={float(jnp.mean(nck)):.2f} max={int(jnp.max(nck))}",
      flush=True)


def make_variant(mode):
    def kernel(bounds_ref, cstart_ref, hbm_ref, out_ref,
               buf_sc, osc_sc, acc_sc, isem, osem):
        t = pl.program_id(0)
        row0 = bounds_ref[t]
        cnt = bounds_ref[t + 1] - row0
        n_chunks = (cnt + CHUNK - 1) // CHUNK
        c0 = cstart_ref[t]
        q0 = row0 // CHUNK
        shift = row0 - q0 * CHUNK
        pixl_x, pixl_y = pc._pix_coords_local()

        def dma(b, slot):
            off = pl.multiple_of((q0 + b) * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                hbm_ref.at[:F, pl.ds(off, CHUNK)], buf_sc.at[slot], isem.at[slot])

        def odma(j):
            slot = jax.lax.rem(j, 2)
            ooff = pl.multiple_of((c0 + j) * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                osc_sc.at[slot], out_ref.at[:, pl.ds(ooff, CHUNK)], osem.at[slot])

        if mode == "seq":
            # grid sequencing + scalar reads only
            acc_sc[:] = acc_sc[:] + jnp.float32(cnt)
            return

        use_idma = mode in ("idma", "roll", "odma")
        use_roll = mode in ("roll", "odma")
        use_odma = mode == "odma"

        if use_idma:
            @pl.when(n_chunks > 0)
            def _start():
                dma(0, 0).start()
                dma(1, 1).start()

        def body(k, carry):
            if use_idma:
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
            if use_odma:
                @pl.when(k >= 2)
                def _wo():
                    odma(k - 2).wait()
            if use_roll:
                x2 = jnp.concatenate([buf_sc[s0], buf_sc[s1]], axis=1)
                buf = pltpu.roll(x2, -shift, axis=1)[:, :CHUNK]
                xs = buf[0:1, :]
                ys = buf[1:2, :]
                dx = xs - pixl_x
                dy = ys - pixl_y
                power = -0.5 * (buf[2:3] * dx * dx + buf[4:5] * dy * dy) \
                    - buf[3:4] * dx * dy
                acc_sc[:] = acc_sc[:] + jnp.sum(power, axis=1, keepdims=True)
            elif use_idma:
                # consume the DMA'd buffer without the roll
                acc_sc[:] = acc_sc[:] + jnp.sum(buf_sc[s0][0:1, 0:1])
            else:
                acc_sc[:] = acc_sc[:] * 0.99999 + jnp.float32(k)
            if use_odma:
                osc_sc[jax.lax.rem(k, 2)] = jnp.zeros((GF, CHUNK), jnp.float32) + acc_sc[0, 0] * 1e-30
                odma(k).start()
            return carry

        jax.lax.fori_loop(0, n_chunks, body, 0)
        if use_odma:
            @pl.when(n_chunks >= 2)
            def _d2():
                odma(n_chunks - 2).wait()
            @pl.when(n_chunks >= 1)
            def _d1():
                odma(n_chunks - 1).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        scratch_shapes=[pltpu.VMEM((3, F, CHUNK), jnp.float32),
                        pltpu.VMEM((2, GF, CHUNK), jnp.float32),
                        pltpu.VMEM((PX, 1), jnp.float32),
                        pltpu.SemaphoreType.DMA((3,)),
                        pltpu.SemaphoreType.DMA((2,))])
    return pl.pallas_call(kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((GF, NC * CHUNK), jnp.float32)])


prev = 0.0
for mode, name in [("seq", "grid sequencing only"),
                   ("loop", "+ chunk fori loop"),
                   ("idma", "+ input DMA ring"),
                   ("roll", "+ concat/roll/power"),
                   ("odma", "+ output DMA ring")]:
    call = make_variant(mode)
    @jax.jit
    def loop(blocks):
        def body(i, a):
            blk = blocks.at[0, 0].add(1e-9 * i)
            (g2,) = call(sb.tile_bounds, cstart0, blk)
            return a * 0.5 + jnp.sum(g2[0][::4096])
        return jax.lax.fori_loop(0, n_iter, body, 0.0)
    ms = timeit(f"base [{mode}] {name}", loop, sb.blocks)
    print(f"{'':40s} (+{ms - prev:.3f})", flush=True)
    prev = ms
