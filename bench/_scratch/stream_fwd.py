"""Streaming-ring v9 forward prototype: global cross-tile DMA ring.

The sorted payload is consumed in globally sequential block order
(tiles' row ranges are contiguous, overlapping by <=1 block), so ONE
persistent ring streams blocks across all 1024 grid steps instead of
re-warming a per-tile ring (~3 chunks/tile => tile-start DMA latency
exposed ~1024x). Scalar SMEM state: head (next block to start),
waited (next block to wait).

Parity test (interpret mode on CPU): v9 output == v8 output.
Usage: JAX_PLATFORMS=cpu python stream_fwd.py  (parity)
       python stream_fwd.py time                (chip timing)
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
S = 8    # ring slots
LA = 4   # lookahead blocks in flight beyond the chunk window


def make_forward_stream(n_tiles: int, grid_x: int, ch: int, r_budget: int):
    CH1 = ch + 1
    F = pc._pad8(7 + ch + 1)
    OUTC = CH1 + 2
    NBLK = r_budget // CHUNK + 1  # payload blocks ([FTAB, R+CHUNK])

    def kernel(bounds_ref, hbm_ref, out_ref, buf_sc, st_sc, sem):
        t = pl.program_id(0)
        pixf_x, pixf_y = pc._pix_coords(t % grid_x, t // grid_x)
        row0 = bounds_ref[t]
        cnt = bounds_ref[t + 1] - row0
        n_chunks = (cnt + CHUNK - 1) // CHUNK
        q0 = row0 // CHUNK
        shift = row0 - q0 * CHUNK

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

        @pl.when(t == 0)
        def _seed():
            st_sc[0] = q0
            st_sc[1] = q0

        # tile-start catch-up: head -> min(q0+2+LA, NBLK). At t==0 this
        # is 2+LA issues; steady-state <=1 (see invariant in docstring).
        for _ in range(LA + 2):
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
            # keep LA blocks in flight past the chunk window
            @pl.when((st_sc[0] < q0 + k + 2 + LA) & (st_sc[0] < NBLK))
            def _pf():
                start_next()
            # blocks q0+k, q0+k+1 must be waited (<=2 per chunk)
            for _ in range(2):
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
            power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
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

        # drain the in-flight lookahead at the last tile
        @pl.when(t == n_tiles - 1)
        def _drain():
            for _ in range(LA + 2):
                @pl.when(st_sc[1] < st_sc[0])
                def _dw():
                    wait_next()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[pl.BlockSpec((1, PX, OUTC), lambda t, b: (t, 0, 0))],
        scratch_shapes=[
            pltpu.VMEM((S, F, CHUNK), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((S,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, PX, OUTC), jnp.float32)],
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
    R, NB, NC = bs.sorted_capacities(mi, ntiles)

    proc = preprocess(scene.params.xyz, scene.params.log_scales,
                      scene.params.quats, scene.get_opacity[:, 0],
                      scene.get_features, cam, alive=scene.alive,
                      active_sh_degree=scene.active_sh_degree,
                      max_sh_degree=scene.max_sh_degree)
    sb = jax.block_until_ready(
        jax.jit(lambda p: bs.sorted_bin(p, gx, gy, mi))(proc))

    f8 = pc.make_forward_tile(ntiles, gx, ch)
    f9 = make_forward_stream(ntiles, gx, ch, R)
    (o8,) = jax.jit(lambda b: f8(sb.tile_bounds, b))(sb.blocks)
    (o9,) = jax.jit(lambda b: f9(sb.tile_bounds, b))(sb.blocks)
    d = float(jnp.max(jnp.abs(o8 - o9)))
    print(f"parity max|v8-v9| = {d:.3e}", flush=True)
    assert d == 0.0, "v9 must match v8 bitwise"

    if timing:
        timeit = timer(20)
        for name, call in [("v8 per-tile ring", f8), ("v9 stream ring", f9)]:
            @jax.jit
            def loop(blocks):
                def body(i, a):
                    blk = blocks.at[0, 0].add(1e-9 * i)
                    (o,) = call(sb.tile_bounds, blk)
                    return a * 0.5 + jnp.sum(o[0, 0])
                return jax.lax.fori_loop(0, 20, body, 0.0)
            timeit(name, loop, sb.blocks)


if __name__ == "__main__":
    main()
