"""MXU-power experiment: evaluate the per-(pixel,instance) quadratic
via a [PX,6] x [6,CHUNK] HIGHEST matmul with tile-local coordinates,
vs the current VPU elementwise chain. Measures speed AND accuracy."""
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops import binning_sorted as bs
from gaussianeditor_tpu.ops.pallas_composite import (
    _pix_coords, _tri_incl, _dot, _pad8, CHUNK, PX)
from gaussianeditor_tpu.ops.composite import ALPHA_MAX, ALPHA_MIN, T_MIN

n = 100_000; hw = 512; MI = 393_216
rng = np.random.RandomState(0)
quats = rng.randn(n,4).astype(np.float32); quats/=np.linalg.norm(quats,axis=1,keepdims=True)
params = GaussianParams(
    xyz=jnp.asarray(rng.uniform(-1,1,(n,3)).astype(np.float32)),
    features_dc=jnp.asarray(rng.randn(n,1,3).astype(np.float32)*0.3),
    features_rest=jnp.asarray(np.zeros((n,15,3),np.float32)),
    opacity_raw=jnp.asarray(rng.uniform(-1,1,(n,1)).astype(np.float32)),
    log_scales=jnp.asarray(np.log(rng.uniform(0.004,0.02,(n,3))).astype(np.float32)),
    quats=jnp.asarray(quats))
scene = GaussianScene.create(params, max_sh_degree=3, active_sh_degree=3)
cam = lookat_camera(np.array([0,0,-4.]), np.zeros(3), np.array([0,1.,0]), 0.8,0.8,hw,hw)
gx = gy = hw//TILE; ntiles = gx*gy
R, NB, NC = bs.sorted_capacities(MI, ntiles)
ch = 3; CH1 = 4; F = 16
N = 30
OVERHEAD = None

def bench(name, body0, *args):
    global OVERHEAD
    def fn(*a):
        def body(i, acc):
            return acc * 0.5 + body0(i, *a)
        return jax.lax.fori_loop(0, N, body, 0.0)
    f = jax.jit(fn)
    float(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(f(*args))
        best = min(best, time.perf_counter() - t0)
    if OVERHEAD is None:
        OVERHEAD = best
        print(f"{name}: total {best*1000:.2f} ms (baseline)", flush=True)
    else:
        print(f"{name}: {(best - OVERHEAD)/N*1000:.3f} ms/iter", flush=True)

def pre(s):
    return preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
        s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
        active_sh_degree=3, max_sh_degree=3)

p0 = jax.tree.map(jax.lax.stop_gradient, jax.jit(pre)(scene))
sb0 = jax.jit(lambda p: bs.sorted_bin(p, gx, gy, MI))(p0)


def make_fwd(variant):
    def kernel(ct_ref, cf_ref, nv_ref, co_ref, qb_ref, sf_ref,
               b0_ref, b1_ref, out_ref, done_sc):
        c = pl.program_id(0)
        tile = ct_ref[c]
        tile_x = tile % gx
        tile_y = tile // gx
        pixf_x, pixf_y = _pix_coords(tile_x, tile_y)

        @pl.when(cf_ref[c] == 1)
        def _init():
            out_ref[0] = jnp.concatenate(
                [jnp.zeros((PX, CH1), jnp.float32),
                 jnp.ones((PX, 1), jnp.float32),
                 jnp.zeros((PX, 1), jnp.float32)], axis=1)
            done_sc[:] = jnp.zeros((PX, 1), jnp.float32)

        n_valid = nv_ref[c]
        not_all_done = jnp.sum(done_sc[:]) < PX

        @pl.when((n_valid > 0) & not_all_done)
        def _compute():
            x2 = jnp.concatenate(
                [b0_ref[0, :7 + ch], b1_ref[0, :7 + ch]], axis=1)
            buf = pltpu.roll(x2, -sf_ref[c], axis=1)[:, :CHUNK]
            xs = buf[0:1, :]
            ys = buf[1:2, :]
            cxx = buf[2:3, :]
            cxy = buf[3:4, :]
            cyy = buf[4:5, :]
            op = buf[5:6, :]
            T = out_ref[0, :, CH1][:, None]
            done = done_sc[:]

            if variant == "vpu":
                dx = xs - pixf_x
                dy = ys - pixf_y
                power = (-0.5 * (cxx * dx * dx + cyy * dy * dy)
                         - cxy * dx * dy)
            else:
                # tile-local quadratic-basis MXU evaluation
                ox = (tile_x * TILE).astype(jnp.float32)
                oy = (tile_y * TILE).astype(jnp.float32)
                xl = xs - ox                      # [1, CHUNK]
                yl = ys - oy
                pxl = pixf_x[:, 0] - ox           # [PX]
                pyl = pixf_y[:, 0] - oy
                c1 = (-0.5 * (cxx * xl * xl + cyy * yl * yl)
                      - cxy * xl * yl)
                cpx = cxx * xl + cxy * yl
                cpy = cyy * yl + cxy * xl
                coef = jnp.concatenate(
                    [c1, cpx, cpy, -0.5 * cxx, -0.5 * cyy, -cxy], axis=0)
                P6 = jnp.stack(
                    [jnp.ones_like(pxl), pxl, pyl, pxl * pxl, pyl * pyl,
                     pxl * pyl], axis=1)          # [PX, 6]
                power = _dot(P6, coef, ((1,), (0,)))

            alpha = jnp.minimum(ALPHA_MAX,
                                op * jnp.exp(jnp.minimum(power, 0.0)))
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            skipped = (power > 0.0) | (alpha < ALPHA_MIN) | (lane >= n_valid)
            lf = jnp.where(skipped, 0.0, jnp.log1p(-alpha))
            cum = _dot(lf, _tri_incl(), ((1,), (0,)))
            TP = T * jnp.exp(cum)
            not_done_px = done < 0.5
            contributes = not_done_px & (~skipped) & (TP >= T_MIN)
            crossed = jnp.any((~skipped) & (TP < T_MIN), axis=-1,
                              keepdims=True)
            done_sc[:] = jnp.maximum(done, crossed.astype(jnp.float32))
            w = jnp.where(contributes, alpha * TP / (1.0 - alpha), 0.0)
            featd = jnp.concatenate([buf[7:7 + ch, :], buf[6:7, :]], axis=0)
            acc_new = out_ref[0, :, :CH1] + _dot(w, featd, ((1,), (1,)))
            T_new = T * jnp.exp(jnp.sum(jnp.where(contributes, lf, 0.0),
                                        axis=-1, keepdims=True))
            pos1 = co_ref[c] + lane + 1
            nc_new = jnp.max(jnp.where(contributes, pos1, 0)
                             .astype(jnp.float32), axis=-1, keepdims=True)
            nc_upd = jnp.maximum(out_ref[0, :, CH1 + 1][:, None], nc_new)
            out_ref[0] = jnp.concatenate([acc_new, T_new, nc_upd], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((1, F, CHUNK),
                         lambda c, ct, cf, nv, co, qb, sf: (qb[c], 0, 0)),
            pl.BlockSpec((1, F, CHUNK),
                         lambda c, ct, cf, nv, co, qb, sf: (qb[c] + 1, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, PX, CH1 + 2),
                         lambda c, ct, cf, nv, co, qb, sf: (ct[c], 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((PX, 1), jnp.float32)],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ntiles, PX, CH1 + 2), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )

def fdep(i):
    return 1 + 1e-9 * i.astype(jnp.float32)

outs = {}
bench("EMPTY", lambda i: i.astype(jnp.float32))
for v in ("vpu", "mxu"):
    call = make_fwd(v)
    def st(i, call=call):
        (out,) = call(sb0.chunk_tile, sb0.chunk_first, sb0.chunk_nvalid,
                      sb0.chunk_offset, sb0.qblk, sb0.shift,
                      sb0.blocks * fdep(i), sb0.blocks * fdep(i))
        return jnp.sum(out)
    bench(f"fwd kernel [{v}]", st)
    (outs[v],) = jax.jit(lambda call=call: call(
        sb0.chunk_tile, sb0.chunk_first, sb0.chunk_nvalid,
        sb0.chunk_offset, sb0.qblk, sb0.shift, sb0.blocks, sb0.blocks))()

a, b = np.asarray(outs["vpu"]), np.asarray(outs["mxu"])
d = np.abs(a - b)
print("acc/T abs err: max", d[..., :CH1+1].max(),
      "p99.5", np.percentile(d[..., :CH1+1], 99.5), flush=True)
print("n_contrib mismatches:", int((a[...,CH1+1] != b[...,CH1+1]).sum()),
      "/", a[...,CH1+1].size, flush=True)
print("done", flush=True)
