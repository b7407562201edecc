"""In-kernel cost attribution via perf-only ablations (results are
numerically WRONG for ablated variants — timing only).

Forward ablations: no dynamic roll, single block input, no exp(excl),
no tri-matmul prefix. Backward: no divide, no second tri (Su), no
moment matmul, no roll.

    PYTHONPATH=/root/.axon_site:/root/repo python bench/prof_r26.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops import binning_sorted as bs
from gaussianeditor_tpu.ops.pallas_composite import (
    _pix_coords, _tri_excl, _tri_incl, _dot, _pad8)
from gaussianeditor_tpu.ops.composite import ALPHA_MAX, ALPHA_MIN, T_MIN

n = 100_000
hw = 512
MI = 393_216
rng = np.random.RandomState(0)
quats = rng.randn(n, 4).astype(np.float32)
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
params = GaussianParams(
    xyz=jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32)),
    features_dc=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32) * 0.3),
    features_rest=jnp.asarray(np.zeros((n, 15, 3), np.float32)),
    opacity_raw=jnp.asarray(rng.uniform(-1, 1, (n, 1)).astype(np.float32)),
    log_scales=jnp.asarray(np.log(rng.uniform(0.004, 0.02, (n, 3))).astype(np.float32)),
    quats=jnp.asarray(quats))
scene = GaussianScene.create(params, max_sh_degree=3, active_sh_degree=3)
cam = lookat_camera(np.array([0, 0, -4.]), np.zeros(3), np.array([0, 1., 0]),
                    0.8, 0.8, hw, hw)
gx = gy = hw // TILE
ntiles = gx * gy
R, NB, NC = bs.sorted_capacities(MI, ntiles)
N = 20
ch = 3
CH1 = ch + 1
F = _pad8(7 + ch)
GF = _pad8(6 + CH1)
CHUNK = 128
PX = 256
grid_x = gx


def timeit(name, fn, *args):
    jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / N * 1000:.3f} ms/iter", flush=True)
    return best / N


def proc_of(p):
    s = scene.replace(params=p)
    return preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
                      s.get_opacity[:, 0], s.get_features, cam,
                      alive=s.alive, active_sh_degree=s.active_sh_degree,
                      max_sh_degree=s.max_sh_degree)


sb0 = jax.jit(lambda p: bs.sorted_bin(proc_of(p), gx, gy, MI))(scene.params)
sb0 = jax.tree.map(jax.block_until_ready, sb0)


def _fast_exp(x):
    """exp(x) for x <= 0, finite (our masked-alpha domain): 2^y split
    with a degree-6 Taylor of 2^f on f in [-0.5, 0.5] (rel err ~1e-7)
    + exponent bit assembly. ~16 VPU slots vs Mosaic's builtin exp."""
    y = x * 1.4426950408889634
    n = jnp.floor(y + 0.5)
    f = y - n
    # Taylor of 2^f: c_k = ln(2)^k / k!
    p = 1.0 + f * (0.6931471805599453 + f * (0.2402265069591007
        + f * (0.05550410866482158 + f * (0.009618129107628477
        + f * (0.0013333558146428443 + f * 0.00015403530393381606)))))
    nn = jnp.clip(n, -126.0, 127.0).astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        (nn + 127) << 23, jnp.float32)
    return p * scale


def _dot3(a, b_exact):
    """a @ b_exact with f32-exact result in 3 DEFAULT bf16 MXU passes:
    b_exact must be exactly representable in bf16 (0/1 triangular
    masks are); a splits into three 8-bit mantissa slices."""
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


def make_fwd(mode):
    def kernel(ct_ref, cf_ref, nv_ref, co_ref, qb_ref, sf_ref,
               b0_ref, b1_ref, out_ref, done_sc):
        c = pl.program_id(0)
        tile = ct_ref[c]
        pixf_x, pixf_y = _pix_coords(tile % grid_x, tile // grid_x)

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
            if mode == "oneblock":
                buf = b0_ref[0, :7 + ch]
            elif mode == "noroll":
                x2 = jnp.concatenate(
                    [b0_ref[0, :7 + ch], b1_ref[0, :7 + ch]], axis=1)
                buf = x2[:, :CHUNK]
            else:
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
            dx = xs - pixf_x
            dy = ys - pixf_y
            power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
            expf = _fast_exp if mode == "fastexp" else jnp.exp
            alpha = jnp.minimum(ALPHA_MAX, op * expf(jnp.minimum(power, 0.0)))
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            skipped = (power > 0.0) | (alpha < ALPHA_MIN) | (lane >= n_valid)
            alpha_s = jnp.where(skipped, 0.0, alpha)
            if mode == "pscan":
                # EXACT alternative arithmetic: exp(prefix sum of
                # log1p(-alpha)) IS the exclusive prefix product of
                # (1 - alpha); compute it directly with a Hillis-Steele
                # log-shift multiplicative scan — no log1p, no tri
                # matmul, no exp
                v = 1.0 - alpha_s
                p = v
                for s in (1, 2, 4, 8, 16, 32, 64):
                    sh = pltpu.roll(p, s, axis=1)
                    p = p * jnp.where(lane >= s, sh, 1.0)
                excl_prod = jnp.where(
                    lane >= 1, pltpu.roll(p, 1, axis=1), 1.0)
                TPx = T * excl_prod
                TP = TPx * v
                not_done_px = done < 0.5
                contributes = not_done_px & (~skipped) & (TP >= T_MIN)
                crossed = jnp.any((~skipped) & (TP < T_MIN), axis=-1,
                                  keepdims=True)
                done_sc[:] = jnp.maximum(done, crossed.astype(jnp.float32))
                w = jnp.where(contributes, alpha * TPx, 0.0)
                featd = jnp.concatenate(
                    [buf[7:7 + ch, :], buf[6:7, :]], axis=0)
                acc_new = out_ref[0, :, :CH1] + _dot(w, featd, ((1,), (1,)))
                tf = jnp.where(contributes, v, 1.0)
                for s in (1, 2, 4, 8, 16, 32, 64):
                    tf = tf * pltpu.roll(tf, s, axis=1)
                T_new = T * tf[:, 0:1]
                pos1 = co_ref[c] + lane + 1
                nc_new = jnp.max(
                    jnp.where(contributes, pos1, 0).astype(jnp.float32),
                    axis=-1, keepdims=True)
                nc_upd = jnp.maximum(out_ref[0, :, CH1 + 1][:, None], nc_new)
                out_ref[0] = jnp.concatenate(
                    [acc_new, T_new, nc_upd], axis=1)
                return
            lf = jnp.log1p(-alpha_s)
            if mode == "notri":
                excl = lf
            else:
                excl = _dot(lf, _tri_excl(), ((1,), (0,)))
            if mode == "noexp2":
                TPx = T * (1.0 + excl)
            else:
                TPx = T * expf(excl)
            TP = TPx * (1.0 - alpha_s)
            not_done_px = done < 0.5
            contributes = not_done_px & (~skipped) & (TP >= T_MIN)
            crossed = jnp.any((~skipped) & (TP < T_MIN), axis=-1,
                              keepdims=True)
            done_sc[:] = jnp.maximum(done, crossed.astype(jnp.float32))
            w = jnp.where(contributes, alpha * TPx, 0.0)
            featd = jnp.concatenate([buf[7:7 + ch, :], buf[6:7, :]], axis=0)
            acc_new = out_ref[0, :, :CH1] + _dot(w, featd, ((1,), (1,)))
            T_new = T * jnp.exp(
                jnp.sum(jnp.where(contributes, lf, 0.0), axis=-1,
                        keepdims=True))
            pos1 = co_ref[c] + lane + 1
            nc_new = jnp.max(
                jnp.where(contributes, pos1, 0).astype(jnp.float32), axis=-1,
                keepdims=True)
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
        out_shape=[jax.ShapeDtypeStruct((ntiles, PX, CH1 + 2), jnp.float32)])


def bench_fwd(mode):
    call = make_fwd(mode)

    @jax.jit
    def run(sb):
        def body(i, acc):
            blk = sb.blocks * (1 + 1e-9 * i)
            (out,) = call(sb.chunk_tile, sb.chunk_first, sb.chunk_nvalid,
                          sb.chunk_offset, sb.qblk, sb.shift, blk, blk)
            return acc * 0.5 + jnp.sum(out)
        return jax.lax.fori_loop(0, N, body, 0.0)
    timeit(f"fwd[{mode}]", run, sb0)





def make_bwd(mode):
    def kernel(ct_ref, cf_ref, nv_ref, co_ref, qb_ref, sf_ref, act_ref,
               b0_ref, b1_ref, gall_ref, grad_ref, logt_sc, s_sc, stot_sc):
        c = pl.program_id(0)
        tile = ct_ref[c]
        pixf_x, pixf_y = _pix_coords(tile % grid_x, tile // grid_x)

        @pl.when(cf_ref[c] == 1)
        def _init():
            logt_sc[:] = jnp.zeros((PX, 1), jnp.float32)
            s_sc[:] = jnp.zeros((PX, 1), jnp.float32)
            gall0 = gall_ref[0]
            stot_sc[:] = jnp.sum(
                gall0[:, :CH1] * gall0[:, CH1:2 * CH1], axis=-1,
                keepdims=True)

        n_valid = nv_ref[c]
        grad_ref[0] = jnp.zeros((GF, CHUNK), jnp.float32)

        @pl.when(act_ref[c] == 1)
        def _compute():
            x2 = jnp.concatenate(
                [b0_ref[0, :7 + ch], b1_ref[0, :7 + ch]], axis=1)
            if mode == "noroll":
                buf = x2[:, :CHUNK]
            else:
                buf = pltpu.roll(x2, -sf_ref[c], axis=1)[:, :CHUNK]
            xs = buf[0:1, :]
            ys = buf[1:2, :]
            cxx = buf[2:3, :]
            cxy = buf[3:4, :]
            cyy = buf[4:5, :]
            op = buf[5:6, :]
            featd = jnp.concatenate([buf[7:7 + ch, :], buf[6:7, :]], axis=0)
            gall = gall_ref[0]
            g_acc = gall[:, :CH1]
            gT_term = (gall[:, 2 * CH1] * gall[:, 2 * CH1 + 1])[:, None]
            nc = gall[:, 2 * CH1 + 2][:, None]
            dx = xs - pixf_x
            dy = ys - pixf_y
            power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
            expf = _fast_exp if mode == "fastexp" else jnp.exp
            g_exp = expf(jnp.minimum(power, 0.0))
            alpha_raw = op * g_exp
            alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            pos = (co_ref[c] + lane).astype(jnp.float32)
            skipped = (power > 0.0) | (alpha < ALPHA_MIN) | (lane >= n_valid)
            m = (~skipped) & (pos < nc)
            alpha_m = jnp.where(m, alpha, 0.0)
            if mode == "pscan":
                # multiplicative carry: logt_sc holds T itself, not log T
                v = 1.0 - alpha_m
                p = v
                for s in (1, 2, 4, 8, 16, 32, 64):
                    sh = pltpu.roll(p, s, axis=1)
                    p = p * jnp.where(lane >= s, sh, 1.0)
                excl_prod = jnp.where(
                    lane >= 1, pltpu.roll(p, 1, axis=1), 1.0)
                T_k = logt_sc[:] * excl_prod
                total = p[:, CHUNK - 1:CHUNK]
            elif mode == "tri3":
                lf = jnp.log1p(-alpha_m)
                excl = _dot3(lf, _tri_excl())
                total = excl[:, CHUNK - 1:CHUNK] + lf[:, CHUNK - 1:CHUNK]
                T_k = jnp.exp(logt_sc[:] + excl)
            else:
                lf = jnp.log1p(-alpha_m)
                excl = _dot(lf, _tri_excl(), ((1,), (0,)))
                total = excl[:, CHUNK - 1:CHUNK] + lf[:, CHUNK - 1:CHUNK]
                if mode == "noexp":
                    T_k = logt_sc[:] + excl
                else:
                    T_k = expf(jnp.minimum(logt_sc[:] + excl, 0.0))
            c_hat = _dot(g_acc, featd, ((1,), (0,)))
            w = alpha_m * T_k
            u = w * c_hat
            if mode == "notri2":
                Su = u
            elif mode == "tri3":
                Su = _dot3(u, _tri_incl())
            else:
                Su = _dot(u, _tri_incl(), ((1,), (0,)))
            u_total = Su[:, CHUNK - 1:CHUNK]
            pre = stot_sc[:] - s_sc[:] + gT_term
            sterm = pre - Su
            f = 1.0 - alpha_m
            amc = jnp.where(alpha_raw < ALPHA_MAX, alpha_m, 0.0)
            if mode == "nodiv":
                dpower = amc * (T_k * c_hat - sterm * f)
            else:
                dpower = amc * (T_k * c_hat - sterm / f)
            gfeat = _dot(g_acc, w, ((0,), (0,)))
            pxv = pixf_x[:, 0]
            pyv = pixf_y[:, 0]
            P6 = jnp.stack(
                [jnp.ones_like(pxv), pxv, pyv, pxv * pxv, pyv * pyv,
                 pxv * pyv], axis=0)
            if mode == "nomoment":
                M = jnp.broadcast_to(dpower[0:6, :], (6, CHUNK))
            else:
                M = _dot(P6, dpower, ((1,), (0,)))
            m0, mx, my, mxx, myy, mxy = (M[i:i + 1, :] for i in range(6))
            sdx = xs * m0 - mx
            sdy = ys * m0 - my
            sdxx = xs * xs * m0 - 2.0 * xs * mx + mxx
            sdyy = ys * ys * m0 - 2.0 * ys * my + myy
            sdxy = xs * ys * m0 - xs * my - ys * mx + mxy
            dop_row = m0 * jnp.where(op > 0.0, 1.0 / op, 0.0)
            rows = jnp.concatenate(
                [-(cxx * sdx + cxy * sdy), -(cyy * sdy + cxy * sdx),
                 -0.5 * sdxx, -sdxy, -0.5 * sdyy, dop_row, gfeat], axis=0)
            pad = GF - (6 + CH1)
            if pad:
                rows = jnp.concatenate(
                    [rows, jnp.zeros((pad, CHUNK), jnp.float32)], axis=0)
            grad_ref[0] = rows
            if mode == "pscan":
                logt_sc[:] = logt_sc[:] * total
            else:
                logt_sc[:] = logt_sc[:] + total
            s_sc[:] = s_sc[:] + u_total

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((1, F, CHUNK),
                         lambda c, ct, cf, nv, co, qb, sf, a: (qb[c], 0, 0)),
            pl.BlockSpec((1, F, CHUNK),
                         lambda c, ct, cf, nv, co, qb, sf, a: (qb[c] + 1, 0, 0)),
            pl.BlockSpec((1, PX, 2 * CH1 + 3),
                         lambda c, ct, cf, nv, co, qb, sf, a: (ct[c], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, GF, CHUNK),
                         lambda c, ct, cf, nv, co, qb, sf, a: (c, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((PX, 1), jnp.float32),
            pltpu.VMEM((PX, 1), jnp.float32),
            pltpu.VMEM((PX, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NC, GF, CHUNK), jnp.float32)])


gall0 = jnp.asarray(np.random.RandomState(7).rand(
    ntiles, PX, 2 * CH1 + 3).astype(np.float32))
act0 = (sb0.chunk_nvalid > 0).astype(jnp.int32)


def bench_bwd(mode):
    call = make_bwd(mode)

    @jax.jit
    def run(sb, gall):
        def body(i, acc):
            blk = sb.blocks * (1 + 1e-9 * i)
            (grows,) = call(sb.chunk_tile, sb.chunk_first, sb.chunk_nvalid,
                            sb.chunk_offset, sb.qblk, sb.shift, act0,
                            blk, blk, gall)
            return acc * 0.5 + jnp.sum(grows)
        return jax.lax.fori_loop(0, N, body, 0.0)
    timeit(f"bwd[{mode}]", run, sb0, gall0)


for mode in ["base", "tri3"]:
    bench_bwd(mode)
