"""Bisect the sorted bwd kernel cost: which parts of the 7.5 ms?"""
import time, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops import binning_sorted as bs
from gaussianeditor_tpu.ops.pallas_composite import (
    make_pallas_compositor_sorted, _pix_coords, _tri_incl, _dot, _pad8,
    CHUNK, PX)
from gaussianeditor_tpu.ops.composite import ALPHA_MAX, ALPHA_MIN

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
ch = 3; CH1 = 4; F = 16; GF = _pad8(6+CH1)
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

bench("EMPTY", lambda i: i.astype(jnp.float32))

def pre(s):
    return preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
        s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
        active_sh_degree=3, max_sh_degree=3)

p0 = jax.tree.map(jax.lax.stop_gradient, jax.jit(pre)(scene))
sb0 = jax.jit(lambda p: bs.sorted_bin(p, gx, gy, MI))(p0)
comp = make_pallas_compositor_sorted(ntiles, gx, ch, scene.capacity, MI)
out0 = jax.jit(lambda: comp(p0.mean2d, p0.conic, p0.opacity, p0.color,
                            p0.depth, sb0))()
acc0 = jnp.concatenate([out0.color, out0.depth[..., None]], axis=-1)
gall0 = jnp.concatenate(
    [jnp.ones_like(acc0), acc0, jnp.ones_like(out0.final_T)[..., None],
     out0.final_T[..., None],
     out0.n_contrib.astype(jnp.float32)[..., None]], axis=-1)
max_nc0 = jnp.max(out0.n_contrib, axis=-1)
active0 = ((sb0.chunk_nvalid > 0)
           & (sb0.chunk_offset < max_nc0[sb0.chunk_tile])).astype(jnp.int32)

def make_bwd_variant(variant):
    def kernel(ct_ref, cf_ref, nv_ref, co_ref, qb_ref, sf_ref, act_ref,
               b0_ref, b1_ref, gall_ref, grad_ref, logt_sc, s_sc, stot_sc):
        c = pl.program_id(0)
        tile = ct_ref[c]
        pixf_x, pixf_y = _pix_coords(tile % gx, tile // gx)

        @pl.when(cf_ref[c] == 1)
        def _init():
            logt_sc[:] = jnp.zeros((PX, 1), jnp.float32)
            s_sc[:] = jnp.zeros((PX, 1), jnp.float32)
            gall0_ = gall_ref[0]
            stot_sc[:] = jnp.sum(
                gall0_[:, :CH1] * gall0_[:, CH1:2*CH1], axis=-1, keepdims=True)

        n_valid = nv_ref[c]
        grad_ref[0] = jnp.zeros((GF, CHUNK), jnp.float32)

        @pl.when(act_ref[c] == 1)
        def _compute():
            if variant == "empty":
                return
            x2 = jnp.concatenate([b0_ref[0], b1_ref[0]], axis=1)
            buf = pltpu.roll(x2, -sf_ref[c], axis=1)[:, :CHUNK]
            if variant == "rollonly":
                grad_ref[0] = buf[:GF, :] * 2.0
                return
            xs = buf[0:1, :]; ys = buf[1:2, :]
            cxx = buf[2:3, :]; cxy = buf[3:4, :]; cyy = buf[4:5, :]
            op = buf[5:6, :]
            featd = jnp.concatenate([buf[7:7+ch, :], buf[6:7, :]], axis=0)
            gall = gall_ref[0]
            g_acc = gall[:, :CH1]
            gT_term = (gall[:, 2*CH1] * gall[:, 2*CH1+1])[:, None]
            nc = gall[:, 2*CH1+2][:, None]
            dx = xs - pixf_x
            dy = ys - pixf_y
            power = -0.5*(cxx*dx*dx + cyy*dy*dy) - cxy*dx*dy
            if variant == "notrans":
                g_exp = jnp.abs(power) * 0.1
            else:
                g_exp = jnp.exp(jnp.minimum(power, 0.0))
            alpha_raw = op * g_exp
            alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            pos = (co_ref[c] + lane).astype(jnp.float32)
            skipped = (power > 0.0) | (alpha < ALPHA_MIN) | (lane >= n_valid)
            m = (~skipped) & (pos < nc)
            if variant == "notrans":
                lf = jnp.where(m, -alpha, 0.0)
            else:
                lf = jnp.where(m, jnp.log1p(-alpha), 0.0)
            if variant == "notri":
                excl = lf * 2.0
            else:
                excl = _dot(lf, _tri_incl(), ((1,), (0,))) - lf
            total = _dot(lf, jnp.ones((CHUNK, 1), jnp.float32), ((1,), (0,)))
            if variant == "notrans":
                T_k = logt_sc[:] + excl
            else:
                T_k = jnp.exp(logt_sc[:] + excl)
            c_hat = _dot(g_acc, featd, ((1,), (0,)))
            mf = m.astype(jnp.float32)
            w = mf * alpha * T_k
            u = w * c_hat
            ones_c = jnp.ones((CHUNK, 1), jnp.float32)
            u_total = _dot(u, ones_c, ((1,), (0,)))
            if variant == "notri":
                S_incl = s_sc[:] + u * 2.0
            else:
                S_incl = s_sc[:] + _dot(u, _tri_incl(), ((1,), (0,)))
            S_at = stot_sc[:] - S_incl
            f = 1.0 - alpha
            dalpha = mf * (T_k*c_hat - (S_at + gT_term)/f)
            cap_gate = (alpha_raw < ALPHA_MAX).astype(jnp.float32)
            dop = dalpha * g_exp * cap_gate
            dpower = dalpha * alpha * cap_gate
            gfeat = _dot(g_acc, w, ((0,), (0,)))
            if variant == "nomoment":
                rows = jnp.concatenate([
                    dpower[0:1]*0, dpower[0:1], dpower[0:1], dpower[0:1],
                    dpower[0:1], dop[0:1], gfeat,
                    jnp.zeros((GF-(6+CH1), CHUNK), jnp.float32)], axis=0)
            else:
                pxv = pixf_x[:, 0]; pyv = pixf_y[:, 0]
                P6 = jnp.stack([jnp.ones_like(pxv), pxv, pyv, pxv*pxv,
                                pyv*pyv, pxv*pyv], axis=0)
                M = _dot(P6, dpower, ((1,), (0,)))
                m0, mx, my, mxx, myy, mxy = (M[i:i+1, :] for i in range(6))
                sdx = xs*m0 - mx
                sdy = ys*m0 - my
                sdxx = xs*xs*m0 - 2.0*xs*mx + mxx
                sdyy = ys*ys*m0 - 2.0*ys*my + myy
                sdxy = xs*ys*m0 - xs*my - ys*mx + mxy
                dop_row = _dot(jnp.ones((1, PX), jnp.float32), dop,
                               ((1,), (0,)))
                rows = jnp.concatenate([
                    -(cxx*sdx + cxy*sdy), -(cyy*sdy + cxy*sdx),
                    -0.5*sdxx, -sdxy, -0.5*sdyy, dop_row, gfeat,
                    jnp.zeros((GF-(6+CH1), CHUNK), jnp.float32)], axis=0)
            grad_ref[0] = rows
            logt_sc[:] = logt_sc[:] + total
            s_sc[:] = s_sc[:] + u_total

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((1, F, CHUNK),
                         lambda c, ct, cf, nv, co, qb, sf, a: (qb[c], 0, 0)),
            pl.BlockSpec((1, F, CHUNK),
                         lambda c, ct, cf, nv, co, qb, sf, a: (qb[c]+1, 0, 0)),
            pl.BlockSpec((1, PX, 2*CH1+3),
                         lambda c, ct, cf, nv, co, qb, sf, a: (ct[c], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, GF, CHUNK),
                         lambda c, ct, cf, nv, co, qb, sf, a: (c, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((PX, 1), jnp.float32)] * 3,
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NC, GF, CHUNK), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )

def fdep(i):
    return 1 + 1e-9 * i.astype(jnp.float32)

for variant in ("full", "nomoment", "notri", "notrans", "rollonly", "empty"):
    call = make_bwd_variant(variant)
    def st(i, call=call):
        blocks = sb0.blocks * fdep(i)
        (grows,) = call(sb0.chunk_tile, sb0.chunk_first, sb0.chunk_nvalid,
                        sb0.chunk_offset, sb0.qblk, sb0.shift, active0,
                        blocks, blocks, gall0 * fdep(i))
        return jnp.sum(grows)
    bench(f"bwd variant {variant}", st)
print("done", flush=True)
