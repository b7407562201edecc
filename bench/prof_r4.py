"""Round-2 perf: candidate fixes for the binning/pack/preprocess hotspots.

Each line is pre+variant; subtract the 'preprocess consumed' line for the
variant's own cost. Single consumption per bench (no double-compute).
"""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.core.sh import C0, C1, C2, C3
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops import binning_dense as bd

n = 100_000; hw = 512; MI = 524_288
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
gx = gy = hw//TILE
num_tiles = gx*gy
C = scene.capacity
R, R2, NC = bd.dense_capacities(MI, num_tiles)
CHUNK = bd.CHUNK
N_IT = 30
OVERHEAD = None

def bench(name, body0, *args):
    global OVERHEAD
    def fn(*a):
        def body(i, acc):
            return acc * 0.5 + body0(i, *a)
        return jax.lax.fori_loop(0, N_IT, body, 0.0)
    f = jax.jit(fn)
    float(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(f(*args))
        best = min(best, time.perf_counter() - t0)
    tag = " (baseline)" if OVERHEAD is None else f": {(best-OVERHEAD)/N_IT*1000:.3f} ms/iter"
    if OVERHEAD is None:
        OVERHEAD = best
    print(f"{name}{tag}", flush=True)

bench("EMPTY", lambda i: i.astype(jnp.float32))

def pre(s, i):
    s = s.replace(params=s.params.replace(
        xyz=s.params.xyz * (1 + 1e-9 * i.astype(jnp.float32))))
    return preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
        s.get_opacity[:,0], s.get_features, cam, alive=s.alive,
        active_sh_degree=3, max_sh_degree=3)

def chk(*xs):
    acc = 0.0
    for x in xs:
        acc = acc + jnp.sum(x[::97].astype(jnp.float32))
    return acc

# ---- 0. preprocess reference points ----
bench("pre bin-fields only",
      lambda i, s: chk(pre(s, i).tiles_touched, pre(s, i).rect_min,
                       pre(s, i).depth), scene)
bench("pre ALL fields (incl color/conic)",
      lambda i, s: (lambda p: chk(p.tiles_touched, p.rect_min, p.depth,
                                  p.color, p.conic, p.mean2d, p.opacity))(
          pre(s, i)), scene)

# ---- SoA preprocess prototype (capacity-last layout) ----
def pre_soa(s, i):
    p = s.params
    xyz = p.xyz * (1 + 1e-9 * i.astype(jnp.float32))
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    P = cam.full_proj
    hx = P[0, 0]*x + P[0, 1]*y + P[0, 2]*z + P[0, 3]
    hy = P[1, 0]*x + P[1, 1]*y + P[1, 2]*z + P[1, 3]
    hw_ = P[3, 0]*x + P[3, 1]*y + P[3, 2]*z + P[3, 3]
    pw = 1.0 / (hw_ + 1e-7)
    WV = cam.world_view
    tz = WV[2, 0]*x + WV[2, 1]*y + WV[2, 2]*z + WV[2, 3]
    mx = ((hx*pw + 1.0) * cam.width - 1.0) * 0.5
    my = ((hy*pw + 1.0) * cam.height - 1.0) * 0.5

    # cov3d (SoA): L = R diag(s); Sigma = L L^T, 6 uniques
    sc = jnp.exp(p.log_scales)
    sx, sy, sz = sc[:, 0], sc[:, 1], sc[:, 2]
    q = p.quats
    qn = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q*q, axis=1), 1e-24))[:, None]
    r_, i_, j_, k_ = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    R00 = 1 - 2*(j_*j_ + k_*k_); R01 = 2*(i_*j_ - r_*k_); R02 = 2*(i_*k_ + r_*j_)
    R10 = 2*(i_*j_ + r_*k_);     R11 = 1 - 2*(i_*i_ + k_*k_); R12 = 2*(j_*k_ - r_*i_)
    R20 = 2*(i_*k_ - r_*j_);     R21 = 2*(j_*k_ + r_*i_); R22 = 1 - 2*(i_*i_ + j_*j_)
    L00, L01, L02 = R00*sx, R01*sy, R02*sz
    L10, L11, L12 = R10*sx, R11*sy, R12*sz
    L20, L21, L22 = R20*sx, R21*sy, R22*sz
    S00 = L00*L00 + L01*L01 + L02*L02
    S01 = L00*L10 + L01*L11 + L02*L12
    S02 = L00*L20 + L01*L21 + L02*L22
    S11 = L10*L10 + L11*L11 + L12*L12
    S12 = L10*L20 + L11*L21 + L12*L22
    S22 = L20*L20 + L21*L21 + L22*L22

    # cov2d EWA (SoA)
    tx_ = WV[0, 0]*x + WV[0, 1]*y + WV[0, 2]*z + WV[0, 3]
    ty_ = WV[1, 0]*x + WV[1, 1]*y + WV[1, 2]*z + WV[1, 3]
    limx = 1.3 * cam.tan_fovx; limy = 1.3 * cam.tan_fovy
    txz = jnp.clip(tx_/tz, -limx, limx) * tz
    tyz = jnp.clip(ty_/tz, -limy, limy) * tz
    itz = 1.0/tz; itz2 = itz*itz
    J00 = cam.focal_x*itz; J02 = -cam.focal_x*txz*itz2
    J11 = cam.focal_y*itz; J12 = -cam.focal_y*tyz*itz2
    # T = J @ W (rows of world_view)
    T00 = J00*WV[0, 0] + J02*WV[2, 0]
    T01 = J00*WV[0, 1] + J02*WV[2, 1]
    T02 = J00*WV[0, 2] + J02*WV[2, 2]
    T10 = J11*WV[1, 0] + J12*WV[2, 0]
    T11 = J11*WV[1, 1] + J12*WV[2, 1]
    T12 = J11*WV[1, 2] + J12*WV[2, 2]
    # cov = T S T^T
    A0 = T00*S00 + T01*S01 + T02*S02
    A1 = T00*S01 + T01*S11 + T02*S12
    A2 = T00*S02 + T01*S12 + T02*S22
    B0 = T10*S00 + T11*S01 + T12*S02
    B1 = T10*S01 + T11*S11 + T12*S12
    B2 = T10*S02 + T11*S12 + T12*S22
    c_xx = A0*T00 + A1*T01 + A2*T02 + 0.3
    c_xy = A0*T10 + A1*T11 + A2*T12
    c_yy = B0*T10 + B1*T11 + B2*T12 + 0.3

    det = c_xx*c_yy - c_xy*c_xy
    det_valid = det != 0.0
    det_inv = 1.0 / jnp.where(det_valid, det, 1.0)
    conic_a, conic_b, conic_c = c_yy*det_inv, -c_xy*det_inv, c_xx*det_inv
    mid = 0.5*(c_xx + c_yy)
    disc = jnp.sqrt(jnp.maximum(0.1, mid*mid - det))
    radius_f = jnp.ceil(3.0*jnp.sqrt(jnp.maximum(mid+disc, mid-disc)))
    rminx = jnp.clip(((mx - radius_f)/TILE).astype(jnp.int32), 0, gx)
    rminy = jnp.clip(((my - radius_f)/TILE).astype(jnp.int32), 0, gy)
    rmaxx = jnp.clip(((mx + radius_f + TILE - 1)/TILE).astype(jnp.int32), 0, gx)
    rmaxy = jnp.clip(((my + radius_f + TILE - 1)/TILE).astype(jnp.int32), 0, gy)
    tiles = (rmaxx - rminx)*(rmaxy - rminy)
    visible = (tz > 0.2) & det_valid & (tiles > 0) & s.alive
    tt = jnp.where(visible, tiles, 0).astype(jnp.int32)

    # SH (SoA): feats [C,16,3] -> [16,3,C] once
    feats = jnp.transpose(s.get_features, (1, 2, 0))  # [16, 3, C]
    dx_ = x - cam.cam_pos[0]; dy_ = y - cam.cam_pos[1]; dz_ = z - cam.cam_pos[2]
    dn = jax.lax.rsqrt(jnp.maximum(dx_*dx_ + dy_*dy_ + dz_*dz_, 1e-24))
    dx_, dy_, dz_ = dx_*dn, dy_*dn, dz_*dn
    xx, yy, zz = dx_*dx_, dy_*dy_, dz_*dz_
    xy, yz, xz = dx_*dy_, dy_*dz_, dx_*dz_
    res = C0*feats[0]
    res = res + (-C1*dy_)*feats[1] + (C1*dz_)*feats[2] + (-C1*dx_)*feats[3]
    res = (res + (C2[0]*xy)*feats[4] + (C2[1]*yz)*feats[5]
           + (C2[2]*(2*zz - xx - yy))*feats[6] + (C2[3]*xz)*feats[7]
           + (C2[4]*(xx - yy))*feats[8])
    res = (res + (C3[0]*dy_*(3*xx - yy))*feats[9] + (C3[1]*xy*dz_)*feats[10]
           + (C3[2]*dy_*(4*zz - xx - yy))*feats[11]
           + (C3[3]*dz_*(2*zz - 3*xx - 3*yy))*feats[12]
           + (C3[4]*dx_*(4*zz - xx - yy))*feats[13]
           + (C3[5]*dz_*(xx - yy))*feats[14]
           + (C3[6]*dx_*(xx - 3*yy))*feats[15])
    color = jnp.maximum(res + 0.5, 0.0)  # [3, C]
    return (tt, rminx, rminy, rmaxx, rmaxy, tz, color,
            conic_a, conic_b, conic_c, mx, my)

bench("pre SoA prototype ALL fields",
      lambda i, s: chk(*pre_soa(s, i)), scene)

# ---- binning expansion variants ----
def expand_scatter(p, how):
    tt = p.tiles_touched
    b_incl = jnp.cumsum(tt, dtype=jnp.int32)
    b_prev = b_incl - tt
    first_rank = jnp.where(tt > 0, b_prev, R)
    if how == "max":
        mark = jnp.full((R,), -1, jnp.int32).at[first_rank].max(
            jnp.arange(C, dtype=jnp.int32))
    else:
        mark = jnp.full((R,), -1, jnp.int32).at[first_rank].set(
            jnp.arange(C, dtype=jnp.int32), mode="drop",
            unique_indices=True)
    gsrc = jnp.maximum(jax.lax.cummax(mark), 0)
    return gsrc, b_incl

bench("expand scatter-max (current)",
      lambda i, s: chk(*expand_scatter(pre(s, i), "max")), scene)
bench("expand scatter-set unique",
      lambda i, s: chk(*expand_scatter(pre(s, i), "set")), scene)

def expand_sort(p):
    tt = p.tiles_touched
    b_incl = jnp.cumsum(tt, dtype=jnp.int32)
    b_prev = b_incl - tt
    mkey = jnp.where(tt > 0, b_prev, jnp.int32(2**30))
    skey = jnp.concatenate([mkey, jnp.arange(R, dtype=jnp.int32)])
    pay = jnp.concatenate([jnp.arange(C, dtype=jnp.int32),
                           jnp.full((R,), -1, jnp.int32)])
    _, spay = jax.lax.sort((skey, pay), num_keys=1, is_stable=True)
    gsrc_pos = jax.lax.cummax(jnp.where(spay >= 0, spay, -1))
    is_m = spay >= 0
    truerank = (jnp.arange(R + C, dtype=jnp.int32)
                - jnp.cumsum(is_m.astype(jnp.int32)))
    return gsrc_pos, truerank, b_incl

bench("expand via marker sort (R+C rows)",
      lambda i, s: chk(*expand_sort(pre(s, i))), scene)

# ---- per-rank field variants (on top of scatter-set expansion) ----
def key_rowgather(p):
    gsrc, b_incl = expand_scatter(p, "set")
    tt = p.tiles_touched
    b_prev = b_incl - tt
    depth = p.depth.astype(jnp.float32)
    dkey32 = (jax.lax.bitcast_convert_type(depth, jnp.uint32) >> 11).astype(jnp.int32)
    table = jnp.stack([b_prev, tt, p.rect_min[:, 0], p.rect_min[:, 1],
        jnp.maximum(p.rect_max[:, 0] - p.rect_min[:, 0], 1), dkey32], axis=1)
    rows = table[gsrc]
    return chk(rows)

def key_1d(p):
    gsrc, b_incl = expand_scatter(p, "set")
    depth = p.depth.astype(jnp.float32)
    dkey32 = (jax.lax.bitcast_convert_type(depth, jnp.uint32) >> 11).astype(jnp.int32)
    w = jnp.maximum(p.rect_max[:, 0] - p.rect_min[:, 0], 1)
    geo = (p.rect_min[:, 0] | (p.rect_min[:, 1] << 10) | (w << 20))
    g_geo = geo[gsrc]
    g_dkey = dkey32[gsrc]
    # j from gsrc boundaries (no b_prev gather)
    q = jnp.arange(R, dtype=jnp.int32)
    is_s = jnp.concatenate([jnp.ones((1,), bool), gsrc[1:] != gsrc[:-1]])
    rstart = jax.lax.cummax(jnp.where(is_s, q, -1))
    j = q - rstart
    rx = g_geo & 1023; ry = (g_geo >> 10) & 1023; rw = (g_geo >> 20).astype(jnp.float32)
    jy = jnp.floor((j.astype(jnp.float32) + 0.5) * (1.0/rw)).astype(jnp.int32)
    jx = j - jy * (g_geo >> 20)
    tile = (ry + jy)*gx + (rx + jx)
    key = (tile.astype(jnp.uint32) << 21) | g_dkey.astype(jnp.uint32)
    return chk(key, j)

bench("fields rowgather [C,6] (current)",
      lambda i, s: key_rowgather(pre(s, i)), scene)
bench("fields 2x 1-D gathers + boundary j",
      lambda i, s: key_1d(pre(s, i)), scene)

# ---- pack variants ----
F = 8
g_tab = jnp.asarray(rng.rand(C + 1, F), jnp.float32)
sorted_g0 = jnp.asarray(np.sort(rng.randint(0, C, R)), jnp.int32)
p0_ = jnp.asarray((np.arange(NC) * CHUNK) % (R - CHUNK), jnp.int32)
nv_ = jnp.asarray(np.where(np.arange(NC)*CHUNK < 360_000, CHUNK, 0), jnp.int32)

def lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (NC, CHUNK), 1)

def pack_row3d(i, gt, sg, p0, nv):
    gs = gt * (1.0 + 1e-9*i.astype(jnp.float32))
    sgp = jnp.pad(sg, (0, 1), constant_values=C)
    src = jnp.where(lane_iota() < nv[:, None], p0[:, None] + lane_iota(), R)
    gid = sgp[src]
    out = jnp.swapaxes(gs[gid], 1, 2)   # [NC, F, CHUNK]
    return chk(out)

def pack_lanes(i, gt, sg, p0, nv):
    gs = gt * (1.0 + 1e-9*i.astype(jnp.float32))
    gT = gs.T                            # [F, C+1]
    sgp = jnp.pad(sg, (0, 1), constant_values=C)
    src = jnp.where(lane_iota() < nv[:, None], p0[:, None] + lane_iota(), R)
    gid = sgp[src].reshape(-1)           # [R2]
    out = gT[:, gid].reshape(F, NC, CHUNK)
    return chk(out)

bench("pack row-gather 3d (current)", pack_row3d, g_tab, sorted_g0, p0_, nv_)
bench("pack lane-gather from gT", pack_lanes, g_tab, sorted_g0, p0_, nv_)
print("done", flush=True)
