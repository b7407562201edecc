"""Consolidated perf profiler — the ONE parameterized harness that
replaces the bench/prof_r*.py scratch scripts (their conclusions live in
docs/perf_log.md).

Modes:
  pipeline   successive-prefix stage split of the production render
             (binning sub-stages, kernels, backward reduce, assembly).
             The staged binning replica is parity-checked against the
             real ops/binning_sorted.sorted_bin every run.
  kernels    forward/backward Pallas kernel + reduce in isolation on
             fixed binning outputs (separates kernel cost from binning).
  micro      primitive costs on this chip (gathers, sorts by operand
             count, scatter, R-sized scans) that motivate the design.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python bench/profiler.py \
      [--mode pipeline|kernels|micro] [--n 100000] [--hw 512] \
      [--mi 393216] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def make_scene(n, hw, seed=0):
    import jax.numpy as jnp

    from gaussianeditor_tpu.core.cameras import lookat_camera
    from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene

    rng = np.random.RandomState(seed)
    quats = rng.randn(n, 4).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    params = GaussianParams(
        xyz=jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32)),
        features_dc=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32) * 0.3),
        features_rest=jnp.asarray(np.zeros((n, 15, 3), np.float32)),
        opacity_raw=jnp.asarray(rng.uniform(-1, 1, (n, 1)).astype(np.float32)),
        log_scales=jnp.asarray(
            np.log(rng.uniform(0.004, 0.02, (n, 3))).astype(np.float32)),
        quats=jnp.asarray(quats))
    scene = GaussianScene.create(params, max_sh_degree=3, active_sh_degree=3)
    cam = lookat_camera(np.array([0, 0, -4.0]), np.zeros(3),
                        np.array([0, 1.0, 0]), 0.8, 0.8, hw, hw)
    return scene, cam


def timer(n_iter):
    import jax

    def sync(x):
        # device_get of the scalar result: block_until_ready has been
        # observed to return WITHOUT syncing through the axon relay
        # (see .claude/skills/verify — float()-sync is the reliable way)
        return float(np.asarray(jax.device_get(jax.tree.leaves(x)[0])).ravel()[0])

    def timeit(name, fn, *args, reps=3):
        sync(fn(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn(*args))
            best = min(best, time.perf_counter() - t0)
        ms = best / n_iter * 1000
        print(f"{name:42s} {ms:8.3f} ms", flush=True)
        return ms

    return timeit


# ---------------------------------------------------------------------------
# staged replica of ops/binning_sorted.sorted_bin (parity-checked below)
# ---------------------------------------------------------------------------

def staged_sorted_bin(proc, grid_x, grid_y, max_instances, stop_at):
    """sorted_bin truncated after the named stage; returns a checksum
    scalar so XLA cannot DCE the work. Stage names in PIPE_STAGES."""
    import jax
    import jax.numpy as jnp

    from gaussianeditor_tpu.ops import binning_sorted as bs

    CHUNK, FTAB, KEY_BLK = bs.CHUNK, bs.FTAB, bs.KEY_BLK
    num_tiles = grid_x * grid_y
    C = proc.tiles_touched.shape[0]
    ch = proc.color.shape[-1]
    P = 7 + ch
    R, NB, NC = bs.sorted_capacities(max_instances, num_tiles)
    tile_bits = max((num_tiles + 1).bit_length(), 1)
    key_depth_bits = min(32 - tile_bits, 24)

    def cs(*xs):
        acc = jnp.float32(0)
        for x in xs:
            acc = acc + jnp.sum(x.astype(jnp.float32) % 1001.0)
        return acc

    tt = proc.tiles_touched
    b_incl = jnp.cumsum(tt, dtype=jnp.int32)
    b_prev = b_incl - tt
    total = b_incl[-1]
    first_rank = jnp.where(tt > 0, b_prev, R)
    mark = jnp.full((R,), -1, jnp.int32).at[first_rank].max(
        jnp.arange(C, dtype=jnp.int32))
    gsrc = jnp.maximum(jax.lax.cummax(mark), 0)
    if stop_at == "gsrc":
        return cs(gsrc, b_incl)

    depth = jax.lax.stop_gradient(proc.depth.astype(jnp.float32))
    dkey32 = (jax.lax.bitcast_convert_type(depth, jnp.uint32)
              >> (32 - key_depth_bits)).astype(jnp.int32)
    stop = jax.lax.stop_gradient
    cols = [
        b_prev.astype(jnp.float32), tt.astype(jnp.float32),
        proc.rect_min[:, 0].astype(jnp.float32),
        proc.rect_min[:, 1].astype(jnp.float32),
        jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0],
                    1).astype(jnp.float32),
        dkey32.astype(jnp.float32),
        stop(proc.mean2d[:, 0]), stop(proc.mean2d[:, 1]),
        stop(proc.conic[:, 0]), stop(proc.conic[:, 1]),
        stop(proc.conic[:, 2]), stop(proc.opacity), depth,
    ] + [stop(proc.color[:, i]) for i in range(ch)]
    table = jnp.stack(cols, axis=1)
    if table.shape[1] < FTAB:
        table = jnp.pad(table, ((0, 0), (0, FTAB - table.shape[1])))
    table = jnp.pad(table, ((0, 1), (0, 0)))
    rows_rank = table[jnp.minimum(gsrc, C)]
    if stop_at == "gather":
        return cs(rows_rank)

    Rk = -(-R // KEY_BLK) * KEY_BLK
    rows_k = (rows_rank if Rk == R
              else jnp.pad(rows_rank, ((0, Rk - R), (0, 0))))
    rows_b = jnp.swapaxes(rows_k.reshape(Rk // KEY_BLK, KEY_BLK, FTAB),
                          1, 2)
    key_call = bs._make_key_kernel(Rk, grid_x, key_depth_bits, P)
    key, rt = key_call(jnp.asarray([0], jnp.int32) + total, rows_b)
    if Rk != R:
        key = key[:R]
        rt = rt[:, :R]
    if stop_at == "key":
        return cs(key, rt)

    q = jnp.arange(R, dtype=jnp.int32)
    ops = (key,) + tuple(rt[i] for i in range(P)) + (q,)
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=True)
    skey = sorted_ops[0]
    scols = sorted_ops[1:1 + P]
    srank = sorted_ops[1 + P]
    stile = (skey >> key_depth_bits).astype(jnp.int32)
    if stop_at == "sort":
        return cs(skey, scols[0], srank)

    bcols = scols + (srank.astype(jnp.float32),)
    blocks = jnp.stack(
        [jnp.pad(c_, (0, CHUNK)) for c_ in bcols]
        + [jnp.zeros((R + CHUNK,), jnp.float32)] * (FTAB - P - 1),
        axis=0,
    )
    if stop_at == "blocks":
        return cs(blocks) + cs(stile)

    T = num_tiles
    bounds = jnp.searchsorted(
        stile, jnp.arange(T + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    return cs(blocks) + cs(bounds, b_incl)


PIPE_STAGES = ["gsrc", "gather", "key", "sort", "blocks", "full"]


def run_pipeline(scene, cam, mi, n_iter):
    import jax
    import jax.numpy as jnp

    from gaussianeditor_tpu.ops import binning_sorted as bs
    from gaussianeditor_tpu.ops.preprocess import TILE, preprocess
    from gaussianeditor_tpu.ops.render import render

    gx = gy = cam.width // TILE
    timeit = timer(n_iter)

    def proc_of(p):
        s = scene.replace(params=p)
        return preprocess(s.params.xyz, s.params.log_scales, s.params.quats,
                          s.get_opacity[:, 0], s.get_features, cam,
                          alive=s.alive, active_sh_degree=s.active_sh_degree,
                          max_sh_degree=s.max_sh_degree)

    # parity: staged full == real sorted_bin (checksum comparison)
    @jax.jit
    def parity(p):
        proc = proc_of(p)
        sb = bs.sorted_bin(proc, gx, gy, mi)

        def cs(*xs):
            acc = jnp.float32(0)
            for x in xs:
                acc = acc + jnp.sum(x.astype(jnp.float32) % 1001.0)
            return acc

        real = cs(sb.blocks) + cs(sb.tile_bounds, sb.b_incl)
        stag = staged_sorted_bin(proc, gx, gy, mi, "full")
        return real, stag

    r, s = jax.device_get(parity(scene.params))
    assert abs(r - s) < max(1e-3 * abs(r), 1.0), (
        f"staged binning replica drifted from sorted_bin: {r} vs {s} — "
        "update bench/profiler.py:staged_sorted_bin")
    print(f"parity ok (checksum {r:.1f})", flush=True)

    def staged_loop(stage):
        @jax.jit
        def run(p):
            def body(i, acc):
                pr = proc_of(p.replace(xyz=p.xyz * (1 + 1e-9 * i)))
                return acc * 0.5 + staged_sorted_bin(pr, gx, gy, mi, stage)
            return jax.lax.fori_loop(0, n_iter, body, 0.0)
        return run

    @jax.jit
    def pre_only(p):
        def body(i, acc):
            pr = proc_of(p.replace(xyz=p.xyz * (1 + 1e-9 * i)))
            return (acc * 0.5 + jnp.sum(pr.mean2d) +
                    jnp.sum(pr.tiles_touched).astype(jnp.float32))
        return jax.lax.fori_loop(0, n_iter, body, 0.0)

    @jax.jit
    def fwd_total(p):
        def body(i, acc):
            out = render(scene.replace(
                params=p.replace(xyz=p.xyz * (1 + 1e-9 * i))),
                cam, jnp.zeros(3), max_instances=mi)
            return acc * 0.5 + jnp.sum(out.color) + jnp.sum(out.depth)
        return jax.lax.fori_loop(0, n_iter, body, 0.0)

    def loss(p):
        out = render(scene.replace(params=p), cam, jnp.zeros(3),
                     max_instances=mi)
        return jnp.sum(out.color) + jnp.sum(out.depth)

    @jax.jit
    def fwdbwd_total(p):
        def body(i, acc):
            g = jax.grad(loss)(p.replace(xyz=p.xyz * (1 + 1e-9 * i)))
            return acc + jnp.sum(g.xyz)
        return jax.lax.fori_loop(0, n_iter, body, 0.0)

    @jax.jit
    def empty_loop(p):
        def body(i, acc):
            return acc * 0.5 + jnp.sum(p.xyz[:8, 0]) * (1 + 1e-9 * i)
        return jax.lax.fori_loop(0, n_iter, body, 0.0)

    results = {}
    results["empty"] = timeit("empty loop baseline", empty_loop, scene.params)
    results["preprocess"] = timeit("preprocess only", pre_only, scene.params)
    prev = results["preprocess"]
    for stage in PIPE_STAGES:
        ms = timeit(f"binning through '{stage}'", staged_loop(stage),
                    scene.params)
        print(f"{'':46s} (+{ms - prev:.3f})", flush=True)
        results[stage] = ms
        prev = ms
    results["fwd"] = timeit("fwd render total", fwd_total, scene.params)
    results["fwdbwd"] = timeit("fwd+bwd total", fwdbwd_total, scene.params)
    return results


def run_kernels(scene, cam, mi, n_iter):
    """Kernel + reduce costs on FIXED binning outputs (v8 layout)."""
    import jax
    import jax.numpy as jnp

    from gaussianeditor_tpu.ops import binning_sorted as bs
    from gaussianeditor_tpu.ops import pallas_composite as pc
    from gaussianeditor_tpu.ops.preprocess import TILE, preprocess

    gx = gy = cam.width // TILE
    ntiles = gx * gy
    ch = 3
    CH1 = ch + 1
    R, NB, NC = bs.sorted_capacities(mi, ntiles)
    NCP = NC * 128
    timeit = timer(n_iter)

    proc = preprocess(scene.params.xyz, scene.params.log_scales,
                      scene.params.quats, scene.get_opacity[:, 0],
                      scene.get_features, cam, alive=scene.alive,
                      active_sh_degree=scene.active_sh_degree,
                      max_sh_degree=scene.max_sh_degree)
    # keep sb resident on device (a device_get of the full pytree
    # through the relay hits FailedPrecondition)
    sb = jax.block_until_ready(
        jax.jit(lambda p: bs.sorted_bin(p, gx, gy, mi))(proc))

    fwd_tile = pc.make_forward_tile(ntiles, gx, ch)
    bwd_tile = pc.make_backward_tile(ntiles, gx, ch, NC, R)

    cnt_t = sb.tile_bounds[1:] - sb.tile_bounds[:-1]
    nck = (cnt_t + 127) // 128
    cstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nck, dtype=jnp.int32)])

    @jax.jit
    def fwd_tile_loop(blocks):
        def body(i, acc):
            blk = blocks.at[0, 0].add(1e-9 * i)
            (out,) = fwd_tile(sb.tile_bounds, blk)
            return acc * 0.5 + jnp.sum(out[..., :CH1])
        return jax.lax.fori_loop(0, n_iter, body, 0.0)

    (out0,) = jax.jit(lambda b: fwd_tile(sb.tile_bounds, b))(sb.blocks)
    acc0 = out0[..., :CH1]
    t_fin0 = out0[..., CH1]
    nc0 = out0[..., CH1 + 1]
    gall = jnp.concatenate(
        [jnp.ones_like(acc0), acc0, jnp.ones_like(t_fin0)[..., None],
         t_fin0[..., None], nc0[..., None]], axis=-1)
    maxnc_t = jnp.max(nc0, axis=-1).astype(jnp.int32)

    @jax.jit
    def bwd_tile_loop(blocks, gall):
        def body(i, acc):
            blk = blocks.at[0, 0].add(1e-9 * i)
            (grows,) = bwd_tile(sb.tile_bounds, cstart, maxnc_t, blk, gall)
            return acc * 0.5 + jnp.sum(grows[0][::4096])
        return jax.lax.fori_loop(0, n_iter, body, 0.0)

    (grows0,) = jax.jit(lambda b, g: bwd_tile(
        sb.tile_bounds, cstart, maxnc_t, b, g))(sb.blocks, gall)

    live = 6 + CH1
    vlan = jnp.arange(NCP, dtype=jnp.int32) < cstart[-1] * 128

    def extract(g2):
        cols = tuple(jnp.where(vlan, g2[j], 0.0) for j in range(live))
        skey = jnp.where(vlan, g2[live], jnp.float32(R))
        return cols, skey

    @jax.jit
    def sort_only(grows):
        def body(i, acc):
            g2 = grows.at[0, 0].add(1e-9 * i)
            cols, skey = extract(g2)
            sorted_ = jax.lax.sort((skey,) + cols, num_keys=1,
                                   is_stable=True)
            return acc * 0.5 + jnp.sum(sorted_[1][::4096])
        return jax.lax.fori_loop(0, n_iter, body, 0.0)

    BSTEP = 256
    nblk_scan = -(-(R // 128) // BSTEP) * BSTEP
    r_scan = nblk_scan * 128
    assert nblk_scan <= NC, "profile geometry can't absorb BSTEP rounding"

    @jax.jit
    def reduce_only(grows):
        def body(i, acc):
            g2 = grows.at[0, 0].add(1e-9 * i)
            cols, skey = extract(g2)
            sorted_ = jax.lax.sort((skey,) + cols, num_keys=1,
                                   is_stable=True)
            scols = tuple(s[:r_scan] for s in sorted_[1:])
            xb = bs._make_assembly_kernel(r_scan, nblk_scan, live,
                                          bpg=BSTEP)(*scols)
            d = pc.rank_space_reduce_blocked(xb, live, sb.b_incl, r_scan)
            return acc * 0.5 + jnp.sum(d)
        return jax.lax.fori_loop(0, n_iter, body, 0.0)

    @jax.jit
    def sort_asm(grows):
        def body(i, acc):
            g2 = grows.at[0, 0].add(1e-9 * i)
            cols, skey = extract(g2)
            sorted_ = jax.lax.sort((skey,) + cols, num_keys=1,
                                   is_stable=True)
            scols = tuple(s[:r_scan] for s in sorted_[1:])
            xb = bs._make_assembly_kernel(r_scan, nblk_scan, live,
                                          bpg=BSTEP)(*scols)
            return acc * 0.5 + jnp.sum(xb[0])
        return jax.lax.fori_loop(0, n_iter, body, 0.0)

    @jax.jit
    def scan_only(xb0):
        def body(i, acc):
            x2 = xb0.at[0, 0, 0].add(1e-9 * i)
            d = pc.rank_space_reduce_blocked(x2, live, sb.b_incl, r_scan)
            return acc * 0.5 + jnp.sum(d)
        return jax.lax.fori_loop(0, n_iter, body, 0.0)

    cols0, skey0 = extract(grows0)
    xb0 = jax.jit(lambda *c: bs._make_assembly_kernel(
        r_scan, nblk_scan, live, bpg=BSTEP)(
        *(x[:r_scan] for x in c)))(*cols0)

    timeit("fwd tile kernel (v8)", fwd_tile_loop, sb.blocks)
    timeit("bwd tile kernel (v8)", bwd_tile_loop, sb.blocks, gall)
    timeit("bwd reduce: rank sort only", sort_only, grows0)
    timeit("bwd reduce: sort + assembly", sort_asm, grows0)
    timeit("bwd reduce: blocked scan only", scan_only, xb0)
    timeit("bwd reduce: sort + asm + scan", reduce_only, grows0)


def run_pre(scene, cam, mi, n_iter):
    """Bisect the preprocess stage: full SH path vs override-color (no
    SH eval / feature concat / transposes) vs its vjp."""
    import jax
    import jax.numpy as jnp

    from gaussianeditor_tpu.ops.preprocess import preprocess

    timeit = timer(n_iter)
    colors = jnp.ones((scene.capacity, 3), jnp.float32) * 0.5

    def pre(p, override):
        s = scene.replace(params=p)
        return preprocess(
            s.params.xyz, s.params.log_scales, s.params.quats,
            s.get_opacity[:, 0], None if override else s.get_features, cam,
            alive=s.alive, active_sh_degree=s.active_sh_degree,
            max_sh_degree=s.max_sh_degree,
            override_color=colors if override else None)

    def consume(pr):
        return (jnp.sum(pr.mean2d) + jnp.sum(pr.conic) + jnp.sum(pr.color)
                + jnp.sum(pr.tiles_touched).astype(jnp.float32))

    def loop(override):
        @jax.jit
        def run(p):
            def body(i, acc):
                pr = pre(p.replace(xyz=p.xyz * (1 + 1e-9 * i)), override)
                return acc * 0.5 + consume(pr)
            return jax.lax.fori_loop(0, n_iter, body, 0.0)
        return run

    def vjp_loop():
        def loss(p):
            return consume(pre(p, False))

        @jax.jit
        def run(p):
            def body(i, acc):
                g = jax.grad(loss)(p.replace(xyz=p.xyz * (1 + 1e-9 * i)))
                return acc + jnp.sum(g.xyz)
            return jax.lax.fori_loop(0, n_iter, body, 0.0)
        return run

    timeit("preprocess full (SH3)", loop(False), scene.params)
    timeit("preprocess override-color", loop(True), scene.params)
    timeit("preprocess fwd+vjp (SH3)", vjp_loop(), scene.params)


def run_reduce(scene, cam, mi, n_iter):
    """Candidate designs for the backward per-Gaussian reduction,
    bisected: scans (row vs blocked vs per-column layout), boundary
    gathers (row vs 2-axis-blocked vs 1-D sorted), end-to-end combos."""
    import jax
    import jax.numpy as jnp

    from gaussianeditor_tpu.ops import binning_sorted as bs
    from gaussianeditor_tpu.ops import pallas_composite as pc
    from gaussianeditor_tpu.ops.preprocess import TILE

    gx = cam.width // TILE
    ntiles = gx * gx
    R, NB, NC = bs.sorted_capacities(mi, ntiles)
    C = scene.params.xyz.shape[0]
    GF = 16
    live = 10
    nblk = R // 128
    timeit = timer(n_iter)
    rng = np.random.RandomState(5)

    rows = jnp.asarray(rng.randn(R, GF).astype(np.float32))
    xb = jnp.swapaxes(rows.reshape(nblk, 128, GF), 1, 2)  # [nblk, GF, 128]
    counts = rng.multinomial(R - 1000, np.ones(C) / C)
    b_incl = jnp.asarray(np.cumsum(counts).astype(np.int32))
    S_rows = jnp.asarray(rng.randn(R + 128, GF).astype(np.float32))
    S_blk = jnp.swapaxes(S_rows.reshape(nblk + 1, 128, GF), 1, 2)
    S_cols = jnp.asarray(rng.randn(GF, R + 128).astype(np.float32))
    b_hi = jnp.minimum(b_incl, R)
    b_lo = jnp.minimum(jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), b_incl[:-1]]), R)

    def loop(fn):
        @jax.jit
        def run(*args):
            def body(i, acc):
                return acc * 0.5 + fn(i, *args)
            return jax.lax.fori_loop(0, n_iter, body, 0.0)
        return run

    timeit("scan row-layout (old)", loop(
        lambda i, r, b: jnp.sum(pc.rank_space_reduce(
            r.at[0, 0].add(1e-9 * i), b, R))), rows, b_incl)
    timeit("scan blocked (new, incl boundary)", loop(
        lambda i, x, b: jnp.sum(pc.rank_space_reduce_blocked(
            x.at[0, 0, 0].add(1e-9 * i), live, b, R))), xb, b_incl)

    def blocked_noboundary(i, x):
        x = x.at[0, 0, 0].add(1e-9 * i)
        tri_b = pc._tri_excl().astype(jnp.bfloat16)
        x1 = x.astype(jnp.bfloat16)
        r1 = x - x1.astype(jnp.float32)
        x2 = r1.astype(jnp.bfloat16)
        x3 = (r1 - x2.astype(jnp.float32)).astype(jnp.bfloat16)

        def pref(xs):
            return jnp.einsum("bck,kj->bcj", xs, tri_b,
                              preferred_element_type=jnp.float32)

        ipx = pref(x1) + pref(x2) + pref(x3)
        return jnp.sum(ipx[:, :, 127])

    timeit("blocked einsum prefix only", loop(blocked_noboundary), xb)

    timeit("boundary: row gather S[b]", loop(
        lambda i, S, h, l: jnp.sum(S[h + (i & 0)] - S[l])),
        S_rows, b_hi, b_lo)
    timeit("boundary: 2-axis blocked gather", loop(
        lambda i, S, h, l: jnp.sum(
            S[(h + (i & 0)) // 128, :, h % 128] - S[l // 128, :, l % 128])),
        S_blk, b_hi, b_lo)

    def boundary_cols(i, S, h, l):
        h = h + (i & 0)
        acc = jnp.float32(0)
        for c_ in range(GF):
            acc += jnp.sum(jnp.take(S[c_], h, indices_are_sorted=True)
                           - jnp.take(S[c_], l, indices_are_sorted=True))
        return acc

    timeit("boundary: 20x 1-D sorted takes", loop(boundary_cols),
           S_cols, b_hi, b_lo)

    def percol_scan(i, x):
        # per-column [nblk,128] prefix + 1-D sorted boundary takes
        x = x.at[0, 0, 0].add(1e-9 * i)
        tri_b = pc._tri_excl().astype(jnp.bfloat16)
        acc = jnp.float32(0)
        for c_ in range(live):
            xc = x[:, c_, :]                        # [nblk, 128]
            x1 = xc.astype(jnp.bfloat16)
            r1 = xc - x1.astype(jnp.float32)
            x2 = r1.astype(jnp.bfloat16)
            x3 = (r1 - x2.astype(jnp.float32)).astype(jnp.bfloat16)

            def pref(xs):
                return jnp.dot(xs, tri_b,
                               preferred_element_type=jnp.float32)

            ipx = pref(x1) + pref(x2) + pref(x3)
            P = ipx[:, 127] + xc[:, 127]
            mu = jnp.mean(P)
            base = jnp.concatenate(
                [jnp.zeros((1,), jnp.float32),
                 jnp.cumsum(P - mu)]) + mu * jnp.arange(
                     nblk + 1, dtype=jnp.float32)
            S = (jnp.concatenate(
                [ipx, jnp.zeros((1, 128), jnp.float32)])
                + base[:, None]).reshape(-1)
            acc += jnp.sum(jnp.take(S, b_hi, indices_are_sorted=True)
                           - jnp.take(S, b_lo, indices_are_sorted=True))
        return acc

    timeit("per-column scan + sorted takes", loop(percol_scan), xb)

    # composed scan+boundary variants on the blocked layout
    def scan_variant(boundary, precision):
        def fn(i, x, b):
            x = x.at[0, 0, 0].add(1e-9 * i)
            GF_ = x.shape[1]
            tri = pc._tri_excl()
            if precision == "split3":
                tri_b = tri.astype(jnp.bfloat16)
                x1 = x.astype(jnp.bfloat16)
                r1 = x - x1.astype(jnp.float32)
                x2 = r1.astype(jnp.bfloat16)
                x3 = (r1 - x2.astype(jnp.float32)).astype(jnp.bfloat16)

                def pref(xs):
                    return jnp.einsum("bck,kj->bcj", xs, tri_b,
                                      preferred_element_type=jnp.float32)

                ipx = pref(x1) + pref(x2) + pref(x3)
            else:
                ipx = jnp.einsum("bck,kj->bcj", x, tri,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
            P = ipx[:, :, 127] + x[:, :, 127]
            mu = jnp.mean(P, axis=0, keepdims=True)
            bpc = jnp.concatenate(
                [jnp.zeros((1, GF_), jnp.float32),
                 jnp.cumsum(P - mu, axis=0, dtype=jnp.float32)], axis=0)
            base = bpc + mu * jnp.arange(
                x.shape[0] + 1, dtype=jnp.float32)[:, None]
            S = jnp.concatenate(
                [ipx, jnp.zeros((1, GF_, 128), jnp.float32)]
            ) + base[:, :, None]
            if boundary == "rowgather":
                S_rows = jnp.swapaxes(S, 1, 2).reshape(-1, GF_)
                d = S_rows[b] - S_rows[jnp.maximum(b - 7, 0)]
            else:
                d = (S[b // 128, :, b % 128]
                     - S[jnp.maximum(b - 7, 0) // 128, :,
                         jnp.maximum(b - 7, 0) % 128])
            return jnp.sum(d)
        return fn

    timeit("scan split3 + 2axis (cur)", loop(scan_variant("2axis", "split3")),
           xb, b_hi)
    timeit("scan split3 + rowgather", loop(scan_variant("rowgather",
                                                        "split3")), xb, b_hi)
    timeit("scan HIGHEST + rowgather", loop(scan_variant("rowgather",
                                                         "highest")), xb, b_hi)
    timeit("scan HIGHEST + 2axis", loop(scan_variant("2axis", "highest")),
           xb, b_hi)


def run_micro(scene, cam, mi, n_iter):
    import jax
    import jax.numpy as jnp

    from gaussianeditor_tpu.ops import binning_sorted as bs
    from gaussianeditor_tpu.ops.preprocess import TILE

    gx = cam.width // TILE
    ntiles = gx * gx
    R, NB, NC = bs.sorted_capacities(mi, ntiles)
    C = scene.params.xyz.shape[0]
    timeit = timer(n_iter)
    rng = np.random.RandomState(7)

    table = jnp.asarray(rng.rand(C + 1, 16).astype(np.float32))
    gsrc = jnp.asarray(np.sort(rng.randint(0, C, R)).astype(np.int32))
    key = jnp.asarray(rng.randint(0, 2 ** 31, R).astype(np.uint32))
    colsf = [jnp.asarray(rng.rand(R).astype(np.float32)) for _ in range(12)]
    perm = jnp.asarray(rng.permutation(R).astype(np.int32))
    avals = jnp.arange(R, dtype=jnp.int32)
    rows_big = jnp.asarray(rng.rand(NC * 128, 10).astype(np.float32))

    def loop(fn):
        @jax.jit
        def run(*args):
            def body(i, acc):
                return acc * 0.5 + fn(i, *args)
            return jax.lax.fori_loop(0, n_iter, body, 0.0)
        return run

    timeit("monotone row gather [C+1,16]->[R,16]",
           loop(lambda i, t, g: jnp.sum(t[g + (i & 0)][::4096])), table, gsrc)
    timeit("random row gather [R2,10]->[R,10]",
           loop(lambda i, r, p: jnp.sum(r[(p + (i & 0)) % (NC * 128)][::4096])),
           rows_big, perm)
    for w in (2, 6, 12):
        ops_w = tuple(colsf[:w])
        timeit(f"fat sort key+{w} payloads",
               loop(lambda i, k, *cs_: jnp.sum(jax.lax.sort(
                   (k + jnp.uint32(i & 0),) + cs_, num_keys=1,
                   is_stable=True)[1])), key, *ops_w)
    timeit("perm inversion: scatter-set",
           loop(lambda i, p, a: jnp.sum((jnp.zeros((R,), jnp.int32)
                                         .at[p + (i & 0)].set(a)
                                         % 7).astype(jnp.float32))),
           perm, avals)
    timeit("cumsum over R (i32)",
           loop(lambda i, a: jnp.sum((jnp.cumsum(a + (i & 0)) % 97)
                                     .astype(jnp.float32)) * 1e-6),
           avals)
    timeit("cummax over R (i32)",
           loop(lambda i, a: jnp.sum((jax.lax.cummax(a + (i & 0)) % 97)
                                     .astype(jnp.float32)) * 1e-6),
           avals)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="pipeline",
                    choices=["pipeline", "kernels", "micro", "pre", "reduce"])
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--mi", type=int, default=393_216)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    scene, cam = make_scene(args.n, args.hw)
    print(f"mode={args.mode} n={args.n} hw={args.hw} mi={args.mi}",
          flush=True)
    if args.mode == "pipeline":
        run_pipeline(scene, cam, args.mi, args.iters)
    elif args.mode == "kernels":
        run_kernels(scene, cam, args.mi, args.iters)
    elif args.mode == "pre":
        run_pre(scene, cam, args.mi, args.iters)
    elif args.mode == "reduce":
        run_reduce(scene, cam, args.mi, args.iters)
    else:
        run_micro(scene, cam, args.mi, args.iters)


if __name__ == "__main__":
    main()
