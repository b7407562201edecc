"""Pack-layout strategies (TPU): get [F, R2] (or [NC, F, 128]) from
g [C, F] + sorted_g [R] + chunk maps, minimizing transpose/gather cost."""
import time
import numpy as np, jax, jax.numpy as jnp

C, R, F = 100_000, 524_288, 16
NC = (R + 128 * 1025) // 128
R2 = NC * 128
N = 30
rng = np.random.RandomState(0)
g = jnp.asarray(rng.rand(C, F), jnp.float32)
sorted_g = jnp.asarray(np.sort(rng.randint(0, C, R)), jnp.int32)
p0 = jnp.asarray(rng.randint(0, R - 128, NC), jnp.int32)
nv = jnp.asarray(np.where(np.arange(NC) < R // 128, 128, 0), jnp.int32)


def bench(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/N*1000:.3f} ms/iter", flush=True)


def lane():
    return jax.lax.broadcasted_iota(jnp.int32, (NC, 128), 1)


def current(g, sorted_g, p0, nv):
    def body(i, acc):
        gs = g * (1.0 + 1e-9 * i.astype(jnp.float32))
        rows = jnp.pad(gs[sorted_g], ((0, 1), (0, 0)))
        src = jnp.where(lane() < nv[:, None], p0[:, None] + lane(), R)
        out = rows[src.reshape(-1)].T            # [F, R2]
        return acc + jnp.sum(out * out)
    return jax.lax.fori_loop(0, N, body, 0.0)


def fused_rowgather_3d(g, sorted_g, p0, nv):
    # one combined gather into [NC, 128, F], per-chunk transpose to
    # [NC, F, 128] (kernel reads 3-D blocks) — no global transpose
    sg = jnp.pad(sorted_g, (0, 1), constant_values=C)
    gp = jnp.pad(g, ((0, 1), (0, 0)))
    def body(i, acc):
        gs = gp * (1.0 + 1e-9 * i.astype(jnp.float32))
        src = jnp.where(lane() < nv[:, None], p0[:, None] + lane(), R)
        gid = sg[src]                            # [NC, 128] int
        out = gs[gid]                            # [NC, 128, F]
        out = jnp.swapaxes(out, 1, 2)            # [NC, F, 128]
        return acc + jnp.sum(out * out)
    return jax.lax.fori_loop(0, N, body, 0.0)


def colgather(g, sorted_g, p0, nv):
    # transpose the SMALL table once, gather along lanes
    def body(i, acc):
        gs = g * (1.0 + 1e-9 * i.astype(jnp.float32))
        gT = jnp.pad(gs.T, ((0, 0), (0, 1)))     # [F, C+1]
        sg = jnp.pad(sorted_g, (0, 1), constant_values=C)
        src = jnp.where(lane() < nv[:, None], p0[:, None] + lane(), R)
        gid = sg[src.reshape(-1)]                # [R2]
        out = gT[:, gid]                         # [F, R2]
        return acc + jnp.sum(out * out)
    return jax.lax.fori_loop(0, N, body, 0.0)


def rowgather_keep_rowmajor(g, sorted_g, p0, nv):
    # gather to [R2, F] and DON'T transpose (kernel would read (CHUNK, F)
    # blocks and transpose in-kernel)
    sg = jnp.pad(sorted_g, (0, 1), constant_values=C)
    gp = jnp.pad(g, ((0, 1), (0, 0)))
    def body(i, acc):
        gs = gp * (1.0 + 1e-9 * i.astype(jnp.float32))
        src = jnp.where(lane() < nv[:, None], p0[:, None] + lane(), R)
        gid = sg[src.reshape(-1)]
        out = gs[gid]                            # [R2, F]
        return acc + jnp.sum(out * out)
    return jax.lax.fori_loop(0, N, body, 0.0)


bench("pack current (2 gathers + T)", current, g, sorted_g, p0, nv)
bench("pack fused 3d (+swapaxes)", fused_rowgather_3d, g, sorted_g, p0, nv)
bench("pack col-gather from g.T", colgather, g, sorted_g, p0, nv)
bench("pack row-major no transpose", rowgather_keep_rowmajor, g, sorted_g,
      p0, nv)
print("done", flush=True)
