"""Microbench: in-kernel prefix-sum strategies + pack cost (TPU)."""
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PX, CHUNK, NC = 256, 128, 5120
N = 30


def bench(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000:.2f} ms", flush=True)


def _tri():
    j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (j <= k).astype(jnp.float32)


def mk(prefix_mode):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        if prefix_mode == "tri_highest":
            cum = jax.lax.dot_general(
                x, _tri(), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        elif prefix_mode == "tri_default":
            cum = jax.lax.dot_general(
                x, _tri(), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            cum = jnp.cumsum(x, axis=1)
        o_ref[:] = cum * 0.5 + x

    return pl.pallas_call(
        kernel,
        grid=(NC,),
        in_specs=[pl.BlockSpec((PX, CHUNK), lambda c: (0, c))],
        out_specs=pl.BlockSpec((PX, CHUNK), lambda c: (0, c)),
        out_shape=jax.ShapeDtypeStruct((PX, NC * CHUNK), jnp.float32),
    )


x = jnp.asarray(np.random.RandomState(0).rand(PX, NC * CHUNK), jnp.float32)
for mode in ("tri_highest", "tri_default", "cumsum"):
    try:
        f = mk(mode)
        def loop(x, f=f):
            def body(i, acc):
                return acc + jnp.sum(f(x + i * 0.0)[::64, ::997])
            return jax.lax.fori_loop(0, N, body, 0.0)
        bench(f"prefix {mode} x{N}", loop, x)
        # numerics check vs host cumsum
        out = f(x)[:, :CHUNK]
        ref = np.cumsum(np.asarray(x[:, :CHUNK]), axis=1) * 0.5 + np.asarray(
            x[:, :CHUNK])
        print("   max err:", float(np.abs(np.asarray(out) - ref).max()),
              flush=True)
    except Exception as e:
        print(f"prefix {mode}: FAILED {type(e).__name__}: {e}", flush=True)

# pack cost: two-stage row gather as in make_pallas_compositor_dense
C, R, F = 100_000, 524_288, 16
R2 = R + 128 * 1025
g = jnp.asarray(np.random.RandomState(1).rand(C, F), jnp.float32)
sorted_g = jnp.asarray(
    np.sort(np.random.RandomState(2).randint(0, C, R)), jnp.int32)
p0 = jnp.asarray(np.arange(R2 // 128) % (R // 128) * 128, jnp.int32)
nv = jnp.asarray(np.full(R2 // 128, 128), jnp.int32)


def pack2(g, sorted_g, p0, nv):
    def body(i, acc):
        rows_sorted = jnp.pad(g[sorted_g], ((0, 1), (0, 0)))
        lane = jax.lax.broadcasted_iota(jnp.int32, (R2 // 128, 128), 1)
        src = p0[:, None] + lane + i * 0
        src = jnp.where(lane < nv[:, None], src, R)
        inst = rows_sorted[src.reshape(-1)].T
        return acc + jnp.sum(inst[:, ::997])
    return jax.lax.fori_loop(0, N, body, 0.0)


def pack1(g, sorted_g, p0, nv):
    def body(i, acc):
        lane = jax.lax.broadcasted_iota(jnp.int32, (R2 // 128, 128), 1)
        src = p0[:, None] + lane + i * 0
        live = lane < nv[:, None]
        src = jnp.where(live, jnp.minimum(src, R - 1), R - 1)
        gid = jnp.where(live.reshape(-1), sorted_g[src.reshape(-1)], C - 1)
        inst = jnp.where(live.reshape(-1)[:, None], g[gid], 0.0).T
        return acc + jnp.sum(inst[:, ::997])
    return jax.lax.fori_loop(0, N, body, 0.0)


bench(f"pack two-stage x{N}", pack2, g, sorted_g, p0, nv)
bench(f"pack fused x{N}", pack1, g, sorted_g, p0, nv)
print("done", flush=True)
