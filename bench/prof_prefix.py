"""Kernel prefix-sum strategies, non-hoistable inputs (TPU)."""
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PX, CHUNK, NC = 256, 128, 5120
N = 20


def bench(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/N*1000:.3f} ms/iter", flush=True)


def _tri():
    j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (j <= k).astype(jnp.float32)


def roll_prefix(x):
    # inclusive prefix along lanes via log-step shift-adds
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < CHUNK:
        shifted = pltpu.roll(x, s, 1)
        x = x + jnp.where(lane >= s, shifted, 0.0)
        s *= 2
    return x


def mk(mode):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        if mode == "tri_highest":
            cum = jax.lax.dot_general(
                x, _tri(), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        elif mode == "roll":
            cum = roll_prefix(x)
        o_ref[:] = cum * 0.5 + x

    return pl.pallas_call(
        kernel,
        grid=(NC,),
        in_specs=[pl.BlockSpec((PX, CHUNK), lambda c: (0, c))],
        out_specs=pl.BlockSpec((PX, CHUNK), lambda c: (0, c)),
        out_shape=jax.ShapeDtypeStruct((PX, NC * CHUNK), jnp.float32),
    )


x0 = jnp.asarray(np.random.RandomState(0).rand(PX, NC * CHUNK), jnp.float32)
for mode in ("tri_highest", "roll"):
    try:
        f = mk(mode)

        def loop(x, f=f):
            def body(i, acc):
                y = f(x * (1.0 + 1e-9 * i.astype(jnp.float32)))
                return acc + jnp.sum(y[::64, ::997])
            return jax.lax.fori_loop(0, N, body, 0.0)

        bench(f"prefix {mode}", loop, x0)
        out = np.asarray(f(x0)[:, :CHUNK])
        ref = (np.cumsum(np.asarray(x0[:, :CHUNK]), axis=1) * 0.5
               + np.asarray(x0[:, :CHUNK]))
        print("   max err:", float(np.abs(out - ref).max()), flush=True)
    except Exception as e:
        print(f"prefix {mode}: FAILED {type(e).__name__}: {e}", flush=True)
print("done", flush=True)
