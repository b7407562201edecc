"""Cost of the image-assembly stage (tiles_to_image x4 + masks + bg)."""
import time
import numpy as np, jax, jax.numpy as jnp
from gaussianeditor_tpu.ops.composite import tiles_to_image

gx = gy = 32; T = gx*gy; PX = 256
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
rng = np.random.RandomState(0)
out = jnp.asarray(rng.randn(T, PX, 6).astype(np.float32))
nonempty = jnp.asarray(rng.rand(T) > 0.1)
bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

def fdep(i):
    return 1 + 1e-9 * i.astype(jnp.float32)

def assemble4(i, out):
    o = out * fdep(i)
    empty = ~nonempty[:, None]
    acc = jnp.where(empty[..., None], 0.0, o[..., :4])
    t_fin = jnp.where(empty, 1.0, o[..., 4])
    nc = jnp.where(empty, 0.0, o[..., 5]).astype(jnp.int32)
    color = tiles_to_image(acc[..., :3], gx, gy, 512, 512)
    depth = tiles_to_image(acc[..., 3], gx, gy, 512, 512)
    fT = tiles_to_image(t_fin, gx, gy, 512, 512)
    ncimg = tiles_to_image(nc, gx, gy, 512, 512)
    color = color + fT[..., None] * bg[None, None, :]
    return (jnp.sum(color) + jnp.sum(depth) + jnp.sum(fT)
            + jnp.sum(ncimg.astype(jnp.float32)))
bench("assemble v-current (4x untile + masks + bg)", assemble4, out)

def assemble1(i, out):
    o = out * fdep(i)
    img = tiles_to_image(o, gx, gy, 512, 512)     # ONE [H,W,6] untile
    ey = ~nonempty.reshape(gy, gx)
    empty = jnp.repeat(jnp.repeat(ey, 16, 0), 16, 1)
    acc = jnp.where(empty[..., None], 0.0, img[..., :4])
    fT = jnp.where(empty, 1.0, img[..., 4])
    ncimg = jnp.where(empty, 0.0, img[..., 5]).astype(jnp.int32)
    color = acc[..., :3] + fT[..., None] * bg[None, None, :]
    return (jnp.sum(color) + jnp.sum(acc[..., 3]) + jnp.sum(fT)
            + jnp.sum(ncimg.astype(jnp.float32)))
bench("assemble v-one (1x untile + image-space masks)", assemble1, out)
print("done", flush=True)
