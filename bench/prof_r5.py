"""Round-2 perf: kernel-side matmul precision + fwd/bwd kernel timings.

1. tri-matmul precision strategies inside a Pallas kernel (f32 HIGHEST
   vs bf16x2 split vs DEFAULT) — accuracy + speed.
2. fwd kernel alone and bwd kernel alone on realistic chunk counts.
"""
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PX, CHUNK, NC = 256, 128, 5121
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


def mk(mode):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        tri = _tri()
        if mode == "tri_highest":
            cum = jax.lax.dot_general(
                x, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        elif mode == "tri_default":
            cum = jax.lax.dot_general(
                x, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif mode == "tri_bf16x2":
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            trib = tri.astype(jnp.bfloat16)
            cum = (jax.lax.dot_general(
                       hi, trib, (((1,), (0,)), ((), ())),
                       preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(
                       lo, trib, (((1,), (0,)), ((), ())),
                       preferred_element_type=jnp.float32))
        o_ref[:] = cum * 0.5 + x

    return pl.pallas_call(
        kernel,
        grid=(NC,),
        in_specs=[pl.BlockSpec((PX, CHUNK), lambda c: (0, c))],
        out_specs=pl.BlockSpec((PX, CHUNK), lambda c: (0, c)),
        out_shape=jax.ShapeDtypeStruct((PX, NC * CHUNK), jnp.float32),
    )


x0 = jnp.asarray(
    np.random.RandomState(0).rand(PX, NC * CHUNK) * -0.05, jnp.float32)
for mode in ("tri_highest", "tri_default", "tri_bf16x2"):
    try:
        f = mk(mode)

        def loop(x, f=f):
            def body(i, acc):
                y = f(x * (1.0 + 1e-9 * i.astype(jnp.float32)))
                return acc + jnp.sum(y[::64, ::997])
            return jax.lax.fori_loop(0, N, body, 0.0)

        bench(f"prefix {mode}", loop, x0)
        out = np.asarray(f(x0)[:, :CHUNK])
        ref = (np.cumsum(np.asarray(x0[:, :CHUNK]).astype(np.float64),
                         axis=1) * 0.5 + np.asarray(x0[:, :CHUNK]))
        print("   max err:", float(np.abs(out - ref).max()), flush=True)
    except Exception as e:
        print(f"prefix {mode}: FAILED {type(e).__name__}: {e}", flush=True)

# ---- fwd/bwd kernels alone on realistic data ----
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.preprocess import preprocess, TILE
from gaussianeditor_tpu.ops.binning_dense import dense_bin
from gaussianeditor_tpu.ops.pallas_composite import make_pallas_compositor_dense

n = 100_000; hw = 512; MI = 524_288
rng = np.random.RandomState(0)
quats = rng.randn(n, 4).astype(np.float32)
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
params = GaussianParams(
    xyz=jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32)),
    features_dc=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32)*0.3),
    features_rest=jnp.asarray(np.zeros((n, 15, 3), np.float32)),
    opacity_raw=jnp.asarray(rng.uniform(-1, 1, (n, 1)).astype(np.float32)),
    log_scales=jnp.asarray(np.log(rng.uniform(0.004, 0.02, (n, 3))).astype(np.float32)),
    quats=jnp.asarray(quats))
scene = GaussianScene.create(params, max_sh_degree=3, active_sh_degree=3)
cam = lookat_camera(np.array([0, 0, -4.]), np.zeros(3), np.array([0, 1., 0]),
                    0.8, 0.8, hw, hw)
gx = gy = hw // TILE
ntiles = gx * gy

proc = jax.jit(lambda s: preprocess(
    s.params.xyz, s.params.log_scales, s.params.quats, s.get_opacity[:, 0],
    s.get_features, cam, alive=s.alive, active_sh_degree=3,
    max_sh_degree=3))(scene)
db = jax.jit(lambda p: dense_bin(p, gx, gy, MI))(proc)
comp = make_pallas_compositor_dense(ntiles, gx, 3, scene.capacity, MI)

def fwd_with_vjp(m2d, con, op, col, dep):
    out, vjp = jax.vjp(
        lambda a, b, c, d, e: comp(a, b, c, d, e, db), m2d, con, op, col, dep)
    return out, vjp

def fwd_only(i, m2d, con, op, col, dep):
    out = comp(m2d * (1 + 1e-9*i.astype(jnp.float32)), con, op, col, dep, db)
    return jnp.sum(out.color[::3, ::5]) + jnp.sum(out.final_T[::7])

def fwdloop(m2d, con, op, col, dep):
    def body(i, acc):
        return acc + fwd_only(i, m2d, con, op, col, dep)
    return jax.lax.fori_loop(0, N, body, 0.0)

def fbloop(m2d, con, op, col, dep):
    def body(i, acc):
        def loss(a, b, c, d, e):
            out = comp(a, b, c, d, e, db)
            return jnp.sum(out.color) + jnp.sum(out.depth)
        g = jax.grad(loss, argnums=(0, 2))(
            m2d * (1 + 1e-9*i.astype(jnp.float32)), con, op, col, dep)
        return acc + jnp.sum(g[0]) + jnp.sum(g[1])
    return jax.lax.fori_loop(0, N, body, 0.0)

args = (proc.mean2d, proc.conic, proc.opacity, proc.color, proc.depth)
bench("compositor fwd (pack+kernel)", fwdloop, *args)
bench("compositor fwd+bwd (pack+kernels+reduce)", fbloop, *args)
print("done", flush=True)
