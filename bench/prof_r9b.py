"""Round-2 primitive measurements for the v5 binning/pack redesign:
  1. lax.sort payload scaling (u32 key + k f32 payloads) at R=524288
  2. XLA monotone row gather [R2,16] (aligned expansion candidate)
  3. Pallas key-build (rank-space elementwise) vs XLA
  4. Pallas column-major cumsum [R,16] vs XLA
All stages take i-dependent inputs so nothing hoists out of fori_loop."""
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 524_288
R2 = 655_488  # not multiple of 128*? it is 5121*128
C = 100_000
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
key0 = jnp.asarray(rng.randint(0, 2**31, R).astype(np.uint32))
pay = [jnp.asarray(rng.randn(R).astype(np.float32)) for _ in range(12)]

def mk_sort(k):
    def f(i, key0, *cols):
        key = key0 ^ i.astype(jnp.uint32)
        outs = jax.lax.sort((key,) + cols, num_keys=1, is_stable=True)
        return sum(jnp.sum(o[::4097]) for o in outs[1:]) + jnp.sum(
            outs[0][::4097].astype(jnp.float32))
    return f

for k in ():
    bench(f"sort u32 + {k} f32 payloads @524k", mk_sort(k), key0, *pay[:k])

# --- monotone row gather [R2,16] from [R+128,16] ---
tbl = jnp.asarray(rng.randn(R + 128, 16).astype(np.float32))
src0 = np.sort(rng.randint(0, R, R2)).astype(np.int32)
src0 = jnp.asarray(src0)

def mono_gather(i, tbl, src):
    rows = tbl[src + jnp.where(i < 0, 1, 0).astype(jnp.int32)]
    return jnp.sum(rows[::37])
bench("monotone row gather [R2,16]", mono_gather, tbl, src0)

def mono_gather_chunked(i, tbl, src):
    rows = tbl[src + jnp.where(i < 0, 1, 0).astype(jnp.int32)]
    inst = jnp.swapaxes(rows.reshape(R2 // 128, 128, 16), 1, 2)
    return jnp.sum(inst[::17, 0, :])
bench("monotone row gather + chunk transpose", mono_gather_chunked, tbl, src0)

# random for comparison
srcr = jnp.asarray(rng.randint(0, R, R2).astype(np.int32))
bench("random row gather [R2,16]", mono_gather, tbl, srcr)

# --- Pallas key-build: 6 int cols -> fused key, live-masked ---
BLK = 4096  # rows per grid step, [BLK] i32 x 6 in, [BLK] u32 out

rows6 = jnp.asarray(rng.randint(0, 1000, (R, 8)).astype(np.int32))
depth_bits = 21
gx = 32

def key_kernel(rows_ref, q_ref, out_ref):
    r = rows_ref[...]
    q = q_ref[...]
    g_bprev = r[:, 0]; g_tt = r[:, 1]; g_rx = r[:, 2]; g_ry = r[:, 3]
    rect_w = jnp.maximum(r[:, 4], 1); g_dkey = r[:, 5]
    j = q - g_bprev
    live = (j >= 0) & (j < g_tt)
    jy = jnp.floor((j.astype(jnp.float32) + 0.5)
                   * (1.0 / rect_w.astype(jnp.float32))).astype(jnp.int32)
    jx = j - jy * rect_w
    tile = (g_ry + jy) * gx + (g_rx + jx)
    key = ((tile.astype(jnp.uint32) << depth_bits)
           | g_dkey.astype(jnp.uint32))
    out_ref[...] = jnp.where(live, key, jnp.uint32(0xFFFFFFFF))

qarr = jnp.arange(R, dtype=jnp.int32)
key_call = pl.pallas_call(
    key_kernel,
    grid=(R // BLK,),
    in_specs=[pl.BlockSpec((BLK, 8), lambda c: (c, 0)),
              pl.BlockSpec((BLK,), lambda c: (c,))],
    out_specs=pl.BlockSpec((BLK,), lambda c: (c,)),
    out_shape=jax.ShapeDtypeStruct((R,), jnp.uint32),
    interpret=jax.default_backend() == "cpu",
)

def pallas_key(i, rows6, qarr):
    out = key_call(rows6 + jnp.where(i < 0, 1, 0).astype(jnp.int32), qarr)
    return jnp.sum(out[::4097].astype(jnp.float32))
bench("pallas key build [R]", pallas_key, rows6, qarr)

def xla_key(i, rows6, qarr):
    r = rows6 + jnp.where(i < 0, 1, 0).astype(jnp.int32)
    q = qarr
    g_bprev = r[:, 0]; g_tt = r[:, 1]; g_rx = r[:, 2]; g_ry = r[:, 3]
    rect_w = jnp.maximum(r[:, 4], 1); g_dkey = r[:, 5]
    j = q - g_bprev
    live = (j >= 0) & (j < g_tt)
    jy = jnp.floor((j.astype(jnp.float32) + 0.5)
                   * (1.0 / rect_w.astype(jnp.float32))).astype(jnp.int32)
    jx = j - jy * rect_w
    tile = (g_ry + jy) * gx + (g_rx + jx)
    key = ((tile.astype(jnp.uint32) << depth_bits)
           | g_dkey.astype(jnp.uint32))
    key = jnp.where(live, key, jnp.uint32(0xFFFFFFFF))
    return jnp.sum(key[::4097].astype(jnp.float32))
bench("xla key build [R]", xla_key, rows6, qarr)

# --- Pallas column cumsum [R,16] with running carry ---
CS_BLK = 2048

def cumsum_kernel(x_ref, out_ref, carry):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        carry[...] = jnp.zeros((1, 16), jnp.float32)

    x = x_ref[...]
    s = jnp.cumsum(x, axis=0) + carry[...]
    out_ref[...] = s
    carry[...] = s[-1:, :]

cs_call = pl.pallas_call(
    cumsum_kernel,
    grid=(R // CS_BLK,),
    in_specs=[pl.BlockSpec((CS_BLK, 16), lambda c: (c, 0))],
    out_specs=pl.BlockSpec((CS_BLK, 16), lambda c: (c, 0)),
    out_shape=jax.ShapeDtypeStruct((R, 16), jnp.float32),
    scratch_shapes=[pltpu.VMEM((1, 16), jnp.float32)],
    interpret=jax.default_backend() == "cpu",
)

mat = jnp.asarray(rng.randn(R, 16).astype(np.float32))

def pallas_cumsum(i, mat):
    out = cs_call(mat * (1 + 1e-9 * i.astype(jnp.float32)))
    return jnp.sum(out[::4097])
bench("pallas cumsum [R,16]", pallas_cumsum, mat)

def xla_cumsum(i, mat):
    out = jnp.cumsum(mat * (1 + 1e-9 * i.astype(jnp.float32)), axis=0,
                     dtype=jnp.float32)
    return jnp.sum(out[::4097])
bench("xla cumsum [R,16]", xla_cumsum, mat)

# sanity: pallas cumsum == xla cumsum
a = np.asarray(jax.jit(cs_call)(mat))
b = np.asarray(jnp.cumsum(mat, axis=0))
print("cumsum max err:", float(np.abs(a - b).max()), flush=True)

print("done", flush=True)
