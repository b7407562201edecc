import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NT = 1024; CHUNK = 128; PX = 256; F = 16
R2 = 524288 + CHUNK*NT
N_CHUNKS_PER_TILE = 3
inst = jnp.asarray(np.random.RandomState(0).rand(F, R2).astype(np.float32))
ts = jnp.asarray((np.arange(NT) * (R2 // NT) // CHUNK * CHUNK).astype(np.int32))
tl = jnp.full((NT,), N_CHUNKS_PER_TILE * CHUNK, jnp.int32)

def make(variant):
    def kernel(ts_ref, tl_ref, inst_ref, out_ref, buf, sem):
        t = pl.program_id(0)
        start = ts_ref[t]; length = tl_ref[t]
        n_chunks = pl.cdiv(length, CHUNK)
        def cond(state):
            k, T, done, acc = state
            if variant == "scalar_cond":
                return k < n_chunks
            return (k < n_chunks) & (jnp.sum(done) < PX)
        def body(state):
            k, T, done, acc = state
            off = pl.multiple_of(start + k*CHUNK, CHUNK)
            cp = pltpu.make_async_copy(inst_ref.at[:, pl.ds(off, CHUNK)], buf, sem)
            cp.start(); cp.wait()
            x = buf[0:1,:] - jax.lax.broadcasted_iota(jnp.int32,(PX,1),0).astype(jnp.float32)
            alpha = jnp.exp(jnp.minimum(-x*x, 0.0))
            lf = jnp.log1p(-jnp.minimum(alpha, 0.99))
            j = jax.lax.broadcasted_iota(jnp.int32,(CHUNK,CHUNK),0)
            kk = jax.lax.broadcasted_iota(jnp.int32,(CHUNK,CHUNK),1)
            tri = (j<=kk).astype(jnp.float32)
            cum = jax.lax.dot_general(lf, tri, dimension_numbers=(((1,),(0,)),((),())),
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            TP = T * jnp.exp(cum)
            contr = TP >= 1e-4
            w = jnp.where(contr, alpha*TP, 0.0)
            featd = buf[4:8, :]
            acc = acc + jax.lax.dot_general(w, featd, dimension_numbers=(((1,),(1,)),((),())),
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            T = T * jnp.exp(jnp.sum(jnp.where(contr, lf, 0.0), axis=-1, keepdims=True))
            done = jnp.maximum(done, 1.0-jnp.max(contr.astype(jnp.float32),axis=-1,keepdims=True))
            return k+1, T, done, acc
        T0 = jnp.ones((PX,1),jnp.float32); d0 = jnp.zeros((PX,1),jnp.float32)
        a0 = jnp.zeros((PX,4),jnp.float32)
        _, T, done, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), T0, d0, a0))
        out_ref[0] = acc
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(NT,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[pl.BlockSpec((1,PX,4), lambda i, ts, tl: (i, 0, 0))],
        scratch_shapes=[pltpu.VMEM((F, CHUNK), jnp.float32), pltpu.SemaphoreType.DMA])
    return pl.pallas_call(kernel, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((NT,PX,4), jnp.float32)])

for v in ("scalar_cond","vector_cond"):
    call = make(v)
    f = jax.jit(lambda i_: jax.lax.fori_loop(0, 10, lambda k, a: a + call(ts, tl, i_)[0][:,0,0].sum(), 0.0))
    r = f(inst); jax.block_until_ready(r)
    t0=time.time(); r=f(inst); jax.block_until_ready(r)
    per_call = (time.time()-t0)/10
    n_chunks = NT * N_CHUNKS_PER_TILE
    print(f"{v}: {per_call*1000:.2f} ms/call, {per_call/n_chunks*1e6:.2f} us/chunk")
