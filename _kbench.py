"""Microbenchmark kernel variants: loop+DMA floor, +compute pieces."""
import time, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NT = 1024; CHUNK = 128; PX = 256; F = 16
R2 = 524288 + CHUNK*NT
N_CHUNKS_PER_TILE = 3  # ~ real avg (360k/128/1024)

inst = jnp.asarray(np.random.RandomState(0).rand(F, R2).astype(np.float32))
ts = jnp.asarray((np.arange(NT) * (R2 // NT) // CHUNK * CHUNK).astype(np.int32))
tl = jnp.full((NT,), N_CHUNKS_PER_TILE * CHUNK, jnp.int32)

def make(variant):
    def kernel(ts_ref, tl_ref, inst_ref, out_ref, buf, sem):
        t = pl.program_id(0)
        start = ts_ref[t]; length = tl_ref[t]
        n_chunks = pl.cdiv(length, CHUNK)
        def cond(state):
            k, acc = state
            return k < n_chunks
        def body(state):
            k, acc = state
            off = pl.multiple_of(start + k*CHUNK, CHUNK)
            cp = pltpu.make_async_copy(inst_ref.at[:, pl.ds(off, CHUNK)], buf, sem)
            cp.start(); cp.wait()
            x = buf[0:1,:]
            if variant == "dma_only":
                acc = acc + jnp.sum(x)
            elif variant == "elemwise":
                a = buf[0:1,:] - jax.lax.broadcasted_iota(jnp.int32,(PX,1),0).astype(jnp.float32)
                b = buf[1:2,:] * a
                p = -0.5*(buf[2:3,:]*a*a + buf[4:5,:]*b*b) - buf[3:4,:]*a*b
                e = jnp.exp(jnp.minimum(p, 0.0))
                acc = acc + jnp.sum(e)
            elif variant == "matmul_hi":
                a = buf[0:1,:] - jax.lax.broadcasted_iota(jnp.int32,(PX,1),0).astype(jnp.float32)
                j = jax.lax.broadcasted_iota(jnp.int32,(CHUNK,CHUNK),0)
                kk = jax.lax.broadcasted_iota(jnp.int32,(CHUNK,CHUNK),1)
                tri = (j<=kk).astype(jnp.float32)
                m = jax.lax.dot_general(a*1.0, tri, dimension_numbers=(((1,),(0,)),((),())),
                    preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
                acc = acc + jnp.sum(m)
            elif variant == "matmul_def":
                a = buf[0:1,:] - jax.lax.broadcasted_iota(jnp.int32,(PX,1),0).astype(jnp.float32)
                j = jax.lax.broadcasted_iota(jnp.int32,(CHUNK,CHUNK),0)
                kk = jax.lax.broadcasted_iota(jnp.int32,(CHUNK,CHUNK),1)
                tri = (j<=kk).astype(jnp.float32)
                m = jax.lax.dot_general(a*1.0, tri, dimension_numbers=(((1,),(0,)),((),())),
                    preferred_element_type=jnp.float32)
                acc = acc + jnp.sum(m)
            elif variant == "exp3":
                a = buf[0:1,:] - jax.lax.broadcasted_iota(jnp.int32,(PX,1),0).astype(jnp.float32)
                e1 = jnp.exp(jnp.minimum(a,0.)); e2 = jnp.log1p(jnp.abs(e1)*0.5); e3 = jnp.exp(-e2)
                acc = acc + jnp.sum(e3)
            return k+1, acc
        _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.zeros((),jnp.float32)))
        out_ref[0,0,:] = acc + jnp.zeros((128,), jnp.float32)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(NT,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[pl.BlockSpec((1,1,128), lambda i, ts, tl: (i, 0, 0))],
        scratch_shapes=[pltpu.VMEM((F, CHUNK), jnp.float32), pltpu.SemaphoreType.DMA])
    return pl.pallas_call(kernel, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((NT,1,128), jnp.float32)])

for v in ("dma_only","elemwise","exp3","matmul_def","matmul_hi"):
    call = make(v)
    f = jax.jit(lambda i_: jax.lax.fori_loop(0, 10, lambda k, a: a + call(ts, tl, i_)[0][:, 0, 0].sum(), 0.0))
    r = f(inst); jax.block_until_ready(r)
    t0=time.time(); r=f(inst); jax.block_until_ready(r)
    per_call = (time.time()-t0)/10
    n_chunks = NT * N_CHUNKS_PER_TILE
    print(f"{v}: {per_call*1000:.2f} ms/call, {per_call/n_chunks*1e6:.2f} us/chunk")
