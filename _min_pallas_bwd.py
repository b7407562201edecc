import numpy as np, jax, jax.numpy as jnp
from tests.helpers import random_scene, make_camera
from gaussianeditor_tpu.ops.render import render
scene = random_scene(150, seed=0)
cam = make_camera(64, 64)
probe = jax.random.normal(jax.random.key(0), (64,64,3))
fp = jax.jit(lambda s: render(s, cam, jnp.zeros(3), impl="pallas", max_instances=8192))
ft = jax.jit(lambda s: render(s, cam, jnp.zeros(3), impl="tiled", max_instances=8192, tile_cap=1024, chunk=128))
op, ot = fp(scene), ft(scene)
d = np.abs(np.asarray(op.color)-np.asarray(ot.color))
print("fwd img maxdiff:", d.max(), "n>1e-4:", (d>1e-4).sum(), "/", d.size)
dn = np.abs(np.asarray(op.n_contrib, np.int64)-np.asarray(ot.n_contrib, np.int64)) if hasattr(op,'n_contrib') else None
def loss(p, impl, kw):
    s = scene.replace(params=p)
    out = render(s, cam, jnp.zeros(3), impl=impl, max_instances=8192, **kw)
    return jnp.sum(out.color*probe)
gp = jax.jit(jax.grad(lambda p: loss(p,"pallas",{})))(scene.params)
gs = jax.jit(jax.grad(lambda p: loss(p,"tiled",dict(tile_cap=1024,chunk=128))))(scene.params)
a, b = np.asarray(gp.xyz), np.asarray(gs.xyz)
d = np.abs(a-b)
print("xyz grad: maxdiff", d.max(), "n rows >1e-3:", (d.max(1)>1e-3).sum(), "/150")
bad = np.argsort(-d.max(1))[:5]
for i in bad:
    print(" gauss", i, "diff", d[i].max(), "grad_scan", b[i], "grad_pallas", a[i])
