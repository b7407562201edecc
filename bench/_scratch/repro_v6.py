import time
import numpy as np
import jax, jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
from bench import make_scene, probe_budget
from gaussianeditor_tpu.core.cameras import lookat_camera
from gaussianeditor_tpu.ops.render import render

hw = 512
cam = lookat_camera(np.array([0.0, 0.0, -4.0]), np.zeros(3), np.array([0.0, 1.0, 0.0]), 0.8, 0.8, hw, hw)
scene = make_scene(100_000)
nr, mi = probe_budget(scene, cam)
print("num_rendered", nr, "mi", mi)

def loss(p):
    out = render(scene.replace(params=p), cam, jnp.zeros(3), max_instances=mi)
    return jnp.sum(out.color) + jnp.sum(out.depth)

g = jax.jit(jax.grad(loss))
t0 = time.perf_counter()
r = g(scene.params)
jax.block_until_ready(r)
print("compile+run ok", time.perf_counter() - t0)
