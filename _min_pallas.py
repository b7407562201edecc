import numpy as np, jax, jax.numpy as jnp
from tests.helpers import random_scene, make_camera  # no conftest import -> TPU
from gaussianeditor_tpu.ops.render import render
scene = random_scene(150, seed=0)
cam = make_camera(64, 64)
f = jax.jit(lambda s: render(s, cam, jnp.zeros(3), impl="pallas", max_instances=8192).color)
r = f(scene); jax.block_until_ready(r)
print("pallas fwd on TPU OK", r.shape, float(r.mean()))
