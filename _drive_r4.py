"""Round-4 verify drive: flagship flow through the public API on the
real TPU (see .claude/skills/verify). Run: python /root/repo/_drive_r4.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from gaussianeditor_tpu.core.cameras import lookat_camera, orbit_cameras
from gaussianeditor_tpu.models.gaussians import GaussianScene
from gaussianeditor_tpu.models.ply import save_ply, load_ply
from gaussianeditor_tpu.ops.render import render
from gaussianeditor_tpu.edit.edit_system import EditConfig, EditSystem
from gaussianeditor_tpu.guidance.fake import FakeGuidance

print("devices:", jax.devices(), flush=True)

rng = np.random.RandomState(0)
pts = rng.uniform(-1, 1, (60_000, 3)).astype(np.float32)
cols = rng.rand(60_000, 3).astype(np.float32)
scene = GaussianScene.from_points(pts, cols, capacity=80_000)
cam = lookat_camera(np.array([0, 0, -4.0]), np.zeros(3),
                    np.array([0, 1.0, 0]), 0.8, 0.8, 512, 512)

MI = 2_621_440  # from_points scenes have large pre-densify footprints
rfn = jax.jit(lambda s: render(s, cam, jnp.zeros(3), max_instances=MI))
out = rfn(scene)
img = np.asarray(out.color)
assert np.isfinite(img).all(), "render produced non-finite"
assert not bool(out.overflow), f"overflow at MI={MI}"
t0 = time.perf_counter()
for _ in range(5):
    out = rfn(scene)
    float(jnp.sum(out.color))
print(f"warm render: {(time.perf_counter() - t0) / 5 * 1000:.1f} ms "
      f"(incl dispatch), num_rendered={int(out.num_rendered)}", flush=True)

# tiny budget must trip overflow
out_small = jax.jit(lambda s: render(s, cam, jnp.zeros(3),
                                     max_instances=2048))(scene)
assert bool(out_small.overflow), "tiny budget did not trip overflow"
print("overflow probe ok", flush=True)

# edit loop with densification + the default perceptual term
cams = orbit_cameras(8, 4.0, 0.8, 0.8, 512, 512)
cfg = EditConfig(batch_size=2, max_steps=20, densification_interval=10,
                 densify_until_step=15, cameras_extent=2.0,
                 max_instances=MI, prompt="make it golden")
sys_ = EditSystem(scene, cams, cfg, guidance=FakeGuidance())
losses = []
sys_.fit(callback=lambda s, m: losses.append(float(m["loss"])))
p = sys_.scene.params
for leaf in jax.tree.leaves(p):
    assert bool(jnp.isfinite(leaf).all()), "non-finite params after fit"
assert losses[-1] < losses[0], f"loss did not decrease: {losses[0]} -> {losses[-1]}"
print(f"edit fit ok: loss {losses[0]:.4f} -> {losses[-1]:.4f}, "
      f"n_alive={int(sys_.scene.n_alive)}", flush=True)

# PLY roundtrip; same MI when re-rendering the loaded scene
save_ply(sys_.scene, "/tmp/drive_r4.ply")
loaded = load_ply("/tmp/drive_r4.ply")
out1 = jax.jit(lambda s: render(s, cam, jnp.zeros(3),
                                max_instances=MI))(sys_.scene)
out2 = jax.jit(lambda s: render(s, cam, jnp.zeros(3),
                                max_instances=MI))(loaded)
d = float(jnp.max(jnp.abs(out1.color - out2.color)))
assert d < 1e-5, f"PLY roundtrip render mismatch {d}"
print(f"ply roundtrip ok (max |diff| {d:.2e})", flush=True)
print("DRIVE OK", flush=True)
