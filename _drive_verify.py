"""End-to-end drive of the flagship flow on the real TPU chip."""
import time

import jax
import numpy as np

from gaussianeditor_tpu.core.cameras import lookat_camera, orbit_cameras
from gaussianeditor_tpu.edit.edit_system import EditConfig, EditSystem
from gaussianeditor_tpu.guidance.fake import FakeGuidance
from gaussianeditor_tpu.models.gaussians import GaussianScene
from gaussianeditor_tpu.models.ply import load_ply, save_ply
from gaussianeditor_tpu.ops.render import render

print("devices:", jax.devices())

rng = np.random.RandomState(0)
P = 20000
pts = rng.normal(0, 0.5, (P, 3)).astype(np.float32)
cols = rng.uniform(0.2, 0.9, (P, 3)).astype(np.float32)
scene = GaussianScene.from_points(pts, cols, capacity=2 * P)

cam = lookat_camera(
    eye=np.array([0.0, 0.0, 3.0]), target=np.zeros(3),
    up=np.array([0.0, 1.0, 0.0]), fovx=1.0, fovy=1.0, height=512, width=512,
)
rfn = jax.jit(lambda s, c: render(s, c))
out = rfn(scene, cam)
out.color.block_until_ready()
assert not bool(out.overflow), "overflow on 20k scene at 512^2"
assert np.isfinite(np.asarray(out.color)).all()
t0 = time.perf_counter()
for _ in range(10):
    out = rfn(scene, cam)
out.color.block_until_ready()
dt = (time.perf_counter() - t0) / 10
print(f"warm forward render 512^2: {dt * 1e3:.2f} ms")

# edit loop with fake guidance
cams = orbit_cameras(8, radius=3.0, fovx=1.0, fovy=1.0,
                     height=128, width=128)
cfg = EditConfig(
    prompt="make it red", batch_size=2, max_steps=20,
    densification_interval=10, per_editing_step=1000,
)
sys_ = EditSystem(scene, cams, cfg, guidance=FakeGuidance())
losses = []
sys_.fit(callback=lambda step, metrics: losses.append(metrics["loss"]))
assert len(losses) == 20
assert np.isfinite(losses).all(), "non-finite loss"
# densify at step 10 prunes max_screen splats (reference parity), which
# legitimately bumps the loss vs the fixed target; judge the pre-densify run
assert losses[9] < losses[0], f"loss did not decrease: {losses[0]} -> {losses[9]}"
xyz = np.asarray(sys_.state.scene.get_xyz)
assert np.isfinite(xyz).all(), "non-finite params"
print(f"edit loop: loss {losses[0]:.4f} -> {losses[-1]:.4f}")

# PLY roundtrip
save_ply(sys_.state.scene, "/tmp/_drive.ply")
loaded = load_ply("/tmp/_drive.ply")
mi = 4 * 65536
a = np.asarray(jax.jit(lambda s, c: render(s, c, max_instances=mi))(
    sys_.state.scene, cams[0]).color)
b = np.asarray(jax.jit(lambda s, c: render(s, c, max_instances=mi))(
    loaded, cams[0]).color)
assert np.allclose(a, b, atol=2e-2), f"roundtrip render mismatch {np.abs(a - b).max()}"
print("PLY roundtrip render matches, max diff", np.abs(a - b).max())
print("DRIVE OK")
