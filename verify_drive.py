"""End-to-end drive on the real TPU (verify skill recipe)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from gaussianeditor_tpu.core.cameras import lookat_camera, orbit_cameras
from gaussianeditor_tpu.models.gaussians import GaussianScene
from gaussianeditor_tpu.models.ply import load_ply, save_ply
from gaussianeditor_tpu.ops.render import render, render_safe
from gaussianeditor_tpu.edit.edit_system import EditConfig, EditSystem
from gaussianeditor_tpu.guidance.fake import FakeGuidance

print("backend:", jax.default_backend(), jax.devices())

rng = np.random.RandomState(0)
n = 20000
pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
cols = rng.rand(n, 3).astype(np.float32)
scene = GaussianScene.from_points(pts, cols, max_sh_degree=1, capacity=4 * n)

cam = lookat_camera(np.array([0, 0, -4.0]), np.zeros(3), np.array([0, 1.0, 0]),
                    0.8, 0.8, 512, 512)
rfn = jax.jit(lambda s, c: render(s, c, jnp.zeros(3), max_instances=1048576))
t0 = time.time()
out = rfn(scene, cam)
col = np.asarray(out.color)
print(f"render 512^2 (cold): {time.time()-t0:.1f}s, overflow={bool(out.overflow)}, "
      f"finite={np.isfinite(col).all()}, mean={col.mean():.4f}")
assert not bool(out.overflow)
assert np.isfinite(col).all()
t0 = time.time()
for _ in range(3):
    col = np.asarray(rfn(scene, cam).color)
print(f"render warm: {(time.time()-t0)/3*1000:.0f} ms/frame")

# overflow flag + render_safe recovery
out_small = render(scene, cam, impl="tiled", max_instances=2048, tile_cap=64)
print("tiny-capacity overflow flag:", bool(out_small.overflow))
assert bool(out_small.overflow)
out_rec = render_safe(scene, cam, impl="tiled", max_instances=131072,
                      tile_cap=256)
print("render_safe recovered:", not bool(out_rec.overflow))

# edit loop with default (on-by-default) perceptual
cams = orbit_cameras(8, 4.0, 0.8, 0.8, 128, 128)
cfg = EditConfig(prompt="warmify", batch_size=2, max_steps=20,
                 per_editing_step=10, densification_interval=10,
                 densify_until_step=15, edit_until_step=20,
                 cameras_extent=2.0, max_instances=65536,
                 dispatch_burst=5)  # exercises burst AND single paths
es = EditSystem(scene, cams, cfg, guidance=FakeGuidance())
hist = []
steps_seen = []
t0 = time.time()
es.fit(callback=lambda s, m: (steps_seen.append(s),
                              hist.append((float(m["loss"]),
                                           float(m["loss_l1"]),
                                           float(m["loss_p"])))))
print(f"edit fit 20 steps (burst=5): {time.time()-t0:.1f}s")
assert steps_seen == list(range(20)), steps_seen
losses = [h[0] for h in hist]
print(f"loss {losses[0]:.4f} -> {losses[-1]:.4f}; "
      f"loss_p[0]={hist[0][2]:.5f} (perceptual ON)")
assert np.isfinite(losses).all()
assert losses[-1] < losses[0]
assert hist[0][2] > 0, "perceptual term must be nonzero by default"
fin = es.state.scene.params
assert np.isfinite(np.asarray(fin.xyz)).all()

# PLY roundtrip
save_ply(es.state.scene, "/tmp/verify_drive.ply")
loaded = load_ply("/tmp/verify_drive.ply", capacity=scene.capacity)
out2 = rfn(loaded, cam)
print("ply roundtrip render finite:", bool(np.isfinite(np.asarray(out2.color)).all()))

# vanilla recon fit (burst dispatch): photometric fit to renders of a
# target scene must reduce loss
from gaussianeditor_tpu.train.recon import ReconConfig, ReconTrainer

rcams = orbit_cameras(6, 4.0, 0.8, 0.8, 128, 128)
rtarget = scene
rimg_fn = jax.jit(lambda s, c: jnp.clip(
    render(s, c, jnp.zeros(3), max_instances=131072, tile_cap=512).color,
    0, 1))
rimages = [np.asarray(rimg_fn(rtarget, c)) for c in rcams]
rinit = scene.replace(params=scene.params.replace(
    features_dc=scene.params.features_dc * 0.0))
rcfg = ReconConfig(max_steps=12, densify_from_step=10_000,
                   opacity_reset_interval=0, oneup_sh_every=0,
                   cameras_extent=2.0, max_instances=131072, tile_cap=512,
                   dispatch_burst=6)
rt = ReconTrainer(rinit, rcams, rimages, rcfg)
rhist = []
t0 = time.time()
rt.fit(callback=lambda s, m: rhist.append(float(m["loss"])))
print(f"recon fit 12 steps (burst=6): {time.time()-t0:.1f}s; "
      f"loss {rhist[0]:.4f} -> {rhist[-1]:.4f}")
assert len(rhist) == 12 and rhist[-1] < rhist[0]
print("VERIFY OK")
