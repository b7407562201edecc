"""Round-3 verify drive: flagship flow on the real TPU after the
kernel-diet / table-alignment / blocked-scan changes.

Run: python /root/repo/_drive_r3.py  (ambient JAX_PLATFORMS=axon)
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from gaussianeditor_tpu.core.cameras import lookat_camera, orbit_cameras
    from gaussianeditor_tpu.models.gaussians import GaussianScene
    from gaussianeditor_tpu.models.ply import save_ply, load_ply
    from gaussianeditor_tpu.ops.render import render

    rng = np.random.RandomState(0)
    n = 100_000
    points = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    colors = rng.rand(n, 3).astype(np.float32)
    scene = GaussianScene.from_points(points, colors, capacity=131072)
    cam = lookat_camera(
        np.array([0.0, 0.0, -4.0]), np.zeros(3), np.array([0.0, 1.0, 0.0]),
        0.8, 0.8, 512, 512,
    )

    rfn = jax.jit(lambda s, c: render(s, c))
    t0 = time.time()
    out = rfn(scene, cam)
    jax.block_until_ready(out.color)
    print(f"first render (compile): {time.time()-t0:.1f}s", flush=True)
    assert not bool(out.overflow), "overflow on flagship render"
    img = np.asarray(out.color)
    assert np.isfinite(img).all(), "non-finite render"
    ts = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(rfn(scene, cam).color)
        ts.append(time.time() - t0)
    print(f"warm render: {min(ts)*1e3:.1f} ms (min of 5)", flush=True)

    # edit fit with fake guidance
    from gaussianeditor_tpu.edit.edit_system import EditSystem, EditConfig
    from gaussianeditor_tpu.guidance.fake import FakeGuidance

    cams = orbit_cameras(8, radius=4.0, fovx=0.8, fovy=0.8,
                         height=256, width=256)
    cfg = EditConfig(batch_size=2, max_steps=10,
                     densification_interval=5, densify_until_step=8)
    sys_ = EditSystem(scene, cams, cfg, guidance=FakeGuidance())
    losses = []
    t0 = time.time()
    sys_.fit(callback=lambda step, metrics: losses.append(
        float(metrics["loss"])))
    print(f"edit fit 10 steps: {time.time()-t0:.1f}s "
          f"loss {losses[0]:.4f} -> {losses[-1]:.4f}", flush=True)
    assert losses[-1] < losses[0], "loss did not decrease"
    p = sys_.state.scene.params
    for name in ("xyz", "features_dc", "features_rest", "opacity_raw",
                 "log_scales", "quats"):
        arr = getattr(p, name)
        assert np.isfinite(np.asarray(arr)).all(), f"non-finite {name}"
    print("params finite", flush=True)

    # PLY roundtrip
    save_ply(sys_.state.scene, "/tmp/_drive_r3.ply")
    loaded = load_ply("/tmp/_drive_r3.ply")
    out2 = jax.jit(lambda s, c: render(s, c, max_instances=393216))(
        loaded, cam)
    jax.block_until_ready(out2.color)
    assert np.isfinite(np.asarray(out2.color)).all()
    print("PLY roundtrip render ok", flush=True)
    print("DRIVE PASS", flush=True)


if __name__ == "__main__":
    main()
