"""End-to-end reconstruction: fit a Gaussian scene to renders of a
reference scene (the minimum slice of SURVEY.md section 7 step 2 /
BASELINE config 1) — PSNR must improve substantially."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianeditor_tpu.core.cameras import orbit_cameras
from gaussianeditor_tpu.ops.render import render
from gaussianeditor_tpu.train.losses import psnr
from gaussianeditor_tpu.train.recon import ReconConfig, ReconTrainer
from tests.helpers import random_scene


def test_photometric_fit_improves_psnr():
    target_scene = random_scene(60, seed=0)
    cams = orbit_cameras(10, 4.0, 0.8, 0.8, 48, 48)
    rfn = jax.jit(lambda s, c: render(
        s, c, jnp.zeros(3), impl="tiled", max_instances=4096,
        tile_cap=256, chunk=32).color)
    images = [np.asarray(rfn(target_scene, c)) for c in cams]

    # perturbed init: same positions, wrong colors + opacity
    init = target_scene.replace(
        params=target_scene.params.replace(
            features_dc=target_scene.params.features_dc * 0.0,
            opacity_raw=jnp.zeros_like(target_scene.params.opacity_raw),
        )
    )
    cfg = ReconConfig(
        max_steps=60, densify_from_step=10_000, opacity_reset_interval=0,
        oneup_sh_every=0, cameras_extent=2.0, max_instances=4096,
        tile_cap=256, chunk=32, impl="tiled",
    )
    trainer = ReconTrainer(init, cams, images, cfg)

    before = float(psnr(rfn(init, cams[0]), jnp.asarray(images[0])))
    trainer.fit()
    after = float(psnr(rfn(trainer.state.scene, cams[0]),
                       jnp.asarray(images[0])))
    assert after > before + 5.0, f"PSNR {before:.2f} -> {after:.2f}"


def test_densify_and_opacity_reset_run():
    scene = random_scene(40, seed=1, capacity=128)
    cams = orbit_cameras(4, 4.0, 0.8, 0.8, 32, 32)
    rfn = jax.jit(lambda s, c: render(
        s, c, jnp.zeros(3), impl="tiled", max_instances=4096,
        tile_cap=256, chunk=32).color)
    images = [np.asarray(rfn(random_scene(40, seed=2), c)) for c in cams]
    cfg = ReconConfig(
        max_steps=25, densify_from_step=5, densification_interval=10,
        densify_grad_threshold=1e-8, opacity_reset_interval=20,
        oneup_sh_every=0, cameras_extent=2.0, max_instances=4096,
        tile_cap=256, chunk=32, impl="tiled",
    )
    trainer = ReconTrainer(scene, cams, images, cfg)
    trainer.fit()
    st = trainer.state
    assert np.isfinite(np.asarray(st.scene.params.xyz)).all()
    # opacity reset clamps activated opacity to <= 0.01 at step 20; only
    # a few steps of recovery follow
    op = np.asarray(st.scene.get_opacity)[np.asarray(st.scene.alive)]
    assert op.max() < 0.5


def test_burst_matches_per_step_loop():
    """dispatch_burst scan bursts train the same model as the per-step
    loop: same view draws, same densify/opacity-reset/SH-oneup cadence
    (train/recon.py burst branch mirrors edit_system's)."""
    def run(burst):
        scene = random_scene(40, seed=3, capacity=128)
        cams = orbit_cameras(5, 4.0, 0.8, 0.8, 32, 32)
        rfn = jax.jit(lambda s, c: render(
            s, c, jnp.zeros(3), impl="tiled", max_instances=4096,
            tile_cap=256, chunk=32).color)
        images = [np.asarray(rfn(random_scene(40, seed=4), c))
                  for c in cams]
        cfg = ReconConfig(
            max_steps=23, densify_from_step=5, densification_interval=10,
            densify_grad_threshold=1e-8, opacity_reset_interval=20,
            oneup_sh_every=8, cameras_extent=2.0, max_instances=4096,
            tile_cap=256, chunk=32, impl="tiled", dispatch_burst=burst,
        )
        trainer = ReconTrainer(scene, cams, images, cfg)
        seen = []
        trainer.fit(callback=lambda s, m: seen.append(
            (s, float(m["loss"]))))
        return trainer.state, seen

    s1, seen1 = run(1)
    s2, seen2 = run(8)
    assert int(s1.step) == int(s2.step) == 23
    assert [s for s, _ in seen1] == [s for s, _ in seen2] == list(range(23))
    np.testing.assert_allclose(
        np.asarray(s1.scene.params.xyz), np.asarray(s2.scene.params.xyz),
        rtol=0, atol=2e-5)
    np.testing.assert_allclose(
        [l for _, l in seen1], [l for _, l in seen2], rtol=2e-4)
