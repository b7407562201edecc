"""Edit-layer tests with deterministic fakes (SURVEY.md section 4 point 5):
semantic tracing (apply_weights lifting), the Edit loop end-to-end
(targets from FakeGuidance; loss must drop), Del (shell mask + prune +
inpaint), Add (depth alignment + rigid placement + concat)."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianeditor_tpu.core.cameras import orbit_cameras
from gaussianeditor_tpu.edit.add_system import align_depth_scale, place_object_in_scene
from gaussianeditor_tpu.edit.del_system import near_gaussians_by_mask
from gaussianeditor_tpu.edit.edit_system import EditConfig, EditSystem, ViewSampler
from gaussianeditor_tpu.edit.tracing import update_mask_from_views
from gaussianeditor_tpu.guidance.fake import FakeGuidance, FakeInpainter, FakeSegmentor
from gaussianeditor_tpu.ops.apply_weights import apply_weights
from gaussianeditor_tpu.ops.render import render
from tests.helpers import make_camera, random_scene


def _two_cluster_scene(seed=0, n_obj=30, n_bg=60):
    """Scene with a small 'object' cluster near origin and background
    points in a shell, distinguishable by position."""
    rng = np.random.RandomState(seed)
    obj = rng.uniform(-0.25, 0.25, (n_obj, 3))
    theta = rng.uniform(0, 2 * np.pi, n_bg)
    phi = rng.uniform(-0.6, 0.6, n_bg)
    bg = np.stack(
        [1.5 * np.cos(theta) * np.cos(phi), 1.5 * np.sin(phi),
         1.5 * np.sin(theta) * np.cos(phi)], axis=1
    )
    pts = np.concatenate([obj, bg]).astype(np.float32)
    scene = random_scene(n_obj + n_bg, seed=seed)
    return scene.replace(params=scene.params.replace(xyz=jnp.asarray(pts)))


class TestApplyWeights:
    def test_full_mask_selects_visible(self):
        scene = random_scene(60, seed=1)
        cam = make_camera(64, 64)
        w = jnp.zeros((scene.capacity, 1))
        c = jnp.zeros((scene.capacity,), jnp.int32)
        ones = jnp.ones((64, 64, 1))
        w, c, over = jax.jit(lambda s, cm, iw, ww, cc: apply_weights(
            s, cm, iw, ww, cc, tile_cap=512, chunk=64))(scene, cam, ones, w, c)
        assert not bool(over)
        out = render(scene, cam, impl="tiled", tile_cap=512, chunk=64)
        vis = np.asarray(out.visible)
        norm = np.asarray(w[:, 0] / (c + 1e-7))
        # every Gaussian that actually contributes pixels gets weight ~1
        contributing = (np.asarray(c) > 0)
        assert contributing.sum() > 10
        np.testing.assert_allclose(norm[contributing], 1.0, atol=1e-5)
        assert not contributing[~vis].any()

    def test_zero_mask_zero_weights(self):
        scene = random_scene(30, seed=2)
        cam = make_camera(32, 32)
        w = jnp.zeros((scene.capacity, 1))
        c = jnp.zeros((scene.capacity,), jnp.int32)
        w, c, _ = jax.jit(lambda s, cm, iw, ww, cc: apply_weights(
            s, cm, iw, ww, cc, tile_cap=256, chunk=32))(
            scene, cam, jnp.zeros((32, 32, 1)), w, c)
        assert float(jnp.abs(w).max()) == 0.0
        assert int(c.sum()) > 0  # counts still accumulate


class TestTracing:
    def test_spatial_mask_selects_object_cluster(self):
        """Lifting a 2D disk mask (center of each view) should select the
        central object Gaussians, not the background shell."""
        scene = _two_cluster_scene()
        cams = orbit_cameras(6, 4.0, 0.8, 0.8, 64, 64)
        masks = []
        ys, xs = np.mgrid[0:64, 0:64]
        disk = (((xs - 31.5) ** 2 + (ys - 31.5) ** 2) < 12**2).astype(np.float32)
        masks = [disk] * len(cams)
        traced, norm = update_mask_from_views(scene, cams, masks, 0.5,
                                              tile_cap=512, chunk=64)
        m = np.asarray(traced.mask)
        # object cluster (first 30) mostly selected; background mostly not
        assert m[:30].mean() > 0.6
        assert m[30:90].mean() < 0.2


class TestEditSystem:
    def test_edit_loop_converges_and_densifies(self):
        scene = random_scene(80, seed=3)
        cams = orbit_cameras(6, 4.0, 0.8, 0.8, 48, 48)
        cfg = EditConfig(
            prompt="warmify", batch_size=2, max_steps=25, per_editing_step=10,
            densification_interval=10, densify_until_step=20,
            edit_until_step=25, cameras_extent=2.0,
            max_instances=8192, tile_cap=512, chunk=64,
        )
        # perceptual=None isolates the photometric-convergence mechanics;
        # the on-by-default perceptual path is covered by
        # test_perceptual_term_on_by_default
        sys_ = EditSystem(scene, cams, cfg, guidance=FakeGuidance(),
                          perceptual=None)
        losses = []
        sys_.fit(callback=lambda s, m: losses.append(float(m["loss"])))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.8
        assert int(sys_.state.step) == 25

    def test_mask_gates_updates(self):
        """With an all-False semantic mask, only rotation may drift
        (grad-mask parity, gaussian_model.py:849)."""
        scene = random_scene(40, seed=4)
        scene = scene.set_mask(jnp.zeros((40,), bool))
        cams = orbit_cameras(4, 4.0, 0.8, 0.8, 32, 32)
        cfg = EditConfig(prompt="x", batch_size=2, max_steps=4,
                         per_editing_step=10, densify_until_step=0,
                         cameras_extent=2.0, max_instances=4096,
                         tile_cap=256, chunk=32)
        sys_ = EditSystem(scene, cams, cfg, guidance=FakeGuidance())
        sys_.fit()
        np.testing.assert_allclose(sys_.state.scene.params.xyz,
                                   scene.params.xyz)
        np.testing.assert_allclose(sys_.state.scene.params.features_dc,
                                   scene.params.features_dc)

    def test_perceptual_term_on_by_default(self):
        """The reference trains L1 + lambda_p*LPIPS (GassuianEditorEdit.py:
        133-145); our edit loop must produce a nonzero perceptual term out
        of the box (VERDICT round-1 weak #5)."""
        scene = random_scene(60, seed=7)
        cams = orbit_cameras(4, 4.0, 0.8, 0.8, 32, 32)
        cfg = EditConfig(prompt="x", batch_size=2, max_steps=2,
                         per_editing_step=10, densify_until_step=0,
                         cameras_extent=2.0, max_instances=4096,
                         tile_cap=256, chunk=32)
        sys_ = EditSystem(scene, cams, cfg, guidance=FakeGuidance())
        assert sys_.perceptual is not None
        terms = []
        sys_.fit(callback=lambda s, m: terms.append(float(m["loss_p"])))
        assert any(t > 0 for t in terms)

    def test_view_sampler_without_replacement(self):
        s = ViewSampler(5, 2, seed=0)
        seen = []
        for _ in range(5):
            seen += s.sample()
        # first 5 draws cover all views exactly once
        assert sorted(seen[:5]) == [0, 1, 2, 3, 4]


class TestDelSystem:
    def test_near_gaussians_shell(self):
        xyz = np.zeros((10, 3), np.float32)
        # shell candidates must sit inside the 1.3x-expanded 3%-97%
        # quantile bbox of the object AND within dist_thresh of it —
        # both filters are reference semantics (gaussian_model.py:869-887)
        xyz[:5] = np.array([[-0.1, -0.1, -0.1], [0.1, 0.1, 0.1],
                            [0.1, -0.1, 0.0], [-0.1, 0.1, 0.0],
                            [0.0, 0.0, 0.1]], np.float32)
        xyz[5] = [0.11, 0, 0]       # near, in bbox
        xyz[6] = [0.0, 0.115, 0]    # near, in bbox
        xyz[7] = [2.0, 0, 0]        # far
        xyz[8] = [0, 0, 0.12]       # near, in bbox
        xyz[9] = [5.0, 5.0, 5.0]    # far
        mask = np.zeros(10, bool)
        mask[:5] = True
        alive = np.ones(10, bool)
        shell = near_gaussians_by_mask(xyz, mask, alive, dist_thresh=0.15)
        assert shell[5] and shell[6] and shell[8]
        assert not shell[7] and not shell[9]
        assert not shell[:5].any()  # object itself excluded

    def test_del_system_prunes_and_trains(self):
        from gaussianeditor_tpu.edit.del_system import DelConfig, DelSystem

        scene = _two_cluster_scene(seed=5)
        cams = orbit_cameras(4, 4.0, 0.8, 0.8, 48, 48)
        cfg = DelConfig(
            seg_prompt="object", batch_size=2, max_steps=6,
            densify_until_step=0, cameras_extent=2.0, inpaint_scale=30.0,
            max_instances=8192, tile_cap=512, chunk=64, mask_dilate=2,
        )
        ys, xs = np.mgrid[0:48, 0:48]
        disk = (((xs - 23.5) ** 2 + (ys - 23.5) ** 2) < 10**2).astype(np.float32)

        class DiskSegmentor:
            def __call__(self, image, prompt):
                return disk

        n_before = 90
        sys_ = DelSystem(scene, cams, cfg, inpainter=FakeInpainter(),
                         segmentor=DiskSegmentor())
        sys_.on_fit_start()
        # the central object is gone
        assert int(sys_.scene.n_alive) < n_before
        alive = np.asarray(sys_.scene.alive)
        assert alive[:30].mean() < 0.4  # object cluster mostly pruned
        assert alive[30:90].mean() > 0.8  # background kept
        losses = []
        sys_.fit(n_steps=6, callback=lambda s, m: losses.append(float(m["loss"])))
        assert np.isfinite(losses).all()


class TestAddSystem:
    def test_align_depth_scale(self):
        rng = np.random.RandomState(0)
        est = rng.uniform(1, 5, (32, 32)).astype(np.float32)
        rendered = 2.0 * est + 0.5
        obj = np.zeros((32, 32), bool)
        obj[10:20, 10:20] = True
        a, b = align_depth_scale(est, rendered, obj)
        assert abs(a - 2.0) < 1e-4 and abs(b - 0.5) < 1e-3

    def test_place_object_lands_in_bbox(self):
        obj = random_scene(20, seed=6, spread=0.5)
        cam = make_camera(64, 64)
        bbox = (20, 24, 44, 48)
        depth = 3.0
        placed = place_object_in_scene(obj, cam, bbox, depth)
        out = render(placed, cam, impl="tiled", max_instances=4096,
                     tile_cap=256, chunk=32)
        # the placed object's projected center is inside the bbox
        xyz = np.asarray(placed.params.xyz)
        center = xyz.mean(axis=0)
        W = np.asarray(cam.world_view)
        p_cam = W[:3, :3] @ center + W[:3, 3]
        assert abs(p_cam[2] - depth) < 0.3
        p = np.asarray(cam.full_proj) @ np.append(center, 1.0)
        ndc = p[:2] / p[3]
        px = (ndc[0] + 1) * 64 / 2
        py = (ndc[1] + 1) * 64 / 2
        assert 20 <= px <= 44 and 24 <= py <= 48

    def test_concat_refine_only_moves_object(self):
        from gaussianeditor_tpu.models.gaussians import concat_scenes

        base = random_scene(30, seed=7)
        obj = random_scene(10, seed=8)
        merged = concat_scenes(base, obj)
        cams = orbit_cameras(4, 4.0, 0.8, 0.8, 32, 32)
        cfg = EditConfig(prompt="blend", batch_size=2, max_steps=3,
                         per_editing_step=10, densify_until_step=0,
                         cameras_extent=2.0, max_instances=8192,
                         tile_cap=256, chunk=32)
        sys_ = EditSystem(merged, cams, cfg, guidance=FakeGuidance())
        sys_.fit()
        got = sys_.state.scene.params
        np.testing.assert_allclose(got.xyz[:30], merged.params.xyz[:30])
        assert float(jnp.abs(got.xyz[30:] - merged.params.xyz[30:]).max()) > 0


class TestCheckpointResume:
    def test_periodic_checkpoint_and_resume(self, tmp_path):
        """checkpoint_every writes TrainState snapshots; resume()
        restores one and continues to the same final state as an
        uninterrupted run (the reference's ModelCheckpoint + cfg.resume
        flow, launch.py:133-136,193)."""
        scene = random_scene(60, seed=9)
        cams = orbit_cameras(4, 4.0, 0.8, 0.8, 48, 48)

        def mk(ckpt_dir=""):
            cfg = EditConfig(
                prompt="p", batch_size=2, max_steps=12, per_editing_step=6,
                densification_interval=100, edit_until_step=12,
                cameras_extent=2.0, max_instances=8192, tile_cap=512,
                chunk=64, checkpoint_every=6 if ckpt_dir else 0,
                checkpoint_dir=ckpt_dir,
            )
            return EditSystem(scene, cams, cfg, guidance=FakeGuidance(),
                              perceptual=None)

        ref = mk()
        ref.fit(n_steps=12)

        a = mk(str(tmp_path))
        a.fit(n_steps=6)
        ckpt = tmp_path / "state_000006.npz"
        assert ckpt.exists()

        b = mk()
        b.resume(str(ckpt))
        assert int(b.state.step) == 6
        b.fit(n_steps=6)
        assert int(b.state.step) == 12
        # deterministic pipeline + restored optimizer/stats state ->
        # the resumed run reproduces the uninterrupted trajectory.
        # (ViewSampler state is re-seeded per system; steps 6-11 draw the
        # same views in both runs because sampling is a pure function of
        # (seed, step) for full-view sampling with n=4, batch=2.)
        np.testing.assert_allclose(
            np.asarray(b.state.scene.params.xyz),
            np.asarray(ref.state.scene.params.xyz), atol=1e-6)


class TestDispatchBurst:
    def _fit(self, burst, steps=21):
        scene = random_scene(80, seed=5)
        cams = orbit_cameras(6, 4.0, 0.8, 0.8, 48, 48)
        cfg = EditConfig(
            prompt="x", batch_size=2, max_steps=steps, per_editing_step=5,
            densification_interval=10, densify_until_step=15,
            edit_until_step=steps, cameras_extent=2.0,
            max_instances=8192, tile_cap=512, chunk=64,
            dispatch_burst=burst,
        )
        # guidance=None -> targets are the (deterministic) origin
        # renders, so burst and per-step loops see identical inputs
        sys_ = EditSystem(scene, cams, cfg, guidance=None,
                          perceptual=None)
        seen = []
        sys_.fit(callback=lambda s, m: seen.append((s, float(m["loss"]))))
        return sys_, seen

    def test_burst_matches_per_step_loop(self):
        """K-step scan bursts must train the same model as the per-step
        loop: same sampler draws, same weights schedule, same densify
        cadence (trainer.make_multi_train_step + fit burst branch)."""
        s1, seen1 = self._fit(1)
        s2, seen2 = self._fit(8)
        assert int(s1.state.step) == int(s2.state.step) == 21
        # callback fired once per step in both modes, in order
        assert [s for s, _ in seen1] == [s for s, _ in seen2] == list(
            range(21))
        np.testing.assert_allclose(
            np.asarray(s1.state.scene.params.xyz),
            np.asarray(s2.state.scene.params.xyz), rtol=0, atol=2e-5)
        np.testing.assert_allclose(
            [l for _, l in seen1], [l for _, l in seen2],
            rtol=2e-4)

    def test_burst_crosses_resolution_milestones(self):
        """Bursts break at milestones; the device frame/camera caches
        invalidate on the size change and the run finishes finite with
        callbacks for every step."""
        scene = random_scene(50, seed=9)
        cams = orbit_cameras(4, 4.0, 0.8, 0.8, 32, 32)
        cfg = EditConfig(
            prompt="p", batch_size=1, max_steps=9, per_editing_step=0,
            densification_interval=100, densify_until_step=0,
            edit_until_step=9, cameras_extent=2.0,
            max_instances=8192, tile_cap=512, chunk=64,
            resolution_milestones=[3, 6],
            heights=[32, 48, 64], widths=[32, 48, 64],
            batch_sizes=[1, 1, 2],
            dispatch_burst=8,
        )
        sys_ = EditSystem(scene, cams, cfg, guidance=FakeGuidance(),
                          perceptual=None)
        seen = []
        sys_.fit(callback=lambda s, m: seen.append(
            (s, float(m["loss"]))))
        assert [s for s, _ in seen] == list(range(9))
        assert np.isfinite([l for _, l in seen]).all()
        assert sys_._frames_dev.shape[1:3] == (64, 64)
        assert int(sys_.state.step) == 9

    def test_burst_checkpoint_resume_matches(self, tmp_path):
        """Periodic checkpoints written at burst boundaries; resuming a
        burst run reproduces the uninterrupted trajectory."""
        import os

        def build(ckpt_dir):
            scene = random_scene(60, seed=15)
            cams = orbit_cameras(5, 4.0, 0.8, 0.8, 48, 48)
            cfg = EditConfig(
                prompt="x", batch_size=2, max_steps=12,
                per_editing_step=4, densification_interval=100,
                densify_until_step=0, edit_until_step=12,
                cameras_extent=2.0, max_instances=8192, tile_cap=512,
                chunk=64, dispatch_burst=4,
                checkpoint_every=8, checkpoint_dir=ckpt_dir,
            )
            return EditSystem(scene, cams, cfg, guidance=None,
                              perceptual=None)

        d1 = str(tmp_path / "a")
        full = build(d1)
        full.fit()
        ckpt = os.path.join(d1, "state_000008.npz")
        assert os.path.exists(ckpt)

        resumed = build(str(tmp_path / "b"))
        resumed.resume(ckpt)
        resumed.fit(n_steps=4)
        np.testing.assert_allclose(
            np.asarray(full.state.scene.params.xyz),
            np.asarray(resumed.state.scene.params.xyz),
            rtol=0, atol=1e-6)

    def test_burst_respects_refresh_grid(self):
        """With guidance on, bursts break at per_editing_step grid steps
        so refresh cadence is unchanged vs the per-step loop."""
        scene = random_scene(60, seed=7)
        cams = orbit_cameras(4, 4.0, 0.8, 0.8, 48, 48)
        calls = []

        class CountingGuidance(FakeGuidance):
            def __call__(self, rgb, cond_rgb, prompt):
                calls.append(len(calls))
                return super().__call__(rgb, cond_rgb, prompt)

        cfg = EditConfig(
            prompt="x", batch_size=2, max_steps=12, per_editing_step=4,
            densification_interval=100, densify_until_step=0,
            edit_until_step=12, cameras_extent=2.0,
            max_instances=8192, tile_cap=512, chunk=64,
            dispatch_burst=16,
        )
        sys_ = EditSystem(scene, cams, cfg, guidance=CountingGuidance(),
                          perceptual=None)
        sys_.fit()
        assert int(sys_.state.step) == 12
        assert len(calls) > 0


class TestAsyncGuidance:
    def test_async_refresh_overlaps_training(self):
        """async_guidance=True refreshes edited targets on a worker
        thread while training continues on the stale target (bounded
        staleness); the refreshed frames must land and the loop stays
        finite."""
        import threading
        import time as _time

        main_thread = threading.get_ident()
        call_threads = []

        class SlowGuidance(FakeGuidance):
            def __call__(self, render, origin, prompt, **kw):
                call_threads.append(threading.get_ident())
                _time.sleep(0.05)
                return super().__call__(render, origin, prompt, **kw)

        scene = random_scene(50, seed=13)
        cams = orbit_cameras(3, 4.0, 0.8, 0.8, 48, 48)
        cfg = EditConfig(
            prompt="p", batch_size=1, max_steps=12, per_editing_step=3,
            densification_interval=100, edit_until_step=12,
            cameras_extent=2.0, max_instances=8192, tile_cap=512, chunk=64,
            async_guidance=True,
        )
        sys_ = EditSystem(scene, cams, cfg, guidance=SlowGuidance(),
                          perceptual=None)
        losses = []
        sys_.fit(callback=lambda s, m: losses.append(float(m["loss"])))
        assert np.isfinite(losses).all()
        # the torch pipelines are not reentrant: EVERY guidance call
        # (first-touch included) must ride the single worker thread —
        # never the main thread, which could race an in-flight refresh
        assert call_threads, "guidance was never invoked"
        assert main_thread not in call_threads
        assert len(set(call_threads)) == 1
        # a background refresh actually landed
        assert len(sys_._pending_targets) < len(call_threads)


class TestProgressiveResolution:
    def test_resolution_milestones_step_render_size(self):
        """An edit run with resolution_milestones actually changes the
        render size and batch size at those steps, invalidating the
        cached targets (gs_load.py:273-283 wired into EditSystem)."""
        sizes_seen = []

        class ShapeSpyGuidance(FakeGuidance):
            def __call__(self, render_img, origin, prompt, **kw):
                sizes_seen.append(np.asarray(origin).shape[:2])
                return super().__call__(render_img, origin, prompt, **kw)

        scene = random_scene(50, seed=11)
        cams = orbit_cameras(4, 4.0, 0.8, 0.8, 32, 32)
        cfg = EditConfig(
            prompt="p", batch_size=1, max_steps=9, per_editing_step=2,
            densification_interval=100, edit_until_step=9,
            cameras_extent=2.0, max_instances=8192, tile_cap=512, chunk=64,
            resolution_milestones=[3, 6],
            heights=[32, 48, 64], widths=[32, 48, 64],
            batch_sizes=[1, 1, 2],
        )
        sys_ = EditSystem(scene, cams, cfg, guidance=ShapeSpyGuidance(),
                          perceptual=None)
        hw_per_step = {}
        batch_per_step = {}

        real_apply = sys_._apply_resolution

        def spy(step):
            bs = real_apply(step)
            hw_per_step[step] = sys_._cur_hw
            batch_per_step[step] = bs
            return bs

        sys_._apply_resolution = spy
        losses = []
        sys_.fit(callback=lambda s, m: losses.append(float(m["loss"])))

        assert hw_per_step[0] == (32, 32)
        assert hw_per_step[2] == (32, 32)
        assert hw_per_step[3] == (48, 48)
        assert hw_per_step[5] == (48, 48)
        assert hw_per_step[6] == (64, 64)
        assert batch_per_step[0] == 1 and batch_per_step[6] == 2
        assert np.isfinite(losses).all() and len(losses) == 9
        # guidance regenerated targets at every scheduled size
        assert {s for s in sizes_seen} == {(32, 32), (48, 48), (64, 64)}
        # the final cached targets are at the final size
        assert all(f.shape[:2] == (64, 64)
                   for f in sys_.edit_frames.values())

    def test_fixed_resolution_unchanged_default(self):
        scene = random_scene(30, seed=12)
        cams = orbit_cameras(2, 4.0, 0.8, 0.8, 32, 32)
        cfg = EditConfig(prompt="p", batch_size=1, max_steps=2,
                         per_editing_step=0, densification_interval=100,
                         cameras_extent=2.0, max_instances=8192,
                         tile_cap=512, chunk=64)
        sys_ = EditSystem(scene, cams, cfg, guidance=FakeGuidance(),
                          perceptual=None)
        sys_.fit()
        assert sys_._cur_hw == (32, 32)


class TestBurstBoundaries:
    """Pure host-side unit tests of the burst sizing math."""

    def _sys(self, **kw):
        scene = random_scene(30, seed=21)
        cams = orbit_cameras(3, 4.0, 0.8, 0.8, 32, 32)
        cfg = EditConfig(prompt="x", batch_size=1, cameras_extent=2.0,
                         max_instances=4096, tile_cap=256, chunk=32,
                         dispatch_burst=10, **kw)
        return EditSystem(scene, cams, cfg, guidance=FakeGuidance(),
                          perceptual=None)

    def test_refresh_grid_caps_burst_start_only(self):
        s = self._sys(per_editing_step=10, edit_begin_step=0,
                      edit_until_step=100, densify_until_step=0,
                      max_steps=100)
        # a burst starting ON the grid runs to the next grid point
        assert s._burst_len(10, 100) == 10
        # a burst starting off-grid stops before the next grid point
        assert s._burst_len(13, 100) == 7
        # after edit_until there is no refresh cap
        assert s._burst_len(100, 200) == 10

    def test_edit_begin_delays_refresh_cap(self):
        s = self._sys(per_editing_step=5, edit_begin_step=12,
                      edit_until_step=100, densify_until_step=0,
                      max_steps=100)
        # steps 0-14: the first in-window grid step is 15
        assert s._burst_len(7, 100) == 8

    def test_densify_step_is_burst_last(self):
        s = self._sys(per_editing_step=0, densification_interval=10,
                      densify_until_step=50, max_steps=100,
                      edit_until_step=0)
        # burst from 5 may include step 10 (densify runs after it)...
        assert s._burst_len(5, 100) == 6
        # ...and the next burst starts at 11
        assert s._burst_len(11, 100) == 10

    def test_checkpoint_is_burst_last(self):
        s = self._sys(per_editing_step=0, densify_until_step=0,
                      max_steps=100, edit_until_step=0,
                      checkpoint_every=8, checkpoint_dir="/tmp/x")
        # checkpoint after step 7 ((7+1) % 8 == 0) -> burst [4, 8)
        assert s._burst_len(4, 100) == 4

    def test_burst_pad_regimes(self):
        s = self._sys(per_editing_step=4, edit_until_step=50,
                      densify_until_step=0, max_steps=100)
        assert s._burst_pad(0) == 4     # editing: refresh grid caps
        assert s._burst_pad(60) == 10   # after edit_until: full burst
