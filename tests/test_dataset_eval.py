"""Data-module parity (data/view_dataset.py: seeded subset, resolution
milestones, val/test selection — gs_load.py:174-374) and the eval
harness (train/metrics.py; compute_clip — GassuianEditorEdit.py:156-173)."""

import json
import os

import numpy as np
import pytest

from gaussianeditor_tpu.data.view_dataset import (
    TrainViewSchedule,
    ViewDataConfig,
    select_test_views,
    select_train_views,
    select_val_views,
)


class TestViewSelection:
    def test_seeded_subset_deterministic(self):
        a = select_train_views(200, 48, seed=0)
        b = select_train_views(200, 48, seed=0)
        assert a == b and len(a) == 48 and len(set(a)) == 48
        assert select_train_views(200, 48, seed=1) != a

    def test_subset_caps_at_total(self):
        assert sorted(select_train_views(5, 48)) == [0, 1, 2, 3, 4]

    def test_val_linspace_over_train_subset(self):
        views = select_val_views([30, 10, 20, 40, 0], 3)
        # sorted subset [0,10,20,30,40] -> endpoints + middle
        assert views == [0, 20, 40]
        assert select_val_views([7], 5) == [7]

    def test_test_views_all(self):
        assert select_test_views(4) == [0, 1, 2, 3]


class TestSchedule:
    def test_resolution_milestones(self):
        cfg = ViewDataConfig(
            height=[64, 128, 256], width=[64, 128, 256],
            batch_size=[4, 2, 1], resolution_milestones=[100, 200],
            max_view_num=8,
        )
        s = TrainViewSchedule(20, cfg)
        assert s.resolution_at(0) == (64, 64, 4)
        assert s.resolution_at(99) == (64, 64, 4)
        assert s.resolution_at(100) == (128, 128, 2)
        assert s.resolution_at(250) == (256, 256, 1)

    def test_milestone_validation(self):
        with pytest.raises(AssertionError):
            TrainViewSchedule(10, ViewDataConfig(
                height=[64, 128], width=[64, 128], batch_size=[1, 1],
                resolution_milestones=[],
            ))

    def test_batch_without_replacement_within_subset(self):
        cfg = ViewDataConfig(batch_size=3, max_view_num=6)
        s = TrainViewSchedule(50, cfg)
        seen = []
        for step in range(4):
            batch = s.sample_batch(step)
            assert all(v in s.view_subset for v in batch)
            seen += batch
        # first 6 draws exhaust the subset exactly once
        assert sorted(seen[:6]) == sorted(s.view_subset)


class TestEditSystemSubset:
    def test_max_view_num_restricts_training_views(self):
        from gaussianeditor_tpu.core.cameras import orbit_cameras
        from gaussianeditor_tpu.edit.edit_system import (
            EditConfig,
            EditSystem,
            ViewSampler,
        )

        sampler = ViewSampler(20, 2, seed=0, max_view_num=5)
        assert len(sampler.views) == 5
        draws = [v for _ in range(10) for v in sampler.sample()]
        assert set(draws) <= set(sampler.views)


class TestMetrics:
    def test_identical_images_perfect_scores(self):
        from gaussianeditor_tpu.train.metrics import compute_image_metrics

        imgs = [np.random.RandomState(i).rand(16, 16, 3).astype(np.float32)
                for i in range(3)]
        out = compute_image_metrics(imgs, imgs)
        assert out["psnr"] > 60
        assert out["ssim"] > 0.99

    def test_noise_degrades(self):
        from gaussianeditor_tpu.train.metrics import compute_image_metrics

        rng = np.random.RandomState(0)
        a = [rng.rand(16, 16, 3).astype(np.float32)]
        b = [np.clip(a[0] + 0.3 * rng.randn(16, 16, 3), 0, 1)
             .astype(np.float32)]
        out = compute_image_metrics(a, b)
        assert out["psnr"] < 25

    def test_evaluate_dirs_cli(self, tmp_path):
        import imageio.v2 as imageio

        from gaussianeditor_tpu.train.metrics import main as metrics_main

        rdir, gdir = tmp_path / "renders", tmp_path / "gt"
        rdir.mkdir(), gdir.mkdir()
        rng = np.random.RandomState(1)
        for i in range(2):
            img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
            imageio.imwrite(str(rdir / f"{i}.png"), img)
            imageio.imwrite(str(gdir / f"{i}.png"), img)
        out_path = tmp_path / "metrics.json"
        metrics_main([str(rdir), str(gdir), "--out", str(out_path)])
        data = json.loads(out_path.read_text())
        assert data["n_images"] == 2 and data["psnr"] > 50

    def test_missing_gt_raises(self, tmp_path):
        import imageio.v2 as imageio

        from gaussianeditor_tpu.train.metrics import evaluate_dirs

        rdir, gdir = tmp_path / "r", tmp_path / "g"
        rdir.mkdir(), gdir.mkdir()
        imageio.imwrite(str(rdir / "a.png"),
                        np.zeros((8, 8, 3), np.uint8))
        with pytest.raises(FileNotFoundError):
            evaluate_dirs(str(rdir), str(gdir))


class _FakeClip:
    """Deterministic embedder: image -> mean-color features, text ->
    hash-derived vector."""

    def embed_image(self, image):
        img = np.asarray(image, np.float32)
        m = img.reshape(-1, 3).mean(0)
        return np.concatenate([m, m * m, [1.0]])

    def embed_text(self, text):
        import hashlib

        h = hashlib.sha256(text.encode()).digest()
        return np.frombuffer(h[:7], np.uint8).astype(np.float32) / 255.0


class TestComputeClip:
    def test_edit_system_compute_clip(self):
        from gaussianeditor_tpu.core.cameras import orbit_cameras
        from gaussianeditor_tpu.edit.edit_system import EditConfig, EditSystem
        from gaussianeditor_tpu.guidance.fake import FakeGuidance
        from tests.helpers import random_scene

        scene = random_scene(40, seed=5)
        cams = orbit_cameras(3, 4.0, 0.8, 0.8, 32, 32)
        cfg = EditConfig(prompt="x", batch_size=2, max_steps=1,
                         densify_until_step=0, cameras_extent=2.0,
                         max_instances=4096, tile_cap=256, chunk=32,
                         clip_prompt_origin="a photo",
                         clip_prompt_target="an autumn photo")
        sys_ = EditSystem(scene, cams, cfg, guidance=FakeGuidance(),
                          perceptual=None)
        sys_.on_fit_start()
        out = sys_.compute_clip(embedder=_FakeClip())
        assert set(out) == {"clip_similarity", "clip_directional"}
        assert all(np.isfinite(v) for v in out.values())

    def test_requires_prompts(self):
        from gaussianeditor_tpu.core.cameras import orbit_cameras
        from gaussianeditor_tpu.edit.edit_system import EditConfig, EditSystem
        from gaussianeditor_tpu.guidance.fake import FakeGuidance
        from tests.helpers import random_scene

        sys_ = EditSystem(
            random_scene(10, seed=0),
            orbit_cameras(2, 4.0, 0.8, 0.8, 16, 16),
            EditConfig(max_instances=2048, tile_cap=128, chunk=32),
            guidance=FakeGuidance(), perceptual=None,
        )
        with pytest.raises(AssertionError):
            sys_.compute_clip(embedder=_FakeClip())
