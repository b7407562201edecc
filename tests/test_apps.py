"""CLI launcher end-to-end (fake guidance), checkpoint roundtrip, saving
utils, click-tracing camera math."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from gaussianeditor_tpu.apps.launch import main as launch_main
from gaussianeditor_tpu.models.ply import load_ply, save_ply
from gaussianeditor_tpu.train.checkpoint import load_train_state, save_train_state
from gaussianeditor_tpu.train.optim import GaussianAdam, OptimConfig
from gaussianeditor_tpu.train.trainer import init_train_state
from gaussianeditor_tpu.utils.camera_math import project, unproject
from gaussianeditor_tpu.utils.saving import save_image, save_image_grid, save_video
from tests.helpers import make_camera, random_scene
from tests.test_data_config import _make_workspace


class TestLaunchCLI:
    def test_edit_mode_end_to_end(self, tmp_path):
        ws = _make_workspace(tmp_path)
        scene = random_scene(60, seed=0)
        ply = os.path.join(tmp_path, "scene.ply")
        save_ply(scene, ply)
        cfg = {
            "mode": "edit",
            "gs_source": ply,
            "colmap_dir": ws,
            "height": 64,
            "width": 64,
            "guidance": "fake",
            "output_dir": os.path.join(str(tmp_path), "out"),
            "system": {
                "prompt": "make it blue",
                "batch_size": 2,
                "max_steps": 4,
                "per_editing_step": 10,
                "densify_until_step": 0,
                "max_instances": 8192,
                "tile_cap": 256,
                "chunk": 32,
            },
        }
        cfg_path = os.path.join(tmp_path, "edit.yaml")
        yaml.safe_dump(cfg, open(cfg_path, "w"))
        launch_main(["--config", cfg_path, "--train",
                     "system.max_steps=3"])
        trials = os.listdir(cfg["output_dir"])
        assert len(trials) == 1
        trial = os.path.join(cfg["output_dir"], trials[0])
        assert os.path.exists(os.path.join(trial, "last.ply"))
        assert os.path.exists(os.path.join(trial, "parsed.yaml"))
        rows = [json.loads(l) for l in
                open(os.path.join(trial, "metrics.jsonl"))]
        assert len(rows) == 3 and "loss" in rows[0]
        # dotlist override took effect
        parsed = yaml.safe_load(open(os.path.join(trial, "parsed.yaml")))
        assert parsed["system"]["max_steps"] == 3

    def test_recon_mode_end_to_end(self, tmp_path):
        """mode: recon — vanilla 3DGS fit from a COLMAP workspace +
        posed images (the reference's gaussiansplatting/train.py flow),
        SfM-point init, burst dispatch, PLY export."""
        import imageio.v2 as imageio

        from gaussianeditor_tpu.data.camera_scene import CamScene
        from gaussianeditor_tpu.ops.render import render

        ws = _make_workspace(tmp_path)
        sc = CamScene(ws, h=64, w=64)
        target = random_scene(60, seed=5)
        rfn = jax.jit(lambda s, c: render(
            s, c, jnp.zeros(3), impl="tiled", max_instances=8192,
            tile_cap=256, chunk=32).color)
        os.makedirs(os.path.join(ws, "images"))
        for cam, name in zip(sc.cameras, sc.image_names):
            im = np.clip(np.asarray(rfn(target, cam)), 0, 1)
            # COLMAP names say .jpg; write .png (loader falls back by stem)
            imageio.imwrite(
                os.path.join(ws, "images",
                             os.path.splitext(name)[0] + ".png"),
                (im * 255).astype(np.uint8))
        cfg = {
            "mode": "recon",
            "colmap_dir": ws,
            "height": 64,
            "width": 64,
            "output_dir": os.path.join(str(tmp_path), "out_recon"),
            "system": {
                "max_steps": 8,
                "densify_from_step": 10_000,
                "opacity_reset_interval": 0,
                "oneup_sh_every": 0,
                "max_instances": 8192,
                "tile_cap": 256,
                "chunk": 32,
                "impl": "tiled",
                "dispatch_burst": 4,
            },
        }
        cfg_path = os.path.join(tmp_path, "recon.yaml")
        yaml.safe_dump(cfg, open(cfg_path, "w"))
        launch_main(["--config", cfg_path, "--train"])
        trial = os.path.join(
            cfg["output_dir"], os.listdir(cfg["output_dir"])[0])
        assert os.path.exists(os.path.join(trial, "last.ply"))
        rows = [json.loads(l) for l in
                open(os.path.join(trial, "metrics.jsonl"))]
        assert len(rows) == 8 and np.isfinite(rows[-1]["loss"])

    def test_gradio_mode_writes_frontend_files(self, tmp_path):
        """--gradio (reference launch.py:92-245): logs file + progress
        file in the trial dir, assets exported after training."""
        ws = _make_workspace(tmp_path)
        scene = random_scene(40, seed=1)
        ply = os.path.join(tmp_path, "scene.ply")
        save_ply(scene, ply)
        cfg = {
            "mode": "edit",
            "gs_source": ply,
            "colmap_dir": ws,
            "height": 64,
            "width": 64,
            "guidance": "fake",
            "output_dir": os.path.join(str(tmp_path), "out_gradio"),
            "system": {
                "prompt": "x",
                "batch_size": 2,
                "max_steps": 2,
                "per_editing_step": 10,
                "densify_until_step": 0,
                "max_instances": 8192,
                "tile_cap": 256,
                "chunk": 32,
            },
        }
        cfg_path = os.path.join(tmp_path, "edit_gradio.yaml")
        yaml.safe_dump(cfg, open(cfg_path, "w"))
        launch_main(["--config", cfg_path, "--train", "--gradio"])
        trial = os.path.join(
            cfg["output_dir"], os.listdir(cfg["output_dir"])[0])
        assert os.path.exists(os.path.join(trial, "logs"))
        assert os.path.exists(os.path.join(trial, "progress"))
        assert os.path.exists(os.path.join(trial, "last.ply"))


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        scene = random_scene(20, seed=1, capacity=40)
        optim = GaussianAdam(config=OptimConfig())
        state = init_train_state(scene, optim)
        grads = jax.tree_util.tree_map(jnp.ones_like, scene.params)
        params, opt_state = optim.step(scene.params, grads, state.opt_state)
        state = state.replace(
            scene=scene.replace(params=params), opt_state=opt_state,
            step=state.step + 1,
        )
        p = os.path.join(tmp_path, "ckpt.npz")
        save_train_state(p, state)
        loaded = load_train_state(p)
        assert int(loaded.step) == 1
        np.testing.assert_allclose(loaded.scene.params.xyz,
                                   state.scene.params.xyz)
        np.testing.assert_allclose(loaded.opt_state.mu.xyz,
                                   state.opt_state.mu.xyz)
        assert loaded.scene.max_sh_degree == scene.max_sh_degree
        assert int(loaded.scene.n_alive) == 20


class TestSaving:
    def test_image_grid_video(self, tmp_path):
        rng = np.random.RandomState(0)
        imgs = [rng.rand(16, 16, 3).astype(np.float32) for _ in range(4)]
        save_image(os.path.join(tmp_path, "a.png"), imgs[0])
        save_image_grid(os.path.join(tmp_path, "g.png"), imgs, cols=2)
        vpath = save_video(os.path.join(tmp_path, "v.mp4"), imgs, fps=4)
        import imageio.v2 as imageio

        grid = imageio.imread(os.path.join(tmp_path, "g.png"))
        assert grid.shape[:2] == (32, 32)
        assert os.path.getsize(vpath) > 0  # gif fallback without ffmpeg


class TestCameraMath:
    def test_project_unproject_roundtrip(self):
        cam = make_camera(64, 64)
        rng = np.random.RandomState(0)
        pts = rng.uniform(-0.5, 0.5, (20, 3)).astype(np.float32)
        pix, depth = project(cam, pts)
        assert np.all(depth > 0)
        # synth depth map: splat the point depths at their pixels
        depth_map = np.zeros((64, 64), np.float32)
        xi = np.clip(pix[:, 0].astype(int), 0, 63)
        yi = np.clip(pix[:, 1].astype(int), 0, 63)
        depth_map[yi, xi] = depth
        back = unproject(cam, pix, depth_map)
        # rounding to integer pixels costs some accuracy
        err = np.linalg.norm(back - pts, axis=1)
        assert np.median(err) < 0.05


class TestTensorBoardLogger:
    def test_writes_event_file_and_degrades_gracefully(self, tmp_path):
        from gaussianeditor_tpu.apps.launch import TensorBoardLogger

        tb = TensorBoardLogger(str(tmp_path))
        tb(0, {"loss": 1.0, "skipme": object()})
        tb(1, {"loss": 0.5})
        tb.close()
        if tb.writer is not None:
            import glob
            files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
            assert files, "no TB event file written"
