"""Add-pipeline externals: the Wonder3D subprocess adapter (stubbed
runner) and the DPT depth estimator (architecture-only, no weights) —
VERDICT round-1 missing #4/#5."""

import os

import numpy as np
import pytest

from gaussianeditor_tpu.edit.wonder3d_adapter import (
    Wonder3DGenerator,
    mvdiffusion_command,
    nsr_command,
)

CUBE_OBJ = """\
v -1 -1 -1 1 0 0
v 1 -1 -1 0 1 0
v 1 1 -1 0 0 1
v -1 1 -1 1 1 0
v -1 -1 1 1 0 1
v 1 -1 1 0 1 1
v 1 1 1 1 1 1
v -1 1 1 0 0 0
f 1 2 3
f 1 3 4
f 5 6 7
f 5 7 8
f 1 2 6
f 1 6 5
f 3 4 8
f 3 8 7
"""


class TestCommands:
    def test_mvdiffusion_shape(self):
        cmd = mvdiffusion_command("/opt/venv", "/cache/mv", "/cache")
        assert cmd[0] == "/opt/venv/bin/accelerate"
        assert "launch" in cmd and "test_mvdiffusion_seq.py" in cmd
        assert "--save_dir" in cmd
        assert cmd[cmd.index("--save_dir") + 1] == "/cache/mv"
        assert "validation_dataset.root_dir=/cache" in cmd
        assert "validation_dataset.filepaths=[removed_bg.png]" in cmd

    def test_nsr_shape(self):
        cmd = nsr_command("/opt/venv", "/cache", "/cache/multiview_pred_images")
        assert cmd[0] == "/opt/venv/bin/python"
        assert "launch.py" in cmd and "--train" in cmd
        assert "dataset.root_dir=/cache" in cmd
        assert "dataset.scene=multiview_pred_images" in cmd


class TestWonder3DGenerator:
    def _stub_runner(self, log):
        """Writes the artifacts each stage is expected to produce."""

        def run(cmd, cwd):
            log.append((list(cmd), cwd))
            if "test_mvdiffusion_seq.py" in cmd:
                save_dir = cmd[cmd.index("--save_dir") + 1]
                for i in range(14):
                    with open(os.path.join(save_dir, f"pred_{i}.png"), "w"):
                        pass
            elif "launch.py" in cmd:
                save_dir = cmd[cmd.index("--save_dir") + 1]
                with open(os.path.join(save_dir, "inpaint_mesh.obj"),
                          "w") as f:
                    f.write(CUBE_OBJ)
            else:
                raise AssertionError(f"unexpected command {cmd}")

        return run

    def test_full_pipeline_with_stub(self, tmp_path):
        log = []
        gen = Wonder3DGenerator(
            wonder3d_root=str(tmp_path / "w3d"),
            cache_dir=str(tmp_path / "cache"),
            python_prefix="/opt/venv",
            n_gaussians=500,
            runner=self._stub_runner(log),
        )
        img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
        scene = gen(img, "a toy robot")
        # both subprocess stages invoked, correct cwd
        assert len(log) == 2
        assert log[0][1] == str(tmp_path / "w3d")
        assert log[1][1] == os.path.join(str(tmp_path / "w3d"),
                                         "instant-nsr-pl")
        # a usable Gaussian scene came out of the mesh
        assert int(scene.n_alive) > 0
        xyz = np.asarray(scene.params.xyz)[np.asarray(scene.alive)]
        assert np.isfinite(xyz).all()
        assert np.abs(xyz).max() <= 1.0 + 1e-5
        # removed_bg.png written for stage 1
        assert os.path.exists(tmp_path / "cache" / "removed_bg.png")

    def test_cache_skips_subprocesses(self, tmp_path):
        log = []
        gen = Wonder3DGenerator(
            wonder3d_root=str(tmp_path / "w3d"),
            cache_dir=str(tmp_path / "cache"),
            n_gaussians=200,
            runner=self._stub_runner(log),
        )
        img = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
        gen(img, "x")
        n_first = len(log)
        gen(img, "x")
        # skip-if-cached semantics (GassuianEditorAdd.py:120,131)
        assert len(log) == n_first

    def test_missing_mesh_raises(self, tmp_path):
        def noop_runner(cmd, cwd):
            if "test_mvdiffusion_seq.py" in cmd:
                save_dir = cmd[cmd.index("--save_dir") + 1]
                for i in range(14):
                    open(os.path.join(save_dir, f"p{i}.png"), "w").close()

        gen = Wonder3DGenerator(
            wonder3d_root=str(tmp_path), cache_dir=str(tmp_path / "c"),
            runner=noop_runner,
        )
        with pytest.raises(RuntimeError, match="no mesh"):
            gen(np.zeros((16, 16, 3), np.float32), "x")


class TestDPT:
    def test_architecture_only_depth(self):
        torch = pytest.importorskip("torch")
        from gaussianeditor_tpu.edit.dpt_adapter import DPTDepthEstimator

        est = DPTDepthEstimator(pretrained=None, image_size=96)
        img = np.random.RandomState(0).rand(48, 64, 3).astype(np.float32)
        depth = est(img)
        assert depth.shape == (48, 64)
        assert depth.dtype == np.float32
        assert np.isfinite(depth).all()

    def test_depth_feeds_alignment(self):
        pytest.importorskip("torch")
        from gaussianeditor_tpu.edit.add_system import align_depth_scale
        from gaussianeditor_tpu.edit.dpt_adapter import DPTDepthEstimator

        est = DPTDepthEstimator(pretrained=None, image_size=96)
        img = np.random.RandomState(1).rand(32, 32, 3).astype(np.float32)
        mono = est(img).astype(np.float64)
        # normalize to a well-conditioned positive range (monocular depth
        # is affine-ambiguous anyway; the alignment solves a, b)
        mono = (mono - mono.min()) / max(float(np.ptp(mono)), 1e-6) + 0.5
        rendered = 2.0 * mono + 0.7  # exact affine relation
        a, b = align_depth_scale(mono, rendered,
                                 np.zeros((32, 32), bool))
        assert abs(a - 2.0) < 1e-2 and abs(b - 0.7) < 2e-2
