"""Bitwise reproducibility — the determinism the CUDA reference cannot
provide (atomicAdd gradient scatter, SURVEY.md section 5): two identical
training runs must produce BITWISE identical parameters."""

import numpy as np

from gaussianeditor_tpu.core.cameras import orbit_cameras
from gaussianeditor_tpu.edit.edit_system import EditConfig, EditSystem
from gaussianeditor_tpu.guidance.fake import FakeGuidance
from tests.helpers import random_scene


def _run():
    scene = random_scene(60, seed=0)
    cams = orbit_cameras(4, 4.0, 0.8, 0.8, 32, 32)
    cfg = EditConfig(prompt="deterministic", batch_size=2, max_steps=8,
                     per_editing_step=5, densification_interval=4,
                     densify_until_step=8, cameras_extent=2.0,
                     max_instances=4096, tile_cap=256, chunk=32, seed=7)
    sys_ = EditSystem(scene, cams, cfg, guidance=FakeGuidance())
    sys_.fit()
    return sys_.state.scene


def test_two_runs_bitwise_identical():
    a = _run()
    b = _run()
    for name in ("xyz", "features_dc", "opacity_raw", "log_scales", "quats"):
        xa = np.asarray(getattr(a.params, name))
        xb = np.asarray(getattr(b.params, name))
        assert xa.tobytes() == xb.tobytes(), f"{name} differs bitwise"
    assert np.asarray(a.alive).tobytes() == np.asarray(b.alive).tobytes()
    assert np.asarray(a.generation).tobytes() == np.asarray(b.generation).tobytes()
