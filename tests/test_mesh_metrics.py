"""mesh->GS conversion + CLIP-metric protocol tests."""

import os

import numpy as np

from gaussianeditor_tpu.edit.mesh_to_gs import (
    load_obj,
    mesh_to_gaussians,
    sample_mesh_surface,
)
from gaussianeditor_tpu.utils.clip_metrics import compute_clip_directional


def _write_cube_obj(path, with_colors=True):
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float
    )
    quads = [
        [0, 1, 2, 3], [4, 5, 6, 7], [0, 1, 5, 4],
        [2, 3, 7, 6], [0, 3, 7, 4], [1, 2, 6, 5],
    ]
    with open(path, "w") as f:
        for p in v:
            if with_colors:
                f.write(f"v {p[0]} {p[1]} {p[2]} {p[0]} {p[1]} {p[2]}\n")
            else:
                f.write(f"v {p[0]} {p[1]} {p[2]}\n")
        for q in quads:
            f.write("f " + " ".join(str(i + 1) for i in q) + "\n")


class TestMeshToGS:
    def test_load_obj_triangulates_quads(self, tmp_path):
        p = os.path.join(tmp_path, "cube.obj")
        _write_cube_obj(p)
        verts, faces, colors = load_obj(p)
        assert verts.shape == (8, 3)
        assert faces.shape == (12, 3)  # 6 quads -> 12 triangles
        assert colors is not None and colors.shape == (8, 3)

    def test_area_weighted_sampling_on_surface(self, tmp_path):
        p = os.path.join(tmp_path, "cube.obj")
        _write_cube_obj(p)
        verts, faces, colors = load_obj(p)
        pts, cols = sample_mesh_surface(verts, faces, 5000, colors)
        assert pts.shape == (5000, 3)
        # every sample lies on a cube face: at least one coord is ~0 or ~1
        on_face = np.any(
            (np.abs(pts) < 1e-5) | (np.abs(pts - 1) < 1e-5), axis=1
        )
        assert on_face.mean() > 0.999
        # colors interpolate position (vertex color == position here)
        np.testing.assert_allclose(cols, np.clip(pts, 0, 1), atol=1e-5)

    def test_mesh_to_gaussians(self, tmp_path):
        p = os.path.join(tmp_path, "cube.obj")
        _write_cube_obj(p)
        scene = mesh_to_gaussians(p, n_samples=2000)
        assert int(scene.n_alive) == 2000
        assert np.isfinite(np.asarray(scene.params.log_scales)).all()


class FakeEmbedder:
    """Deterministic embedder: image -> mean color stats, text -> hash."""

    def embed_image(self, image):
        img = np.asarray(image, np.float32)
        return np.concatenate([img.mean((0, 1)), img.std((0, 1))])

    def embed_text(self, text):
        h = abs(hash(text))
        rng = np.random.RandomState(h % (2**31))
        return rng.randn(6).astype(np.float32)


def test_clip_directional_protocol():
    rng = np.random.RandomState(0)
    origin = [rng.rand(8, 8, 3) for _ in range(3)]
    # edit = add red
    edited = [np.clip(im + np.array([0.3, 0, 0]), 0, 1) for im in origin]
    out = compute_clip_directional(
        FakeEmbedder(), origin, edited, "a photo", "a red photo"
    )
    assert set(out) == {"clip_similarity", "clip_directional"}
    assert -1.0 <= out["clip_directional"] <= 1.0
