"""GaussianScene + PLY I/O tests (parity with gaussian_model.py layout)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gaussianeditor_tpu.models.gaussians import (
    GaussianScene,
    concat_scenes,
    opacity_activation,
)
from gaussianeditor_tpu.models.ply import load_ply, save_ply
from tests.helpers import random_scene


class TestScene:
    def test_from_points_scale_init(self):
        # regular grid: 3-NN mean squared distance is known
        pts = np.stack(np.meshgrid(*[np.arange(4.0)] * 3), -1).reshape(-1, 3)
        colors = np.full((64, 3), 0.5)
        scene = GaussianScene.from_points(pts, colors, max_sh_degree=1)
        # interior point: 3 nearest at distance 1 -> mean sq dist 1 -> log(1)=0
        scales = np.asarray(scene.params.log_scales)
        assert np.all(np.abs(scales) < 1e-5)
        # raw opacity 1.0 (GaussianEditor variant, gaussian_model.py:324-326)
        np.testing.assert_allclose(np.asarray(scene.params.opacity_raw), 1.0)
        assert int(scene.n_alive) == 64

    def test_capacity_padding(self):
        scene = random_scene(10, capacity=32)
        assert scene.capacity == 32
        assert int(scene.n_alive) == 10
        # dead slots render with zero opacity
        assert float(jnp.sum(scene.get_opacity[10:])) == 0.0

    def test_pad_and_compact_roundtrip(self):
        scene = random_scene(10)
        padded = scene.pad_to_capacity(64)
        assert padded.capacity == 64 and int(padded.n_alive) == 10
        back = padded.compact()
        np.testing.assert_allclose(back.params.xyz, scene.params.xyz)
        np.testing.assert_allclose(back.generation, scene.generation)

    def test_anchor_snapshot_and_postfix(self):
        scene = random_scene(10)
        moved = scene.replace(
            params=scene.params.replace(xyz=scene.params.xyz + 1.0)
        )
        assert float(jnp.max(jnp.abs(moved.anchor.xyz - moved.params.xyz))) > 0.5
        moved = moved.update_anchor()
        np.testing.assert_allclose(moved.anchor.xyz, moved.params.xyz)
        # postfix resets generations + schedule (gaussian_model.py:104-108)
        g = moved.replace(generation=moved.generation + 3).anchor_postfix()
        assert int(jnp.max(g.generation)) == 0
        assert int(g.n_generations) == 1

    def test_scene_is_jittable_pytree(self):
        scene = random_scene(8)

        @jax.jit
        def f(s):
            return jnp.sum(s.get_opacity) + jnp.sum(s.get_scaling)

        f(scene)

    def test_concat_scenes_masks_new_object(self):
        base = random_scene(20, seed=0)
        obj = random_scene(5, seed=1)
        merged = concat_scenes(base, obj)
        assert merged.capacity == 25
        m = np.asarray(merged.mask)
        assert not m[:20].any() and m[20:].all()


class TestPly:
    def test_roundtrip(self, tmp_path):
        scene = random_scene(33, seed=2, max_sh_degree=2)
        path = os.path.join(tmp_path, "scene.ply")
        save_ply(scene, path)
        loaded = load_ply(path)
        assert loaded.max_sh_degree == 2
        assert int(loaded.active_sh_degree) == 2
        for name in ["xyz", "features_dc", "features_rest", "opacity_raw",
                     "log_scales", "quats"]:
            np.testing.assert_allclose(
                np.asarray(getattr(loaded.params, name)),
                np.asarray(getattr(scene.params, name)),
                atol=1e-6, err_msg=name,
            )

    def test_padded_scene_saves_alive_only(self, tmp_path):
        scene = random_scene(10, capacity=64)
        path = os.path.join(tmp_path, "s.ply")
        save_ply(scene, path)
        loaded = load_ply(path)
        assert loaded.capacity == 10

    def test_header_layout_matches_inria(self, tmp_path):
        """The field order must be byte-compatible with
        gaussian_model.py:389-445 so reference checkpoints interchange."""
        scene = random_scene(4, seed=3, max_sh_degree=1)
        path = os.path.join(tmp_path, "h.ply")
        save_ply(scene, path)
        header = open(path, "rb").read(2000).split(b"end_header")[0].decode()
        names = [l.split()[-1] for l in header.splitlines()
                 if l.startswith("property")]
        k_rest = 3 * ((1 + 1) ** 2 - 1)
        expect = (
            ["x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2"]
            + [f"f_rest_{i}" for i in range(k_rest)]
            + ["opacity", "scale_0", "scale_1", "scale_2",
               "rot_0", "rot_1", "rot_2", "rot_3"]
        )
        assert names == expect

    def test_load_with_capacity(self, tmp_path):
        scene = random_scene(7)
        path = os.path.join(tmp_path, "c.ply")
        save_ply(scene, path)
        loaded = load_ply(path, capacity=32)
        assert loaded.capacity == 32 and int(loaded.n_alive) == 7
