"""View-dependent prompts + click tracing + point_cloud_render tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianeditor_tpu.core.cameras import lookat_camera, orbit_cameras
from gaussianeditor_tpu.edit.tracing import trace_from_click
from gaussianeditor_tpu.guidance.fake import FakePointSegmentor
from gaussianeditor_tpu.guidance.prompts import (
    DirectionConfig,
    PromptProcessor,
    camera_angles,
    view_direction,
)
from gaussianeditor_tpu.ops.render import point_cloud_render, render
from tests.helpers import make_camera, random_scene


class TestViewDirections:
    def test_quadrants(self):
        assert view_direction(0, 0) == "front"
        assert view_direction(180, 0) == "back"
        assert view_direction(-179, 0) == "back"
        assert view_direction(90, 0) == "side"
        assert view_direction(-90, 0) == "side"
        assert view_direction(0, 75) == "overhead"
        # boundary: front threshold is exclusive low, inclusive high
        assert view_direction(45, 0) == "front"
        assert view_direction(46, 0) == "side"

    def test_camera_angles_on_orbit(self):
        cams = orbit_cameras(4, 3.0, 0.8, 0.8, 32, 32)
        dirs = set()
        for c in cams:
            az, el = camera_angles(c)
            assert abs(el) < 1e-5
            dirs.add(view_direction(az, el))
        assert "front" in dirs and "back" in dirs and "side" in dirs

    def test_prompt_templating(self):
        pp = PromptProcessor(prompt="a bear statue")
        cam = lookat_camera(np.array([0, 5.0, 0.1]), np.zeros(3),
                            np.array([0, 1.0, 0]), 0.8, 0.8, 32, 32)
        assert pp.for_camera(cam) == "a bear statue, overhead view"
        pp2 = PromptProcessor(prompt="x", use_view_dependent=False)
        assert pp2.for_camera(cam) == "x"


class TestClickTracing:
    def test_click_selects_cluster(self):
        from tests.test_edit import _two_cluster_scene

        scene = _two_cluster_scene(seed=3)
        cams = orbit_cameras(5, 4.0, 0.8, 0.8, 64, 64)
        # click the image center of view 0 (the central object projects there)
        traced, _ = trace_from_click(
            scene, cams, click_view=0, click_xy=(31.5, 31.5),
            point_segmentor=FakePointSegmentor(radius=2.0),  # select-all color
            mask_thres=0.3, tile_cap=512, chunk=64,
        )
        m = np.asarray(traced.mask)
        assert m.sum() > 0  # traced something
        # radius 2.0 selects every rendered pixel -> all visible gaussians
        vis = np.asarray(render(scene, cams[0], tile_cap=512,
                                chunk=64).visible)
        assert m[vis].mean() > 0.5


def test_point_cloud_render():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, (200, 3)).astype(np.float32)
    cam = make_camera(48, 48)
    out = jax.jit(
        lambda p: point_cloud_render(p, cam, point_scale=0.02,
                                     max_instances=8192, tile_cap=256,
                                     chunk=32).color
    )(jnp.asarray(pts))
    img = np.asarray(out)
    assert img.max() > 0.9  # white points visible
    assert np.isfinite(img).all()
