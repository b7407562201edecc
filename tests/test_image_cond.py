"""ControlNet conditioning-image preparation (guidance/image_cond.py) —
parity with controlnet_guidance.py:281-311."""

import numpy as np
import pytest

from gaussianeditor_tpu.guidance.image_cond import (
    canny_cond,
    normal_from_depth,
    prepare_image_cond,
)


def _edge_image(hw=64):
    img = np.zeros((hw, hw, 3), np.float32)
    img[:, hw // 2:] = 1.0
    return img


class TestCanny:
    def test_detects_vertical_edge(self):
        out = canny_cond(_edge_image())
        assert out.shape == (64, 64, 3)
        assert out.dtype == np.float32
        # the three channels are identical replicas
        np.testing.assert_array_equal(out[..., 0], out[..., 1])
        col = out[..., 0].max(axis=0)
        edge_cols = np.where(col > 0.5)[0]
        assert len(edge_cols) > 0
        assert np.all(np.abs(edge_cols - 32) <= 4)

    def test_flat_image_no_edges(self):
        out = canny_cond(np.full((32, 32, 3), 0.5, np.float32))
        assert out.max() == 0.0


class TestNormalFromDepth:
    def test_flat_plane_faces_camera(self):
        out = normal_from_depth(np.full((16, 16), 2.0, np.float32))
        np.testing.assert_allclose(out, np.broadcast_to(
            np.array([0.5, 0.5, 1.0], np.float32), (16, 16, 3)), atol=1e-6)

    def test_slope_tilts_normal(self):
        # depth increasing to the right -> normal tilts toward -x
        d = np.tile(np.linspace(1, 3, 32, dtype=np.float32), (32, 1))
        out = normal_from_depth(d)
        inner = out[8:-8, 8:-8]
        assert inner[..., 0].mean() < 0.5  # x component negative
        assert abs(inner[..., 1].mean() - 0.5) < 1e-3

    def test_background_flat(self):
        d = np.full((8, 8), 2.0, np.float32)
        d[0, 0] = 0.0  # no-hit pixel
        out = normal_from_depth(d)
        np.testing.assert_allclose(out[0, 0], [0.5, 0.5, 1.0], atol=1e-6)


class TestDispatch:
    def test_passthrough_types(self):
        img = _edge_image()
        np.testing.assert_array_equal(prepare_image_cond("p2p", img), img)
        np.testing.assert_array_equal(prepare_image_cond("inpaint", img), img)

    def test_normal_needs_source(self):
        with pytest.raises(ValueError):
            prepare_image_cond("normal", _edge_image())
        out = prepare_image_cond("normal", _edge_image(),
                                 depth=np.ones((64, 64), np.float32))
        assert out.shape == (64, 64, 3)

    def test_unknown_type(self):
        with pytest.raises(ValueError):
            prepare_image_cond("scribble", _edge_image())
