"""Native C++ KNN vs scipy oracle."""

import numpy as np
import pytest

from gaussianeditor_tpu.native import (
    get_lib,
    knn_sq_dists_native,
    mean_sq_dist_3nn_native,
)

needs_native = pytest.mark.skipif(get_lib() is None,
                                  reason="g++ toolchain unavailable")


@needs_native
def test_mean_sq_dist_matches_scipy():
    from scipy.spatial import cKDTree

    rng = np.random.RandomState(0)
    pts = rng.rand(5000, 3).astype(np.float32)
    native = mean_sq_dist_3nn_native(pts)

    tree = cKDTree(pts)
    d, _ = tree.query(pts, k=4)
    exact = np.mean(d[:, 1:] ** 2, axis=1)

    # the boxed AABB-rejection search is exact (up to f32 arithmetic)
    rel = np.abs(native - exact) / (exact + 1e-12)
    assert (rel < 1e-4).mean() > 0.999


@needs_native
def test_knn_sq_dists_exact():
    from scipy.spatial import cKDTree

    rng = np.random.RandomState(1)
    pts = rng.rand(800, 3).astype(np.float32)
    qs = rng.rand(100, 3).astype(np.float32)
    native = knn_sq_dists_native(pts, qs, k=3)
    tree = cKDTree(pts)
    d, _ = tree.query(qs, k=3)
    np.testing.assert_allclose(np.sqrt(native), d, rtol=1e-4, atol=1e-5)


@needs_native
def test_tiny_inputs():
    pts = np.zeros((2, 3), np.float32)
    pts[1] = [1, 0, 0]
    out = mean_sq_dist_3nn_native(pts)
    assert out is not None and out.shape == (2,)
