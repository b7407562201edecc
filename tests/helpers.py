"""Shared test fixtures: synthetic scenes, cameras, and jitted wrappers.

Eager-mode dispatch on the CI CPU costs ~300ms/op (per-op compilation),
so every test must run through cached `jax.jit` wrappers.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gaussianeditor_tpu.core.cameras import Camera, lookat_camera
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene


def random_scene(n: int, seed: int = 0, max_sh_degree: int = 0,
                 capacity: int = None, spread: float = 1.0) -> GaussianScene:
    rng = np.random.RandomState(seed)
    k = (max_sh_degree + 1) ** 2
    cap = capacity or n

    def pad(x):
        out = np.zeros((cap,) + x.shape[1:], np.float32)
        out[:n] = x
        return jnp.asarray(out)

    quats = rng.randn(n, 4).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    params = GaussianParams(
        xyz=pad(rng.uniform(-spread, spread, (n, 3)).astype(np.float32)),
        features_dc=pad(rng.randn(n, 1, 3).astype(np.float32) * 0.5),
        features_rest=pad(rng.randn(n, k - 1, 3).astype(np.float32) * 0.1),
        opacity_raw=pad(rng.uniform(-1.0, 3.0, (n, 1)).astype(np.float32)),
        log_scales=pad(np.log(rng.uniform(0.02, 0.12, (n, 3))).astype(np.float32)),
        quats=pad(quats),
    )
    return GaussianScene.create(
        params,
        max_sh_degree=max_sh_degree,
        active_sh_degree=max_sh_degree,
        alive=jnp.arange(cap) < n,
    )


@functools.lru_cache(maxsize=None)
def _jitted_render(impl, tile_cap, chunk, with_bg, with_override, with_offset):
    from gaussianeditor_tpu.ops.render import render

    def f(scene, cam, bg, oc, off):
        return render(
            scene, cam, bg, override_color=oc, mean2d_offset_ndc=off,
            impl=impl, tile_cap=tile_cap, chunk=chunk,
        )

    return jax.jit(f)


def render_j(scene, cam, bg=None, override_color=None, mean2d_offset_ndc=None,
             impl="tiled", tile_cap=256, chunk=32):
    """Cached-jit render for tests."""
    f = _jitted_render(impl, tile_cap, chunk, bg is not None,
                       override_color is not None, mean2d_offset_ndc is not None)
    return f(scene, cam, bg, override_color, mean2d_offset_ndc)


def assert_images_close(a, b, tight=3e-5, loose=6e-3, frac=0.995, name="image"):
    """Robust image comparison. Two numerically equivalent rasterizers can
    flip the alpha-cutoff test (alpha < 1/255, forward.cu:347) on borderline
    Gaussians due to differing FMA/fusion order; each flip perturbs a pixel
    by up to ~alpha_min * color ~ 4e-3. So: the vast majority of pixels
    must match tightly and ALL pixels within the cutoff-flip bound."""
    a, b = np.asarray(a), np.asarray(b)
    diff = np.abs(a - b)
    assert diff.max() <= loose, f"{name}: max diff {diff.max()} > {loose}"
    ok = np.mean(diff <= tight)
    assert ok >= frac, f"{name}: only {ok:.4f} of pixels within {tight}"


def make_camera(height: int = 64, width: int = 64, dist: float = 4.0) -> Camera:
    return lookat_camera(
        eye=np.array([0.0, 0.0, -dist]),
        target=np.zeros(3),
        up=np.array([0.0, 1.0, 0.0]),
        fovx=0.8,
        fovy=0.8,
        height=height,
        width=width,
    )
