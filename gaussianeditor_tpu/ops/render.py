"""Public differentiable render API.

The TPU-native counterpart of `gaussian_renderer/__init__.py:45-150`
(`render`) — one function composing preprocess -> bin/sort -> composite.
Returns channels-last images ([H, W, C] rather than the reference's
[C, H, W]; that is the TPU-friendly layout and is our API convention).

Differences vs the reference wrapper, by design:
  * The densification viewspace-gradient probe is functional: pass an
    all-zeros `mean2d_offset_ndc` and differentiate the loss w.r.t. it;
    its cotangent equals the reference's `screenspace_points.grad`
    (`gaussian_renderer/__init__.py:60-69`).
  * `visibility_filter`/`radii` are returned as arrays over the full
    static capacity.
  * Static capacity knobs (`max_instances`, `tile_cap`) replace the CUDA
    runtime buffer resize; `overflow` reports truncation.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax.numpy as jnp

from gaussianeditor_tpu.core.cameras import Camera
from gaussianeditor_tpu.ops import refimpl
from gaussianeditor_tpu.ops.binning import bin_and_sort
from gaussianeditor_tpu.ops.composite import composite_tiles, tiles_to_image
from gaussianeditor_tpu.ops.preprocess import TILE, preprocess


class RenderOutput(NamedTuple):
    color: jnp.ndarray        # [H, W, ch]
    depth: jnp.ndarray        # [H, W]
    alpha: jnp.ndarray        # [H, W] = 1 - final_T
    final_T: jnp.ndarray      # [H, W]
    radii: jnp.ndarray        # [C] int32
    visible: jnp.ndarray      # [C] bool (visibility_filter == radii > 0)
    num_rendered: jnp.ndarray  # scalar int32
    overflow: jnp.ndarray      # scalar bool


def point_cloud_render(
    xyz: jnp.ndarray,
    camera: Camera,
    *,
    point_scale: float = 0.01,
    color: Optional[jnp.ndarray] = None,
    bg: Optional[jnp.ndarray] = None,
    **kwargs,
) -> "RenderOutput":
    """Render raw points as fixed-size opaque white Gaussians — the
    reference's `point_cloud_render` debug view
    (gaussian_renderer/__init__.py:156-250)."""
    from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene

    n = xyz.shape[0]
    params = GaussianParams(
        xyz=jnp.asarray(xyz, jnp.float32),
        features_dc=jnp.zeros((n, 1, 3), jnp.float32),
        features_rest=jnp.zeros((n, 0, 3), jnp.float32),
        opacity_raw=jnp.full((n, 1), 10.0, jnp.float32),  # ~opaque
        log_scales=jnp.full((n, 3), math.log(point_scale), jnp.float32),
        quats=jnp.concatenate(
            [jnp.ones((n, 1)), jnp.zeros((n, 3))], axis=1
        ).astype(jnp.float32),
    )
    scene = GaussianScene.create(params, max_sh_degree=0)
    if color is None:
        color = jnp.ones((n, 3), jnp.float32)
    return render(scene, camera, bg, override_color=color, **kwargs)


def default_impl() -> str:
    """Production compositor on TPU (Pallas kernels); the scan compositor
    on CPU (where Pallas runs interpreted and the scan is faster)."""
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "tiled"


def default_max_instances(capacity: int) -> int:
    """Static instance-buffer capacity heuristic: ~32 tile duplicates per
    Gaussian (point-cloud-initialized scenes have large footprints before
    densification shrinks them), rounded to a lane-friendly multiple.
    `RenderOutput.overflow` reports truncation; callers with tighter
    memory should pass `max_instances` explicitly."""
    r = max(capacity * 32, 65536)
    return -(-r // 1024) * 1024


def render(
    scene,
    camera: Camera,
    bg: Optional[jnp.ndarray] = None,
    *,
    scale_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    mean2d_offset_ndc: Optional[jnp.ndarray] = None,
    impl: Optional[str] = None,
    max_instances: Optional[int] = None,
    tile_cap: int = 1024,
    chunk: int = 128,
) -> RenderOutput:
    """Differentiable render of a GaussianScene through `camera`.

    impl: 'tiled' (production, scan+MXU compositor), 'ref' (dense oracle).
    """
    H, W = camera.height, camera.width
    if impl is None:
        impl = default_impl()
    if bg is None:
        bg = jnp.zeros((3 if override_color is None else override_color.shape[-1],),
                       jnp.float32)

    sh = None if override_color is not None else scene.get_features
    proc = preprocess(
        scene.params.xyz,
        scene.params.log_scales,
        scene.params.quats,
        scene.get_opacity[:, 0],
        sh,
        camera,
        alive=scene.alive,
        active_sh_degree=scene.active_sh_degree,
        max_sh_degree=scene.max_sh_degree,
        scale_modifier=scale_modifier,
        override_color=override_color,
        mean2d_offset_ndc=mean2d_offset_ndc,
    )

    if impl == "ref":
        color, depth, final_T = refimpl.composite_dense(proc, H, W, bg)
        return RenderOutput(
            color=color,
            depth=depth,
            alpha=1.0 - final_T,
            final_T=final_T,
            radii=proc.radius,
            visible=proc.visible,
            num_rendered=jnp.sum(proc.tiles_touched),
            overflow=jnp.asarray(False),
        )

    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    if max_instances is None:
        max_instances = default_max_instances(scene.capacity)
    if impl == "pallas":  # aligned layout requires chunk-multiple capacity
        from gaussianeditor_tpu.ops.pallas_composite import CHUNK as _PC

        max_instances = -(-max_instances // _PC) * _PC

    binning = bin_and_sort(proc, grid_x, grid_y, max_instances)
    if impl == "pallas":
        from gaussianeditor_tpu.ops.binning import align_ranges
        from gaussianeditor_tpu.ops.pallas_composite import (
            CHUNK,
            make_pallas_compositor,
        )

        num_tiles = grid_x * grid_y
        ab = align_ranges(binning, num_tiles, CHUNK)
        r2 = max_instances + CHUNK * num_tiles
        ch = proc.color.shape[-1]
        compositor = make_pallas_compositor(
            num_tiles, grid_x, ch, r2, scene.capacity
        )
        tiles = compositor(
            proc.mean2d, proc.conic, proc.opacity, proc.color, proc.depth,
            ab.gauss_id, ab.valid, ab.tile_start, ab.tile_len,
        )
    else:
        tiles = composite_tiles(
            proc, binning, grid_x, grid_y, tile_cap=tile_cap, chunk=chunk
        )

    color = tiles_to_image(tiles.color, grid_x, grid_y, H, W)
    depth = tiles_to_image(tiles.depth, grid_x, grid_y, H, W)
    final_T = tiles_to_image(tiles.final_T, grid_x, grid_y, H, W)
    color = color + final_T[..., None] * bg[None, None, :]

    return RenderOutput(
        color=color,
        depth=depth,
        alpha=1.0 - final_T,
        final_T=final_T,
        radii=proc.radius,
        visible=proc.visible,
        num_rendered=binning.num_rendered,
        overflow=binning.overflow,
    )
