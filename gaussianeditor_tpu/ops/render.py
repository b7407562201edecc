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
    n_contrib: Optional[jnp.ndarray] = None  # [H, W] int32 last-contributor
    # position per pixel (forward.cu:330,365); None on the 'ref' oracle


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

    impl: 'pallas' (production TPU path: payload-carrying fat sort +
    chunk-grid kernels, ops/binning_sorted.py), 'pallas4' (v4 id-sort +
    gather path; auto-selected for >3-channel feature renders),
    'tiled' (scan+MXU compositor), 'ref' (dense oracle).
    max_instances: total tile-instance budget (all impls); exceeding it
    trips `overflow` and the host policy (`render_safe`) re-renders at
    doubled budget — the XLA analog of CUDA's runtime buffer resize.
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
    ch = proc.color.shape[-1]
    if impl == "pallas" and ch > 3:
        impl = "pallas4"  # sorted payload table caps at 7+ch <= 16 columns
    if impl == "pallas" and max_instances > 2 ** 24:
        # the fat-sort path carries int fields through f32 (exact only
        # below 2^24); huge budgets take the id-sort path instead
        impl = "pallas4"
    if impl == "pallas":
        from gaussianeditor_tpu.ops.binning_sorted import sorted_bin
        from gaussianeditor_tpu.ops.pallas_composite import (
            make_pallas_compositor_sorted,
        )

        num_tiles = grid_x * grid_y
        sb = sorted_bin(proc, grid_x, grid_y, max_instances)
        compositor = make_pallas_compositor_sorted(
            num_tiles, grid_x, ch, scene.capacity, max_instances
        )
        tiles = compositor(
            proc.mean2d, proc.conic, proc.opacity, proc.color, proc.depth, sb
        )
        num_rendered = sb.num_rendered
        overflow = sb.overflow
    elif impl == "pallas4":
        from gaussianeditor_tpu.ops.binning_dense import dense_bin
        from gaussianeditor_tpu.ops.pallas_composite import (
            make_pallas_compositor_dense,
        )

        num_tiles = grid_x * grid_y
        db = dense_bin(proc, grid_x, grid_y, max_instances)
        compositor = make_pallas_compositor_dense(
            num_tiles, grid_x, ch, scene.capacity, max_instances
        )
        tiles = compositor(
            proc.mean2d, proc.conic, proc.opacity, proc.color, proc.depth, db
        )
        num_rendered = db.num_rendered
        overflow = db.overflow
    else:
        binning = bin_and_sort(proc, grid_x, grid_y, max_instances)
        num_rendered = binning.num_rendered
        # the scan compositor truncates each tile at tile_cap instances
        # (CUDA has no such cap — rasterizer_impl.cu:236-244 resizes);
        # detect it so the caller's overflow policy can re-render
        tile_len = jnp.minimum(binning.tile_end, max_instances) - jnp.minimum(
            binning.tile_start, max_instances
        )
        overflow = binning.overflow | (jnp.max(tile_len) > tile_cap)
        tiles = composite_tiles(
            proc, binning, grid_x, grid_y, tile_cap=tile_cap, chunk=chunk
        )

    color = tiles_to_image(tiles.color, grid_x, grid_y, H, W)
    depth = tiles_to_image(tiles.depth, grid_x, grid_y, H, W)
    final_T = tiles_to_image(tiles.final_T, grid_x, grid_y, H, W)
    n_contrib = tiles_to_image(tiles.n_contrib, grid_x, grid_y, H, W)
    color = color + final_T[..., None] * bg[None, None, :]

    return RenderOutput(
        color=color,
        depth=depth,
        alpha=1.0 - final_T,
        final_T=final_T,
        radii=proc.radius,
        visible=proc.visible,
        num_rendered=num_rendered,
        overflow=overflow,
        n_contrib=n_contrib,
    )


def render_safe(scene, camera: Camera, bg=None, *, max_retries: int = 3,
                max_instances: Optional[int] = None, tile_cap: int = 1024,
                **kwargs) -> RenderOutput:
    """Host-side overflow policy around `render` (SURVEY hard-part #1):
    if a render reports instance-buffer or per-tile-capacity overflow,
    re-render with doubled capacities (the XLA analog of CUDA's runtime
    buffer resize, rasterizer_impl.cu:236-244). NOT jittable — use inside
    host loops (origin-render caching, tracing, eval); the jitted train
    step instead surfaces `overflow` in its metrics."""
    import warnings

    import jax

    if max_instances is None:
        max_instances = default_max_instances(scene.capacity)
    for attempt in range(max_retries + 1):
        out = render(scene, camera, bg, max_instances=max_instances,
                     tile_cap=tile_cap, **kwargs)
        if not bool(jax.device_get(out.overflow)):
            return out
        if attempt < max_retries:
            warnings.warn(
                f"render overflow (num_rendered={int(out.num_rendered)}, "
                f"max_instances={max_instances}, tile_cap={tile_cap}); "
                "retrying at doubled capacity"
            )
            max_instances *= 2
            tile_cap *= 2
    warnings.warn("render overflow persisted after retries; output may "
                  "drop contributors")
    return out
