"""Instance-space (tile) sharding prototype — one large render split
across chips in horizontal tile-row strips (docs/tile_sharding.md;
SURVEY §2.6/§5 long-axis item).

Each shard runs the UNMODIFIED production pipeline (preprocess ->
sorted_bin -> Pallas chunk compositor) on its strip: the preprocess
`tile_row_range` clip drops out-of-strip instances at rect-walk time
(so binning work is ~R/D per shard), the mean2d y coordinate is shifted
into strip-local pixels, and strips are all-gathered into the full
image. Gradients need no extra collective for the render itself — each
shard's compositor backward yields exact partials for the Gaussians
seen by its strip, and the loss's psum handles the cross-strip sum
(demonstrated in tests/test_tile_sharding.py).

The CUDA reference has no multi-GPU analog of this (single-GPU per
render, `forward.cu:261` launches one block per tile on one device).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gaussianeditor_tpu.core.cameras import Camera
from gaussianeditor_tpu.ops.binning_sorted import sorted_bin
from gaussianeditor_tpu.ops.composite import composite_tiles, tiles_to_image
from gaussianeditor_tpu.ops.binning import bin_and_sort
from gaussianeditor_tpu.ops.pallas_composite import (
    make_pallas_compositor_sorted,
)
from gaussianeditor_tpu.ops.preprocess import TILE, preprocess


class StripRender:
    """Lightweight result bundle for one tile-row strip."""

    def __init__(self, color, final_T, overflow, radii, visible):
        self.color = color
        self.final_T = final_T
        self.overflow = overflow
        self.radii = radii
        self.visible = visible

    def __iter__(self):  # backward compat: (color, final_T, overflow)
        return iter((self.color, self.final_T, self.overflow))


def render_strip(scene, camera: Camera, ty0, gy_local: int, *,
                 max_instances: int, impl: str = "pallas",
                 mean2d_offset_ndc=None):
    """Render tile rows [ty0, ty0 + gy_local) of `camera`'s image.

    ty0 may be traced (per-shard under shard_map); gy_local is static.
    Returns a StripRender (iterable as (color, final_T, overflow));
    `visible` is strip-local (a splat is visible iff it touches THIS
    strip — OR/pmax over strips reconstructs the full-image filter).
    """
    W, H = camera.width, camera.height
    grid_x = (W + TILE - 1) // TILE
    proc = preprocess(
        scene.params.xyz,
        scene.params.log_scales,
        scene.params.quats,
        scene.get_opacity[:, 0],
        scene.get_features,
        camera,
        alive=scene.alive,
        active_sh_degree=scene.active_sh_degree,
        max_sh_degree=scene.max_sh_degree,
        tile_row_range=(ty0, ty0 + gy_local),
        mean2d_offset_ndc=mean2d_offset_ndc,
    )
    # strip-local pixel space: shift the splat centers' y
    shift = (ty0 * TILE).astype(jnp.float32)
    proc = proc._replace(
        mean2d=proc.mean2d - jnp.stack(
            [jnp.zeros_like(shift), shift]
        )[None, :]
    )
    n_tiles = grid_x * gy_local
    if impl == "pallas":
        sb = sorted_bin(proc, grid_x, gy_local, max_instances)
        compositor = make_pallas_compositor_sorted(
            n_tiles, grid_x, proc.color.shape[-1], scene.capacity,
            max_instances,
        )
        tiles = compositor(
            proc.mean2d, proc.conic, proc.opacity, proc.color, proc.depth, sb
        )
        overflow = sb.overflow
    else:
        binning = bin_and_sort(proc, grid_x, gy_local, max_instances)
        tiles = composite_tiles(proc, binning, grid_x, gy_local)
        overflow = binning.overflow
    hs = gy_local * TILE
    color = tiles_to_image(tiles.color, grid_x, gy_local, hs, W)
    final_T = tiles_to_image(tiles.final_T, grid_x, gy_local, hs, W)
    return StripRender(color, final_T, overflow, proc.radius, proc.visible)


def make_tile_sharded_render(mesh: Mesh, scene_capacity: int, camera: Camera,
                             *, axis: str = "tile",
                             max_instances_per_shard: int,
                             impl: str = "pallas"):
    """Build a jittable full-image render sharded over `axis`.

    render(scene, bg) -> (color [H, W, ch], overflow_any). Gaussians are
    replicated; each device renders its strip; strips are all-gathered.
    """
    D = mesh.shape[axis]
    H = camera.height
    gy = (H + TILE - 1) // TILE
    assert gy % D == 0, f"tile rows {gy} not divisible by {D} shards"
    gy_local = gy // D

    def _shard(scene, bg):
        d = jax.lax.axis_index(axis)
        ty0 = d * gy_local
        color, final_T, ovf = render_strip(
            scene, camera, ty0, gy_local,
            max_instances=max_instances_per_shard, impl=impl,
        )
        color = color + final_T[..., None] * bg[None, None, :]
        strips = jax.lax.all_gather(color, axis)      # [D, hs, W, ch]
        ovf_any = jax.lax.pmax(ovf.astype(jnp.int32), axis) > 0
        return strips.reshape(H, camera.width, -1), ovf_any

    return jax.jit(
        jax.shard_map(
            _shard, mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
