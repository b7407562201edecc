"""apply_weights — splat per-pixel weights back onto per-Gaussian
accumulators (the core of 2D->3D semantic mask lifting).

TPU-native equivalent of the GaussianEditor-specific CUDA kernel
(`cuda_rasterizer/apply_weights.cu:240-356`, orchestrated by
`rasterizer_impl.cu:343-447`): for every pixel, walk the depth-sorted
tile list front-to-back with the exact render-loop (T, done) semantics,
and for every *contributing* Gaussian add the pixel's weight image value
to `weights[gaussian, ch]` and 1 to `cnt[gaussian]` per channel.

Where CUDA uses global atomicAdds (nondeterministic order), this
implementation reduces each chunk with a (pixels x chunk) matmul and a
deterministic XLA scatter-add — bit-stable across runs.

Shares preprocess + binning with the renderer; the contribution predicate
is the cumulative-product formulation proven exact in
`ops/composite.py`. Forward-only (no gradients needed — the reference
wraps it in torch.no_grad, GassuianEditor.py:86).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gaussianeditor_tpu.core.cameras import Camera
from gaussianeditor_tpu.ops.binning import bin_and_sort
from gaussianeditor_tpu.ops.composite import (
    ALPHA_MAX,
    ALPHA_MIN,
    T_MIN,
    _tile_pixel_coords,
)
from gaussianeditor_tpu.ops.preprocess import TILE, preprocess


def image_to_tiles(img: jnp.ndarray, grid_x: int, grid_y: int) -> jnp.ndarray:
    """[H, W, ...] -> [num_tiles, TILE*TILE, ...] with zero padding."""
    H, W = img.shape[:2]
    trailing = img.shape[2:]
    pad_h, pad_w = grid_y * TILE - H, grid_x * TILE - W
    img = jnp.pad(img, ((0, pad_h), (0, pad_w)) + ((0, 0),) * len(trailing))
    img = img.reshape((grid_y, TILE, grid_x, TILE) + trailing)
    img = jnp.moveaxis(img, 1, 2)
    return img.reshape((grid_y * grid_x, TILE * TILE) + trailing)


def apply_weights(
    scene,
    camera: Camera,
    image_weights: jnp.ndarray,  # [H, W, ch] per-pixel weights (e.g. 2D mask)
    weights: jnp.ndarray,        # [C, ch] running accumulator
    weights_cnt: jnp.ndarray,    # [C] int32 running contribution counter
    *,
    max_instances: Optional[int] = None,
    tile_cap: int = 1024,
    chunk: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One view's accumulation pass; call per view and normalize with
    `weights / (weights_cnt + 1e-7)` (GassuianEditor.py:134-137).

    Returns (weights, counts, overflow): overflow is True when the
    instance buffer or any tile's `tile_cap` truncated contributors —
    callers re-run the view at doubled capacity (no silent splat loss)."""
    H, W = camera.height, camera.width
    ch = image_weights.shape[-1]
    Cap = scene.capacity

    proc = preprocess(
        scene.params.xyz,
        scene.params.log_scales,
        scene.params.quats,
        scene.get_opacity[:, 0],
        None,
        camera,
        alive=scene.alive,
        override_color=jnp.zeros((Cap, 1)),  # features unused here
    )
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    if max_instances is None:
        from gaussianeditor_tpu.ops.render import default_max_instances

        max_instances = default_max_instances(Cap)
    binning = bin_and_sort(proc, grid_x, grid_y, max_instances)

    img_tiles = image_to_tiles(image_weights, grid_x, grid_y)  # [T, px, ch]
    pixf = _tile_pixel_coords(grid_x, grid_y)
    # out-of-image pixels never contribute (inside check, apply_weights.cu:262)
    px_valid = (pixf[..., 0] < W) & (pixf[..., 1] < H)  # [T, px]

    start = binning.tile_start
    end = jnp.minimum(binning.tile_end, start + tile_cap)
    R = binning.gauss_id.shape[0]
    n_steps = -(-tile_cap // chunk)

    def step(carry, i):
        T_in, done_in, w_acc, c_acc = carry
        pos = start[:, None] + i * chunk + jnp.arange(chunk)[None, :]
        in_range = pos < end[:, None]
        gid = binning.gauss_id[jnp.clip(pos, 0, R - 1)]

        xy = proc.mean2d[gid]
        conic = proc.conic[gid]
        op = proc.opacity[gid]

        d = xy[:, None, :, :] - pixf[:, :, None, :]
        dx, dy = d[..., 0], d[..., 1]
        power = (
            -0.5 * (conic[:, None, :, 0] * dx * dx + conic[:, None, :, 2] * dy * dy)
            - conic[:, None, :, 1] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_MAX, op[:, None, :] * jnp.exp(jnp.minimum(power, 0.0)))
        skipped = (
            (power > 0.0) | (alpha < ALPHA_MIN)
            | ~in_range[:, None, :] | ~px_valid[..., None]
        )
        f = jnp.where(skipped, 1.0, 1.0 - alpha)
        P_incl = jnp.cumprod(f, axis=-1)
        TP = T_in[..., None] * P_incl
        contributes = (~done_in[..., None]) & (~skipped) & (TP >= T_MIN)
        done_out = done_in | jnp.any((~skipped) & (TP < T_MIN), axis=-1)
        T_out = T_in * jnp.prod(jnp.where(contributes, f, 1.0), axis=-1)

        contrib_f = contributes.astype(jnp.float32)  # [T, px, chunk]
        # per-instance weight sums: [T, chunk, ch]
        w_add = jax.lax.dot_general(
            contrib_f, img_tiles,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        n_add = jnp.sum(contrib_f, axis=1) * ch  # cnt += 1 per channel (:332-334)

        flat_gid = gid.reshape(-1)
        w_acc = w_acc.at[flat_gid].add(w_add.reshape(-1, ch))
        c_acc = c_acc.at[flat_gid].add(n_add.reshape(-1).astype(jnp.int32))
        return (T_out, done_out, w_acc, c_acc), None

    num_tiles = grid_x * grid_y
    n_px = TILE * TILE
    T0 = jnp.ones((num_tiles, n_px), jnp.float32)
    done0 = jnp.zeros((num_tiles, n_px), bool)
    (_, _, w_out, c_out), _ = jax.lax.scan(
        step, (T0, done0, weights, weights_cnt), jnp.arange(n_steps)
    )
    tile_len = jnp.minimum(binning.tile_end, max_instances) - jnp.minimum(
        binning.tile_start, max_instances
    )
    overflow = binning.overflow | (jnp.max(tile_len) > tile_cap)
    return w_out, c_out, overflow
