"""Semantic tracing: lift 2D segmentation masks to per-Gaussian labels.

Parity with `GaussianEditor.update_mask` (threestudio/systems/
GassuianEditor.py:86-150) and the click-prompt variant
(webui.py:890-958): per cached view, obtain a 2D mask from the segmentor,
splat it onto per-Gaussian weight/count accumulators with
`ops.apply_weights`, normalize by count, threshold, and install the
resulting boolean mask (which gates gradients and densification).

The segmentor is pluggable (`guidance.segmentation`): LangSAM in
production, a deterministic color-threshold fake in tests.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussianeditor_tpu.core.cameras import Camera
from gaussianeditor_tpu.ops.apply_weights import apply_weights


@functools.lru_cache(maxsize=None)
def _jitted_apply_weights(height, width, tile_cap, chunk):
    def f(scene, camera, mask_img, weights, cnt):
        return apply_weights(
            scene, camera, mask_img, weights, cnt,
            tile_cap=tile_cap, chunk=chunk,
        )

    return jax.jit(f)


def accumulate_view_weights(
    scene,
    cameras: Sequence[Camera],
    masks: Sequence[jnp.ndarray],  # each [H, W] in [0, 1]
    *,
    tile_cap: int = 1024,
    chunk: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the apply_weights accumulation over a set of views
    (GassuianEditor.py:97-133). Returns (weights [C,1], counts [C]).

    Views whose accumulation reports capacity overflow are re-run at
    doubled tile_cap (overflow policy: no silent contributor loss)."""
    import warnings

    C = scene.capacity
    weights = jnp.zeros((C, 1), jnp.float32)
    cnt = jnp.zeros((C,), jnp.int32)
    for cam, mask in zip(cameras, masks):
        m = jnp.asarray(mask, jnp.float32)
        if m.ndim == 2:
            m = m[..., None]
        cap = tile_cap
        for attempt in range(4):
            f = _jitted_apply_weights(cam.height, cam.width, cap, chunk)
            w2, c2, over = f(scene, cam, m, weights, cnt)
            if not bool(jax.device_get(over)) or attempt == 3:
                if attempt == 3:
                    warnings.warn("apply_weights overflow persisted after "
                                  "retries; mask lifting may be incomplete")
                weights, cnt = w2, c2
                break
            warnings.warn(
                f"apply_weights tile overflow at tile_cap={cap}; retrying "
                "at doubled capacity"
            )
            cap *= 2
    return weights, cnt


def trace_from_click(
    scene,
    cameras: Sequence[Camera],
    click_view: int,
    click_xy,
    point_segmentor,
    mask_thres: float = 0.5,
    *,
    render_fn=None,
    tile_cap: int = 1024,
    chunk: int = 128,
):
    """Click-prompt tracing (webui.py:890-958): unproject the click
    through the rendered depth of the clicked view, re-project the 3D
    point into every view, run the point-prompted segmentor per view,
    and lift the masks with apply_weights.

    point_segmentor: (image [H,W,3], points [N,2]) -> [H,W] mask — the
    SAM point-predictor protocol (webui.py:913-928).
    Returns (scene_with_mask, normalized_weights).
    """
    import jax

    from gaussianeditor_tpu.ops.render import render as _render
    from gaussianeditor_tpu.utils.camera_math import project, unproject

    if render_fn is None:
        render_fn = jax.jit(
            lambda s, c: _render(s, c, tile_cap=tile_cap, chunk=chunk)
        )
    out = render_fn(scene, cameras[click_view])
    depth = np.asarray(out.depth)
    pt3d = unproject(cameras[click_view], np.asarray([click_xy], np.float32),
                     depth)

    masks = []
    for cam in cameras:
        pix, z = project(cam, pt3d)
        img = np.asarray(render_fn(scene, cam).color)
        in_view = (
            (0 <= pix[0, 0] < cam.width) and (0 <= pix[0, 1] < cam.height)
            and z[0] > 0
        )
        if in_view:
            masks.append(point_segmentor(img, pix))
        else:
            masks.append(np.zeros((cam.height, cam.width), np.float32))
    return update_mask_from_views(scene, cameras, masks, mask_thres,
                                  tile_cap=tile_cap, chunk=chunk)


def update_mask_from_views(
    scene,
    cameras: Sequence[Camera],
    masks: Sequence[jnp.ndarray],
    mask_thres: float = 0.5,
    *,
    tile_cap: int = 1024,
    chunk: int = 128,
):
    """Full tracing step: accumulate -> normalize -> threshold -> install.

    Matches GassuianEditor.py:134-150: selected = weights/(cnt+1e-7) >
    mask_thres; the new mask replaces the scene's semantic mask and the
    anchor snapshot is refreshed for the upcoming edit.
    Returns (scene, normalized_weights [C]).
    """
    weights, cnt = accumulate_view_weights(
        scene, cameras, masks, tile_cap=tile_cap, chunk=chunk
    )
    norm = weights[:, 0] / (cnt.astype(jnp.float32) + 1e-7)
    selected = (norm > mask_thres) & scene.alive
    scene = scene.set_mask(selected)
    return scene, norm
