"""Project / unproject helpers for click-based semantic tracing.

Parity with `threestudio/utils/camera.py:71-150` (`project`, `unproject`,
`get_point_depth`): powering the WebUI's click-prompt tracing
(webui.py:890-958) — a 2D click + the rendered depth lifts to a 3D point,
which is re-projected into other views to seed per-view point prompts.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gaussianeditor_tpu.core.cameras import Camera


def project(camera: Camera, points: np.ndarray) -> np.ndarray:
    """[N, 3] world points -> [N, 2] pixel coords (x, y) + [N] depth."""
    points = np.asarray(points, np.float32)
    ones = np.ones((points.shape[0], 1), np.float32)
    p_hom = np.concatenate([points, ones], axis=1) @ np.asarray(
        camera.full_proj
    ).T
    w = p_hom[:, 3:4] + 1e-7
    ndc = p_hom[:, :2] / w
    x = ((ndc[:, 0] + 1) * camera.width - 1) * 0.5
    y = ((ndc[:, 1] + 1) * camera.height - 1) * 0.5
    depth = (
        points @ np.asarray(camera.world_view)[2, :3]
        + float(np.asarray(camera.world_view)[2, 3])
    )
    return np.stack([x, y], axis=1), depth


def unproject(camera: Camera, pixels: np.ndarray,
              depth_map: np.ndarray) -> np.ndarray:
    """[N, 2] pixel coords + rendered depth map [H, W] -> [N, 3] world
    points at the rendered depth (utils/camera.py:101-141)."""
    pixels = np.asarray(pixels)
    px = np.clip(pixels[:, 0].astype(int), 0, camera.width - 1)
    py = np.clip(pixels[:, 1].astype(int), 0, camera.height - 1)
    z = np.asarray(depth_map)[py, px]

    ndc_x = (2.0 * pixels[:, 0] + 1.0) / camera.width - 1.0
    ndc_y = (2.0 * pixels[:, 1] + 1.0) / camera.height - 1.0
    cam_pts = np.stack(
        [
            ndc_x * float(camera.tan_fovx) * z,
            ndc_y * float(camera.tan_fovy) * z,
            z,
            np.ones_like(z),
        ],
        axis=1,
    )
    c2w = np.linalg.inv(np.asarray(camera.world_view))
    return (cam_pts @ c2w.T)[:, :3]
