"""Image / video / grid writers.

Parity with the reference `SaverMixin` surface actually used by the
editing systems (`threestudio/utils/saving.py`: save_image_grid :301,
save_img_sequence :396, rgb/grayscale writers) — functional, imageio-
backed, channels-last float images in [0, 1].
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def _to_u8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    return img


def save_image(path: str, img: np.ndarray) -> None:
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    imageio.imwrite(path, _to_u8(img))


def save_image_grid(path: str, images: Sequence[np.ndarray],
                    cols: Optional[int] = None) -> None:
    """Horizontal/wrapped grid of same-size images (save_image_grid)."""
    imgs = [_to_u8(im) for im in images]
    h, w = imgs[0].shape[:2]
    assert all(im.shape[:2] == (h, w) for im in imgs)
    n = len(imgs)
    cols = cols or n
    rows = -(-n // cols)
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, im in enumerate(imgs):
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = im[..., :3]
    save_image(path, grid)


def save_video(path: str, frames: Sequence[np.ndarray], fps: int = 30) -> str:
    """mp4/gif turntable writer (save_img_sequence; used by
    on_test_epoch_end, GassuianEditor.py:436-481). Environments without
    an ffmpeg backend fall back to GIF; returns the path written."""
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    u8 = [_to_u8(f) for f in frames]
    if path.endswith(".gif"):
        imageio.mimwrite(path, u8, duration=1000.0 / fps)
        return path
    try:
        imageio.mimwrite(path, u8, fps=fps, macro_block_size=1)
        return path
    except (ValueError, ImportError):
        alt = os.path.splitext(path)[0] + ".gif"
        imageio.mimwrite(alt, u8, duration=1000.0 / fps)
        return alt
