"""Image losses: L1, SSIM, PSNR.

Parity with `gaussiansplatting/utils/loss_utils.py:17-43` (L1 and the
11x11 Gaussian-window SSIM with C1=0.01^2, C2=0.03^2) and
`utils/image_utils.py:17` (PSNR). Channels-last [..., H, W, C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray,
             window_size: int = 11, rows: str = "SAME") -> jnp.ndarray:
    """Per-pixel SSIM map of an [H, W, C] / [B, H, W, C] pair; separable
    Gaussian window, matching loss_utils.py:23-43.

    rows: padding mode for the H axis. "SAME" = whole-image semantics
    (zero pad). "VALID" = the inputs carry (window_size-1)/2 pre-filled
    halo rows on both sides (parallel/halo.py strip exchange) and the
    map comes back trimmed to the interior — the sharded-exact path.
    The W axis is always SAME (columns are never sharded).
    """
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    w = jnp.asarray(_gaussian_window(window_size))

    def blur(x):
        # separable conv along H then W, per channel
        x = jnp.moveaxis(x, -1, 1)  # [B, C, H, W]
        kh = w.reshape(1, 1, window_size, 1)
        kw = w.reshape(1, 1, 1, window_size)
        b, c, h, wd = x.shape
        x = x.reshape(b * c, 1, h, wd)
        x = jax.lax.conv_general_dilated(x, kh, (1, 1), rows)
        x = jax.lax.conv_general_dilated(x, kw, (1, 1), "SAME")
        x = x.reshape(b, c, -1, wd)
        return jnp.moveaxis(x, 1, -1)

    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu12

    c1, c2 = 0.01**2, 0.03**2
    return ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over an [H, W, C] (or [B, H, W, C]) image pair; separable
    Gaussian window, SAME padding — matching loss_utils.py:23-43."""
    return jnp.mean(ssim_map(img1, img2, window_size))
