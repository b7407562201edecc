"""Halo exchange for strip-sharded window losses (VERDICT round-2 #4).

The 2-D (view x tile) mesh step shards each image into tile-row strips;
window losses see truncated neighborhoods at strip boundaries. Two exact
remedies, chosen per loss by receptive-field size:

* SSIM (11x11 Gaussian window, radius 5): `halo_exchange_rows` ships the
  (window-1)/2 boundary rows between adjacent strips over ICI with ONE
  `jax.lax.ppermute` pair per direction; true image edges keep the
  reference's zero padding (loss_utils.py:23-43 uses SAME conv). The
  extended strips then run a rows-VALID SSIM whose map equals the
  full-image map restricted to the strip — bit-exact, gradients flow
  back through the ppermute automatically (its VJP is the reverse
  permute).

* LPIPS (VGG16 through conv5_3, receptive field ~212 px): a "halo" of
  106 rows against 128-row strips ships ~1.7x MORE bytes than just
  all-gathering the missing strips, and needs pool-aligned VALID
  plumbing through every VGG stage. `gather_rows` therefore
  reconstructs the full image per chip (the all_gather VJP
  psum-scatters cotangents, so gradients are exact), and the caller
  divides by the tile-axis size so the replicated loss psums to one
  image's worth. Compute is replicated across the tile axis — a
  deliberate trade: the tile axis exists to shard the RENDER, which
  dwarfs one VGG pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussianeditor_tpu.train.losses import ssim_map


def halo_exchange_rows(x: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """Extend a strip [hs, W, ...] with `halo` rows from each neighbor
    along the named mesh axis (row-sharded images, shard i holding rows
    [i*hs, (i+1)*hs)). True image edges are zero-filled, matching SAME
    conv padding. Must run inside shard_map."""
    n = jax.lax.psum(1, axis)
    i = jax.lax.axis_index(axis)
    # my top halo = previous shard's bottom rows: shift data forward
    from_prev = jax.lax.ppermute(
        x[-halo:], axis, [(j, (j + 1) % n) for j in range(n)])
    # my bottom halo = next shard's top rows: shift data backward
    from_next = jax.lax.ppermute(
        x[:halo], axis, [(j, (j - 1) % n) for j in range(n)])
    top = jnp.where(i == 0, jnp.zeros_like(from_prev), from_prev)
    bot = jnp.where(i == n - 1, jnp.zeros_like(from_next), from_next)
    return jnp.concatenate([top, x, bot], axis=0)


def ssim_sum_sharded(pred: jnp.ndarray, target: jnp.ndarray, axis: str,
                     window_size: int = 11) -> jnp.ndarray:
    """SUM of the SSIM map over this shard's strip rows, exact across
    strip boundaries (halo-extended rows-VALID map). psum over `axis`
    and divide by H*W*C to recover the full-image mean SSIM."""
    h = window_size // 2
    p = halo_exchange_rows(pred, h, axis)
    t = halo_exchange_rows(target, h, axis)
    return jnp.sum(ssim_map(p, t, window_size, rows="VALID"))


def ssim_sharded(pred: jnp.ndarray, target: jnp.ndarray, axis: str,
                 window_size: int = 11) -> jnp.ndarray:
    """Full-image mean SSIM of a row-strip-sharded pair; equals
    losses.ssim on the gathered image to fp tolerance. Must run inside
    shard_map; all strips must be equal-height."""
    s = jax.lax.psum(
        ssim_sum_sharded(pred, target, axis, window_size), axis)
    n = jax.lax.psum(1, axis)
    return s / (n * pred.size)


def gather_rows(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Reassemble the full image from row strips: [hs, W, ...] ->
    [n*hs, W, ...]. Differentiable (all_gather VJP = psum-scatter)."""
    g = jax.lax.all_gather(x, axis)  # [n, hs, W, ...]
    return g.reshape((-1,) + x.shape[1:])
