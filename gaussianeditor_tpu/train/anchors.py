"""Hierarchical Gaussian Splatting: anchor (elastic) loss + schedule.

Parity with `gaussian_model.py:136-184` (`update_anchor_loss_schedule`,
`anchor_loss`): per-generation weights grow by `anchor_weight_multiplier`
on every densification, capped at MAX_ANCHOR_WEIGHT=10; the firstborn
(newest) generation always carries weight 0 until the next densify; the
loss is a per-element MSE between current raw params and the anchor
snapshot, weighted by the generation schedule, restricted to the semantic
mask, and grouped into color / geo / opacity / scale terms.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from gaussianeditor_tpu.models.gaussians import (
    MAX_ANCHOR_WEIGHT,
    MAX_GENERATIONS,
    GaussianScene,
)


def update_anchor_loss_schedule(
    scene: GaussianScene,
    anchor_weight_init: float,
    anchor_weight_multiplier: float,
) -> GaussianScene:
    """gaussian_model.py:136-149, on the fixed-size weights array."""
    n = scene.n_generations
    idx = jnp.arange(MAX_GENERATIONS)
    w = scene.anchor_weights
    w = jnp.where(idx < n, jnp.minimum(anchor_weight_multiplier * w,
                                       MAX_ANCHOR_WEIGHT), w)
    # the previous firstborn (weight 0) starts anchoring at init weight
    w = jnp.where((idx == n - 1) & (n > 1), anchor_weight_init, w)
    # the new firstborn generation is exempt
    w = jnp.where(idx == n, 0.0, w)
    n = jnp.minimum(n + 1, MAX_GENERATIONS - 1)
    return scene.replace(anchor_weights=w, n_generations=n)


def anchor_loss(scene: GaussianScene) -> Dict[str, jnp.ndarray]:
    """gaussian_model.py:152-184. Means are over masked alive elements
    (the reference indexes with the mask, so its `.mean()` divides by the
    masked count x feature size)."""
    sel = (scene.mask & scene.alive).astype(jnp.float32)
    w = scene.anchor_weights[jnp.clip(scene.generation, 0, MAX_GENERATIONS - 1)]
    w = w * sel  # [C]
    n_sel = jnp.maximum(jnp.sum(sel), 1.0)

    def term(cur, ref):
        feat = 1
        for s in cur.shape[1:]:
            feat *= s
        if feat == 0:  # e.g. features_rest at SH degree 0
            return jnp.asarray(0.0, jnp.float32)
        d = (cur - ref) ** 2
        per_row = jnp.sum(d.reshape(d.shape[0], -1), axis=-1)
        return jnp.sum(per_row * w) / (n_sel * feat)

    p, a = scene.params, scene.anchor
    return {
        "loss_anchor_color": term(p.features_dc, a.features_dc)
        + term(p.features_rest, a.features_rest),
        "loss_anchor_geo": term(p.xyz, a.xyz) + term(p.quats, a.quats),
        "loss_anchor_opacity": term(p.opacity_raw, a.opacity_raw),
        "loss_anchor_scale": term(p.log_scales, a.log_scales),
    }
