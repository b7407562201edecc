"""Densification & pruning under fixed capacity — fully jit-compatible.

Semantics-preserving re-design of `densify_and_prune` and friends
(`gaussian_model.py:673-815`). The reference resizes parameter tensors and
performs optimizer-state surgery; under XLA we keep a fixed capacity C
with an `alive` mask:

  * clone  -> copy the row into a free slot (original keeps its moments,
              the new slot's moments are zeroed);
  * split  -> the original slot is overwritten by one resampled child and
              a second child goes to a free slot (the reference prunes the
              original and appends two children — same population, and the
              moments of all written slots reset to zero exactly like
              `cat_tensors_to_optimizer` zero-extends);
  * prune  -> clear `alive`.

Preserved reference behaviors, including the subtle ones:
  * grads zeroed outside the semantic mask before gating
    (gaussian_model.py:774 "Bug fixed");
  * top-percent quantile gating with `max_densify_percent`
    (`:775-779`, GaussianEditor's change vs vanilla);
  * clone condition max-scale <= percent_dense*extent, split condition >
    (`:730-744`, `:673-689`); split children scale /(0.8*N), N=2;
  * children tagged generation = generation_num; mask inherited;
  * max_radii2D / grad accumulators are reset by densification_postfix
    BEFORE the prune mask is computed (`:697-708` ordering), so the
    max_screen_size screen-space prune never fires inside
    densify_and_prune — we reproduce that faithfully;
  * prune restricted to maskedAussians AND'ed with the world-space
    size/opacity conditions (`:794` "fix bug");
  * anchor snapshot + schedule growth afterwards (`:805-808`).

If free slots run out, excess clones/splits are dropped deterministically
(lowest slot index first) and reported via `n_dropped`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from gaussianeditor_tpu.core.transforms import quat_to_rotmat
from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.train.anchors import update_anchor_loss_schedule


@struct.dataclass
class DensifyConfig:
    max_grad: float = 0.01              # densify_grad_threshold
    max_densify_percent: float = 0.01
    min_opacity: float = 0.005
    max_screen_size: float = 5.0        # 0 disables the (dead) vs-prune branch
    percent_dense: float = 0.01


@struct.dataclass
class DensifyStats:
    xyz_gradient_accum: jnp.ndarray  # [C]
    denom: jnp.ndarray               # [C]
    max_radii2d: jnp.ndarray         # [C] float32


def init_densify_stats(capacity: int) -> DensifyStats:
    z = jnp.zeros((capacity,), jnp.float32)
    return DensifyStats(xyz_gradient_accum=z, denom=z, max_radii2d=z)


def add_densification_stats(
    stats: DensifyStats,
    viewspace_grad_norm: jnp.ndarray,  # [C] ||dL/d(ndc mean2d)|| summed over batch
    radii: jnp.ndarray,                # [C] int32 max radii over batch
    update_filter: jnp.ndarray,        # [C] bool (radii > 0 in any batch view)
) -> DensifyStats:
    """Reference `add_densification_stats` (gaussian_model.py:811-815) +
    the max_radii2D running max from `on_before_optimizer_step`
    (GassuianEditor.py:253-269)."""
    upd = update_filter.astype(jnp.float32)
    return DensifyStats(
        xyz_gradient_accum=stats.xyz_gradient_accum + viewspace_grad_norm * upd,
        denom=stats.denom + upd,
        max_radii2d=jnp.maximum(stats.max_radii2d, radii.astype(jnp.float32)),
    )


class DensifyResult(NamedTuple):
    scene: GaussianScene
    stats: DensifyStats
    reset_mask: jnp.ndarray   # [C] slots whose Adam moments must be zeroed
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_dropped: jnp.ndarray    # requests lost to capacity exhaustion


def _masked_quantile(values: jnp.ndarray, valid: jnp.ndarray, q: jnp.ndarray):
    """torch.quantile(values[valid], q) with linear interpolation, under
    static shapes (invalid entries sorted to +inf)."""
    C = values.shape[0]
    n = jnp.sum(valid.astype(jnp.int32))
    s = jnp.sort(jnp.where(valid, values, jnp.inf))
    pos = jnp.clip(q, 0.0, 1.0) * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    lo = jnp.clip(lo, 0, C - 1)
    hi = jnp.clip(hi, 0, C - 1)
    return s[lo] * (1.0 - frac) + s[hi] * frac


def densify_and_prune(
    scene: GaussianScene,
    stats: DensifyStats,
    config: DensifyConfig,
    cameras_extent: float,
    key: jax.Array,
    anchor_weight_init: float,
    anchor_weight_multiplier: float,
) -> DensifyResult:
    C = scene.capacity
    alive = scene.alive
    p = scene.params

    # --- gradient gating (gaussian_model.py:771-779) ---
    grads = stats.xyz_gradient_accum / jnp.maximum(stats.denom, 1e-12)
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)
    grads = jnp.where(scene.mask & alive, grads, 0.0)

    if config.max_densify_percent < 1.0:
        n_alive = jnp.sum(alive.astype(jnp.float32))
        nnz = jnp.sum((grads != 0.0).astype(jnp.float32))
        valid_percent = nnz * config.max_densify_percent / jnp.maximum(n_alive, 1.0)
        thres = _masked_quantile(grads, alive, 1.0 - valid_percent)
        grads = jnp.where(grads < thres, 0.0, grads)

    # --- selection (clone :730-744 / split :673-689) ---
    max_scale = jnp.max(jnp.exp(p.log_scales), axis=-1)
    dense_lim = config.percent_dense * cameras_extent
    hot = (grads >= config.max_grad) & alive
    clone_sel = hot & (max_scale <= dense_lim)
    split_sel = hot & (max_scale > dense_lim)

    # --- free-slot allocation ---
    # each clone or split needs exactly one free slot (split child B).
    req = clone_sel | split_sel
    n_free = jnp.sum((~alive).astype(jnp.int32))
    free_sorted = jnp.argsort(jnp.where(~alive, jnp.arange(C), C + jnp.arange(C)))
    rank = jnp.cumsum(req.astype(jnp.int32)) - 1
    can_alloc = req & (rank < n_free)
    dest = jnp.where(can_alloc, free_sorted[jnp.clip(rank, 0, C - 1)], C)  # C==drop
    n_dropped = jnp.sum((req & ~can_alloc).astype(jnp.int32))

    clone_do = clone_sel & can_alloc
    split_do = split_sel & can_alloc

    # --- split resampling (gaussian_model.py:689-699): child xyz = R@eps+xyz,
    # eps ~ N(0, diag(scales)); child log-scale = log(scale / (0.8*N)), N=2.
    key_a, key_b = jax.random.split(key)
    scales = jnp.exp(p.log_scales)
    R = quat_to_rotmat(p.quats)

    def sample_child(k):
        eps = jax.random.normal(k, (C, 3)) * scales
        return jnp.einsum("nij,nj->ni", R, eps) + p.xyz

    child_a_xyz = sample_child(key_a)   # overwrites the split original
    child_b_xyz = sample_child(key_b)   # goes to the free slot
    child_log_scales = jnp.log(scales / (0.8 * 2.0))

    gen_new = scene.n_generations.astype(jnp.int32)  # == generation_num

    # --- source rows for the newly allocated slots ---
    new_xyz = jnp.where(split_do[:, None], child_b_xyz, p.xyz)
    new_log_scales = jnp.where(split_do[:, None], child_log_scales, p.log_scales)

    def scatter(base, rows):
        return base.at[dest].set(rows, mode="drop")

    out = GaussianParams(
        xyz=scatter(p.xyz, jnp.where(req[:, None], new_xyz, p.xyz)),
        features_dc=scatter(p.features_dc, p.features_dc),
        features_rest=scatter(p.features_rest, p.features_rest),
        opacity_raw=scatter(p.opacity_raw, p.opacity_raw),
        log_scales=scatter(p.log_scales,
                           jnp.where(req[:, None], new_log_scales, p.log_scales)),
        quats=scatter(p.quats, p.quats),
    )
    # overwrite split originals in place with child A
    out = out.replace(
        xyz=jnp.where(split_do[:, None], child_a_xyz, out.xyz),
        log_scales=jnp.where(split_do[:, None], child_log_scales, out.log_scales),
    )

    new_alive = alive.at[dest].set(True, mode="drop")
    new_mask = scene.mask.at[dest].set(jnp.where(req, scene.mask, False), mode="drop")
    gen_rows = jnp.where(req, gen_new, scene.generation)
    new_generation = scene.generation.at[dest].set(gen_rows, mode="drop")
    new_generation = jnp.where(split_do, gen_new, new_generation)

    # postfix resets the accumulators and max radii for everyone
    # (densification_postfix, gaussian_model.py:664-671) — note this is what
    # makes the reference's screen-space prune a no-op here too.
    stats = init_densify_stats(C)

    # --- prune (gaussian_model.py:787-796) ---
    from gaussianeditor_tpu.models.gaussians import opacity_activation

    opacity = opacity_activation(out.opacity_raw)[:, 0]
    prune = opacity < config.min_opacity
    if config.max_screen_size:
        big_vs = stats.max_radii2d > config.max_screen_size  # all-False: parity
        big_ws = jnp.max(jnp.exp(out.log_scales), axis=-1) > 0.1 * cameras_extent
        prune = prune | big_vs | big_ws
    prune = prune & new_mask & new_alive
    new_alive = new_alive & ~prune

    scene = scene.replace(
        params=out,
        alive=new_alive,
        mask=new_mask & new_alive,
        generation=new_generation,
    )
    # anchor snapshot + schedule growth (gaussian_model.py:805-808)
    scene = scene.update_anchor()
    scene = update_anchor_loss_schedule(
        scene, anchor_weight_init, anchor_weight_multiplier
    )

    reset_mask = jnp.zeros((C,), bool).at[dest].set(True, mode="drop")
    reset_mask = reset_mask | split_do | prune

    return DensifyResult(
        scene=scene,
        stats=stats,
        reset_mask=reset_mask,
        n_cloned=jnp.sum(clone_do.astype(jnp.int32)),
        n_split=jnp.sum(split_do.astype(jnp.int32)),
        n_pruned=jnp.sum(prune.astype(jnp.int32)),
        n_dropped=n_dropped,
    )


def reset_opacity(scene: GaussianScene) -> GaussianScene:
    """Vanilla-3DGS opacity reset (gaussian_model.py:447-452): clamp
    activated opacity to <= 0.01 via inverse sigmoid. Caller must also
    zero the opacity Adam moments (`GaussianAdam.replace_param`)."""
    from gaussianeditor_tpu.models.gaussians import (
        opacity_activation,
        opacity_inverse_activation,
    )

    new = opacity_inverse_activation(
        jnp.minimum(opacity_activation(scene.params.opacity_raw), 0.01)
    )
    return scene.replace(params=scene.params.replace(opacity_raw=new))
