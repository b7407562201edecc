"""View-sharded (data-parallel) edit training step.

SPMD design (SURVEY.md section 2.6 "TPU-native equivalent"): the camera
batch is sharded over the `data` mesh axis, every chip renders and
differentiates its local views against the full replicated Gaussian
parameter table, per-Gaussian parameter gradients are `psum`-reduced over
ICI (XLA overlaps the reduction with backward compute), and the Adam
update runs replicated — bitwise identical on every chip, so parameters
never need re-broadcasting.

The viewspace densification statistics reduce the same way: grad-norm
sums add across chips (`psum`), per-Gaussian max radii take `pmax`, and
visibility ORs (`pmax` on int) — matching the single-device semantics of
`GassuianEditor.on_before_optimizer_step` (:253-269) exactly, so
densification decisions are independent of the device count.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gaussianeditor_tpu.core.cameras import Camera
from gaussianeditor_tpu.models.gaussians import GaussianParams
from gaussianeditor_tpu.ops.render import render
from gaussianeditor_tpu.train.anchors import anchor_loss
from gaussianeditor_tpu.train.densify import add_densification_stats
from gaussianeditor_tpu.train.losses import l1_loss
from gaussianeditor_tpu.train.optim import GaussianAdam
from gaussianeditor_tpu.train.trainer import LossWeights, TrainState


def make_sharded_train_step(
    optim: GaussianAdam,
    weights: LossWeights,
    mesh: Mesh,
    *,
    axis: str = "data",
    perceptual: Optional[Callable] = None,
    impl: Optional[str] = None,
    max_instances: Optional[int] = None,
    tile_cap: int = 1024,
    chunk: int = 128,
):
    """Build the pjit'd multi-chip train step.

    cam_batch leaves and targets must have a leading batch dim divisible
    by the mesh size; they are sharded over `axis`, everything else is
    replicated.
    """

    def local_loss(scene, params, cam_treedef, cam_leaves, targets, offsets):
        """SUM loss over this chip's local views + densify probes
        (divided by the global batch after psum). Views unrolled — see
        train/trainer.py (lax.scan measured ~2x slower per view)."""
        C = scene.capacity
        B_local = targets.shape[0]
        radii_max = jnp.zeros((C,), jnp.int32)
        vis_any = jnp.zeros((C,), bool)
        loss_l1 = 0.0
        loss_p = 0.0
        s = scene.replace(params=params)
        for b in range(B_local):
            leaves = [x[b] for x in cam_leaves]
            cam = jax.tree_util.tree_unflatten(cam_treedef, leaves)
            out = render(
                s, cam, jnp.zeros(3), mean2d_offset_ndc=offsets[b],
                impl=impl, max_instances=max_instances,
                tile_cap=tile_cap, chunk=chunk,
            )
            loss_l1 = loss_l1 + l1_loss(out.color, targets[b])
            if perceptual is not None:
                loss_p = loss_p + perceptual(out.color, targets[b])
            radii_max = jnp.maximum(radii_max, out.radii)
            vis_any = vis_any | out.visible
        return loss_l1, loss_p, radii_max, vis_any

    def step_fn(state: TrainState, cam_batch: Camera, targets: jnp.ndarray):
        cam_leaves, cam_treedef = jax.tree_util.tree_flatten(cam_batch)

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(
                P(),                                  # state (replicated)
                tuple(P(axis) for _ in cam_leaves),    # cameras (sharded)
                P(axis),                               # targets (sharded)
            ),
            out_specs=P(),
            check_vma=False,
        )
        def sharded(state, local_cam_leaves, local_targets):
            scene = state.scene
            C = scene.capacity
            B_local = local_targets.shape[0]
            n_dev = jax.lax.psum(1, axis)
            B_global = B_local * n_dev

            def loss_for_grad(params, offsets):
                l1, lp, radii_max, vis_any = local_loss(
                    scene, params, cam_treedef, local_cam_leaves,
                    local_targets, offsets,
                )
                anchors = anchor_loss(scene.replace(params=params))
                # anchor terms are view-independent; keep them OUT of the
                # psum by scaling with 1/n_dev (each chip contributes an
                # identical copy).
                local_total = (
                    (weights.lambda_l1 * l1 + weights.lambda_p * lp) / B_global
                    + (
                        weights.lambda_anchor_color * anchors["loss_anchor_color"]
                        + weights.lambda_anchor_geo * anchors["loss_anchor_geo"]
                        + weights.lambda_anchor_scale * anchors["loss_anchor_scale"]
                        + weights.lambda_anchor_opacity
                        * anchors["loss_anchor_opacity"]
                    ) / n_dev
                )
                return local_total, (l1, lp, radii_max, vis_any, anchors)

            offsets0 = jnp.zeros((B_local, C, 2), jnp.float32)
            (local_total, (l1, lp, radii_max, vis_any, anchors)), (g, og) = (
                jax.value_and_grad(loss_for_grad, argnums=(0, 1), has_aux=True)(
                    scene.params, offsets0
                )
            )

            # global reductions over ICI
            grads = jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis), g)
            total = jax.lax.psum(local_total, axis)
            loss_l1 = jax.lax.psum(l1, axis) / B_global
            loss_p = jax.lax.psum(jnp.asarray(lp, jnp.float32),
                                  axis) / B_global
            vgrad = jax.lax.psum(jnp.sum(og, axis=0), axis)  # [C, 2]
            vnorm = jnp.linalg.norm(vgrad, axis=-1)
            radii_g = jax.lax.pmax(radii_max, axis)
            vis_g = jax.lax.pmax(vis_any.astype(jnp.int32), axis) > 0

            stats = add_densification_stats(state.stats, vnorm, radii_g, vis_g)
            params, opt_state = optim.step(
                scene.params, grads, state.opt_state,
                grad_mask=scene.mask, step_override=state.step,
            )
            new_state = TrainState(
                scene=scene.replace(params=params),
                opt_state=opt_state,
                stats=stats,
                step=state.step + 1,
            )
            metrics = {"loss": total, "loss_l1": loss_l1, "loss_p": loss_p,
                       **anchors}
            return new_state, metrics

        return sharded(state, tuple(cam_leaves), targets)

    return jax.jit(step_fn)
