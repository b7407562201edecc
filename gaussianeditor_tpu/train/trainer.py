"""The jitted editing train step + host-side training state.

TPU-first re-architecture of the reference training loop
(`GassuianEditorEdit.training_step` + `GassuianEditor.forward` +
`on_before_optimizer_step`, threestudio/systems/GassuianEditor*.py):

  * One `jax.jit`-compiled `train_step` consumes a *stacked* batch of
    cameras and per-view target images and performs: render (lax.scan over
    the batch), photometric + anchor losses, backward, viewspace-gradient
    harvesting for densification, grad masking, and the Adam update.
    Guidance (diffusion) runs on the host OUTSIDE this step, exactly as the
    reference amortizes it via `per_editing_step`.
  * The viewspace densification probe is functional: zero NDC offsets are
    fed per view; the summed cotangent reproduces
    `screenspace_points.grad` accumulation (GassuianEditor.py:253-269).
  * Densification is a second jitted function over the same fixed-capacity
    pytree (train/densify.py), so parameter "resizing" never recompiles.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from gaussianeditor_tpu.core.cameras import Camera
from gaussianeditor_tpu.models.gaussians import GaussianScene
from gaussianeditor_tpu.ops.render import render
from gaussianeditor_tpu.train.anchors import anchor_loss
from gaussianeditor_tpu.train.densify import (
    DensifyConfig,
    DensifyStats,
    add_densification_stats,
    densify_and_prune,
    init_densify_stats,
)
from gaussianeditor_tpu.train.losses import l1_loss
from gaussianeditor_tpu.train.optim import AdamState, GaussianAdam, OptimConfig


@struct.dataclass
class LossWeights:
    """Reference loss block (configs/edit-n2n.yaml; GassuianEditorEdit.py:
    100-148)."""

    lambda_l1: float = 10.0
    lambda_p: float = 10.0
    lambda_anchor_color: float = 5.0
    lambda_anchor_geo: float = 50.0
    lambda_anchor_scale: float = 50.0
    lambda_anchor_opacity: float = 50.0
    # score-distillation weights (SDS on the primary guidance /
    # DDS second guidance, GassuianEditorEdit.py:113-131); nonzero values
    # enable the `inject_grad` path of the train step
    lambda_sds: float = 0.0
    lambda_dds: float = 0.0


@struct.dataclass
class TrainState:
    scene: GaussianScene
    opt_state: AdamState
    stats: DensifyStats
    step: jnp.ndarray  # scalar int32


def init_train_state(scene: GaussianScene, optim: GaussianAdam) -> TrainState:
    return TrainState(
        scene=scene,
        opt_state=optim.init(scene.params),
        stats=init_densify_stats(scene.capacity),
        step=jnp.asarray(0, jnp.int32),
    )


def stack_cameras(cameras) -> Camera:
    """Stack same-resolution cameras into one batched Camera pytree."""
    h, w = cameras[0].height, cameras[0].width
    assert all(c.height == h and c.width == w for c in cameras)
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cameras)


def make_train_step(
    optim: GaussianAdam,
    weights: LossWeights,
    *,
    perceptual: Optional[Callable] = None,
    impl: Optional[str] = None,
    local_edit: bool = False,
    with_inject: bool = False,
    max_instances: Optional[int] = None,
    tile_cap: int = 1024,
    chunk: int = 128,
    batched: Optional[bool] = None,
):
    """Build the jitted edit train step.

    perceptual: optional JAX-traceable (pred [H,W,3], target [H,W,3]) ->
    scalar standing in for LPIPS (utils/perceptual in the reference).
    with_inject: accept an extra `inject_grad` [B, H, W, 3] input — a
    host-computed score-distillation image gradient (SDS/DDS,
    guidance/score.py), already weighted by its lambda; the step adds
    sum(render * stopgrad(inject_grad)) so backprop routes the score
    gradient into the Gaussian parameters (the JAX analog of the
    reference's `loss_sds = 0.5*mse(latents, target)` trick,
    instructpix2pix_guidance.py:285-297).
    batched: route the whole camera batch through ONE kernel-pair launch
    (ops/render_batched.py: one fat sort + one forward/backward Pallas
    launch + one rank reduction for all B views). Default OFF — a
    measured negative result (bench/prof_r17.py, v5e): XLA already
    compiles the unrolled per-view renders into ONE program (there is no
    per-view launch cost to save, unlike CUDA's per-view renderCUDA
    launches), while the union fat sort pays the sorting network's
    log^2 factor on 2R rows (+~2 ms/step at batch 2: fwd+bwd 50.3 ms
    batched vs 48.4 unrolled). Kept as an option + parity oracle
    (tests/test_render_batched.py); it may win on future hardware where
    sort scales linearly.
    """
    if batched is None:
        batched = False

    @functools.partial(jax.jit, static_argnames=())
    def train_step(
        state: TrainState,
        cam_batch: Camera,        # stacked pytree, leaves [B, ...]
        targets: jnp.ndarray,     # [B, H, W, 3] edited target images
        weights: LossWeights = weights,
        # weights as a dynamic arg: the reference evaluates C()-scheduled
        # lambdas per step (GassuianEditorEdit.py:100-148); passing them as
        # traced scalars avoids recompiling on schedule changes
        inject_grad: Optional[jnp.ndarray] = None,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        scene = state.scene
        C = scene.capacity
        B = targets.shape[0]

        def loss_fn(params, offsets):
            s = scene.replace(params=params)
            if local_edit:
                # render only the masked region (GassuianEditorEdit.py:15
                # local_edit -> gaussian.localize)
                s = s.localized()

            if batched:
                # ONE launch for the whole batch: one fat sort + one
                # fwd/bwd Pallas kernel pair + one rank reduction
                # (ops/render_batched.py; beats the reference's
                # per-view renderCUDA launches, forward.cu:396)
                from gaussianeditor_tpu.ops.render_batched import (
                    render_batched,
                )

                out = render_batched(
                    s, cam_batch, jnp.zeros(3),
                    mean2d_offset_ndc=offsets,
                    max_instances=max_instances,
                )
                loss_l1 = l1_loss(out.color, targets)
                lps = [perceptual(out.color[b], targets[b])
                       for b in range(B)] if perceptual is not None else []
                loss_p = (jnp.mean(jnp.stack(lps))
                          if perceptual is not None else 0.0)
                loss_inject = (
                    jnp.sum(out.color * jax.lax.stop_gradient(inject_grad))
                    if with_inject else jnp.asarray(0.0)
                )
                radii_max = jnp.max(out.radii, axis=0)
                vis_any = jnp.any(out.visible, axis=0)
                ovf = out.overflow
            else:
                # views are UNROLLED, not lax.scan'ed: scanning the
                # per-view render measured ~2x the per-view cost of the
                # unrolled graph (scan residual handling defeats fusion);
                # batch sizes are small and static (reference default 2)
                radii_max = jnp.zeros((C,), jnp.int32)
                vis_any = jnp.zeros((C,), bool)
                ovf = jnp.asarray(False)
                l1s, lps, injs = [], [], []
                for b in range(B):
                    cam = jax.tree_util.tree_map(lambda x: x[b], cam_batch)
                    out = render(
                        s, cam, jnp.zeros(3),
                        mean2d_offset_ndc=offsets[b],
                        impl=impl, max_instances=max_instances,
                        tile_cap=tile_cap, chunk=chunk,
                    )
                    l1s.append(l1_loss(out.color, targets[b]))
                    lps.append(perceptual(out.color, targets[b])
                               if perceptual is not None else 0.0)
                    if with_inject:
                        injs.append(jnp.sum(
                            out.color * jax.lax.stop_gradient(inject_grad[b])
                        ))
                    radii_max = jnp.maximum(radii_max, out.radii)
                    vis_any = vis_any | out.visible
                    ovf = ovf | out.overflow

                loss_l1 = jnp.mean(jnp.stack(l1s))
                loss_p = (jnp.mean(jnp.stack(lps))
                          if perceptual is not None else 0.0)
                loss_inject = (jnp.sum(jnp.stack(injs)) if with_inject
                               else jnp.asarray(0.0))

            anchors = anchor_loss(s)
            total = (
                weights.lambda_l1 * loss_l1
                + weights.lambda_p * loss_p
                + weights.lambda_anchor_color * anchors["loss_anchor_color"]
                + weights.lambda_anchor_geo * anchors["loss_anchor_geo"]
                + weights.lambda_anchor_scale * anchors["loss_anchor_scale"]
                + weights.lambda_anchor_opacity * anchors["loss_anchor_opacity"]
                + loss_inject
            )
            metrics = {
                "loss": total,
                "loss_l1": loss_l1,
                "loss_p": jnp.asarray(loss_p),
                "loss_inject": loss_inject,
                # instance-budget overflow surfaced per step: the jitted
                # step cannot re-render at doubled capacity (static
                # shapes), so callers watch this and rebuild with a
                # bigger max_instances (see ops/render.render_safe)
                "overflow": ovf,
                **anchors,
            }
            return total, (metrics, radii_max, vis_any)

        offsets0 = jnp.zeros((B, C, 2), jnp.float32)
        (_, (metrics, radii_max, vis_any)), (grads, off_grads) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                scene.params, offsets0
            )
        )

        # viewspace grads: sum over batch views, then xy-norm
        # (GassuianEditor.py:253-269 + gaussian_model.py:811-815)
        vgrad = jnp.sum(off_grads, axis=0)  # [C, 2]
        vnorm = jnp.linalg.norm(vgrad, axis=-1)
        stats = add_densification_stats(state.stats, vnorm, radii_max, vis_any)

        params, opt_state = optim.step(
            scene.params, grads, state.opt_state, grad_mask=scene.mask,
            step_override=state.step,
        )
        new_scene = scene.replace(params=params)
        return (
            TrainState(scene=new_scene, opt_state=opt_state, stats=stats,
                       step=state.step + 1),
            metrics,
        )

    return train_step


def make_multi_train_step(train_step):
    """Burst dispatcher: run K train steps in ONE device program.

    The per-step host loop pays one dispatch round-trip per step (the
    reference's PL loop does too, but torch's eager queue hides it; on a
    remote-dispatch TPU relay it is ~70 ms/step and dominates the
    measured end-to-end edit wall-clock). Bursting K steps through
    `lax.scan` amortizes it K-fold. Guidance refreshes, densification,
    milestones and checkpoints stay OUTSIDE bursts — EditSystem sizes K
    so no boundary is crossed (edit_system._burst_len).

    cam_all: stacked pytree of ALL views' cameras (leaves [V, ...]);
    frames_all: [V, H, W, 3] device-resident target cache;
    ids: [K, B] int32 view indices (the sampler's draws for the burst);
    enabled: [K] bool — False rows compute-and-discard (the state is
    where-gated back to its previous value), so EVERY burst pads to one
    fixed K and the whole training loop compiles exactly ONE program
    (boundary-shortened bursts — a K=9 after each densify step, K=1 at
    the densify step itself — would otherwise each pay their own
    multi-minute jit compile for ~45 ms of skipped work per pad row);
    weights_seq: LossWeights pytree with [K]-leaf schedules.
    Returns (state, metrics stacked [K]; pad rows carry garbage — the
    caller slices by its own enabled mask)."""

    @jax.jit
    def multi_step(state, cam_all, frames_all, ids, enabled, weights_seq):
        def body(st, xs):
            ids_k, en, w = xs
            cam_b = jax.tree_util.tree_map(lambda x: x[ids_k], cam_all)
            st2, metrics = train_step(st, cam_b, frames_all[ids_k], w)
            st = jax.tree_util.tree_map(
                lambda new, old: jnp.where(en, new, old), st2, st)
            return st, metrics

        return jax.lax.scan(body, state, (ids, enabled, weights_seq))

    return multi_step


def make_densify_step(
    optim: GaussianAdam,
    config: DensifyConfig,
    cameras_extent: float,
    anchor_weight_init: float,
    anchor_weight_multiplier: float,
):
    """Jitted densify/prune + optimizer-moment reset
    (GassuianEditor.on_before_optimizer_step periodic branch,
    GassuianEditor.py:270-281)."""

    @jax.jit
    def densify_step(state: TrainState, key: jax.Array):
        res = densify_and_prune(
            state.scene, state.stats, config, cameras_extent, key,
            anchor_weight_init, anchor_weight_multiplier,
        )
        opt_state = optim.reset_slots(state.opt_state, res.reset_mask)
        new_state = TrainState(
            scene=res.scene, opt_state=opt_state, stats=res.stats,
            step=state.step,
        )
        info = {
            "n_cloned": res.n_cloned,
            "n_split": res.n_split,
            "n_pruned": res.n_pruned,
            "n_dropped": res.n_dropped,
        }
        return new_state, info

    return densify_step
