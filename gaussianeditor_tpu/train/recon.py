"""Vanilla 3DGS reconstruction training (photometric fit to posed images).

Parity target: the Inria training loop retained in the reference
(`gaussiansplatting/train.py`): loss = (1-lambda_dssim)*L1 +
lambda_dssim*(1-SSIM), per-view sampling, densify+prune on an interval
with threshold gating (vanilla: no quantile gate, no mask restriction),
periodic opacity reset, progressive SH degree activation every 1000
steps. Used by `train_from_mesh` (mesh -> GS fitting) and standalone
scene reconstruction (BASELINE config 2).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gaussianeditor_tpu.core.cameras import Camera
from gaussianeditor_tpu.models.gaussians import GaussianScene
from gaussianeditor_tpu.ops.render import render
from gaussianeditor_tpu.train.densify import (
    DensifyConfig,
    add_densification_stats,
    densify_and_prune,
    init_densify_stats,
    reset_opacity,
)
from gaussianeditor_tpu.train.losses import l1_loss, ssim
from gaussianeditor_tpu.train.optim import GaussianAdam, OptimConfig
from gaussianeditor_tpu.train.trainer import TrainState, init_train_state


@dataclasses.dataclass
class ReconConfig:
    """Vanilla hyperparameters (gaussiansplatting/train.py + arguments/
    __init__.py:71-89)."""

    max_steps: int = 7000
    lambda_dssim: float = 0.2
    densify_from_step: int = 500
    densify_until_step: int = 15000
    densification_interval: int = 100
    densify_grad_threshold: float = 0.0002
    opacity_reset_interval: int = 3000
    oneup_sh_every: int = 1000
    min_opacity: float = 0.005
    max_screen_size: float = 20.0
    cameras_extent: float = 1.0
    seed: int = 0
    max_instances: Optional[int] = None
    tile_cap: int = 2048
    chunk: int = 128
    impl: Optional[str] = None
    # run up to this many train steps per device program (lax.scan in
    # one jit, same design as edit_system's burst dispatcher): amortizes
    # the per-step host dispatch round-trip that dominates long vanilla
    # runs (30k steps) on remote-dispatch hosts. Bursts never span an
    # SH-oneup, densify, or opacity-reset boundary; shortened boundary
    # bursts pad to one fixed length with disabled rows so the loop
    # compiles ONE scan program per SH degree. 1 = exact per-step loop.
    dispatch_burst: int = 1


class ReconTrainer:
    def __init__(self, scene: GaussianScene, cameras: Sequence[Camera],
                 images: Sequence[np.ndarray], config: ReconConfig):
        self.cfg = config
        self.cameras = list(cameras)
        self.images = [jnp.asarray(im, jnp.float32) for im in images]
        oc = OptimConfig(
            spatial_lr_scale=config.cameras_extent,
            position_lr_max_steps=config.max_steps,
        )
        self.optim = GaussianAdam(config=oc)
        self.state = init_train_state(scene, self.optim)
        self.rng = np.random.RandomState(config.seed)
        self._stack: List[int] = []
        cfgd = DensifyConfig(
            max_grad=config.densify_grad_threshold,
            max_densify_percent=1.0,  # vanilla: threshold-only gating
            min_opacity=config.min_opacity,
            max_screen_size=config.max_screen_size,
            percent_dense=oc.percent_dense,
        )
        self._densify_cfg = cfgd
        self.key = jax.random.key(config.seed)

        @jax.jit
        def train_step(state: TrainState, cam: Camera, target: jnp.ndarray):
            scene = state.scene
            C = scene.capacity

            def loss_fn(params, offset):
                s = scene.replace(params=params)
                out = render(
                    s, cam, jnp.zeros(3), mean2d_offset_ndc=offset,
                    impl=config.impl, max_instances=config.max_instances,
                    tile_cap=config.tile_cap, chunk=config.chunk,
                )
                l1 = l1_loss(out.color, target)
                dssim = 1.0 - ssim(out.color, target)
                loss = (1 - config.lambda_dssim) * l1 \
                    + config.lambda_dssim * dssim
                return loss, (out.radii, out.visible, l1)

            offset0 = jnp.zeros((C, 2), jnp.float32)
            (loss, (radii, vis, l1)), (grads, ograd) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(scene.params, offset0)

            vnorm = jnp.linalg.norm(ograd, axis=-1)
            stats = add_densification_stats(state.stats, vnorm, radii, vis)
            params, opt_state = self.optim.step(
                scene.params, grads, state.opt_state, step_override=state.step
            )
            return (
                TrainState(scene=scene.replace(params=params),
                           opt_state=opt_state, stats=stats,
                           step=state.step + 1),
                {"loss": loss, "l1": l1},
            )

        self._train_step = train_step

        @jax.jit
        def densify_step(state: TrainState, key):
            res = densify_and_prune(
                state.scene, state.stats, cfgd, config.cameras_extent, key,
                anchor_weight_init=0.0, anchor_weight_multiplier=1.0,
            )
            opt_state = self.optim.reset_slots(state.opt_state, res.reset_mask)
            return TrainState(scene=res.scene, opt_state=opt_state,
                              stats=res.stats, step=state.step), res

        self._densify_step = densify_step

        @jax.jit
        def opacity_reset(state: TrainState):
            scene = reset_opacity(state.scene)
            opt_state = self.optim.replace_param(state.opt_state, "opacity_raw")
            return state.replace(scene=scene, opt_state=opt_state)

        self._opacity_reset = opacity_reset

        @jax.jit
        def multi_step(state, cams, imgs, ids, enabled):
            # K steps per device program; disabled rows compute-and-
            # discard (state where-gated back) so every burst shares one
            # compiled scan (see edit_system.make_multi_train_step)
            def body(st, xs):
                vid, en = xs
                cam = jax.tree_util.tree_map(lambda x: x[vid], cams)
                st2, m = train_step(st, cam, imgs[vid])
                st = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(en, new, old), st2, st)
                return st, m

            return jax.lax.scan(body, state, (ids, enabled))

        self._multi_step = multi_step
        self._cams_dev = None
        self._imgs_dev = None
        self._pending_metrics = None
        self._enabled_cache: Dict[tuple, jnp.ndarray] = {}

    @property
    def scene(self) -> GaussianScene:
        return self.state.scene

    def _next_view(self) -> int:
        if not self._stack:
            self._stack = list(self.rng.permutation(len(self.cameras)))
        return int(self._stack.pop())

    def _sh_up_at(self, s: int) -> bool:
        cfg = self.cfg
        return s > 0 and cfg.oneup_sh_every > 0 and s % cfg.oneup_sh_every == 0

    def _densify_after(self, s: int) -> bool:
        cfg = self.cfg
        return (cfg.densify_from_step <= s < cfg.densify_until_step
                and s % cfg.densification_interval == 0 and s > 0)

    def _reset_after(self, s: int) -> bool:
        cfg = self.cfg
        return (cfg.opacity_reset_interval > 0 and s > 0
                and s % cfg.opacity_reset_interval == 0)

    def _burst_len(self, s0: int, end: int) -> int:
        k_max = max(1, min(self.cfg.dispatch_burst, end - s0))
        k = 1
        while k < k_max:
            s = s0 + k
            if (self._sh_up_at(s) or self._densify_after(s - 1)
                    or self._reset_after(s - 1)):
                break
            k += 1
        return k

    def _run_burst(self, step: int, K: int, callback) -> None:
        if self._cams_dev is None:
            from gaussianeditor_tpu.train.trainer import stack_cameras

            self._cams_dev = stack_cameras(self.cameras)
            self._imgs_dev = jnp.stack(self.images)
        kp = max(K, self.cfg.dispatch_burst)
        ids = np.asarray([self._next_view() for _ in range(K)], np.int32)
        ids_pad = np.concatenate(
            [ids, np.broadcast_to(ids[:1], (kp - K,))])
        if (K, kp) not in self._enabled_cache:
            enabled = np.zeros((kp,), bool)
            enabled[:K] = True
            self._enabled_cache[(K, kp)] = jnp.asarray(enabled)
        self.state, ms = self._multi_step(
            self.state, self._cams_dev, self._imgs_dev,
            jnp.asarray(ids_pad), self._enabled_cache[(K, kp)])
        if callback is not None:
            # deferred drain (see edit_system._run_burst): fetch this
            # burst's metrics while the next one computes
            jax.tree_util.tree_map(
                lambda x: x.copy_to_host_async()
                if hasattr(x, "copy_to_host_async") else None, ms)
            self._drain_metrics(callback)
            self._pending_metrics = (step, K, ms)

    def _drain_metrics(self, callback) -> None:
        if self._pending_metrics is None:
            return
        step0, K, ms = self._pending_metrics
        self._pending_metrics = None
        ms_host = jax.device_get(ms)
        for k in range(K):
            callback(step0 + k,
                     {key: val[k] for key, val in ms_host.items()})

    def fit(self, n_steps: Optional[int] = None, callback=None) -> TrainState:
        cfg = self.cfg
        n = n_steps if n_steps is not None else cfg.max_steps
        step = int(self.state.step)
        end = step + n
        # bursts require one stacked camera pytree: same-size views only
        use_burst = cfg.dispatch_burst > 1 and len(
            {(c.height, c.width) for c in self.cameras}) == 1
        while step < end:
            if self._sh_up_at(step):
                self.state = self.state.replace(
                    scene=self.state.scene.one_up_sh_degree()
                )
            if use_burst:
                K = self._burst_len(step, end)
                self._run_burst(step, K, callback)
            else:
                K = 1
                vid = self._next_view()
                self.state, metrics = self._train_step(
                    self.state, self.cameras[vid], self.images[vid]
                )
                if callback is not None:
                    callback(step, metrics)
            s_last = step + K - 1
            if self._densify_after(s_last):
                self.key, sub = jax.random.split(self.key)
                self.state, _ = self._densify_step(self.state, sub)
            if self._reset_after(s_last):
                self.state = self._opacity_reset(self.state)
            step += K
        if callback is not None:
            self._drain_metrics(callback)
        return self.state
