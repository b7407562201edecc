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

    def _next_view(self) -> int:
        if not self._stack:
            self._stack = list(self.rng.permutation(len(self.cameras)))
        return int(self._stack.pop())

    def fit(self, n_steps: Optional[int] = None, callback=None) -> TrainState:
        cfg = self.cfg
        n = n_steps if n_steps is not None else cfg.max_steps
        for _ in range(n):
            step = int(self.state.step)
            if step > 0 and cfg.oneup_sh_every > 0 \
                    and step % cfg.oneup_sh_every == 0:
                self.state = self.state.replace(
                    scene=self.state.scene.one_up_sh_degree()
                )
            vid = self._next_view()
            self.state, metrics = self._train_step(
                self.state, self.cameras[vid], self.images[vid]
            )
            if (cfg.densify_from_step <= step < cfg.densify_until_step
                    and step % cfg.densification_interval == 0 and step > 0):
                self.key, sub = jax.random.split(self.key)
                self.state, _ = self._densify_step(self.state, sub)
            if (cfg.opacity_reset_interval > 0 and step > 0
                    and step % cfg.opacity_reset_interval == 0):
                self.state = self._opacity_reset(self.state)
            if callback is not None:
                callback(step, metrics)
        return self.state
