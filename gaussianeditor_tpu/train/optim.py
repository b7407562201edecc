"""Per-group Adam with exponential xyz LR schedule and moment surgery.

Parity with the reference training setup (`gaussian_model.py:336-387`):
six param groups with the Inria LRs, Adam eps 1e-15, xyz on the log-lerp
schedule `get_expon_lr_func` (`utils/general_utils.py:29-62`).

Re-designed for fixed capacity: where the reference rebuilds optimizer
state on every densify (`cat_tensors_to_optimizer`/`_prune_optimizer`,
gaussian_model.py:553-641), here the moments live at full capacity and
densification simply zeroes the moments of (re)allocated slots — the
`reset_mask` returned by `train.densify.densify_and_prune` — preserving
the reference semantics (new points start with zero moments but the
group's global step count).

Implemented from scratch rather than with optax so grad-masking, per-slot
moment resets and per-group dynamic LRs stay explicit and jit-friendly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from gaussianeditor_tpu.models.gaussians import GaussianParams


@struct.dataclass
class OptimConfig:
    """Reference `OptimizationParams` (arguments/__init__.py:71-89), with
    the editing systems' LR scalers applied by the caller
    (GassuianEditor.py:483-505)."""

    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0125
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    spatial_lr_scale: float = 1.0  # = cameras_extent (GassuianEditor.py:503)
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-15


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1_000_000):
    """Log-linear LR interpolation with optional sine delay
    (general_utils.py:29-62). jit-safe in `step`."""
    step = jnp.asarray(step, jnp.float32)
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    out = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, out)


@struct.dataclass
class AdamState:
    mu: GaussianParams
    nu: GaussianParams
    count: jnp.ndarray  # scalar int32 — global step (shared by all groups)


@struct.dataclass
class GaussianAdam:
    config: OptimConfig = struct.field(pytree_node=False)

    def init(self, params: GaussianParams) -> AdamState:
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamState(mu=zeros, nu=zeros, count=jnp.asarray(0, jnp.int32))

    def group_lrs(self, step) -> GaussianParams:
        """Per-group learning rates at `step` (gaussian_model.py:336-387)."""
        c = self.config
        xyz_lr = expon_lr(
            step,
            c.position_lr_init * c.spatial_lr_scale,
            c.position_lr_final * c.spatial_lr_scale,
            lr_delay_mult=c.position_lr_delay_mult,
            max_steps=c.position_lr_max_steps,
        )
        return GaussianParams(
            xyz=xyz_lr,
            features_dc=jnp.asarray(c.feature_lr, jnp.float32),
            features_rest=jnp.asarray(c.feature_lr / 20.0, jnp.float32),
            opacity_raw=jnp.asarray(c.opacity_lr, jnp.float32),
            log_scales=jnp.asarray(c.scaling_lr, jnp.float32),
            quats=jnp.asarray(c.rotation_lr, jnp.float32),
        )

    def step(
        self,
        params: GaussianParams,
        grads: GaussianParams,
        state: AdamState,
        *,
        grad_mask: Optional[jnp.ndarray] = None,
        step_override=None,
    ):
        """One Adam update. `grad_mask` [C] zeroes gradients outside the
        semantic edit mask for every group EXCEPT rotation — the exact
        hook set of `apply_grad_mask` (gaussian_model.py:837-856)."""
        c = self.config
        count = state.count + 1
        lrs = self.group_lrs(state.count if step_override is None else step_override)

        if grad_mask is not None:
            m = grad_mask.astype(jnp.float32)

            def apply_mask(g, name):
                if name == "quats":
                    return g
                return g * m.reshape((-1,) + (1,) * (g.ndim - 1))

            grads = GaussianParams(
                **{
                    name: apply_mask(getattr(grads, name), name)
                    for name in ("xyz", "features_dc", "features_rest",
                                 "opacity_raw", "log_scales", "quats")
                }
            )

        t = count.astype(jnp.float32)
        bc1 = 1.0 - c.beta1 ** t
        bc2 = 1.0 - c.beta2 ** t

        def upd(p, g, mu, nu, lr):
            mu = c.beta1 * mu + (1 - c.beta1) * g
            nu = c.beta2 * nu + (1 - c.beta2) * g * g
            step_val = lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + c.eps)
            return p - step_val, mu, nu

        names = ("xyz", "features_dc", "features_rest", "opacity_raw",
                 "log_scales", "quats")
        new_p, new_mu, new_nu = {}, {}, {}
        for name in names:
            p, mu, nu = upd(
                getattr(params, name), getattr(grads, name),
                getattr(state.mu, name), getattr(state.nu, name),
                getattr(lrs, name),
            )
            new_p[name], new_mu[name], new_nu[name] = p, mu, nu

        return (
            GaussianParams(**new_p),
            AdamState(mu=GaussianParams(**new_mu), nu=GaussianParams(**new_nu),
                      count=count),
        )

    def reset_slots(self, state: AdamState, reset_mask: jnp.ndarray) -> AdamState:
        """Zero the moments of slots in `reset_mask` — the fixed-capacity
        equivalent of the reference's optimizer-state surgery on
        densify/prune (gaussian_model.py:553-641)."""

        def zero(x):
            m = reset_mask.reshape((-1,) + (1,) * (x.ndim - 1))
            return jnp.where(m, jnp.zeros_like(x), x)

        return state.replace(
            mu=jax.tree_util.tree_map(zero, state.mu),
            nu=jax.tree_util.tree_map(zero, state.nu),
        )

    def replace_param(self, state: AdamState, name: str) -> AdamState:
        """Zero ALL moments of one group — `replace_tensor_to_optimizer`
        (gaussian_model.py:553-566), used by opacity reset."""
        zeros = jnp.zeros_like(getattr(state.mu, name))
        return state.replace(
            mu=state.mu.replace(**{name: zeros}),
            nu=state.nu.replace(**{name: zeros}),
        )
