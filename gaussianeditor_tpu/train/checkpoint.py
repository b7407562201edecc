"""Checkpoint / resume.

The reference's three mechanisms (SURVEY.md section 5): PL ModelCheckpoint,
`GaussianModel.capture()/restore()` (incl. optimizer state,
gaussian_model.py:110-204), and PLY interchange. Here: `save_train_state`
/ `load_train_state` persist the FULL TrainState (scene + Adam moments +
densify stats + step) as an npz — the capture/restore equivalent — while
`models.ply` remains the interchange format.
"""

from __future__ import annotations

import os
import jax.numpy as jnp
import numpy as np

from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
from gaussianeditor_tpu.train.densify import DensifyStats
from gaussianeditor_tpu.train.optim import AdamState
from gaussianeditor_tpu.train.trainer import TrainState

_PARAM_FIELDS = ("xyz", "features_dc", "features_rest", "opacity_raw",
                 "log_scales", "quats")


def _params_to_dict(prefix: str, p: GaussianParams) -> dict:
    return {f"{prefix}.{k}": np.asarray(getattr(p, k)) for k in _PARAM_FIELDS}


def _params_from_dict(prefix: str, d) -> GaussianParams:
    return GaussianParams(
        **{k: jnp.asarray(d[f"{prefix}.{k}"]) for k in _PARAM_FIELDS}
    )


def save_train_state(path: str, state: TrainState) -> None:
    s = state.scene
    payload = {
        **_params_to_dict("params", s.params),
        **_params_to_dict("anchor", s.anchor),
        **_params_to_dict("mu", state.opt_state.mu),
        **_params_to_dict("nu", state.opt_state.nu),
        "alive": np.asarray(s.alive),
        "generation": np.asarray(s.generation),
        "mask": np.asarray(s.mask),
        "anchor_weights": np.asarray(s.anchor_weights),
        "n_generations": np.asarray(s.n_generations),
        "active_sh_degree": np.asarray(s.active_sh_degree),
        "max_sh_degree": np.asarray(s.max_sh_degree),
        "opt_count": np.asarray(state.opt_state.count),
        "stats.accum": np.asarray(state.stats.xyz_gradient_accum),
        "stats.denom": np.asarray(state.stats.denom),
        "stats.radii": np.asarray(state.stats.max_radii2d),
        "step": np.asarray(state.step),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **payload)


def load_train_state(path: str) -> TrainState:
    d = np.load(path if path.endswith(".npz") else path + ".npz")
    scene = GaussianScene(
        params=_params_from_dict("params", d),
        alive=jnp.asarray(d["alive"]),
        generation=jnp.asarray(d["generation"]),
        mask=jnp.asarray(d["mask"]),
        anchor=_params_from_dict("anchor", d),
        anchor_weights=jnp.asarray(d["anchor_weights"]),
        n_generations=jnp.asarray(d["n_generations"]),
        active_sh_degree=jnp.asarray(d["active_sh_degree"]),
        max_sh_degree=int(d["max_sh_degree"]),
    )
    opt = AdamState(
        mu=_params_from_dict("mu", d),
        nu=_params_from_dict("nu", d),
        count=jnp.asarray(d["opt_count"]),
    )
    stats = DensifyStats(
        xyz_gradient_accum=jnp.asarray(d["stats.accum"]),
        denom=jnp.asarray(d["stats.denom"]),
        max_radii2d=jnp.asarray(d["stats.radii"]),
    )
    return TrainState(scene=scene, opt_state=opt, stats=stats,
                      step=jnp.asarray(d["step"]))
