"""GaussianScene — the fixed-capacity Gaussian cloud pytree.

TPU-first re-design of the reference `GaussianModel`
(`gaussiansplatting/scene/gaussian_model.py:41-923`). Key differences,
all driven by XLA's static-shape compilation model:

* Structure-of-arrays pytree, not an nn.Module: pure data, transformed by
  pure functions (densify/prune/anchor live in `train/`).
* **Fixed capacity + `alive` mask** instead of runtime tensor resizing —
  densification writes into dead slots and pruning clears `alive`, so one
  compiled program serves the whole training run.
* The per-generation anchor-loss schedule
  (`gaussian_model.py:136-149`) is a fixed-size `anchor_weights` array
  plus an `n_generations` counter instead of a growing tensor.
* Differentiable leaves are isolated in `GaussianParams` so
  `jax.grad(loss)(scene.params, ...)` never touches bool/int state.

Semantics preserved from the reference:
  activations exp/log scaling, sigmoid opacity, normalized quats
  (`gaussian_model.py:42-57`); `mask` = semantic edit mask gating grads &
  densification; `generation` tags (`:318-323`); anchor snapshot dict
  (`:126-134`); firstborn generation exempt from anchor loss (`:147-149`);
  weight cap MAX_ANCHOR_WEIGHT=10 (`:38`); point-cloud init with knn-based
  scale init and raw opacity 1.0 (`:274-334`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gaussianeditor_tpu.core import sh as sh_utils

MAX_ANCHOR_WEIGHT = 10.0
# Upper bound on densification rounds per edit (reference runs ~20-30 at
# interval 100 over <=3000 steps); sized generously.
MAX_GENERATIONS = 64


def scaling_activation(x):
    return jnp.exp(x)


def scaling_inverse_activation(x):
    return jnp.log(x)


def opacity_activation(x):
    return jax.nn.sigmoid(x)


def opacity_inverse_activation(x, eps: float = 1e-7):
    x = jnp.clip(x, eps, 1.0 - eps)
    return jnp.log(x / (1.0 - x))


@struct.dataclass
class GaussianParams:
    """The six trainable leaf arrays (reference gaussian_model.py:75-83)."""

    xyz: jnp.ndarray            # [C, 3]
    features_dc: jnp.ndarray    # [C, 1, 3]
    features_rest: jnp.ndarray  # [C, K-1, 3]
    opacity_raw: jnp.ndarray    # [C, 1]  (pre-sigmoid)
    log_scales: jnp.ndarray     # [C, 3]
    quats: jnp.ndarray          # [C, 4]  (w,x,y,z), unnormalized

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def sh_features(self) -> jnp.ndarray:
        """[C, K, 3] concatenated SH coefficients (get_features)."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)


@struct.dataclass
class GaussianScene:
    params: GaussianParams
    alive: jnp.ndarray          # [C] bool — slot occupied
    generation: jnp.ndarray     # [C] int32 — HGS generation tag
    mask: jnp.ndarray           # [C] bool — semantic edit mask (True = editable)
    anchor: GaussianParams      # snapshot for anchor (elastic) loss
    anchor_weights: jnp.ndarray  # [MAX_GENERATIONS] f32 schedule
    n_generations: jnp.ndarray  # scalar int32, >= 1
    active_sh_degree: jnp.ndarray  # scalar int32
    max_sh_degree: int = struct.field(pytree_node=False, default=3)

    # ---- derived quantities (activated parameter views) ----

    @property
    def capacity(self) -> int:
        return self.params.capacity

    @property
    def n_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))

    @property
    def get_xyz(self) -> jnp.ndarray:
        return self.params.xyz

    @property
    def get_scaling(self) -> jnp.ndarray:
        return scaling_activation(self.params.log_scales)

    @property
    def get_rotation(self) -> jnp.ndarray:
        from gaussianeditor_tpu.core.transforms import quat_normalize

        return quat_normalize(self.params.quats)

    @property
    def get_opacity(self) -> jnp.ndarray:
        """[C, 1] sigmoid opacity, zeroed on dead slots."""
        op = opacity_activation(self.params.opacity_raw)
        return op * self.alive[:, None].astype(op.dtype)

    @property
    def get_features(self) -> jnp.ndarray:
        return self.params.sh_features

    def one_up_sh_degree(self) -> "GaussianScene":
        """Reference `oneupSHdegree` (gaussian_model.py:269-271)."""
        return self.replace(
            active_sh_degree=jnp.minimum(self.active_sh_degree + 1, self.max_sh_degree)
        )

    def update_anchor(self) -> "GaussianScene":
        """Snapshot current params as the anchor (gaussian_model.py:126-134)."""
        return self.replace(anchor=jax.tree_util.tree_map(jax.lax.stop_gradient, self.params))

    def set_mask(self, mask: jnp.ndarray) -> "GaussianScene":
        return self.replace(mask=mask.astype(bool))

    def localized(self) -> "GaussianScene":
        """View of the scene restricted to the semantic mask — the
        reference `localize` property family (gaussian_model.py:221-268),
        used by local_edit to render/train only the edited region."""
        return self.replace(alive=self.alive & self.mask)

    def anchor_postfix(self) -> "GaussianScene":
        """Reset generations + schedule after an edit round
        (gaussian_model.py:104-108)."""
        weights = jnp.zeros_like(self.anchor_weights).at[0].set(self.anchor_weights[0])
        return self.replace(
            generation=jnp.zeros_like(self.generation),
            anchor_weights=weights,
            n_generations=jnp.asarray(1, jnp.int32),
        )

    # ---- construction ----

    @classmethod
    def create(
        cls,
        params: GaussianParams,
        max_sh_degree: int,
        anchor_weight_init_g0: float = 0.05,
        active_sh_degree: Optional[int] = None,
        alive: Optional[jnp.ndarray] = None,
    ) -> "GaussianScene":
        C = params.capacity
        # aux state built host-side in numpy: on remote-dispatch backends
        # every tiny eager jnp op is a round-trip (+compile), which made
        # scene loading take tens of seconds
        if alive is None:
            alive = np.ones((C,), dtype=bool)
        alive = np.asarray(alive)
        weights = np.zeros((MAX_GENERATIONS,), np.float32)
        weights[0] = anchor_weight_init_g0
        if active_sh_degree is None:
            active_sh_degree = 0
        return cls(
            params=params,
            alive=jnp.asarray(alive),
            generation=jnp.asarray(np.zeros((C,), np.int32)),
            mask=jnp.asarray(alive),  # "all updatable" == all alive slots
            anchor=jax.tree_util.tree_map(jnp.asarray, params),
            anchor_weights=jnp.asarray(weights),
            n_generations=jnp.asarray(1, jnp.int32),
            active_sh_degree=jnp.asarray(active_sh_degree, jnp.int32),
            max_sh_degree=max_sh_degree,
        )

    @classmethod
    def from_points(
        cls,
        points: np.ndarray,
        colors: np.ndarray,
        max_sh_degree: int = 3,
        capacity: Optional[int] = None,
        anchor_weight_init_g0: float = 0.05,
    ) -> "GaussianScene":
        """Initialize from a colored point cloud.

        Matches `create_from_pcd` (gaussian_model.py:274-334): log-scales
        from sqrt(mean squared distance to 3 nearest neighbors), identity
        quats, raw opacity 1.0 (GaussianEditor's variant — NOT the vanilla
        inverse_sigmoid(0.1)), DC features = RGB2SH(color).
        """
        from gaussianeditor_tpu.ops.knn import mean_sq_dist_to_3nn

        points = np.asarray(points, dtype=np.float32)
        colors = np.asarray(colors, dtype=np.float32)
        n = points.shape[0]
        if capacity is None:
            capacity = n
        assert capacity >= n

        dist2 = np.maximum(mean_sq_dist_to_3nn(points), 1e-7)
        log_scales = np.repeat(
            np.log(np.sqrt(dist2))[:, None], 3, axis=1
        ).astype(np.float32)

        k = sh_utils.num_sh_bases(max_sh_degree)
        f_dc = np.asarray(sh_utils.rgb2sh(colors))[:, None, :]  # [n,1,3]
        f_rest = np.zeros((n, k - 1, 3), np.float32)
        quats = np.zeros((n, 4), np.float32)
        quats[:, 0] = 1.0
        opacity_raw = np.ones((n, 1), np.float32)

        def pad(x):
            if capacity == n:
                return jnp.asarray(x)
            padded = np.zeros((capacity,) + x.shape[1:], x.dtype)
            padded[:n] = x
            return jnp.asarray(padded)

        params = GaussianParams(
            xyz=pad(points),
            features_dc=pad(f_dc.astype(np.float32)),
            features_rest=pad(f_rest),
            opacity_raw=pad(opacity_raw),
            log_scales=pad(log_scales),
            quats=pad(quats),
        )
        alive = np.arange(capacity) < n
        return cls.create(
            params,
            max_sh_degree=max_sh_degree,
            anchor_weight_init_g0=anchor_weight_init_g0,
            alive=alive,
        )

    def pad_to_capacity(self, capacity: int) -> "GaussianScene":
        """Grow all arrays to `capacity`, new slots dead. Host-side op used
        before starting a densifying training run."""
        cur = self.capacity
        assert capacity >= cur

        def pad(x):
            pad_width = [(0, capacity - cur)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad_width)

        return self.replace(
            params=jax.tree_util.tree_map(pad, self.params),
            anchor=jax.tree_util.tree_map(pad, self.anchor),
            alive=pad(self.alive),
            generation=pad(self.generation),
            mask=pad(self.mask),
        )

    def compact(self) -> "GaussianScene":
        """Drop dead slots (host-side, non-jittable: dynamic shape)."""
        keep = np.asarray(self.alive)
        take = lambda x: jnp.asarray(np.asarray(x)[keep])
        return self.replace(
            params=jax.tree_util.tree_map(take, self.params),
            anchor=jax.tree_util.tree_map(take, self.anchor),
            alive=take(self.alive),
            generation=take(self.generation),
            mask=take(self.mask),
        )


def concat_scenes(base: GaussianScene, obj: GaussianScene) -> GaussianScene:
    """Merge an added object into a scene.

    Reference `concat_gaussians` (gaussian_model.py:900-923): the merged
    mask marks ONLY the new object as editable, so subsequent training
    refines the insertion without disturbing the original scene. Both
    scenes are compacted first (host-side op).
    """
    base = base.compact()
    obj = obj.compact()
    kb = sh_utils.num_sh_bases(base.max_sh_degree)
    ko = sh_utils.num_sh_bases(obj.max_sh_degree)
    obj_rest = obj.params.features_rest
    if ko < kb:  # pad object SH up to scene degree
        obj_rest = jnp.pad(obj_rest, ((0, 0), (0, kb - ko), (0, 0)))
    elif ko > kb:
        obj_rest = obj_rest[:, : kb - 1]
    cat = lambda a, b: jnp.concatenate([a, b], axis=0)
    params = GaussianParams(
        xyz=cat(base.params.xyz, obj.params.xyz),
        features_dc=cat(base.params.features_dc, obj.params.features_dc),
        features_rest=cat(base.params.features_rest, obj_rest),
        opacity_raw=cat(base.params.opacity_raw, obj.params.opacity_raw),
        log_scales=cat(base.params.log_scales, obj.params.log_scales),
        quats=cat(base.params.quats, obj.params.quats),
    )
    nb, no = base.capacity, obj.capacity
    merged = GaussianScene.create(
        params,
        max_sh_degree=base.max_sh_degree,
        anchor_weight_init_g0=float(base.anchor_weights[0]),
        active_sh_degree=int(base.active_sh_degree),
    )
    mask = jnp.concatenate([jnp.zeros((nb,), bool), jnp.ones((no,), bool)])
    return merged.set_mask(mask).update_anchor()
