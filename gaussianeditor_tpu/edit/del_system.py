"""Delete system: remove a traced object and inpaint the hole.

Parity target: `threestudio/systems/GassuianEditorDel.py` —
on_fit_start (:34-66): trace -> find the shell of Gaussians near the
object (`get_near_gaussians_by_mask`, gaussian_model.py:865-898) ->
prune the object and re-target the mask to the shell
(`prune_with_mask`, :206-214) -> render per-view hole masks (dilate +
fill, :131-157) -> inpaint each view ONCE -> train the shell against the
inpainted targets with L1 (+ perceptual) + anchor losses (:159-210).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gaussianeditor_tpu.core.cameras import Camera
from gaussianeditor_tpu.edit.edit_system import EditConfig, EditSystem
from gaussianeditor_tpu.guidance.base import Inpainter, Segmentor
from gaussianeditor_tpu.models.gaussians import GaussianScene
from gaussianeditor_tpu.ops.knn import k_nearest_neighbors
from gaussianeditor_tpu.ops.render import render
from gaussianeditor_tpu.train.optim import OptimConfig
from gaussianeditor_tpu.utils.masks import dilate_mask, fill_closed_areas


@dataclasses.dataclass
class DelConfig(EditConfig):
    """GassuianEditorDel.Config (:17-21)."""

    fix_holes: bool = True
    mask_dilate: int = 5
    inpaint_scale: float = 0.25
    inpaint_prompt: str = ""


def near_gaussians_by_mask(
    xyz: np.ndarray, mask: np.ndarray, alive: np.ndarray, dist_thresh: float
) -> np.ndarray:
    """Full-capacity boolean mask of unmasked alive Gaussians within
    `dist_thresh` of the masked object, restricted to a 1.3x-expanded
    3%..97%-quantile bbox — gaussian_model.py:865-898. Host-side."""
    mask = np.asarray(mask) & np.asarray(alive)
    remaining = (~np.asarray(mask)) & np.asarray(alive)
    obj = xyz[mask]
    out = np.zeros(xyz.shape[0], dtype=bool)
    if obj.shape[0] == 0 or remaining.sum() == 0:
        return out
    lo = np.quantile(obj, 0.03, axis=0)
    hi = np.quantile(obj, 0.97, axis=0)
    mid, scale = (hi + lo) / 2, (hi - lo) * 1.3
    lo, hi = mid - scale / 2, mid + scale / 2
    rem_idx = np.nonzero(remaining)[0]
    rem_xyz = xyz[rem_idx]
    in_bbox = np.all((rem_xyz >= lo) & (rem_xyz <= hi), axis=1)
    cand_idx = rem_idx[in_bbox]
    if cand_idx.size == 0:
        return out
    dists, _ = k_nearest_neighbors(obj, xyz[cand_idx], k=1)
    out[cand_idx[dists[:, 0] <= dist_thresh]] = True
    return out


class DelSystem(EditSystem):
    def __init__(
        self,
        scene: GaussianScene,
        cameras: Sequence[Camera],
        config: DelConfig,
        inpainter: Inpainter,
        segmentor: Segmentor,
        perceptual="auto",
    ):
        super().__init__(scene, cameras, config, guidance=None,
                         segmentor=segmentor, perceptual=perceptual)
        self.inpainter = inpainter
        self._mask_render = jax.jit(
            lambda s, c: render(
                s, c, jnp.zeros(1),
                override_color=s.mask[:, None].astype(jnp.float32),
                impl="tiled", max_instances=config.max_instances,
                tile_cap=config.tile_cap, chunk=config.chunk,
            ).color[..., 0]
        )

    def render_view_masks(self) -> Dict[int, np.ndarray]:
        """Per-view hole masks from the pruned scene
        (render_all_view_with_mask, GassuianEditorDel.py:131-157)."""
        out = {}
        for i, cam in enumerate(self.cameras):
            m = np.asarray(self._mask_render(self.scene, cam))
            m = (m > 0.5).astype(np.float32)
            m = dilate_mask(m, self.cfg.mask_dilate)
            if self.cfg.fix_holes:
                m = fill_closed_areas(m)
            out[i] = m
        return out

    def on_fit_start(self) -> None:
        assert self.cfg.seg_prompt, "Delete requires system.seg_prompt"
        self.render_all_views()
        self.update_mask()

        # shell = near-object surviving Gaussians (GassuianEditorDel.py:45-56)
        dist_thres = (
            self.cfg.inpaint_scale
            * self.cfg.cameras_extent
            * OptimConfig().percent_dense
        )
        shell = near_gaussians_by_mask(
            np.asarray(self.scene.params.xyz),
            np.asarray(self.scene.mask),
            np.asarray(self.scene.alive),
            dist_thres,
        )
        # prune_with_mask(new_mask=shell) (gaussian_model.py:206-214):
        # delete the object, re-target the mask, refresh the anchor.
        new_alive = self.scene.alive & ~self.scene.mask
        self.scene = self.scene.replace(alive=new_alive)
        self.scene = self.scene.set_mask(jnp.asarray(shell) & new_alive)
        self.scene = self.scene.update_anchor()

        # per-view inpainting, once (GassuianEditorDel.py:68-129)
        view_masks = self.render_view_masks()
        self.origin_frames = {}
        self.render_all_views()  # pruned-scene renders
        for i in range(len(self.cameras)):
            self.edit_frames[i] = np.asarray(
                self.inpainter(
                    self.origin_frames[i], view_masks[i],
                    self.cfg.inpaint_prompt,
                ),
                np.float32,
            )

        from gaussianeditor_tpu.train.trainer import init_train_state

        self.state = init_train_state(self.scene, self.optim)

    def _refresh_targets(self, view_ids, step) -> None:
        # Del targets are fixed after on_fit_start (no per-step diffusion).
        pass
