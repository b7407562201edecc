"""Add system: insert a generated object into the scene.

Parity target: `threestudio/systems/GassuianEditorAdd.py:43-281` — the
one-shot pipeline: pick an anchor camera -> inpaint the target bbox with
a 2D diffusion inpainter -> background removal -> image-to-3D (the
reference shells out to Wonder3D multiview diffusion + instant-nsr NeuS
+ train_from_mesh; here that stage is a pluggable `ObjectGenerator`
adapter) -> depth-align the object against the rendered scene depth
(least-squares a*depth+b over non-object pixels, :197-230) -> rigid
place into world coordinates (:239-276) -> `concat_scenes` (mask = new
object only) -> optional refinement training of the inserted object.

External generative models stay host-side adapters; the geometric
machinery (depth alignment, camera-frame placement, concat) is
first-party and tested with fakes.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Protocol, Sequence, Tuple, runtime_checkable

import jax.numpy as jnp
import numpy as np

from gaussianeditor_tpu.core.cameras import Camera
from gaussianeditor_tpu.core.transforms import (
    default_model_rotation,
    quat_multiply,
    rotmat_to_quat,
)
from gaussianeditor_tpu.edit.edit_system import EditConfig, EditSystem
from gaussianeditor_tpu.guidance.base import Inpainter
from gaussianeditor_tpu.models.gaussians import GaussianScene, concat_scenes


@runtime_checkable
class ObjectGenerator(Protocol):
    """image (RGBA or RGB) -> object GaussianScene in its canonical frame.

    Stands in for the reference's three subprocesses (Wonder3D ->
    instant-nsr-pl -> train_from_mesh; GassuianEditorAdd.py:121-157)."""

    def __call__(self, image: np.ndarray, prompt: str) -> GaussianScene:
        ...


@runtime_checkable
class DepthEstimator(Protocol):
    """Monocular depth (reference DPT, utils/dpt.py)."""

    def __call__(self, image: np.ndarray) -> np.ndarray:
        ...


@dataclasses.dataclass
class AddConfig(EditConfig):
    inpaint_prompt: str = ""
    refine_steps: int = 0       # post-concat refinement of the new object
    bbox: Tuple[int, int, int, int] = (0, 0, 0, 0)  # x0, y0, x1, y1 pixels
    anchor_view_id: int = 0


def align_depth_scale(
    est_depth: np.ndarray,       # [H, W] monocular estimate
    rendered_depth: np.ndarray,  # [H, W] scene depth from the renderer
    object_mask: np.ndarray,     # [H, W] bool: pixels of the new object
) -> Tuple[float, float]:
    """Solve est*a + b ~= rendered over non-object pixels, restricted to
    the depth band around the object (reference robust alignment,
    GassuianEditorAdd.py:197-230: non-object pixels filtered by the
    object-depth quantile band)."""
    obj = object_mask > 0.5
    bgm = (~obj) & (rendered_depth > 0)
    if obj.any():
        lo, hi = np.quantile(est_depth[obj], [0.05, 0.95])
        band = (est_depth >= lo - (hi - lo)) & (est_depth <= hi + (hi - lo))
        bgm = bgm & band
    x = est_depth[bgm].astype(np.float64)
    y = rendered_depth[bgm].astype(np.float64)
    if x.size < 2:
        return 1.0, 0.0
    A = np.stack([x, np.ones_like(x)], axis=1)
    sol, *_ = np.linalg.lstsq(A, y, rcond=None)
    return float(sol[0]), float(sol[1])


def place_object_in_scene(
    obj: GaussianScene,
    camera: Camera,
    bbox: Tuple[int, int, int, int],
    depth: float,
) -> GaussianScene:
    """Rigidly place a canonical-frame object so it lands in the camera
    bbox at the given camera-space depth (GassuianEditorAdd.py:239-276):
    center the object, rotate by the canonical->scene default rotation
    and the camera rotation, scale to bbox * depth / focal, translate to
    the unprojected bbox center."""
    xyz = np.asarray(obj.params.xyz)
    center = xyz.mean(axis=0)
    xyz = xyz - center

    R_default = default_model_rotation()
    W = np.asarray(camera.world_view)
    R_c2w = np.linalg.inv(W)[:3, :3]
    R = R_c2w @ R_default

    x0, y0, x1, y1 = bbox
    fx = float(camera.focal_x)
    fy = float(camera.focal_y)
    extent = max(abs(xyz).max(), 1e-6)
    target_size = 0.5 * ((x1 - x0) / fx + (y1 - y0) / fy) * depth
    s = target_size / (2.0 * extent)

    # unproject bbox center at `depth`
    cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
    W_img, H_img = camera.width, camera.height
    ndc_x = (2.0 * cx + 1.0) / W_img - 1.0
    ndc_y = (2.0 * cy + 1.0) / H_img - 1.0
    cam_pt = np.array(
        [ndc_x * float(camera.tan_fovx) * depth,
         ndc_y * float(camera.tan_fovy) * depth,
         depth, 1.0]
    )
    world_pt = (np.linalg.inv(W) @ cam_pt)[:3]

    new_xyz = (s * (xyz @ R.T)) + world_pt
    new_log_scales = np.asarray(obj.params.log_scales) + np.log(s)
    rot_quat = rotmat_to_quat(R)
    new_quats = np.asarray(
        quat_multiply(jnp.asarray(rot_quat)[None], obj.params.quats)
    )
    return obj.replace(
        params=obj.params.replace(
            xyz=jnp.asarray(new_xyz, jnp.float32),
            log_scales=jnp.asarray(new_log_scales, jnp.float32),
            quats=jnp.asarray(new_quats, jnp.float32),
        )
    )


class AddSystem(EditSystem):
    def __init__(
        self,
        scene: GaussianScene,
        cameras: Sequence[Camera],
        config: AddConfig,
        inpainter: Inpainter,
        object_generator: ObjectGenerator,
        depth_estimator: Optional[DepthEstimator] = None,
        perceptual=None,
    ):
        super().__init__(scene, cameras, config, guidance=None,
                         perceptual=perceptual)
        self.inpainter = inpainter
        self.object_generator = object_generator
        self.depth_estimator = depth_estimator

    def run(self) -> GaussianScene:
        """Execute the one-shot Add pipeline; returns the merged scene."""
        import jax

        from gaussianeditor_tpu.ops.render import render as _render

        cfg: AddConfig = self.cfg
        cam = self.cameras[cfg.anchor_view_id]
        out = jax.jit(
            lambda s, c: _render(s, c, jnp.zeros(3), impl="tiled",
                                 tile_cap=cfg.tile_cap, chunk=cfg.chunk)
        )(self.scene, cam)
        rgb = np.asarray(out.color)
        rendered_depth = np.asarray(out.depth)

        x0, y0, x1, y1 = cfg.bbox
        bbox_mask = np.zeros(rgb.shape[:2], np.float32)
        bbox_mask[y0:y1, x0:x1] = 1.0
        inpainted = self.inpainter(rgb, bbox_mask, cfg.inpaint_prompt)

        obj = self.object_generator(inpainted[y0:y1, x0:x1], cfg.inpaint_prompt)

        # depth placement: monocular estimate aligned to scene depth, or
        # median scene depth in the bbox as fallback
        if self.depth_estimator is not None:
            est = self.depth_estimator(inpainted)
            a, b = align_depth_scale(est, rendered_depth, bbox_mask > 0.5)
            obj_depth = float(np.median(est[y0:y1, x0:x1]) * a + b)
        else:
            region = rendered_depth[y0:y1, x0:x1]
            valid = region[region > 0]
            obj_depth = float(np.median(valid)) if valid.size else 1.0

        placed = place_object_in_scene(obj, cam, cfg.bbox, obj_depth)
        merged = concat_scenes(self.scene, placed)
        self.scene = merged
        return merged
