"""Camera model and projection math.

Behavioral parity with the reference camera stack
(`gaussiansplatting/utils/graphics_utils.py:40-93`,
`gaussiansplatting/scene/cameras.py:17-153`), with one deliberate
convention change: matrices here are stored in standard math (column-vector)
convention, `p_cam = world_view @ [p; 1]`, rather than the reference's
transposed row-vector layout. The projection matrix maps z into [0, 1]
(OpenGL-style with z_sign=+1), identical to the reference's
``getProjectionMatrix``.

Cameras are JAX pytrees; image height/width are static (they determine
rasterizer grid shapes under jit).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


def fov2focal(fov: float, pixels: float) -> float:
    """Reference: graphics_utils.py:89-90."""
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    """Reference: graphics_utils.py:92-93."""
    return 2.0 * math.atan(pixels / (2.0 * focal))


def get_world2view(
    R: np.ndarray,
    t: np.ndarray,
    translate: Optional[np.ndarray] = None,
    scale: float = 1.0,
) -> np.ndarray:
    """World-to-camera 4x4 (math convention).

    Matches `getWorld2View2` (graphics_utils.py:40-51) *before* the
    reference transposes it for row-vector use: given the COLMAP-style
    inputs (R = cam-to-world rotation, t = world-to-cam translation),
    returns W such that p_cam = W @ [p_world; 1].
    """
    if translate is None:
        translate = np.zeros(3)
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0

    C2W = np.linalg.inv(Rt)
    cam_center = C2W[:3, 3]
    cam_center = (cam_center + translate) * scale
    C2W[:3, 3] = cam_center
    Rt = np.linalg.inv(C2W)
    return Rt.astype(np.float32)


def get_projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Perspective projection, z in [0,1]. Reference: graphics_utils.py:67-87."""
    tan_half_fovy = math.tan(fovy / 2.0)
    tan_half_fovx = math.tan(fovx / 2.0)

    top = tan_half_fovy * znear
    bottom = -top
    right = tan_half_fovx * znear
    left = -right

    P = np.zeros((4, 4), dtype=np.float32)
    z_sign = 1.0
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = z_sign
    P[2, 2] = z_sign * zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


@struct.dataclass
class Camera:
    """A single pinhole camera. Pytree of f32 arrays + static H/W.

    Mirrors `scene/cameras.py:17-57` (Camera / Simple_Camera) — view and
    full-projection matrices precomputed, camera center cached — in math
    (column-vector) convention.
    """

    world_view: jnp.ndarray  # [4,4]  p_cam  = world_view @ p_world
    full_proj: jnp.ndarray   # [4,4]  p_clip = full_proj  @ p_world
    cam_pos: jnp.ndarray     # [3]    camera center in world coords
    tan_fovx: jnp.ndarray    # scalar
    tan_fovy: jnp.ndarray    # scalar
    height: int = struct.field(pytree_node=False, default=512)
    width: int = struct.field(pytree_node=False, default=512)

    @property
    def focal_x(self) -> jnp.ndarray:
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self) -> jnp.ndarray:
        return self.height / (2.0 * self.tan_fovy)

    @classmethod
    def from_Rt(
        cls,
        R: np.ndarray,
        t: np.ndarray,
        fovx: float,
        fovy: float,
        height: int,
        width: int,
        znear: float = 0.01,
        zfar: float = 100.0,
        translate: Optional[np.ndarray] = None,
        scale: float = 1.0,
    ) -> "Camera":
        """COLMAP-style constructor (R = C2W rotation, t = W2C translation).

        Matches the precomputation in `scene/cameras.py:49-57`.
        """
        world_view = get_world2view(np.asarray(R), np.asarray(t), translate, scale)
        proj = get_projection_matrix(znear, zfar, fovx, fovy)
        full_proj = (proj @ world_view).astype(np.float32)
        cam_pos = np.linalg.inv(world_view)[:3, 3].astype(np.float32)
        return cls(
            world_view=jnp.asarray(world_view),
            full_proj=jnp.asarray(full_proj),
            cam_pos=jnp.asarray(cam_pos),
            tan_fovx=jnp.asarray(math.tan(fovx / 2.0), jnp.float32),
            tan_fovy=jnp.asarray(math.tan(fovy / 2.0), jnp.float32),
            height=int(height),
            width=int(width),
        )

    @classmethod
    def from_c2w(
        cls,
        c2w: np.ndarray,
        fovx: float,
        fovy: float,
        height: int,
        width: int,
        znear: float = 0.01,
        zfar: float = 100.0,
    ) -> "Camera":
        """Construct from a camera-to-world 4x4 (reference `C2W_Camera`,
        scene/cameras.py:101-139)."""
        c2w = np.asarray(c2w, dtype=np.float64)
        w2c = np.linalg.inv(c2w)
        R = w2c[:3, :3].transpose()
        t = w2c[:3, 3]
        return cls.from_Rt(R, t, fovx, fovy, height, width, znear, zfar)

    def rescale(self, height: int, width: int) -> "Camera":
        """Same pose at a different image resolution (reference
        `Simple_Camera.HW_scale`, scene/cameras.py:92-98)."""
        return self.replace(height=int(height), width=int(width))


def lookat_camera(
    eye: np.ndarray,
    target: np.ndarray,
    up: np.ndarray,
    fovx: float,
    fovy: float,
    height: int,
    width: int,
) -> Camera:
    """Convenience constructor for tests/synthetic scenes: camera at `eye`
    looking at `target` (camera +z towards target, OpenCV convention)."""
    eye = np.asarray(eye, dtype=np.float64)
    forward = np.asarray(target, dtype=np.float64) - eye
    forward = forward / np.linalg.norm(forward)
    right = np.cross(forward, np.asarray(up, dtype=np.float64))
    right = right / np.linalg.norm(right)
    down = np.cross(forward, right)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = down
    c2w[:3, 2] = forward
    c2w[:3, 3] = eye
    return Camera.from_c2w(c2w, fovx, fovy, height, width)


def orbit_cameras(
    n: int,
    radius: float,
    fovx: float,
    fovy: float,
    height: int,
    width: int,
    center: Optional[np.ndarray] = None,
    elevation: float = 0.0,
) -> list:
    """Ring of n cameras orbiting `center` — used by tests and the
    test-epoch turntable render (reference GassuianEditor.py:347-445)."""
    if center is None:
        center = np.zeros(3)
    cams = []
    for i in range(n):
        theta = 2.0 * math.pi * i / n
        eye = center + radius * np.array(
            [math.cos(theta) * math.cos(elevation),
             math.sin(elevation),
             math.sin(theta) * math.cos(elevation)]
        )
        cams.append(lookat_camera(eye, center, np.array([0.0, 1.0, 0.0]),
                                  fovx, fovy, height, width))
    return cams
