"""Cross-framework oracle: an independent pure-torch rasterizer written
directly from the CUDA reference's formulas (forward.cu) — sharing NO
code with the JAX implementation — must agree with our renderer.

This stands in for 'allclose vs the reference CUDA rasterizer'
(BASELINE.md) in a CUDA-less environment: same math, independent
implementation, different framework.
"""

import numpy as np
import pytest
import torch

from gaussianeditor_tpu.ops.render import render
from tests.helpers import assert_images_close, make_camera, random_scene


def torch_rasterize(xyz, log_scales, quats, opacity_raw, f_dc, cam, bg):
    """Faithful torch transliteration of the reference math:
    computeCov3D (forward.cu:118-152), computeCov2D (:74-113), preprocess
    culling/rect (:156-256), sequential per-pixel compositing (:261-379)
    with tile-quantized footprints (auxiliary.h getRect)."""
    TILE = 16
    xyz = torch.tensor(np.asarray(xyz))
    n = xyz.shape[0]
    W, H = cam.width, cam.height

    # activations (gaussian_model.py:42-57)
    scales = torch.exp(torch.tensor(np.asarray(log_scales)))
    q = torch.tensor(np.asarray(quats))
    q = q / q.norm(dim=1, keepdim=True)
    op = torch.sigmoid(torch.tensor(np.asarray(opacity_raw)))[:, 0]
    color = torch.tensor(np.asarray(f_dc))[:, 0, :] * 0.28209479177387814 + 0.5
    color = color.clamp_min(0.0)

    # cov3D = R S S R^T
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = torch.stack(
        [
            torch.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z),
                         2 * (x * z + r * y)], -1),
            torch.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z),
                         2 * (y * z - r * x)], -1),
            torch.stack([2 * (x * z - r * y), 2 * (y * z + r * x),
                         1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )
    L = R * scales[:, None, :]
    cov3d = L @ L.transpose(1, 2)

    world_view = torch.tensor(np.asarray(cam.world_view))
    full_proj = torch.tensor(np.asarray(cam.full_proj))
    p_hom = torch.cat([xyz, torch.ones(n, 1)], 1) @ full_proj.T
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]
    t_cam = xyz @ world_view[:3, :3].T + world_view[:3, 3]
    in_frustum = t_cam[:, 2] > 0.2

    fx = float(cam.focal_x)
    fy = float(cam.focal_y)
    tfx, tfy = float(cam.tan_fovx), float(cam.tan_fovy)
    tx = torch.clamp(t_cam[:, 0] / t_cam[:, 2], -1.3 * tfx, 1.3 * tfx) * t_cam[:, 2]
    ty = torch.clamp(t_cam[:, 1] / t_cam[:, 2], -1.3 * tfy, 1.3 * tfy) * t_cam[:, 2]
    tz = t_cam[:, 2]
    J = torch.zeros(n, 2, 3)
    J[:, 0, 0] = fx / tz
    J[:, 0, 2] = -fx * tx / (tz * tz)
    J[:, 1, 1] = fy / tz
    J[:, 1, 2] = -fy * ty / (tz * tz)
    JW = J @ world_view[:3, :3]
    cov2d = JW @ cov3d @ JW.transpose(1, 2)
    cov2d[:, 0, 0] += 0.3
    cov2d[:, 1, 1] += 0.3

    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] ** 2
    conic = torch.stack(
        [cov2d[:, 1, 1] / det, -cov2d[:, 0, 1] / det, cov2d[:, 0, 0] / det], -1
    )
    mid = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    disc = torch.sqrt(torch.clamp(mid * mid - det, min=0.1))
    radius = torch.ceil(3.0 * torch.sqrt(torch.maximum(mid + disc, mid - disc)))
    mean2d = torch.stack(
        [((p_proj[:, 0] + 1) * W - 1) * 0.5, ((p_proj[:, 1] + 1) * H - 1) * 0.5],
        -1,
    )
    gx, gy = (W + TILE - 1) // TILE, (H + TILE - 1) // TILE
    rect_min_x = ((mean2d[:, 0] - radius) / TILE).int().clamp(0, gx)
    rect_min_y = ((mean2d[:, 1] - radius) / TILE).int().clamp(0, gy)
    rect_max_x = ((mean2d[:, 0] + radius + TILE - 1) / TILE).int().clamp(0, gx)
    rect_max_y = ((mean2d[:, 1] + radius + TILE - 1) / TILE).int().clamp(0, gy)
    tiles = (rect_max_x - rect_min_x) * (rect_max_y - rect_min_y)
    visible = in_frustum & (det != 0) & (tiles > 0)

    order = torch.argsort(torch.where(visible, t_cam[:, 2],
                                      torch.full_like(tz, 1e30)))
    img = torch.zeros(H, W, 3)
    depth_img = torch.zeros(H, W)
    ys, xs_pix = torch.meshgrid(torch.arange(H), torch.arange(W),
                                indexing="ij")
    T = torch.ones(H, W)
    done = torch.zeros(H, W, dtype=torch.bool)
    for i in order.tolist():
        if not visible[i]:
            continue
        dx = mean2d[i, 0] - xs_pix.float()
        dy = mean2d[i, 1] - ys.float()
        power = (
            -0.5 * (conic[i, 0] * dx * dx + conic[i, 2] * dy * dy)
            - conic[i, 1] * dx * dy
        )
        alpha = torch.clamp(op[i] * torch.exp(power.clamp(max=0.0)), max=0.99)
        tile_x = (xs_pix // TILE)
        tile_y = (ys // TILE)
        in_rect = ((tile_x >= rect_min_x[i]) & (tile_x < rect_max_x[i])
                   & (tile_y >= rect_min_y[i]) & (tile_y < rect_max_y[i]))
        valid = (power <= 0) & (alpha >= 1.0 / 255.0) & in_rect & (~done)
        test_T = T * (1 - alpha)
        crossing = valid & (test_T < 1e-4)
        contributes = valid & (~crossing)
        w = torch.where(contributes, alpha * T, torch.zeros(()))
        img += w[..., None] * color[i]
        depth_img += w * t_cam[i, 2]
        T = torch.where(contributes, test_T, T)
        done = done | crossing
    img += T[..., None] * torch.tensor(bg)
    return img.numpy(), depth_img.numpy(), T.numpy()


@pytest.mark.parametrize("seed", [0, 3])
def test_render_matches_independent_torch_oracle(seed):
    scene = random_scene(80, seed=seed)
    cam = make_camera(48, 48)
    bg = np.array([0.1, 0.2, 0.3], np.float32)

    t_img, t_depth, t_T = torch_rasterize(
        scene.params.xyz, scene.params.log_scales, scene.params.quats,
        scene.params.opacity_raw, scene.params.features_dc, cam, bg,
    )
    import jax
    import jax.numpy as jnp

    out = jax.jit(
        lambda s: render(s, cam, jnp.asarray(bg), impl="tiled",
                         max_instances=8192, tile_cap=512, chunk=64)
    )(scene)
    assert_images_close(out.color, t_img, name="color vs torch oracle")
    assert_images_close(out.depth, t_depth, loose=2e-2,
                        name="depth vs torch oracle")
    assert_images_close(out.final_T, t_T, name="final_T vs torch oracle")
