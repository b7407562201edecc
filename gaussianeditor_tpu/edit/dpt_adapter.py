"""Monocular depth estimation for the Add pipeline's depth alignment.

The reference vendors a 1056-LoC DPT-hybrid network and loads the
omnidata checkpoint (`threestudio/utils/dpt.py`, used from
`GassuianEditorAdd.py:182-186`). Rather than translating that torch code,
this adapter drives the SAME architecture through the `transformers`
library's DPT implementation (torch, host-side, frozen inference —
exactly the role the reference gives it):

  * `DPTDepthEstimator(pretrained="Intel/dpt-hybrid-midas")` — loads the
    published checkpoint when weights are available locally.
  * `DPTDepthEstimator(pretrained=None)` — builds the architecture from
    config with random weights; used by tests to validate the full
    image -> tensor -> model -> resized-depth plumbing without any
    download (zero-egress environments).

Output: float32 [H, W] inverse-depth-like map resized to the input
resolution; `align_depth_scale` (edit/add_system.py) solves the a*x+b
least-squares fit against rendered depth exactly like the reference
(GassuianEditorAdd.py:197-230), so the affine ambiguity of monocular
depth does not matter."""

from __future__ import annotations

from typing import Optional

import numpy as np


class DPTDepthEstimator:
    """`DepthEstimator` protocol implementation over transformers' DPT."""

    def __init__(self, pretrained: Optional[str] = "Intel/dpt-hybrid-midas",
                 device: str = "cpu", image_size: int = 384):
        try:
            import torch
            from transformers import DPTConfig, DPTForDepthEstimation
        except ImportError as e:
            raise ImportError(
                "torch/transformers are required for DPT depth estimation"
            ) from e
        self.torch = torch
        self.device = device
        self.image_size = image_size
        if pretrained:
            self.model = DPTForDepthEstimation.from_pretrained(pretrained)
        else:
            # architecture-only (random weights): hermetic test path
            cfg = DPTConfig(
                image_size=image_size,
                hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
                intermediate_size=128, fusion_hidden_size=32,
                neck_hidden_sizes=[16, 32, 48, 64],
                backbone_out_indices=[0, 1, 2, 3],
            )
            self.model = DPTForDepthEstimation(cfg)
        self.model.eval().to(device)

    def __call__(self, image: np.ndarray) -> np.ndarray:
        torch = self.torch
        img = np.clip(np.asarray(image, np.float32), 0, 1)
        H, W = img.shape[:2]
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        img = img[..., :3]
        x = torch.from_numpy(img).permute(2, 0, 1)[None]
        # ImageNet normalization (the omnidata DPT preprocessing)
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        x = (x - mean) / std
        x = torch.nn.functional.interpolate(
            x, (self.image_size, self.image_size), mode="bilinear",
            align_corners=False,
        ).to(self.device)
        with torch.no_grad():
            depth = self.model(pixel_values=x).predicted_depth  # [1, h, w]
        depth = torch.nn.functional.interpolate(
            depth[:, None], (H, W), mode="bilinear", align_corners=False
        )[0, 0]
        return depth.float().cpu().numpy()
