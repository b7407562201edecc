"""Guidance and segmentation protocols.

The reference couples its editing systems to diffusers pipelines
(threestudio/models/guidance/*.py). Here the trainer sees only a narrow
protocol — `Guidance(render, origin, prompt) -> edited image` — matching
how the systems actually consume guidance (the iterative-dataset-update
scheme: regenerate per-view edited targets every `per_editing_step`,
GassuianEditorEdit.py:64-150). Real diffusion backends run on the host
(torch), OUTSIDE the jitted TPU training step; the reference amortizes
them the same way, regenerating targets only every N steps.

Implementations:
  * `fake.FakeGuidance` — deterministic, dependency-free; the hermetic
    test stand-in (SURVEY.md section 4 point 5).
  * `ip2p.InstructPix2PixGuidance` / `controlnet.ControlNetGuidance` —
    diffusers adapters, import-gated (unavailable in this image).
"""

from __future__ import annotations

import dataclasses
from typing import Protocol, runtime_checkable

import numpy as np


@dataclasses.dataclass
class GuidanceOutput:
    edit_image: np.ndarray  # [H, W, 3] float in [0, 1]


@runtime_checkable
class Guidance(Protocol):
    """Produce an edited target for one view.

    Args mirror the reference guidance __call__ (instructpix2pix_guidance
    .py:241-303): the current render, the cached origin render, and the
    instruction prompt.
    """

    def __call__(
        self,
        rgb: np.ndarray,        # current render [H, W, 3]
        cond_rgb: np.ndarray,   # origin render [H, W, 3]
        prompt: str,
    ) -> GuidanceOutput:
        ...


@runtime_checkable
class Segmentor(Protocol):
    """Text-prompted 2D segmentation (reference `LangSAMTextSegmentor`,
    threestudio/utils/sam.py:14-36)."""

    def __call__(self, image: np.ndarray, prompt: str) -> np.ndarray:
        """[H, W, 3] image -> [H, W] float mask in [0, 1]."""
        ...


@runtime_checkable
class Inpainter(Protocol):
    """Masked image inpainting (reference ControlNet-inpaint usage,
    GassuianEditorDel.py:68-129 / SDXL-inpaint, GassuianEditorAdd.py:81-110)."""

    def __call__(self, image: np.ndarray, mask: np.ndarray,
                 prompt: str) -> np.ndarray:
        ...
