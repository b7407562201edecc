"""View-dependent prompt processing.

Parity with the reference prompt processors
(`threestudio/models/prompt_processors/base.py:226-295`): per-view
direction classification (side / front / back / overhead) from camera
azimuth/elevation, with the canonical thresholds, and prompt templating
"<prompt>, <dir> view". The CLIP text-embedding cache the reference adds
on top (base.py:340-389) is a frozen-model host concern; embeddings are
produced by whichever guidance backend consumes these strings.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence

import numpy as np

from gaussianeditor_tpu.core.cameras import Camera


@dataclasses.dataclass
class DirectionConfig:
    """Thresholds in degrees (reference defaults, base.py:241-266)."""

    overhead_threshold: float = 60.0
    front_threshold: float = 45.0
    back_threshold: float = 45.0


def camera_angles(camera: Camera, center=None):
    """(azimuth_deg, elevation_deg) of the camera position about `center`
    — the quantities the reference datamodules feed the processor."""
    if center is None:
        center = np.zeros(3)
    pos = np.asarray(camera.cam_pos) - np.asarray(center)
    r = np.linalg.norm(pos)
    elevation = math.degrees(math.asin(np.clip(pos[1] / max(r, 1e-9), -1, 1)))
    azimuth = math.degrees(math.atan2(pos[0], pos[2]))
    return azimuth, elevation


def view_direction(azimuth_deg: float, elevation_deg: float,
                   cfg: Optional[DirectionConfig] = None) -> str:
    """base.py:247-266: overhead wins; front is azimuth in
    (-front_thr, front_thr]; back is |azimuth| > 180 - back_thr; else side."""
    cfg = cfg or DirectionConfig()
    if elevation_deg > cfg.overhead_threshold:
        return "overhead"
    a = ((azimuth_deg + 180.0) % 360.0) - 180.0
    if -cfg.front_threshold < a <= cfg.front_threshold:
        return "front"
    if a > 180.0 - cfg.back_threshold or a <= -180.0 + cfg.back_threshold:
        return "back"
    return "side"


@dataclasses.dataclass
class PromptProcessor:
    """Templated per-view prompts (PromptProcessorOutput role)."""

    prompt: str
    negative_prompt: str = ""
    use_view_dependent: bool = True
    direction_config: DirectionConfig = dataclasses.field(
        default_factory=DirectionConfig
    )

    def for_camera(self, camera: Camera, center=None) -> str:
        if not self.use_view_dependent:
            return self.prompt
        az, el = camera_angles(camera, center)
        d = view_direction(az, el, self.direction_config)
        return f"{self.prompt}, {d} view"

    def for_cameras(self, cameras: Sequence[Camera], center=None) -> List[str]:
        return [self.for_camera(c, center) for c in cameras]
