from gaussianeditor_tpu.data.colmap import (
    ColmapCamera,
    ColmapImage,
    read_colmap_model,
    read_points3d,
)
from gaussianeditor_tpu.data.camera_scene import CamScene
