from gaussianeditor_tpu.models.gaussians import (
    MAX_ANCHOR_WEIGHT,
    MAX_GENERATIONS,
    GaussianParams,
    GaussianScene,
    opacity_activation,
    opacity_inverse_activation,
    scaling_activation,
    scaling_inverse_activation,
)
from gaussianeditor_tpu.models.ply import load_ply, save_ply
