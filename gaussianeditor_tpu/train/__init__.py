from gaussianeditor_tpu.train.optim import (
    AdamState,
    GaussianAdam,
    OptimConfig,
    expon_lr,
)
from gaussianeditor_tpu.train.densify import (
    DensifyConfig,
    DensifyStats,
    add_densification_stats,
    densify_and_prune,
    init_densify_stats,
)
from gaussianeditor_tpu.train.anchors import anchor_loss, update_anchor_loss_schedule
from gaussianeditor_tpu.train.losses import l1_loss, psnr, ssim
