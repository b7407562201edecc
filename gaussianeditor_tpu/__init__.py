"""gaussianeditor_tpu — a TPU-native 3D Gaussian Splatting editing framework.

A from-scratch JAX/Pallas/pjit re-design of the capabilities of
buaacyw/GaussianEditor (CVPR 2024): a differentiable tile-based Gaussian
rasterizer, semantic tracing (2D mask -> per-Gaussian labels), hierarchical
Gaussian splatting (generation tags + anchor losses), densify/prune under
fixed capacity, and edit/delete/add pipelines driven by pluggable 2D
guidance — all built for TPU: static shapes, functional transforms,
Pallas kernels on the compositing hot path, and `shard_map` view-parallel
training over a device mesh.

Layer map (mirrors SURVEY.md section 1, re-architected for XLA):
  core/      camera math, spherical harmonics, quaternion/covariance ops
  models/    GaussianScene pytree (fixed-capacity SoA) + PLY I/O
  ops/       the differentiable renderer: preprocess, tile binning, Pallas
             compositing kernels, apply_weights mask splatting, refimpl oracle
  train/     optimizer, densify/prune, anchors/HGS, trainer loops
  edit/      semantic tracing + edit/del/add systems
  guidance/  2D diffusion guidance protocol + deterministic fake + adapters
  parallel/  mesh construction, view-sharded pjit/shard_map training step
  data/      COLMAP ingest, camera scenes, view samplers
  config/    dataclass+YAML config with step-interpolated scalars
  utils/     masks, image metrics, saving
  apps/      CLI launcher, web UI (gated on viser)
"""

__version__ = "0.1.0"
