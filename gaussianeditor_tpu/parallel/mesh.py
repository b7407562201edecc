"""Device mesh construction for view-parallel training.

The reference is single-GPU with latent DDP scaffolding
(SURVEY.md section 2.6): PL `Trainer(devices=-1)` + torch.distributed
barrier/broadcast helpers that don't actually work with the CUDA
rasterizer. Here multi-chip is first-class: a 1-D `data` mesh shards the
multi-view camera batch across chips (the natural parallel axis of the
editing workload — `forward` loops over batch cameras,
GassuianEditor.py:165), Gaussian parameters are replicated, and gradients
are reduced with `psum` over ICI. Multi-host extends the same mesh via
`jax.distributed.initialize()`.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (the jax-native replacement for the reference's
    SLURM/RANK discovery, threestudio/utils/misc.py:39-47)."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
