"""Test config: force CPU with 8 virtual devices so sharding/collective
logic is testable without TPU hardware (SURVEY.md section 4, point 4).

The environment's sitecustomize registers the axon TPU plugin at
interpreter start and programmatically sets jax_platforms="axon,cpu",
so the JAX_PLATFORMS env var alone does NOT keep tests off the TPU
tunnel — the config must be updated before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", "tests must run on host CPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
