"""Benchmark harness — prints ONE JSON line for the driver.

Metric: rasterizer throughput in Mpix/s for a full differentiable
render (forward + backward through the tiled compositor) at the
reference's canonical editing resolution (512x512,
configs/edit-n2n.yaml) on a synthetic ~100k-Gaussian scene.

The reference publishes no benchmark tables; the 26 Mpix/s comparison
anchor is DERIVED in BASELINE.md ("Anchor derivation", anchor 1) from an
op-count cost model of the reference's own forward.cu/backward.cu inner
loops plus published GA102-class measurements of the identical Inria
kernels (band 15-40, two independent estimates intersecting at 25-30).
vs_baseline > 1.0 means faster than the reference's rasterizer fwd+bwd
on its own hardware at this scene density.

The timed loop runs REPEATS times and reports the MEDIAN: the single-chip
tunnel shows +-20% run-to-run variance, which would otherwise swamp
round-over-round deltas.
"""

import json
import statistics
import time

import numpy as np


BASELINE_MPIX_S = 26.0  # BASELINE.md "Anchor derivation", anchor 1
REPEATS = 5


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gaussianeditor_tpu.core.cameras import lookat_camera
    from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
    from gaussianeditor_tpu.ops.render import render

    n = 100_000
    hw = 512
    rng = np.random.RandomState(0)
    quats = rng.randn(n, 4).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    params = GaussianParams(
        xyz=jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32)),
        features_dc=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32) * 0.3),
        features_rest=jnp.asarray(np.zeros((n, 15, 3), np.float32)),
        opacity_raw=jnp.asarray(rng.uniform(-1.0, 1.0, (n, 1)).astype(np.float32)),
        log_scales=jnp.asarray(
            np.log(rng.uniform(0.004, 0.02, (n, 3))).astype(np.float32)
        ),
        quats=jnp.asarray(quats),
    )
    scene = GaussianScene.create(params, max_sh_degree=3, active_sh_degree=3)
    cam = lookat_camera(
        np.array([0.0, 0.0, -4.0]), np.zeros(3), np.array([0.0, 1.0, 0.0]),
        0.8, 0.8, hw, hw,
    )

    # instance budget sized to the scene (num_rendered = 329,514 with the
    # round-4 exact per-axis rect tightening; CUDA sizes its buffers to
    # exactly num_rendered after a probe pass — rasterizer_impl.cu:236-244;
    # our host overflow policy re-renders at doubled budget if a scene
    # outgrows it, see ops/render.py:render_safe)
    kwargs = dict(max_instances=352_256)  # impl auto: Pallas on TPU

    def loss(p):
        out = render(scene.replace(params=p), cam, jnp.zeros(3), **kwargs)
        return jnp.sum(out.color) + jnp.sum(out.depth)

    n_iter = 20

    # batch the iterations inside one jitted program: the single-chip
    # tunnel has ~70 ms per-dispatch overhead that would otherwise
    # dominate the measurement
    # perturb xyz (not opacity): every real training step moves the
    # geometry, so the binning/sort must re-run per iteration — an
    # opacity-only perturbation lets XLA hoist the geometry-dependent
    # sort out of the loop and flatters the measurement
    @jax.jit
    def bench_loop(params):
        def body(i, acc):
            g = jax.grad(loss)(
                params.replace(xyz=params.xyz * (1.0 + i * 1e-9))
            )
            return acc + jnp.sum(g.xyz)
        return jax.lax.fori_loop(0, n_iter, body, 0.0)

    jax.block_until_ready(bench_loop(scene.params))  # compile + warm
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.block_until_ready(bench_loop(scene.params))
        times.append((time.perf_counter() - t0) / n_iter)
    dt = statistics.median(times)

    mpix_s = hw * hw / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "fwd+bwd rasterizer throughput (512^2, 100k gaussians)",
                "value": round(mpix_s, 3),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
