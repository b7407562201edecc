"""End-to-end flagship edit run on the real chip — the repo's analog of
the reference's "2-7 minutes per edit" claim (readme.md:43).

Canonical CLI-script configuration (script/edit_n2n_face_Ein.sh +
configs/edit-n2n.yaml): 512x512, 96 training views, 2000 steps, densify
interval 100, batch 2, full objective (L1 + perceptual + anchors),
FakeGuidance standing in for the host-side diffusion (the reference's
own docs name diffusion the dominant cost and it is excluded from the
anchor on both sides; async_guidance overlaps it here anyway).

Writes <out>/e2e_edit.json (wall-clock minutes, steps/s, overflow
count), final PLY, and a 60-frame turntable mp4.

    PYTHONPATH=/root/.axon_site:/root/repo python bench/e2e_edit.py \
        --out trials/e2e_r04 [--steps 2000] [--views 96]
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="trials/e2e_r04")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--views", type=int, default=96)
    ap.add_argument("--gaussians", type=int, default=100_000)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from gaussianeditor_tpu.core.cameras import lookat_camera, orbit_cameras
    from gaussianeditor_tpu.edit.edit_system import EditConfig, EditSystem
    from gaussianeditor_tpu.guidance.fake import FakeGuidance
    from gaussianeditor_tpu.models.gaussians import GaussianParams, GaussianScene
    from gaussianeditor_tpu.models.ply import save_ply
    from gaussianeditor_tpu.ops.render import render
    from gaussianeditor_tpu.utils.saving import save_video

    n = args.gaussians
    rng = np.random.RandomState(0)
    quats = rng.randn(n, 4).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    # densification headroom: capacity 2x the live count (fixed-capacity
    # model: dead slots padded with identity quats, masked by `alive`)
    cap = 2 * n

    def pad(x):
        padded = np.zeros((cap,) + x.shape[1:], x.dtype)
        padded[:n] = x
        return jnp.asarray(padded)

    quats_padded = np.zeros((cap, 4), np.float32)
    quats_padded[:, 0] = 1.0
    quats_padded[:n] = quats
    params = GaussianParams(
        xyz=pad(rng.uniform(-1, 1, (n, 3)).astype(np.float32)),
        features_dc=pad(rng.randn(n, 1, 3).astype(np.float32) * 0.3),
        features_rest=pad(np.zeros((n, 15, 3), np.float32)),
        opacity_raw=pad(rng.uniform(-1, 1, (n, 1)).astype(np.float32)),
        log_scales=pad(
            np.log(rng.uniform(0.004, 0.02, (n, 3))).astype(np.float32)),
        quats=jnp.asarray(quats_padded),
    )
    alive = np.zeros((cap,), bool)
    alive[:n] = True
    scene = GaussianScene.create(params, max_sh_degree=3, active_sh_degree=3,
                                 alive=alive)
    cams = orbit_cameras(args.views, 4.0, 0.8, 0.8, 512, 512)

    cfg = EditConfig(
        prompt="make it golden",
        batch_size=2,
        max_steps=args.steps,
        per_editing_step=10,
        edit_until_step=args.steps // 2,
        densify_until_step=int(args.steps * 0.65),
        densification_interval=100,
        cameras_extent=2.0,
        max_instances=786_432,  # densification grows footprints
        async_guidance=True,
        # amortize the relay's ~70 ms/dispatch: 10 steps per device
        # program (= per_editing_step, so refresh cadence is unchanged)
        dispatch_burst=10,
    )
    system = EditSystem(scene, cams, cfg, guidance=FakeGuidance())

    overflow_steps = 0
    losses = []
    marks = []  # (step, seconds since fit start) every 100 steps

    def cb(step, metrics):
        nonlocal overflow_steps
        if bool(metrics.get("overflow", False)):
            overflow_steps += 1
        if step % 100 == 0:
            marks.append((int(step), round(time.perf_counter() - t0, 2)))
        if step % 200 == 0:
            losses.append((int(step), float(metrics["loss"])))
            print(f"step {step}: loss {float(metrics['loss']):.4f}",
                  flush=True)

    t0 = time.perf_counter()
    system.fit(callback=cb)
    wall_s = time.perf_counter() - t0

    # artifacts
    ply_path = os.path.join(args.out, "edited.ply")
    save_ply(system.scene, ply_path)

    frames = []
    rfn = jax.jit(lambda s, c: jnp.clip(render(
        s, c, jnp.zeros(3), max_instances=cfg.max_instances).color, 0, 1))
    for k in range(60):
        th = 2 * np.pi * k / 60
        cam = lookat_camera(
            4.0 * np.array([np.cos(th), 0.15, np.sin(th)]), np.zeros(3),
            np.array([0.0, 1.0, 0.0]), 0.8, 0.8, 512, 512)
        frames.append(np.asarray(rfn(system.scene, cam)))
    mp4 = save_video(os.path.join(args.out, "turntable.mp4"),
                     [(f * 255).astype(np.uint8) for f in frames], fps=20)

    # warm rate: steps/s over the last 3/4 of training (excludes the
    # one-time jit compiles that dominate the first bursts)
    warm = [m for m in marks if m[0] >= args.steps // 4]
    warm_rate = (round((warm[-1][0] - warm[0][0])
                       / (warm[-1][1] - warm[0][1]), 2)
                 if len(warm) >= 2 and warm[-1][1] > warm[0][1] else None)
    result = {
        "metric": "end-to-end edit wall-clock (2000 steps, 512^2, 96 views, "
                  "batch 2, densify interval 100, full objective)",
        "wall_minutes": round(wall_s / 60, 2),
        "steps_per_s": round(args.steps / wall_s, 2),
        "warm_steps_per_s": warm_rate,
        "warm_minutes_2000_steps": (round(args.steps / warm_rate / 60, 2)
                                    if warm_rate else None),
        "timeline": marks[:: max(1, len(marks) // 20)],
        "overflow_steps": overflow_steps,
        "n_alive_final": int(system.scene.n_alive),
        "losses": losses,
        "reference_claim": "2-7 min per edit on RTX 3090 (readme.md:43), "
                           "diffusion excluded on both sides",
        "artifacts": {"ply": ply_path, "mp4": mp4},
    }
    with open(os.path.join(args.out, "e2e_edit.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
