"""CLI launcher.

Parity target: the reference `launch.py:43-250` —
`python -m gaussianeditor_tpu.apps.launch --config cfg.yaml --train
[key.path=value ...]` with modes --train / --test / --export, trial-dir
layout, config snapshotting and metric logging (CSV JSON-lines).

Config schema (YAML):
    mode: edit | del | add | recon
    gs_source: scene.ply            # or points from colmap for recon
    colmap_dir: dataset/            # COLMAP workspace with sparse/0
    height: 512
    width: 512
    capacity_multiplier: 4          # param capacity = multiplier * N
    guidance: fake | ip2p | controlnet-p2p
    segmentor: fake | langsam
    output_dir: outputs/<name>
    system: {EditConfig / DelConfig / AddConfig / ReconConfig fields}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from gaussianeditor_tpu.config.config import load_config, parse_structured


def build_guidance(name: str, cfg: dict):
    if name == "fake":
        from gaussianeditor_tpu.guidance.fake import FakeGuidance

        return FakeGuidance()
    if name == "ip2p":
        from gaussianeditor_tpu.guidance.diffusers_adapters import (
            InstructPix2PixGuidance,
        )

        return InstructPix2PixGuidance(**cfg.get("guidance_kwargs", {}))
    if name.startswith("controlnet"):
        from gaussianeditor_tpu.guidance.diffusers_adapters import (
            ControlNetGuidance,
        )

        control_type = name.split("-", 1)[1] if "-" in name else "p2p"
        return ControlNetGuidance(control_type=control_type,
                                  **cfg.get("guidance_kwargs", {}))
    raise ValueError(f"unknown guidance '{name}'")


def build_segmentor(name: str):
    if name == "fake":
        from gaussianeditor_tpu.guidance.fake import FakeSegmentor

        return FakeSegmentor()
    if name == "langsam":
        from gaussianeditor_tpu.guidance.diffusers_adapters import (
            LangSAMSegmentor,
        )

        return LangSAMSegmentor()
    raise ValueError(f"unknown segmentor '{name}'")


def build_inpainter(name: str):
    if name == "fake":
        from gaussianeditor_tpu.guidance.fake import FakeInpainter

        return FakeInpainter()
    if name == "controlnet":
        from gaussianeditor_tpu.guidance.diffusers_adapters import (
            ControlNetInpainter,
        )

        return ControlNetInpainter()
    if name == "sdxl":
        from gaussianeditor_tpu.guidance.diffusers_adapters import SDXLInpainter

        return SDXLInpainter()
    raise ValueError(f"unknown inpainter '{name}'")


def _snapshot_code(trial_dir: str) -> None:
    """Zip the tracked source into <trial>/code.zip — the reference's
    CodeSnapshotCallback (threestudio/utils/callbacks.py:59-80) writes a
    git-ls-files copy; we archive the installed package sources, which
    also works outside a git checkout."""
    import zipfile

    try:
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = os.path.join(trial_dir, "code.zip")
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
            for root, _, files in os.walk(pkg_root):
                for fn in files:
                    if fn.endswith(".py"):
                        p = os.path.join(root, fn)
                        z.write(p, os.path.relpath(p, pkg_root))
    except Exception as e:  # snapshot is best-effort provenance
        import warnings

        warnings.warn(f"code snapshot failed: {e}")


class ProgressWriter:
    """File-based progress reporting (the reference's ProgressCallback
    for gradio, utils/callbacks.py:118-156): writes `step/total pct%` to
    <trial>/progress every `interval` steps."""

    def __init__(self, trial_dir: str, total: int, interval: int = 10):
        self.path = os.path.join(trial_dir, "progress")
        self.total = max(int(total), 1)
        self.interval = max(int(interval), 1)

    def __call__(self, step: int, metrics: dict) -> None:
        if step % self.interval == 0 or step + 1 == self.total:
            with open(self.path, "w") as f:
                f.write(f"{step}/{self.total} "
                        f"{100.0 * step / self.total:.1f}%\n")


class MetricsLogger:
    """CSV-style JSON-lines logger (the reference's CSVLogger role)."""

    def __init__(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        self.f = open(os.path.join(out_dir, "metrics.jsonl"), "a")

    def __call__(self, step: int, metrics: dict) -> None:
        row = {"step": step}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                pass
        self.f.write(json.dumps(row) + "\n")
        self.f.flush()


class TensorBoardLogger:
    """TensorBoard scalar logger behind the same callback interface —
    the reference's TensorboardLogger slot (launch.py:110-169, enabled
    per trial dir). Degrades to a no-op with a warning if tensorboard
    is unavailable in the environment."""

    def __init__(self, out_dir: str):
        self.writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(os.path.join(out_dir, "tb"))
        except Exception as e:  # logging must never kill training
            import warnings

            warnings.warn(f"tensorboard unavailable ({e}); TB logging off")

    def __call__(self, step: int, metrics: dict) -> None:
        if self.writer is None:
            return
        for k, v in metrics.items():
            try:
                self.writer.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def close(self) -> None:
        if self.writer is not None:
            self.writer.flush()
            self.writer.close()


def _load_posed_images(img_dir: str, scene_cams) -> list:
    """Load the COLMAP-registered training images at each camera's
    (possibly aspect-refit) resolution — the reference's
    `scene/dataset_readers.py` PIL load + resize flow."""
    import imageio.v2 as imageio
    from PIL import Image

    images = []
    for cam, name in zip(scene_cams.cameras, scene_cams.image_names):
        path = os.path.join(img_dir, name)
        if not os.path.exists(path):
            stem = os.path.splitext(name)[0]
            for ext in (".png", ".jpg", ".jpeg", ".JPG", ".PNG"):
                if os.path.exists(os.path.join(img_dir, stem + ext)):
                    path = os.path.join(img_dir, stem + ext)
                    break
            else:
                raise FileNotFoundError(
                    f"training image {name} not found under {img_dir}")
        im = np.asarray(imageio.imread(path))
        if im.dtype != np.uint8:
            im = np.clip(im, 0, 255).astype(np.uint8)
        if im.ndim == 2:
            im = np.repeat(im[..., None], 3, axis=-1)
        im = im[..., :3]
        if im.shape[:2] != (cam.height, cam.width):
            im = np.asarray(Image.fromarray(im).resize(
                (cam.width, cam.height), Image.BILINEAR))
        images.append(im.astype(np.float32) / 255.0)
    return images


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--validate", action="store_true",
                        help="save validation image grids + metrics JSON")
    parser.add_argument("--test", action="store_true",
                        help="render a turntable video of the result")
    parser.add_argument("--export", action="store_true",
                        help="save the resulting scene as PLY")
    parser.add_argument("--resume", default="",
                        help="TrainState .npz to resume training from "
                             "(reference cfg.resume, launch.py:193)")
    parser.add_argument("--gradio", action="store_true",
                        help="headless-frontend mode (reference launch.py "
                             "--gradio, :92-245): logs to <trial>/logs, "
                             "progress to <trial>/progress, and assets "
                             "are exported after training")
    parser.add_argument("overrides", nargs="*", help="key.path=value")
    args = parser.parse_args(argv)

    cfg = load_config(args.config, args.overrides)
    mode = cfg.get("mode", "edit")
    out_dir = cfg.get("output_dir", "outputs/trial")
    trial_dir = os.path.join(out_dir, time.strftime("%Y%m%d-%H%M%S"))
    os.makedirs(trial_dir, exist_ok=True)
    if args.gradio:
        # a frontend polls <trial>/progress and tails <trial>/logs; the
        # trained scene must always be exported for the frontend to pick
        # up (reference launch.py:123-126 file logging, :195-197
        # train-then-predict)
        import logging

        fh = logging.FileHandler(os.path.join(trial_dir, "logs"))
        fh.setLevel(logging.INFO)
        logging.getLogger().addHandler(fh)
        args.export = args.export or args.train
    # config snapshot (ConfigSnapshotCallback parity)
    with open(os.path.join(trial_dir, "parsed.yaml"), "w") as f:
        import yaml

        yaml.safe_dump(cfg, f)
    # provenance: cmd.txt + code snapshot (launch.py:170-175 cmd dump,
    # CodeSnapshotCallback git-ls-files snapshot, utils/callbacks.py:59-80)
    with open(os.path.join(trial_dir, "cmd.txt"), "w") as f:
        f.write(" ".join(sys.argv) + "\n")
    _snapshot_code(trial_dir)

    from gaussianeditor_tpu.data.camera_scene import CamScene
    from gaussianeditor_tpu.models.gaussians import GaussianScene
    from gaussianeditor_tpu.models.ply import load_ply, ply_vertex_count, save_ply

    # height/width may be LISTS with resolution_milestones (the
    # reference's data block, gs_load.py:174-208): cameras are built at
    # the first size; the edit system steps through the schedule
    hs, ws = cfg.get("height", 512), cfg.get("width", 512)
    h_list = hs if isinstance(hs, (list, tuple)) else [hs]
    w_list = ws if isinstance(ws, (list, tuple)) else [ws]
    h, w = int(h_list[0]), int(w_list[0])
    scene_cams = CamScene(cfg["colmap_dir"], h=h, w=w)
    cap_mult = float(cfg.get("capacity_multiplier", 4))

    if cfg.get("gs_source"):
        n_pts = ply_vertex_count(cfg["gs_source"])
        scene = load_ply(cfg["gs_source"], capacity=int(n_pts * cap_mult))
    else:
        xyz, rgb = scene_cams.load_points()
        scene = GaussianScene.from_points(
            xyz, rgb, max_sh_degree=int(cfg.get("sh_degree", 3)),
            capacity=int(len(xyz) * cap_mult),
        )

    logger = MetricsLogger(trial_dir)
    sys_cfg = dict(cfg.get("system", {}))
    sys_cfg.setdefault("cameras_extent", scene_cams.cameras_extent)
    if len(h_list) > 1 and mode == "edit":
        # route the reference-style data schedule into the edit system
        sys_cfg.setdefault("heights", [int(x) for x in h_list])
        sys_cfg.setdefault("widths", [int(x) for x in w_list])
        sys_cfg.setdefault("resolution_milestones",
                           list(cfg.get("resolution_milestones", [])))
        if isinstance(sys_cfg.get("batch_size"), (list, tuple)):
            bs_list = list(sys_cfg["batch_size"])
            sys_cfg["batch_size"] = int(bs_list[0])
            sys_cfg.setdefault("batch_sizes", [int(x) for x in bs_list])

    system = None
    if mode == "edit":
        from gaussianeditor_tpu.edit.edit_system import EditConfig, EditSystem

        system = EditSystem(
            scene, scene_cams.cameras, parse_structured(EditConfig, sys_cfg),
            guidance=build_guidance(cfg.get("guidance", "fake"), cfg),
            segmentor=build_segmentor(cfg.get("segmentor", "fake"))
            if sys_cfg.get("seg_prompt") else None,
        )
    elif mode == "del":
        from gaussianeditor_tpu.edit.del_system import DelConfig, DelSystem

        system = DelSystem(
            scene, scene_cams.cameras, parse_structured(DelConfig, sys_cfg),
            inpainter=build_inpainter(cfg.get("inpainter", "fake")),
            segmentor=build_segmentor(cfg.get("segmentor", "fake")),
        )
    elif mode == "add":
        from gaussianeditor_tpu.edit.add_system import AddConfig, AddSystem
        from gaussianeditor_tpu.guidance.fake import FakeObjectGenerator

        if cfg.get("wonder3d_root"):
            # real Wonder3D checkout: the three-stage subprocess pipeline
            # (GassuianEditorAdd.py:121-157)
            from gaussianeditor_tpu.edit.wonder3d_adapter import (
                Wonder3DGenerator,
            )

            generator = Wonder3DGenerator(
                wonder3d_root=cfg["wonder3d_root"],
                cache_dir=os.path.join(trial_dir, "add_cache"),
                refine_prompt=str(cfg.get("refine_prompt", "")),
            )
        else:
            generator = FakeObjectGenerator()
        depth_est = None
        if cfg.get("dpt", False):
            from gaussianeditor_tpu.edit.dpt_adapter import DPTDepthEstimator

            depth_est = DPTDepthEstimator(
                pretrained=cfg.get("dpt_checkpoint", "Intel/dpt-hybrid-midas")
            )

        system = AddSystem(
            scene, scene_cams.cameras, parse_structured(AddConfig, sys_cfg),
            inpainter=build_inpainter(cfg.get("inpainter", "fake")),
            object_generator=generator,
            depth_estimator=depth_est,
        )
        merged = system.run()
        save_ply(merged, os.path.join(trial_dir, "merged.ply"))
    elif mode == "recon":
        # vanilla 3DGS reconstruction from a COLMAP workspace + posed
        # images (the reference's gaussiansplatting/train.py flow:
        # SfM point init + per-view photometric fit)
        from gaussianeditor_tpu.train.recon import ReconConfig, ReconTrainer

        images = _load_posed_images(
            os.path.join(cfg["colmap_dir"],
                         cfg.get("images_subdir", "images")),
            scene_cams,
        )
        system = ReconTrainer(
            scene, scene_cams.cameras, images,
            parse_structured(ReconConfig, sys_cfg),
        )
    else:
        raise ValueError(f"unknown mode '{mode}'")

    if args.train and mode in ("edit", "del"):
        if not system.cfg.checkpoint_dir:
            system.cfg.checkpoint_dir = os.path.join(trial_dir, "ckpts")
        if args.resume:
            system.resume(args.resume)
        progress = ProgressWriter(trial_dir, system.cfg.max_steps)
        tb = (TensorBoardLogger(trial_dir)
              if cfg.get("tensorboard", False) else None)

        def _cb(step, metrics):
            logger(step, metrics)
            progress(step, metrics)
            if tb is not None:
                tb(step, metrics)

        remaining = system.cfg.max_steps - (
            int(system.state.step) if system.state is not None else 0)
        system.fit(n_steps=max(remaining, 0), callback=_cb)
        if tb is not None:
            tb.close()
    elif args.train and mode == "add" and system.cfg.refine_steps > 0:
        from gaussianeditor_tpu.guidance.fake import FakeGuidance

        system.guidance = FakeGuidance()
        system.fit(n_steps=system.cfg.refine_steps, callback=logger)
    elif args.train and mode == "recon":
        progress = ProgressWriter(trial_dir, system.cfg.max_steps)

        def _rcb(step, metrics):
            logger(step, metrics)
            progress(step, metrics)

        system.fit(callback=_rcb)

    final_scene = system.scene if system is not None else scene

    if args.validate and mode in ("edit", "del"):
        # validation grids (origin | target | render) over linspaced val
        # views + a metrics JSON — GassuianEditor.validation_step
        # (GassuianEditor.py:283-345) + metrics.py parity
        import jax

        from gaussianeditor_tpu.data.view_dataset import select_val_views
        from gaussianeditor_tpu.train.metrics import compute_image_metrics
        from gaussianeditor_tpu.utils.saving import save_image_grid

        if system.state is None:
            system.on_fit_start()
        val_dir = os.path.join(trial_dir, "validation")
        os.makedirs(val_dir, exist_ok=True)
        val_views = select_val_views(
            system.sampler.views, int(cfg.get("n_val_views", 8))
        )
        preds, targets = [], []
        for vid in val_views:
            system._refresh_targets([vid], int(system.state.step))
            rendered = np.asarray(
                system._render_cache(system.state.scene, system.cameras[vid])
            )
            origin = system.origin_frames[vid]
            target = system.edit_frames.get(vid, origin)
            preds.append(rendered)
            targets.append(target)
            save_image_grid(
                os.path.join(val_dir, f"val_{vid:03d}.png"),
                [origin, target, rendered],
            )
        metrics_out = compute_image_metrics(preds, targets)
        if system.cfg.clip_prompt_origin and system.cfg.clip_prompt_target:
            try:
                metrics_out.update(system.compute_clip())
            except Exception as e:  # CLIP weights absent (zero egress)
                metrics_out["clip_error"] = str(e)
        with open(os.path.join(val_dir, "metrics.json"), "w") as f:
            json.dump(metrics_out, f, indent=2)
        print(f"validation metrics: {metrics_out}")

    if args.export or args.train:
        save_ply(final_scene, os.path.join(trial_dir, "last.ply"))
        print(f"saved {os.path.join(trial_dir, 'last.ply')}")

    if args.test:
        import jax
        import jax.numpy as jnp

        from gaussianeditor_tpu.core.cameras import orbit_cameras
        from gaussianeditor_tpu.ops.render import render
        from gaussianeditor_tpu.utils.saving import save_video

        center = np.asarray(final_scene.params.xyz)[
            np.asarray(final_scene.alive)
        ].mean(axis=0)
        cams = orbit_cameras(
            int(cfg.get("test_views", 60)),
            radius=scene_cams.cameras_extent,
            fovx=0.8, fovy=0.8, height=h, width=w, center=center,
        )
        rfn = jax.jit(lambda s, c: render(s, c, jnp.zeros(3)).color)
        frames = [np.asarray(rfn(final_scene, c)) for c in cams]
        written = save_video(os.path.join(trial_dir, "turntable.mp4"), frames)
        print(f"saved {written}")


if __name__ == "__main__":
    main()
