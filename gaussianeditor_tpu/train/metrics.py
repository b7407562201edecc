"""Quantitative evaluation: PSNR / SSIM / LPIPS over image sets.

Parity target: `gaussiansplatting/metrics.py` (per-image PSNR/SSIM/LPIPS
averaged over a renders/ vs gt/ directory pair) and the CLIP
directional eval the Edit system runs (`GassuianEditorEdit.py:156-173`).

LPIPS uses the pure-JAX port (train/lpips_jax.py) when converted
weights exist; otherwise the metric is reported as None rather than
silently substituting a different distance."""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gaussianeditor_tpu.train.losses import psnr, ssim


def _metric_fns(lpips_weights_path: Optional[str] = None):
    from gaussianeditor_tpu.train.lpips_jax import find_weights, lpips

    w = find_weights(lpips_weights_path)
    fns = {
        "psnr": jax.jit(psnr),
        "ssim": jax.jit(ssim),
    }
    if w is not None:
        fns["lpips"] = jax.jit(lambda a, b: lpips(w, a, b))
    return fns


def compute_image_metrics(
    preds: Sequence[np.ndarray],
    gts: Sequence[np.ndarray],
    lpips_weights_path: Optional[str] = None,
) -> Dict[str, Optional[float]]:
    """Mean PSNR/SSIM(/LPIPS) over image pairs (metrics.py:40-57)."""
    assert len(preds) == len(gts) and len(preds) > 0
    fns = _metric_fns(lpips_weights_path)
    sums = {k: 0.0 for k in fns}
    for p, g in zip(preds, gts):
        pa = jnp.asarray(np.asarray(p, np.float32))
        ga = jnp.asarray(np.asarray(g, np.float32))
        for k, f in fns.items():
            sums[k] += float(f(pa, ga))
    out: Dict[str, Optional[float]] = {
        k: v / len(preds) for k, v in sums.items()
    }
    if "lpips" not in out:
        out["lpips"] = None
    return out


def _load_image(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path), np.float32) / 255.0
    return img[..., :3]


def evaluate_dirs(renders_dir: str, gt_dir: str,
                  lpips_weights_path: Optional[str] = None) -> Dict:
    """Directory-pair evaluation matching the reference's
    renders/ vs gt/ layout (metrics.py:23-38): files paired by sorted
    name."""
    names = sorted(
        f for f in os.listdir(renders_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if not names:
        raise ValueError(f"no images in {renders_dir}")
    preds, gts = [], []
    for n in names:
        gt_path = os.path.join(gt_dir, n)
        if not os.path.exists(gt_path):
            raise FileNotFoundError(f"missing ground truth for {n}")
        preds.append(_load_image(os.path.join(renders_dir, n)))
        gts.append(_load_image(gt_path))
    result = compute_image_metrics(preds, gts, lpips_weights_path)
    result["n_images"] = len(names)
    return result


def main(argv=None) -> None:
    """CLI: `gsedit-metrics <renders_dir> <gt_dir> [--out metrics.json]`
    (the full_eval.py/metrics.py role)."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("renders_dir")
    p.add_argument("gt_dir")
    p.add_argument("--out", default=None)
    p.add_argument("--lpips_weights", default=None)
    args = p.parse_args(argv)
    result = evaluate_dirs(args.renders_dir, args.gt_dir,
                           args.lpips_weights)
    line = json.dumps(result, indent=2)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
