"""CLIP similarity metrics for edit evaluation.

Parity with `threestudio/utils/clip_metrics.py:7-45` (`ClipSimilarity`:
image/text cosine + directional similarity) and `compute_clip`
(GassuianEditorEdit.py:156-173) — the paper's quantitative metric.

Real CLIP requires downloadable weights (unavailable here, zero egress);
`TorchClipSimilarity` gates on availability and `compute_clip_directional`
takes any embedder matching the protocol so tests can use a fake.
"""

from __future__ import annotations

from typing import Protocol, Sequence, runtime_checkable

import numpy as np


@runtime_checkable
class ClipEmbedder(Protocol):
    def embed_image(self, image: np.ndarray) -> np.ndarray: ...
    def embed_text(self, text: str) -> np.ndarray: ...


def _norm(v: np.ndarray) -> np.ndarray:
    return v / (np.linalg.norm(v) + 1e-10)


def compute_clip_directional(
    embedder: ClipEmbedder,
    origin_images: Sequence[np.ndarray],
    edited_images: Sequence[np.ndarray],
    origin_text: str,
    edited_text: str,
) -> dict:
    """Directional similarity: cos(delta_image, delta_text) averaged over
    views + plain image/target-text similarity (clip_metrics.py:25-45)."""
    dt = _norm(embedder.embed_text(edited_text)
               - embedder.embed_text(origin_text))
    sims, dir_sims = [], []
    for o, e in zip(origin_images, edited_images):
        eo = _norm(embedder.embed_image(o))
        ee = _norm(embedder.embed_image(e))
        di = _norm(ee - eo)
        dir_sims.append(float(np.dot(di, dt)))
        sims.append(float(np.dot(ee, _norm(embedder.embed_text(edited_text)))))
    return {
        "clip_similarity": float(np.mean(sims)),
        "clip_directional": float(np.mean(dir_sims)),
    }


class TorchClipSimilarity:
    """openai/CLIP ViT-B/32 embedder (requires downloaded weights)."""

    def __init__(self, device: str = "cpu"):
        try:
            import clip  # noqa
            import torch
        except ImportError as e:
            raise ImportError(
                "openai-clip is unavailable; pass a custom ClipEmbedder"
            ) from e
        self.torch = torch
        self.model, self.preprocess = clip.load("ViT-B/32", device=device)
        self.device = device

    def embed_image(self, image: np.ndarray) -> np.ndarray:
        import PIL.Image

        torch = self.torch
        im = PIL.Image.fromarray(
            (np.clip(image, 0, 1) * 255).astype(np.uint8)
        )
        with torch.no_grad():
            x = self.preprocess(im)[None].to(self.device)
            return self.model.encode_image(x)[0].float().cpu().numpy()

    def embed_text(self, text: str) -> np.ndarray:
        import clip

        torch = self.torch
        with torch.no_grad():
            t = clip.tokenize([text]).to(self.device)
            return self.model.encode_text(t)[0].float().cpu().numpy()
