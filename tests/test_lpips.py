"""LPIPS-in-JAX parity tests.

The zero-egress image has no torchvision/LPIPS checkpoints, so parity is
established structurally: an independent plain-torch VGG16+LPIPS
implementation (built from torch.nn primitives, sharing no code with
the JAX port) is evaluated with the SAME random weights and must agree.
Production converts the official checkpoints via
`lpips_jax.convert_torch_vgg16` once.
"""

import numpy as np
import pytest

from gaussianeditor_tpu.train import lpips_jax


def _torch_lpips(weights, pred, target):
    """Independent torch evaluation of the same LPIPS definition."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(img):
        x = torch.from_numpy(np.asarray(img, np.float32)).permute(2, 0, 1)[None]
        x = (2 * x - 1 - shift) / scale
        taps = []
        plan = [(64, False), (64, False), (128, True), (128, False),
                (256, True), (256, False), (256, False), (512, True),
                (512, False), (512, False), (512, True), (512, False),
                (512, False)]
        for i, (_, pool) in enumerate(plan):
            if pool:
                x = F.max_pool2d(x, 2)
            w = torch.from_numpy(weights[f"conv{i}_w"]).permute(3, 2, 0, 1)
            b = torch.from_numpy(weights[f"conv{i}_b"])
            x = F.relu(F.conv2d(x, w, b, padding=1))
            if i in (1, 3, 6, 9, 12):
                taps.append(x)
        return taps

    fa, fb = feats(pred), feats(target)
    total = 0.0
    for j, (a, b) in enumerate(zip(fa, fb)):
        na = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
        nb = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
        d = (na - nb) ** 2
        head = torch.from_numpy(weights[f"lin{j}_w"]).clamp_min(0)
        total += float((d * head.view(1, -1, 1, 1)).sum(1).mean())
    return total


@pytest.fixture(scope="module")
def weights():
    return lpips_jax.random_weights(seed=3)


def test_lpips_matches_independent_torch_impl(weights):
    rng = np.random.RandomState(0)
    a = rng.rand(64, 64, 3).astype(np.float32)
    b = np.clip(a + rng.randn(64, 64, 3).astype(np.float32) * 0.1, 0, 1)
    ours = float(lpips_jax.lpips(weights, a, b))
    theirs = _torch_lpips(weights, a, b)
    assert ours == pytest.approx(theirs, rel=2e-3)


def test_lpips_zero_for_identical_and_positive_otherwise(weights):
    rng = np.random.RandomState(1)
    a = rng.rand(32, 32, 3).astype(np.float32)
    assert float(lpips_jax.lpips(weights, a, a)) == pytest.approx(0.0, abs=1e-6)
    b = np.clip(a + 0.2, 0, 1)
    assert float(lpips_jax.lpips(weights, a, b)) > 1e-4


def test_lpips_is_differentiable(weights):
    import jax

    rng = np.random.RandomState(2)
    a = rng.rand(32, 32, 3).astype(np.float32)
    b = rng.rand(32, 32, 3).astype(np.float32)
    g = jax.grad(lambda x: lpips_jax.lpips(weights, x, b))(a)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(np.abs(np.asarray(g)).max()) > 0


def test_convert_torch_vgg16_roundtrip(weights):
    """convert_torch_vgg16 on a torch module built from our random weights
    reproduces them (the production checkpoint conversion path)."""
    import torch.nn as nn
    import torch

    layers = []
    cin = 3
    plan = [(64, False), (64, False), (128, True), (128, False),
            (256, True), (256, False), (256, False), (512, True),
            (512, False), (512, False), (512, True), (512, False),
            (512, False)]
    for i, (cout, pool) in enumerate(plan):
        if pool:
            layers.append(nn.MaxPool2d(2))
        conv = nn.Conv2d(cin, cout, 3, padding=1)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(
                weights[f"conv{i}_w"]).permute(3, 2, 0, 1))
            conv.bias.copy_(torch.from_numpy(weights[f"conv{i}_b"]))
        layers.append(conv)
        layers.append(nn.ReLU())
        cin = cout
    module = nn.Sequential(*layers)
    heads = [weights[f"lin{j}_w"].reshape(1, -1, 1, 1) for j in range(5)]
    out = lpips_jax.convert_torch_vgg16(module, heads)
    for i in range(13):
        np.testing.assert_allclose(out[f"conv{i}_w"], weights[f"conv{i}_w"],
                                   rtol=1e-6)
    for j in range(5):
        np.testing.assert_allclose(out[f"lin{j}_w"], weights[f"lin{j}_w"])


def test_weights_file_roundtrip(tmp_path, weights):
    p = str(tmp_path / "lpips.npz")
    lpips_jax.save_weights(p, weights)
    loaded = lpips_jax.load_weights(p)
    assert set(loaded) == set(weights)
    found = lpips_jax.find_weights(p)
    assert found is not None


def test_make_perceptual_defaults_to_proxy_without_weights(monkeypatch):
    monkeypatch.delenv(lpips_jax.DEFAULT_WEIGHTS_ENV, raising=False)
    with pytest.warns(UserWarning, match="multiscale-gradient proxy"):
        fn = lpips_jax.make_perceptual("/nonexistent/path.npz")
    from gaussianeditor_tpu.train.perceptual import multiscale_gradient_loss

    assert fn is multiscale_gradient_loss


def test_make_perceptual_uses_lpips_with_weights(tmp_path, weights):
    p = str(tmp_path / "lpips.npz")
    lpips_jax.save_weights(p, weights)
    fn = lpips_jax.make_perceptual(p)
    rng = np.random.RandomState(4)
    a = rng.rand(32, 32, 3).astype(np.float32)
    b = rng.rand(32, 32, 3).astype(np.float32)
    expected = float(lpips_jax.lpips({k: np.asarray(v) for k, v in
                                      lpips_jax.load_weights(p).items()},
                                     a, b))
    assert float(fn(a, b)) == pytest.approx(expected, rel=1e-5)
