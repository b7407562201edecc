"""Latent/CFG plumbing of the real-checkpoint guidance adapters,
exercised with a mock diffusers pipe (VERDICT round-1 weak #6: without
this, a shape/wiring bug in `guidance/diffusers_adapters.py` would only
surface in production where checkpoints exist).

The mock reproduces the diffusers surface the adapters touch — VAE
encode/decode (8x spatial, 4 latent channels), a real DDIM-style
scheduler on a cosine alphas_cumprod, `_encode_prompt` returning the
3-way [text; image; uncond] embedding batch, and a deterministic UNet
that ASSERTS the ip2p input contract (batch 3, 8 = 4 latent + 4
image-cond channels, zero image-cond on the unconditional row)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gaussianeditor_tpu.guidance.diffusers_adapters import (  # noqa: E402
    ControlNetGuidance,
    ControlNetInpainter,
    InstructPix2PixGuidance,
)

H = W = 64
LC, LH, LW = 4, H // 8, W // 8


class _Cfg:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class _Dist:
    def __init__(self, z):
        self.z = z

    def sample(self):
        return self.z

    def mode(self):
        return self.z


class _Out:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class MockVAE:
    dtype = torch.float32
    config = _Cfg(scaling_factor=0.18215)

    def encode(self, x):
        # deterministic 8x8 average-pool "encoder" -> 4 channels
        b = x.shape[0]
        pooled = torch.nn.functional.avg_pool2d(x, 8)      # [b,3,8,8]
        z = torch.cat([pooled, pooled.mean(1, keepdim=True)], dim=1)
        return _Out(latent_dist=_Dist(z))

    def decode(self, z):
        rgb = z[:, :3]
        up = torch.nn.functional.interpolate(rgb, scale_factor=8)
        return _Out(sample=up)


class MockScheduler:
    def __init__(self, num_train=1000):
        self.config = _Cfg(num_train_timesteps=num_train)
        t = torch.linspace(0, 1, num_train)
        self.alphas_cumprod = torch.cos(t * 1.5) ** 2
        self.timesteps = None

    def set_timesteps(self, n):
        nt = self.config.num_train_timesteps
        self.timesteps = torch.linspace(nt - 1, 0, n).long()

    def add_noise(self, latents, noise, t):
        a = self.alphas_cumprod[t.long()].view(-1, 1, 1, 1)
        return a.sqrt() * latents + (1 - a).sqrt() * noise

    def step(self, noise_pred, t, latents):
        a = self.alphas_cumprod[int(t)]
        x0 = (latents - (1 - a).sqrt() * noise_pred) / a.sqrt()
        idx = (self.timesteps == t).nonzero()[0, 0]
        prev = (self.timesteps[idx + 1] if idx + 1 < len(self.timesteps)
                else torch.tensor(0))
        ap = self.alphas_cumprod[int(prev)] if int(prev) > 0 else torch.tensor(1.0)
        return _Out(prev_sample=ap.sqrt() * x0
                    + (1 - ap).sqrt() * noise_pred)


class MockUNet:
    """Deterministic 'noise predictor' asserting the ip2p input contract."""

    def __init__(self):
        self.calls = 0

    def __call__(self, latent_in, t, encoder_hidden_states=None):
        assert latent_in.shape[0] % 3 == 0, "3-way CFG batch expected"
        assert latent_in.shape[1] == 2 * LC, "latent + image-cond concat"
        # unconditional row must carry ZERO image conditioning
        # (instructpix2pix_guidance.py:166-207 wiring)
        b = latent_in.shape[0] // 3
        assert torch.all(latent_in[2 * b:, LC:] == 0)
        assert encoder_hidden_states is not None
        self.calls += 1
        x = latent_in[:, :LC]
        return _Out(sample=torch.tanh(x) * 0.1
                    + 0.01 * encoder_hidden_states.mean())


class MockPipe:
    def __init__(self):
        self.vae = MockVAE()
        self.scheduler = MockScheduler()
        self.unet = MockUNet()

    def _encode_prompt(self, prompt, device, n, do_cfg, neg):
        emb = torch.zeros(3, 77, 8)
        emb[0] += float(len(prompt)) * 0.01   # text row varies with prompt
        return emb


class TestIp2pPlumbing:
    def test_edit_call_shapes_and_determinism(self):
        pipe = MockPipe()
        g = InstructPix2PixGuidance(device="cpu", pipe=pipe,
                                    diffusion_steps=4)
        rgb = np.random.RandomState(0).rand(H, W, 3).astype(np.float32)
        origin = np.random.RandomState(1).rand(H, W, 3).astype(np.float32)
        torch.manual_seed(0)
        out1 = g(rgb, origin, "make it night")
        assert out1.edit_image.shape == (H, W, 3)
        assert np.isfinite(out1.edit_image).all()
        assert 0.0 <= out1.edit_image.min() and out1.edit_image.max() <= 1.0
        assert pipe.unet.calls == 4  # one 3-way pass per DDIM step
        torch.manual_seed(0)
        out2 = g(rgb, origin, "make it night")
        np.testing.assert_array_equal(out1.edit_image, out2.edit_image)

    def test_sds_grad_shapes_and_nonzero(self):
        pipe = MockPipe()
        g = InstructPix2PixGuidance(device="cpu", pipe=pipe,
                                    diffusion_steps=4)
        rgb = np.random.RandomState(2).rand(H, W, 3).astype(np.float32)
        origin = np.random.RandomState(3).rand(H, W, 3).astype(np.float32)
        torch.manual_seed(0)
        grad, info = g.sds_image_grad(rgb, origin, "prompt", step=5)
        assert grad.shape == (H, W, 3)
        assert np.isfinite(grad).all()
        assert np.abs(grad).max() > 0
        assert info["min_step"] == 20 and info["max_step"] == 980

    def test_grad_clip_bounds_latent_grad(self):
        pipe = MockPipe()
        g = InstructPix2PixGuidance(device="cpu", pipe=pipe)
        rgb = np.random.RandomState(4).rand(H, W, 3).astype(np.float32)
        torch.manual_seed(0)
        _, info = g.sds_image_grad(rgb, rgb, "p", grad_clip=1e-6)
        # clamped latent grad -> tiny norm
        assert info["grad_norm"] <= 1e-6 * LC * LH * LW + 1e-8


class _CallablePipe:
    """ControlNet pipeline surface: pipe(prompt, image=..., ...)."""

    def __init__(self):
        self.kwargs = None

    def __call__(self, prompt, **kw):
        import PIL.Image

        self.kwargs = kw
        im = kw.get("image") or kw.get("control_image")
        arr = np.asarray(im, np.uint8)
        return _Out(images=[PIL.Image.fromarray(255 - arr)])


class TestControlNetPlumbing:
    def test_canny_cond_flows_to_pipe(self):
        pipe = _CallablePipe()
        g = ControlNetGuidance(control_type="canny", device="cpu", pipe=pipe)
        rgb = np.zeros((H, W, 3), np.float32)
        rgb[:, W // 2:] = 1.0  # a vertical edge
        out = g(rgb, rgb, "sharpen")
        assert out.edit_image.shape == (H, W, 3)
        cond = np.asarray(pipe.kwargs["image"])
        assert cond.max() == 255  # the edge shows up in the cond image
        assert pipe.kwargs["num_inference_steps"] == g.diffusion_steps

    def test_inpainter_masks_and_seed(self):
        pipe = _CallablePipe()
        inp = ControlNetInpainter(device="cpu", pipe=pipe, seed=7)
        img = np.random.RandomState(0).rand(H, W, 3).astype(np.float32)
        mask = np.zeros((H, W), np.float32)
        mask[10:20, 10:20] = 1.0
        out = inp(img, mask, "")
        assert out.shape == (H, W, 3)
        mk = np.asarray(pipe.kwargs["mask_image"])
        assert mk[15, 15] == 255 and mk[0, 0] == 0
        assert pipe.kwargs["generator"] is not None
