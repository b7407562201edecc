"""Score-distillation guidance: SDS and DDS gradient paths.

Reference behaviors reproduced:

  * SDS (`threestudio/models/guidance/instructpix2pix_guidance.py:209-297`):
    encode the render to latents, add noise at t ~ U[min_step, max_step],
    one UNet evaluation, 3-way classifier-free guidance (text / image /
    uncond with guidance_scale 7.5 and condition_scale 1.5), then
    grad = w(t) * (noise_pred - noise) with w(t) = 1 - alpha_bar_t,
    nan_to_num + clamp to `grad_clip`, and the loss trick
    0.5 * mse(latents, stopgrad(latents - grad)) whose image gradient is
    J_encode^T grad.
  * min/max-percent + grad-clip annealing via C()-interpolated schedules
    (`instructpix2pix_guidance.py:305-315`, `update_step`).
  * DDS — the Edit system's second-guidance slot
    (`GassuianEditorEdit.py:15-28, 113-131`; second_guidance_type "dds").
    Delta Denoising Score (Hertz et al. 2023): noise BOTH the render's
    latents z and the origin image's latents z_src with the SAME noise at
    the same t, predict eps(z_t, target_prompt) and eps(z_src_t,
    source_prompt) (each with its own 2-way CFG), and take
    grad = w(t) * (eps_tgt - eps_src) — the shared-noise difference
    cancels the score bias that makes plain SDS blurry.

The math here is pure and backend-agnostic: a `LatentModel` supplies
`encode` / `unet`. `guidance.fake.FakeLatentModel` is a deterministic
JAX implementation so every branch (CFG weighting, scheduling, the VJP
through encode) is hermetically testable; the diffusers adapters expose
the same interface around real checkpoints (torch host-side, frozen
inference — exactly how the reference runs them).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Protocol, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from gaussianeditor_tpu.config.config import C

ScheduleLike = Union[float, Sequence[float]]


class LatentModel(Protocol):
    """Minimal latent-diffusion surface the score losses need."""

    def encode(self, images: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] in [0,1] -> latents [B, h, w, c]; differentiable."""
        ...

    def unet(
        self,
        latents_noisy: jnp.ndarray,
        t: jnp.ndarray,
        prompt: str,
        cond_latents: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Predict noise. `cond_latents` carries the ip2p image condition."""
        ...


class DDIMSchedule:
    """Stable-Diffusion noise schedule (scaled_linear betas), the
    quantities SDS/DDS need: alpha_bar, add_noise, w(t) = 1 - alpha_bar.

    Matches diffusers' DDIMScheduler defaults for SD1.5 (beta_start
    0.00085, beta_end 0.012, 1000 train steps, scaled_linear)."""

    def __init__(self, num_train_timesteps: int = 1000,
                 beta_start: float = 0.00085, beta_end: float = 0.012):
        self.num_train_timesteps = num_train_timesteps
        betas = (
            np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                        num_train_timesteps, dtype=np.float64) ** 2
        )
        self.alphas_cumprod = jnp.asarray(
            np.cumprod(1.0 - betas), jnp.float32
        )

    def add_noise(self, latents: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        a = self.alphas_cumprod[t]
        return jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise

    def w(self, t: jnp.ndarray) -> jnp.ndarray:
        """SDS weighting w(t) = 1 - alpha_bar_t (ip2p guidance :237)."""
        return 1.0 - self.alphas_cumprod[t]


def cfg_combine3(n_text: jnp.ndarray, n_image: jnp.ndarray,
                 n_uncond: jnp.ndarray, guidance_scale: float,
                 condition_scale: float) -> jnp.ndarray:
    """ip2p 3-way CFG (instructpix2pix_guidance.py:230-235)."""
    return (n_uncond
            + guidance_scale * (n_text - n_image)
            + condition_scale * (n_image - n_uncond))


def cfg_combine2(n_cond: jnp.ndarray, n_uncond: jnp.ndarray,
                 guidance_scale: float) -> jnp.ndarray:
    """2-way CFG (controlnet_guidance.py edit loop)."""
    return n_uncond + guidance_scale * (n_cond - n_uncond)


@dataclasses.dataclass
class ScoreConfig:
    """Annealable knobs (C()-schedulable, like update_step
    :305-315)."""

    guidance_scale: float = 7.5
    condition_scale: float = 1.5       # ip2p image-guidance scale
    min_step_percent: ScheduleLike = 0.02
    max_step_percent: ScheduleLike = 0.98
    grad_clip: Optional[ScheduleLike] = None


def _steps_at(cfg: ScoreConfig, num_train: int, step: int):
    lo = int(num_train * C(cfg.min_step_percent, step))
    hi = int(num_train * C(cfg.max_step_percent, step))
    return max(0, lo), min(num_train - 1, max(hi, lo))


def _postprocess_grad(grad: jnp.ndarray, clip: Optional[float]) -> jnp.ndarray:
    grad = jnp.nan_to_num(grad)
    if clip is not None:
        grad = jnp.clip(grad, -clip, clip)
    return grad


class SDSGuidance:
    """SDS over an ip2p-style latent model.

    __call__(rgb, cond_rgb, prompt, step, key) -> (g_image, info):
    g_image is dL/d(rgb) for L = 0.5*||latents - stopgrad(latents -
    grad)||^2 / B — inject into the photometric loss as
    sum(rgb * stopgrad(g_image)) (train step `inject_grad` input)."""

    def __init__(self, model: LatentModel, config: ScoreConfig = None,
                 schedule: Optional[DDIMSchedule] = None):
        self.model = model
        self.cfg = config or ScoreConfig()
        self.sched = schedule or DDIMSchedule()

    def __call__(self, rgb, cond_rgb, prompt: str, step: int = 0,
                 key: Optional[jax.Array] = None):
        cfg, sched = self.cfg, self.sched
        key = key if key is not None else jax.random.key(step)
        rgb = jnp.asarray(rgb, jnp.float32)
        cond = jnp.asarray(cond_rgb, jnp.float32)
        if rgb.ndim == 3:
            rgb, cond = rgb[None], cond[None]
        B = rgb.shape[0]
        lo, hi = _steps_at(cfg, sched.num_train_timesteps, step)
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (B,), lo, hi + 1)

        latents, enc_vjp = jax.vjp(self.model.encode, rgb)
        cond_latents = self.model.unet_cond(cond) if hasattr(
            self.model, "unet_cond") else self.model.encode(cond)
        noise = jax.random.normal(kn, latents.shape, latents.dtype)
        tb = t[:, None, None, None]
        noisy = sched.add_noise(latents, noise, tb)
        n_text = self.model.unet(noisy, t, prompt, cond_latents)
        n_image = self.model.unet(noisy, t, "", cond_latents)
        n_uncond = self.model.unet(noisy, t, "",
                                   jnp.zeros_like(cond_latents))
        noise_pred = cfg_combine3(n_text, n_image, n_uncond,
                                  cfg.guidance_scale, cfg.condition_scale)
        w = sched.w(tb)
        clip = None if cfg.grad_clip is None else C(cfg.grad_clip, step)
        grad = _postprocess_grad(w * (noise_pred - noise), clip)
        (g_image,) = enc_vjp(grad / B)
        info = {
            "grad_norm": jnp.linalg.norm(grad),
            "min_step": lo,
            "max_step": hi,
            # proxy value of 0.5*mse(latents, latents-grad)/B for logging
            "loss_sds": 0.5 * jnp.sum(grad * grad) / B,
        }
        return g_image, info


class DDSGuidance:
    """Delta Denoising Score between the current render and the origin
    image under (target_prompt, source_prompt) — the Edit system's
    second-guidance slot (GassuianEditorEdit.py:113-131)."""

    def __init__(self, model: LatentModel, config: ScoreConfig = None,
                 schedule: Optional[DDIMSchedule] = None):
        self.model = model
        self.cfg = config or ScoreConfig(guidance_scale=7.5)
        self.sched = schedule or DDIMSchedule()

    def __call__(self, rgb, origin_rgb, target_prompt: str,
                 source_prompt: str, step: int = 0,
                 key: Optional[jax.Array] = None):
        cfg, sched = self.cfg, self.sched
        key = key if key is not None else jax.random.key(step)
        rgb = jnp.asarray(rgb, jnp.float32)
        origin = jnp.asarray(origin_rgb, jnp.float32)
        if rgb.ndim == 3:
            rgb, origin = rgb[None], origin[None]
        B = rgb.shape[0]
        lo, hi = _steps_at(cfg, sched.num_train_timesteps, step)
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (B,), lo, hi + 1)

        latents, enc_vjp = jax.vjp(self.model.encode, rgb)
        src_latents = self.model.encode(origin)
        # SAME noise on both branches — the defining property of DDS
        noise = jax.random.normal(kn, latents.shape, latents.dtype)
        tb = t[:, None, None, None]
        z_t = sched.add_noise(latents, noise, tb)
        zs_t = sched.add_noise(src_latents, noise, tb)

        def eps(noisy, prompt):
            n_c = self.model.unet(noisy, t, prompt)
            n_u = self.model.unet(noisy, t, "")
            return cfg_combine2(n_c, n_u, cfg.guidance_scale)

        delta = eps(z_t, target_prompt) - eps(zs_t, source_prompt)
        clip = None if cfg.grad_clip is None else C(cfg.grad_clip, step)
        grad = _postprocess_grad(sched.w(tb) * delta, clip)
        (g_image,) = enc_vjp(grad / B)
        info = {
            "grad_norm": jnp.linalg.norm(grad),
            "loss_dds": 0.5 * jnp.sum(grad * grad) / B,
        }
        return g_image, info
