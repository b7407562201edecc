"""SDS/DDS score-distillation guidance (guidance/score.py) — hermetic
tests over the deterministic FakeLatentModel, covering the reference's
use_sds branch (instructpix2pix_guidance.py:209-297), min/max-percent +
grad-clip annealing (:305-315), and the Edit system's DDS second
guidance slot (GassuianEditorEdit.py:15-28, 113-131)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianeditor_tpu.guidance.fake import FakeGuidance, FakeLatentModel
from gaussianeditor_tpu.guidance.score import (
    DDIMSchedule,
    DDSGuidance,
    SDSGuidance,
    ScoreConfig,
    cfg_combine2,
    cfg_combine3,
)


def _img(seed, b=1, hw=32):
    rng = np.random.RandomState(seed)
    return rng.rand(b, hw, hw, 3).astype(np.float32)


class TestSchedule:
    def test_alpha_bar_monotone(self):
        s = DDIMSchedule()
        a = np.asarray(s.alphas_cumprod)
        assert a.shape == (1000,)
        assert (np.diff(a) < 0).all()
        assert 0.99 < a[0] <= 1.0 and a[-1] < 0.02

    def test_add_noise_endpoints(self):
        s = DDIMSchedule()
        x = jnp.ones((1, 4, 4, 4))
        n = 2.0 * jnp.ones((1, 4, 4, 4))
        lo = s.add_noise(x, n, jnp.asarray([[[[0]]]]))
        hi = s.add_noise(x, n, jnp.asarray([[[[999]]]]))
        # t=0: nearly the clean signal; t=999: nearly pure noise
        assert abs(float(lo[0, 0, 0, 0]) - 1.0) < 0.1
        assert abs(float(hi[0, 0, 0, 0]) - 2.0) < 0.3

    def test_cfg_identities(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 3))
        # equal branches collapse to the branch value for any scales
        assert np.allclose(cfg_combine3(x, x, x, 7.5, 1.5), x)
        assert np.allclose(cfg_combine2(x, x, 12.0), x)
        # guidance_scale 1, condition_scale 1 -> text branch
        y = jnp.ones_like(x)
        z = 2.0 * jnp.ones_like(x)
        assert np.allclose(cfg_combine3(y, z, x, 1.0, 1.0), y)


class TestSDS:
    def test_shapes_and_finiteness(self):
        g = SDSGuidance(FakeLatentModel())
        rgb, cond = _img(0), _img(1)
        gi, info = g(rgb, cond, "make it snowy", step=3)
        assert gi.shape == rgb.shape
        assert np.isfinite(np.asarray(gi)).all()
        assert float(info["grad_norm"]) > 0

    def test_deterministic_given_step(self):
        g = SDSGuidance(FakeLatentModel())
        rgb, cond = _img(0), _img(1)
        a, _ = g(rgb, cond, "p", step=7)
        b, _ = g(rgb, cond, "p", step=7)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_vjp_matches_autodiff(self):
        """g_image must equal the gradient of the reference loss
        0.5*mse(latents, stopgrad(latents - grad)) = sum(latents*sg)."""
        model = FakeLatentModel()
        g = SDSGuidance(model)
        rgb, cond = _img(2), _img(3)
        gi, _ = g(rgb, cond, "p", step=0)

        # reconstruct the latent-space grad with the same key schedule
        key = jax.random.key(0)
        cfgc = g.cfg
        sched = g.sched
        lo = int(sched.num_train_timesteps * cfgc.min_step_percent)
        hi = int(sched.num_train_timesteps * cfgc.max_step_percent)
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (1,), lo, hi + 1)
        latents = model.encode(jnp.asarray(rgb))
        clat = model.encode(jnp.asarray(cond))
        noise = jax.random.normal(kn, latents.shape, latents.dtype)
        noisy = sched.add_noise(latents, noise, t[:, None, None, None])
        npred = cfg_combine3(
            model.unet(noisy, t, "p", clat),
            model.unet(noisy, t, "", clat),
            model.unet(noisy, t, "", jnp.zeros_like(clat)),
            cfgc.guidance_scale, cfgc.condition_scale,
        )
        grad = sched.w(t[:, None, None, None]) * (npred - noise)

        ref = jax.grad(
            lambda im: jnp.sum(model.encode(im) * jax.lax.stop_gradient(grad))
        )(jnp.asarray(rgb))
        np.testing.assert_allclose(np.asarray(gi), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_grad_clip_and_annealing(self):
        model = FakeLatentModel()
        # C()-scheduled max_step_percent: 0.98 -> 0.5 over steps 0..100
        cfg = ScoreConfig(max_step_percent=[0, 0.98, 0.5, 100],
                          grad_clip=1e-6)
        g = SDSGuidance(model, cfg)
        _, info0 = g(_img(0), _img(1), "p", step=0)
        _, info1 = g(_img(0), _img(1), "p", step=100)
        assert info0["max_step"] == int(1000 * 0.98)
        assert info1["max_step"] == int(1000 * 0.5)
        # a tiny clip caps the latent grad norm
        n_latent = (32 // FakeLatentModel.down) ** 2 * 4
        assert float(info1["grad_norm"]) <= np.sqrt(n_latent) * 1e-6 + 1e-12


class TestDDS:
    def test_zero_delta_when_identical(self):
        """Same image, same prompt, SAME noise -> eps difference is
        exactly zero (the defining DDS property)."""
        g = DDSGuidance(FakeLatentModel())
        rgb = _img(4)
        gi, info = g(rgb, rgb, "same", "same", step=5)
        np.testing.assert_array_equal(np.asarray(gi), 0.0)
        assert float(info["grad_norm"]) == 0.0

    def test_nonzero_when_prompts_differ(self):
        g = DDSGuidance(FakeLatentModel())
        rgb = _img(4)
        gi, info = g(rgb, rgb, "a red car", "a blue car", step=5)
        assert float(info["grad_norm"]) > 0
        assert np.abs(np.asarray(gi)).max() > 0


class TestEditSystemScorePaths:
    def _mk(self, **kw):
        from gaussianeditor_tpu.core.cameras import orbit_cameras
        from gaussianeditor_tpu.edit.edit_system import EditConfig, EditSystem
        from gaussianeditor_tpu.train.trainer import LossWeights
        from tests.helpers import random_scene

        scene = random_scene(50, seed=3)
        cams = orbit_cameras(4, 4.0, 0.8, 0.8, 32, 32)
        cfg = EditConfig(
            prompt="make it autumn", batch_size=2, max_steps=3,
            per_editing_step=10, densify_until_step=0, cameras_extent=2.0,
            max_instances=4096, tile_cap=256, chunk=32,
            loss=LossWeights(**kw),
        )
        return scene, cams, cfg

    def test_dds_second_guidance_slot(self):
        from gaussianeditor_tpu.edit.edit_system import EditSystem

        scene, cams, cfg = self._mk(lambda_dds=0.5)
        sys_ = EditSystem(
            scene, cams, cfg, guidance=FakeGuidance(), perceptual=None,
            dds_guidance=DDSGuidance(FakeLatentModel()),
            dds_prompts=("autumn trees", "summer trees"),
        )
        vals = []
        sys_.fit(callback=lambda s, m: vals.append(float(m["loss_inject"])))
        assert len(vals) == 3
        assert np.isfinite(vals).all()
        assert any(v != 0.0 for v in vals)

    def test_sds_only_training(self):
        """Score distillation with no iterative-dataset-update guidance
        (the reference's use_sds mode): lambda_l1 = lambda_p = 0."""
        from gaussianeditor_tpu.edit.edit_system import EditSystem

        scene, cams, cfg = self._mk(lambda_l1=0.0, lambda_p=0.0,
                                    lambda_sds=1.0)
        sys_ = EditSystem(
            scene, cams, cfg, guidance=None, perceptual=None,
            sds_guidance=SDSGuidance(FakeLatentModel()),
        )
        st = sys_.fit()
        assert np.isfinite(np.asarray(st.scene.params.xyz)).all()

    def test_inject_moves_params(self):
        """The injected score gradient must actually reach the Gaussian
        parameters through the jitted step."""
        from gaussianeditor_tpu.edit.edit_system import EditSystem

        scene, cams, cfg = self._mk(lambda_l1=0.0, lambda_p=0.0,
                                    lambda_sds=10.0)
        sys_ = EditSystem(
            scene, cams, cfg, guidance=None, perceptual=None,
            sds_guidance=SDSGuidance(FakeLatentModel()),
        )
        sys_.on_fit_start()
        before = np.asarray(sys_.state.scene.params.features_dc).copy()
        sys_.fit(n_steps=2)
        after = np.asarray(sys_.state.scene.params.features_dc)
        assert np.abs(after - before).max() > 0
