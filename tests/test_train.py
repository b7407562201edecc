"""Train-layer tests: Adam vs torch oracle, LR schedule, densify/prune
semantics, anchor loss/schedule, jitted train step convergence."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianeditor_tpu.models.gaussians import (
    MAX_ANCHOR_WEIGHT,
    GaussianParams,
)
from gaussianeditor_tpu.train.anchors import anchor_loss, update_anchor_loss_schedule
from gaussianeditor_tpu.train.densify import (
    DensifyConfig,
    add_densification_stats,
    densify_and_prune,
    init_densify_stats,
)
from gaussianeditor_tpu.train.losses import l1_loss, psnr, ssim
from gaussianeditor_tpu.train.optim import AdamState, GaussianAdam, OptimConfig, expon_lr
from tests.helpers import make_camera, random_scene


class TestExponLR:
    def test_endpoints(self):
        assert abs(float(expon_lr(0, 1e-2, 1e-4, max_steps=100)) - 1e-2) < 1e-9
        assert abs(float(expon_lr(100, 1e-2, 1e-4, max_steps=100)) - 1e-4) < 1e-9

    def test_log_linear_midpoint(self):
        mid = float(expon_lr(50, 1e-2, 1e-4, max_steps=100))
        assert abs(mid - 1e-3) < 1e-9  # geometric mean

    def test_delay_mult(self):
        # with a delay, early LR is scaled by ~delay_mult
        v = float(expon_lr(0, 1e-2, 1e-4, lr_delay_steps=10, lr_delay_mult=0.1,
                           max_steps=100))
        assert abs(v - 1e-3) < 1e-9

    def test_negative_step_zero(self):
        assert float(expon_lr(-5, 1e-2, 1e-4, max_steps=100)) == 0.0


class TestAdamVsTorch:
    def test_matches_torch_adam(self):
        """Run 10 steps of our Adam against torch.optim.Adam with
        identical grads — the reference's exact optimizer
        (gaussian_model.py:501: Adam(lr per group, eps=1e-15))."""
        import torch

        rng = np.random.RandomState(0)
        n = 32
        cfg = OptimConfig(spatial_lr_scale=2.0)
        optim = GaussianAdam(config=cfg)

        params = GaussianParams(
            xyz=jnp.asarray(rng.randn(n, 3).astype(np.float32)),
            features_dc=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32)),
            features_rest=jnp.asarray(rng.randn(n, 3, 3).astype(np.float32)),
            opacity_raw=jnp.asarray(rng.randn(n, 1).astype(np.float32)),
            log_scales=jnp.asarray(rng.randn(n, 3).astype(np.float32)),
            quats=jnp.asarray(rng.randn(n, 4).astype(np.float32)),
        )
        state = optim.init(params)

        names = ["xyz", "features_dc", "features_rest", "opacity_raw",
                 "log_scales", "quats"]
        tparams = {
            k: torch.nn.Parameter(torch.tensor(np.asarray(getattr(params, k))))
            for k in names
        }
        lrs0 = optim.group_lrs(0)
        topt = torch.optim.Adam(
            [{"params": [tparams[k]], "lr": float(getattr(lrs0, k))}
             for k in names],
            lr=0.0, eps=1e-15,
        )

        for step in range(10):
            grads_np = {k: rng.randn(*getattr(params, k).shape).astype(np.float32)
                        for k in names}
            grads = GaussianParams(**{k: jnp.asarray(v) for k, v in grads_np.items()})
            lrs = optim.group_lrs(step)
            for pg, k in zip(topt.param_groups, names):
                pg["lr"] = float(getattr(lrs, k))
            for k in names:
                tparams[k].grad = torch.tensor(grads_np[k])
            topt.step()
            params, state = optim.step(params, grads, state)

        for k in names:
            np.testing.assert_allclose(
                np.asarray(getattr(params, k)),
                tparams[k].detach().numpy(),
                rtol=1e-4, atol=1e-5, err_msg=k,
            )

    def test_grad_mask_excludes_rotation(self):
        """apply_grad_mask hooks cover xyz/features/opacity/scaling but NOT
        rotation (gaussian_model.py:849)."""
        optim = GaussianAdam(config=OptimConfig())
        scene = random_scene(8)
        params = scene.params
        state = optim.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        mask = jnp.zeros((8,), bool)  # nothing editable
        new, _ = optim.step(params, grads, state, grad_mask=mask)
        np.testing.assert_allclose(new.xyz, params.xyz)
        np.testing.assert_allclose(new.opacity_raw, params.opacity_raw)
        assert float(jnp.max(jnp.abs(new.quats - params.quats))) > 0

    def test_reset_slots(self):
        optim = GaussianAdam(config=OptimConfig())
        scene = random_scene(8)
        state = optim.init(scene.params)
        grads = jax.tree_util.tree_map(jnp.ones_like, scene.params)
        _, state = optim.step(scene.params, grads, state)
        reset = jnp.zeros((8,), bool).at[2].set(True)
        state2 = optim.reset_slots(state, reset)
        assert float(jnp.abs(state2.mu.xyz[2]).max()) == 0.0
        assert float(jnp.abs(state2.mu.xyz[3]).max()) > 0.0


class TestAnchors:
    def test_schedule_growth_and_cap(self):
        scene = random_scene(8)
        # initial: [g0, 0, 0, ...], n_gen 1
        assert int(scene.n_generations) == 1
        s = update_anchor_loss_schedule(scene, anchor_weight_init=0.1,
                                        anchor_weight_multiplier=2.0)
        w = np.asarray(s.anchor_weights)
        assert int(s.n_generations) == 2
        np.testing.assert_allclose(w[0], 0.1)  # g0 * 2
        np.testing.assert_allclose(w[1], 0.0)  # new firstborn exempt
        s2 = update_anchor_loss_schedule(s, 0.1, 2.0)
        w2 = np.asarray(s2.anchor_weights)
        np.testing.assert_allclose(w2[0], 0.2)
        np.testing.assert_allclose(w2[1], 0.1)  # previous firstborn -> init
        np.testing.assert_allclose(w2[2], 0.0)
        # cap at MAX_ANCHOR_WEIGHT
        for _ in range(10):
            s2 = update_anchor_loss_schedule(s2, 0.1, 3.0)
        assert np.asarray(s2.anchor_weights).max() <= MAX_ANCHOR_WEIGHT

    def test_anchor_loss_zero_at_anchor(self):
        scene = random_scene(16).update_anchor()
        out = anchor_loss(scene)
        for v in out.values():
            assert float(v) == 0.0

    def test_anchor_loss_weighted_by_generation(self):
        scene = random_scene(16)
        # generation 0 weight g0=0.05; move all xyz by 1
        moved = scene.replace(
            params=scene.params.replace(xyz=scene.params.xyz + 1.0)
        )
        out = anchor_loss(moved)
        # mse per masked row = 3 (summed over dims) * w / (n*3) = w
        np.testing.assert_allclose(float(out["loss_anchor_geo"]), 0.05,
                                   rtol=1e-5)
        # firstborn generation (weight 0) contributes nothing
        gen1 = moved.replace(
            generation=jnp.ones_like(moved.generation),
            n_generations=jnp.asarray(2),
        )
        out1 = anchor_loss(gen1)
        assert float(out1["loss_anchor_geo"]) == 0.0


class TestDensify:
    def _setup(self, n=32, cap=64):
        scene = random_scene(n, capacity=cap)
        stats = init_densify_stats(cap)
        return scene, stats

    def _run(self, scene, stats, grads, **over):
        cfg = DensifyConfig(**{**dict(max_grad=0.5, max_densify_percent=1.0,
                                      min_opacity=0.005, max_screen_size=5.0,
                                      percent_dense=0.01), **over})
        stats = stats.replace(
            xyz_gradient_accum=grads, denom=jnp.ones_like(grads)
        )
        return jax.jit(
            lambda s, st, k: densify_and_prune(s, st, cfg, 1.0, k, 0.1, 2.0)
        )(scene, stats, jax.random.key(0))

    def test_clone_small_gaussian(self):
        scene, stats = self._setup()
        scene = scene.replace(
            params=scene.params.replace(
                log_scales=jnp.full_like(scene.params.log_scales, np.log(0.001))
            )
        )
        grads = jnp.zeros((64,)).at[3].set(1.0)
        res = self._run(scene, stats, grads)
        assert int(res.n_cloned) == 1 and int(res.n_split) == 0
        assert int(res.scene.n_alive) == int(scene.n_alive) + 1
        # clone copies the row and tags the new generation
        new_slots = np.asarray(res.scene.alive) & ~np.asarray(scene.alive)
        idx = np.nonzero(new_slots)[0][0]
        np.testing.assert_allclose(res.scene.params.xyz[idx],
                                   scene.params.xyz[3])
        assert int(res.scene.generation[idx]) == 1
        assert int(res.scene.n_generations) == 2

    def test_split_large_gaussian(self):
        scene, stats = self._setup()
        scene = scene.replace(
            params=scene.params.replace(
                log_scales=jnp.full_like(scene.params.log_scales, np.log(0.5))
            )
        )
        grads = jnp.zeros((64,)).at[5].set(1.0)
        res = self._run(scene, stats, grads)
        assert int(res.n_split) == 1 and int(res.n_cloned) == 0
        # original overwritten (child A) + one new slot (child B), both
        # with scale / (0.8 * 2)
        expect_scale = np.log(0.5 / 1.6)
        np.testing.assert_allclose(
            np.asarray(res.scene.params.log_scales[5]), expect_scale, rtol=1e-5
        )
        assert int(res.scene.generation[5]) == 1
        assert bool(res.reset_mask[5])

    def test_prune_low_opacity_masked_only(self):
        scene, stats = self._setup()
        # keep scales small so the world-size prune branch (0.1*extent)
        # doesn't fire — isolating the opacity condition
        scene = scene.replace(
            params=scene.params.replace(
                log_scales=jnp.full_like(scene.params.log_scales, np.log(0.01))
            )
        )
        op = scene.params.opacity_raw.at[:].set(3.0)
        op = op.at[1].set(-10.0).at[2].set(-10.0)  # ~0 opacity
        scene = scene.replace(params=scene.params.replace(opacity_raw=op))
        # Gaussian 2 is outside the semantic mask -> protected (":794 fix")
        mask = scene.mask.at[2].set(False)
        scene = scene.set_mask(mask)
        res = self._run(scene, stats, jnp.zeros((64,)))
        assert int(res.n_pruned) == 1
        assert not bool(res.scene.alive[1])
        assert bool(res.scene.alive[2])

    def test_grads_outside_mask_ignored(self):
        scene, stats = self._setup()
        scene = scene.set_mask(scene.mask.at[7].set(False))
        grads = jnp.zeros((64,)).at[7].set(10.0)
        res = self._run(scene, stats, grads)
        assert int(res.n_cloned) == 0 and int(res.n_split) == 0

    def test_capacity_exhaustion_drops(self):
        scene, stats = self._setup(n=32, cap=33)  # one free slot
        grads = jnp.zeros((33,)).at[0].set(1.0).at[1].set(1.0)
        scene = scene.replace(
            params=scene.params.replace(
                log_scales=jnp.full_like(scene.params.log_scales, np.log(0.001))
            )
        )
        res = self._run(scene, stats, grads)
        assert int(res.n_cloned) == 1
        assert int(res.n_dropped) == 1

    def test_quantile_gating(self):
        """max_densify_percent keeps only the top fraction of grads
        (gaussian_model.py:775-779)."""
        scene, stats = self._setup(n=40, cap=80)
        scene = scene.replace(
            params=scene.params.replace(
                log_scales=jnp.full_like(scene.params.log_scales, np.log(0.001))
            )
        )
        grads = jnp.zeros((80,)).at[:40].set(
            jnp.linspace(0.5, 1.5, 40)
        )
        res = self._run(scene, stats, grads, max_densify_percent=0.1)
        # nnz=40, valid_percent = 40*0.1/40 = 0.1 -> ~top 10% (4) survive
        assert 2 <= int(res.n_cloned) <= 6

    def test_stats_accumulation(self):
        stats = init_densify_stats(8)
        vnorm = jnp.arange(8, dtype=jnp.float32)
        radii = jnp.arange(8, dtype=jnp.int32)
        upd = radii > 3
        stats = add_densification_stats(stats, vnorm, radii, upd)
        np.testing.assert_allclose(np.asarray(stats.denom),
                                   (np.arange(8) > 3).astype(np.float32))
        np.testing.assert_allclose(np.asarray(stats.max_radii2d),
                                   np.arange(8, dtype=np.float32))


class TestLosses:
    def test_ssim_identical_is_one(self):
        img = jnp.asarray(np.random.RandomState(0).rand(32, 32, 3)
                          .astype(np.float32))
        assert abs(float(ssim(img, img)) - 1.0) < 1e-5

    def test_psnr(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        assert abs(float(psnr(a, b)) - 20.0) < 1e-4

    def test_ssim_decreases_with_noise(self):
        rng = np.random.RandomState(1)
        img = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
        noisy = img + 0.2 * jnp.asarray(rng.randn(32, 32, 3).astype(np.float32))
        assert float(ssim(img, noisy)) < 0.9
