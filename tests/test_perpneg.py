"""Perp-Neg view-dependent negative prompting (guidance/prompts.py) —
parity with prompt_processors/base.py:80-165 and utils/ops.py:423-442."""

import math

import numpy as np

from gaussianeditor_tpu.guidance.prompts import (
    PERP_NEG_F_FS,
    PERP_NEG_F_SB,
    perp_neg_combine,
    perp_neg_view_prompt,
    perpendicular_component,
    shifted_exponential_decay,
)


class TestDecay:
    def test_zero_at_r1(self):
        # the reference chooses constants so f(1) ~ 0 (base.py:197-205)
        for f in (PERP_NEG_F_SB, PERP_NEG_F_FS):
            assert abs(shifted_exponential_decay(*f, 1.0)) < 5e-3


class TestViewPrompt:
    def test_pure_front(self):
        p = perp_neg_view_prompt(0.0, 0.0)
        assert p.pos_blend == [(1, 1.0), (0, 0.0)]
        # at r=1 the front negative weight is ~0
        w_front = dict((i, w) for i, w in p.negatives)[1]
        assert abs(w_front) < 5e-3

    def test_pure_side(self):
        p = perp_neg_view_prompt(90.0, 0.0)
        # azi=90 -> side-back branch with r=1 (full side)
        (i0, c0), (i1, c1) = p.pos_blend
        assert (i0, i1) == (0, 2)
        assert abs(c0 - 1.0) < 1e-9 and abs(c1) < 1e-9

    def test_back_interpolation(self):
        p = perp_neg_view_prompt(180.0, 0.0)
        (i0, c0), (i1, c1) = p.pos_blend
        assert (i0, i1) == (0, 2)
        assert abs(c0) < 1e-9 and abs(c1 - 1.0) < 1e-9
        # negatives [side, front] with strictly negative weights at r=0
        assert [i for i, _ in p.negatives] == [0, 1]
        assert all(w < 0 for _, w in p.negatives)

    def test_overhead_no_negatives(self):
        p = perp_neg_view_prompt(30.0, 75.0)
        assert p.pos_blend == [(3, 1.0)]
        assert p.negatives == []

    def test_front_side_negative_signs(self):
        # mid-interpolation (azi=45): both negatives active and negative
        p = perp_neg_view_prompt(45.0, 0.0)
        assert [i for i, _ in p.negatives] == [1, 0]
        assert all(w < 0 for _, w in p.negatives)


class TestCombine:
    def test_perpendicular(self):
        rng = np.random.RandomState(0)
        x, y = rng.randn(8), rng.randn(8)
        px = perpendicular_component(x, y)
        assert abs(np.dot(px, y)) < 1e-5

    def test_identity_without_negatives(self):
        rng = np.random.RandomState(1)
        pos, unc = rng.randn(4, 4), rng.randn(4, 4)
        np.testing.assert_allclose(
            perp_neg_combine(pos, unc, []), pos - unc
        )

    def test_negative_suppresses_aligned_direction(self):
        # a negative parallel to the positive delta contributes nothing
        pos = np.array([1.0, 0.0])
        unc = np.zeros(2)
        neg_parallel = np.array([2.0, 0.0])
        out = perp_neg_combine(pos, unc, [(neg_parallel, -0.5)])
        np.testing.assert_allclose(out, pos)
        # an orthogonal negative is subtracted with its weight
        neg_orth = np.array([0.0, 1.0])
        out2 = perp_neg_combine(pos, unc, [(neg_orth, -0.5)])
        np.testing.assert_allclose(out2, np.array([1.0, -0.5]))


class TestPromptDebiasing:
    def test_biasing_word_removed_for_affected_view(self):
        """A word that skews the view distribution is removed from the
        views whose probability it inflates relative to the droppped
        variant (PMI < 0.95), reproducing base.py:443-501 semantics."""
        from gaussianeditor_tpu.guidance.prompts import get_debiased_prompts

        # fake masked-LM probe: the word "lying" biases toward view 3
        # (overhead); without it the distribution is uniform
        def probe(text):
            if "lying" in text:
                return np.array([0.1, 0.1, 0.1, 0.7])
            return np.array([0.25, 0.25, 0.25, 0.25])

        out = get_debiased_prompts("a dog lying down", probe)
        assert len(out) == 4
        # full=with-word; dropping "lying" -> part uniform; for views
        # 0-2: pmi = 0.1/(0.5*(0.25+0.1)) = 0.57 < 0.95 -> removed;
        # view 3: pmi = 0.7/(0.5*(0.25+0.7)) = 1.47 -> kept
        assert out[3] == "a dog lying down"
        for i in range(3):
            assert "lying" not in out[i]

    def test_unbiased_prompt_unchanged(self):
        from gaussianeditor_tpu.guidance.prompts import get_debiased_prompts

        out = get_debiased_prompts(
            "a stone statue", lambda t: np.full(4, 0.25))
        assert out == ["a stone statue"] * 4

    def test_mask_ids_restrict_candidates(self):
        from gaussianeditor_tpu.guidance.prompts import get_debiased_prompts

        def probe(text):
            return (np.array([0.7, 0.1, 0.1, 0.1]) if "red" in text
                    else np.full(4, 0.25))

        # "red" is word 1 but only word 0 may be debiased -> unchanged
        out = get_debiased_prompts("a red car", probe, mask_ids=[0])
        assert out == ["a red car"] * 4


class TestPromptLibrary:
    def test_lib_lookup_unique(self):
        from gaussianeditor_tpu.guidance.prompts import resolve_prompt

        assert resolve_prompt("plain prompt") == "plain prompt"
        out = resolve_prompt("lib:hamburger")
        assert out == "a DSLR photo of a hamburger"

    def test_lib_lookup_multi_and_missing(self):
        import pytest

        from gaussianeditor_tpu.guidance.prompts import resolve_prompt

        with pytest.raises(ValueError, match="Multiple"):
            resolve_prompt("lib:a")  # 'a' matches many entries
        with pytest.raises(ValueError, match="Cannot find"):
            resolve_prompt("lib:xyzzy_unfindable")

    def test_lib_lookup_reference_format_file(self, tmp_path):
        import json

        from gaussianeditor_tpu.guidance.prompts import resolve_prompt

        p = tmp_path / "lib.json"
        p.write_text(json.dumps(
            {"dreamfusion": ["a red fox", "a blue whale"]}))
        assert resolve_prompt("lib:red_fox",
                              library_path=str(p)) == "a red fox"

    def test_edit_system_resolves_lib_prompt(self):
        from gaussianeditor_tpu.core.cameras import orbit_cameras
        from gaussianeditor_tpu.edit.edit_system import EditConfig, EditSystem
        from gaussianeditor_tpu.guidance.fake import FakeGuidance
        from tests.helpers import random_scene

        sys_ = EditSystem(
            random_scene(10, seed=0),
            orbit_cameras(2, 4.0, 0.8, 0.8, 32, 32),
            EditConfig(prompt="lib:hamburger", batch_size=1, max_steps=1,
                       max_instances=2048, tile_cap=256, chunk=32),
            guidance=FakeGuidance(), perceptual=None,
        )
        assert sys_.cfg.prompt == "a DSLR photo of a hamburger"
