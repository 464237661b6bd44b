"""DA5 transform-for-transform parity (round-5 VERDICT #5): the seeded
statistical test pins each pipeline stage's EMPIRICAL per-sample incidence
against the reference's configured probabilities (ref distillation/
nnunetv2/training/nnUNetTrainer/variants/data_augmentation/
nnUNetTrainerDA5.py:96-292), plus gating/order semantics."""
import numpy as np
import pytest

from fast_nnunet_tpu.training import augment_da5 as M


def _sample(rng, patch, n_ch=1):
    data = rng.randn(n_ch, *patch).astype(np.float32)
    seg = (rng.rand(1, *patch) * 3).astype(np.int16)
    return data, seg


def _wrap_counting(monkeypatch, names):
    counts = {n: 0 for n in names}

    def make(fn, name):
        def w(data, *a, **kw):
            before = np.array(data, copy=True)
            out = fn(data, *a, **kw)
            d = out[0] if isinstance(out, tuple) else out
            if d.shape == before.shape and not np.allclose(
                    before, d, atol=1e-4):
                counts[name] += 1
            elif d.shape != before.shape:
                counts[name] += 1  # geometric shape change counts as fired
            return out
        return w

    for n in names:
        monkeypatch.setattr(M, n, make(getattr(M, n), n))
    return counts


# (stage, analytic incidence for 1 channel, isotropic 12^3 patch):
#   spatial: 1 - (1 - .4*(1 - .5^3)) * (1 - .2) = .48 (p_rot .4 with
#       per-axis gate .5^3 all-off, p_scale .2; ref :116,126-128)
#   rot90: .5 * 3/4 (k=0 no-op; ref :136-141)
#   transpose: .5 * 5/6 (identity perm of 3 axes; ref :143-146)
#   median/blur OneOf: each branch .5 pick * .2 p * .5 p_ch (ref :148-159)
#   noise .1 (ref :161); add-brightness .1*.5 (ref :163); contrast OneOf
#   sum .2*.5 (ref :171-190); lowres .15*.5 (ref :192-201); each inverted
#   gamma .1 (ref :203-206); mirror 1-.5^3 (ref :208); blank rect .4*.5
#   (ref :211-219); brightness-gradient .3*.5 (ref :221-231); local gamma
#   .3*.5 (ref :233-242); sharpening .2*.5 (ref :244-251)
EXPECTED = {
    "spatial_augment_da5": 0.48,
    "rot90_augment": 0.375,
    "transpose_axes_augment": 0.4167,
    "gaussian_noise": 0.10,
    "additive_brightness": 0.05,
    "simulate_low_resolution_da5": 0.072,  # .075 minus zoom~1 no-ops
    "mirror_augment": 0.875,
    "blank_rectangles_augment": 0.20,
    "brightness_gradient_additive": 0.15,
    "local_gamma_augment": 0.15,
    "sharpening_augment": 0.10,
    # OneOf pairs measured as sums below
    "median_filter_augment": None,
    "gaussian_blur": None,
    "contrast_augment_da5": None,
    "gamma_augment": None,  # called twice at p=.1 -> expected count 2*N*.1
}


def test_stage_incidence_matches_reference_probabilities(monkeypatch):
    N = 500
    patch = (12, 12, 12)
    counts = _wrap_counting(monkeypatch, list(EXPECTED))
    aug = M.DA5TrainingAugmenter(patch, (-0.52, 0.52), (0, 1, 2))
    rng = np.random.RandomState(1234)
    for _ in range(N):
        data, seg = _sample(rng, patch)
        out, targets = aug(data, seg, rng)
        assert out.shape == (1, *patch)

    def check(name, p, n_draws=N):
        got = counts[name] / n_draws
        sigma = (p * (1 - p) / n_draws) ** 0.5
        assert abs(got - p) < 5 * sigma + 0.01, \
            f"{name}: incidence {got:.3f} vs expected {p:.3f}"

    for name, p in EXPECTED.items():
        if p is not None:
            check(name, p)
    # OneOf(median | blur): each branch picked .5, then p=.2, p_ch=.5
    check("median_filter_augment", 0.05)
    check("gaussian_blur", 0.05)
    # OneOf(contrast preserve | free) both count into the same function
    check("contrast_augment_da5", 0.10)
    # double inverted gamma: two draws at p=.1 each
    check("gamma_augment", 0.10, n_draws=2 * N)


def test_rot90_transpose_absent_for_fully_anisotropic_patch(monkeypatch):
    counts = _wrap_counting(monkeypatch,
                            ["rot90_augment", "transpose_axes_augment"])
    patch = (8, 12, 16)  # all extents distinct -> matching_axes all 1
    aug = M.DA5TrainingAugmenter(patch, (-0.52, 0.52), (0, 1, 2))
    rng = np.random.RandomState(7)
    for _ in range(30):
        data, seg = _sample(rng, patch)
        aug(data, seg, rng)
    assert counts["rot90_augment"] == 0
    assert counts["transpose_axes_augment"] == 0


def test_rot90_transpose_gate_on_matching_pair():
    # (16, 8, 8): axes 1 and 2 match -> only those may rotate/permute
    matching, valid = M._matching_axes((16, 8, 8))
    assert list(valid) == [1, 2]
    rng = np.random.RandomState(3)
    data = rng.randn(1, 16, 8, 8).astype(np.float32)
    seg = np.zeros((1, 16, 8, 8), np.int16)
    for _ in range(20):
        d2, s2 = M.rot90_augment(data.copy(), seg.copy(), rng, valid, p=1.0)
        assert d2.shape == data.shape  # plane rotation preserves shape


def test_seg_order1_invents_no_labels():
    """Per-label interpolation + argmax (batchgenerators is_seg semantics)
    must only emit labels present in the input (or -1 at the border)."""
    rng = np.random.RandomState(11)
    data = rng.randn(1, 20, 20, 20).astype(np.float32)
    seg = np.zeros((1, 20, 20, 20), np.int16)
    seg[0, 5:15, 5:15, 5:15] = 7
    seg[0, 8:12, 8:12, 8:12] = 3
    out_d, out_s = M.spatial_augment_da5(
        data, seg, (16, 16, 16), (-0.52, 0.52),
        np.random.RandomState(0), order_data=3, order_seg=1)
    got = set(np.unique(out_s).tolist())
    assert got <= {-1, 0, 3, 7}, got


def test_da5_variant_orders():
    from fast_nnunet_tpu.run.run_training import find_trainer_class
    assert find_trainer_class("nnUNetTrainerDA5ord0") is \
        find_trainer_class("NNUNetTrainerDA5ord0")
    assert find_trainer_class("nnUNetTrainerDA5Segord0") is \
        find_trainer_class("NNUNetTrainerDA5Segord0")


def test_da5_initial_patch_uses_wide_scale_range():
    """DA5 computes the initial patch with scale (0.7, 1.43) (ref :67-71)
    -> strictly larger than the default (0.85, 1.25) envelope."""
    from fast_nnunet_tpu.training.augment import \
        configure_rotation_dummyDA_mirroring_and_initial_patch_size as dflt
    rot, d2d, init5, mirror = \
        M.configure_da5_rotation_dummyDA_mirroring_and_initial_patch_size(
            (128, 128, 128))
    _, _, init_d, _ = dflt((128, 128, 128))
    assert all(a >= b for a, b in zip(init5, init_d))
    assert any(a > b for a, b in zip(init5, init_d))
    assert mirror == (0, 1, 2) and not d2d


def test_condensed_variant_env(monkeypatch, tmp_path):
    from fast_nnunet_tpu.training.augment_da5 import (DA5CondensedAugmenter,
                                                      DA5TrainingAugmenter)
    rng = np.random.RandomState(5)
    data, seg = _sample(rng, (12, 12, 12))
    for cls in (DA5TrainingAugmenter, DA5CondensedAugmenter):
        aug = cls((12, 12, 12), (-0.52, 0.52), (0, 1, 2))
        out, targets = aug(data.copy(), seg.copy(), np.random.RandomState(9))
        assert out.shape == (1, 12, 12, 12)
        assert targets[0].shape == (1, 12, 12, 12)
