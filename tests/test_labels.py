import numpy as np
import pytest

from fast_nnunet_tpu.core.labels import (LabelManager, convert_labelmap_to_one_hot)


PLAIN = {"background": 0, "liver": 1, "tumor": 2}
REGIONS = {"background": 0, "whole": (1, 2, 3), "core": (2, 3), "enhancing": 3}
IGNORE = {"background": 0, "a": 1, "b": 2, "ignore": 3}


def test_plain_labels():
    lm = LabelManager(PLAIN, None)
    assert not lm.has_regions
    assert not lm.has_ignore_label
    assert lm.all_labels == [0, 1, 2]
    assert lm.num_segmentation_heads == 3
    assert lm.foreground_labels == [1, 2]


def test_regions():
    lm = LabelManager(REGIONS, regions_class_order=(1, 2, 3))
    assert lm.has_regions
    assert lm.num_segmentation_heads == 3
    assert lm.all_regions == [(1, 2, 3), (2, 3), 3]
    assert lm.all_labels == [0, 1, 2, 3]


def test_ignore_label():
    lm = LabelManager(IGNORE, None)
    assert lm.has_ignore_label and lm.ignore_label == 3
    assert lm.all_labels == [0, 1, 2]


def test_ignore_label_must_be_highest():
    with pytest.raises(ValueError):
        LabelManager({"background": 0, "a": 2, "ignore": 1}, None)


def test_background_must_be_zero():
    with pytest.raises(ValueError):
        LabelManager({"background": 1, "a": 0}, None)
    with pytest.raises(ValueError):
        LabelManager({"a": 1}, None)


def test_probabilities_to_segmentation_argmax():
    lm = LabelManager(PLAIN, None)
    probs = np.zeros((3, 2, 2, 2), dtype=np.float32)
    probs[1, 0] = 1.0
    probs[2, 1] = 1.0
    seg = lm.convert_probabilities_to_segmentation(probs)
    assert (seg[0] == 1).all() and (seg[1] == 2).all()


def test_region_thresholding_order():
    lm = LabelManager(REGIONS, regions_class_order=(1, 2, 3))
    probs = np.zeros((3, 1, 1, 3), dtype=np.float32)
    probs[0, ..., :] = 0.9            # whole everywhere
    probs[1, ..., 1:] = 0.9           # core on voxels 1,2
    probs[2, ..., 2] = 0.9            # enhancing on voxel 2
    seg = lm.convert_probabilities_to_segmentation(probs)
    assert seg.tolist() == [[[1, 2, 3]]]  # later regions overwrite earlier ones


def test_logits_to_segmentation_softmax_invariance():
    lm = LabelManager(PLAIN, None)
    logits = np.random.RandomState(0).randn(3, 4, 4, 4).astype(np.float32)
    a = lm.convert_logits_to_segmentation(logits)
    b = lm.convert_probabilities_to_segmentation(lm.apply_inference_nonlin(logits))
    np.testing.assert_array_equal(a, b)


def test_revert_cropping():
    lm = LabelManager(PLAIN, None)
    probs = np.ones((3, 2, 2, 2), dtype=np.float32) / 3
    out = lm.revert_cropping_on_probabilities(probs, [[1, 3], [0, 2], [2, 4]], (4, 4, 4))
    assert out.shape == (3, 4, 4, 4)
    assert out[0, 0, 0, 0] == 1.0  # padded area is background
    assert out[1, 1, 0, 2] == pytest.approx(1 / 3)


def test_one_hot():
    seg = np.array([[[0, 1], [2, 1]]])
    oh = convert_labelmap_to_one_hot(seg, [0, 1, 2])
    assert oh.shape == (3, 1, 2, 2)
    np.testing.assert_array_equal(oh.sum(0), np.ones_like(seg))
    np.testing.assert_array_equal(oh[1][seg == 1], 1)
