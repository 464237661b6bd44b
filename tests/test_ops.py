import numpy as np
import pytest

from fast_nnunet_tpu.ops.sliding_window import (
    compute_gaussian, compute_steps_for_sliding_window, tile_coords_from_steps)
from fast_nnunet_tpu.ops.cropping import (
    crop_to_nonzero, get_bbox_from_mask, insert_crop_into_image)
from fast_nnunet_tpu.ops.pad import pad_nd_image, crop_and_pad_nd
from fast_nnunet_tpu.ops.normalization import (
    CTNormalization, ZScoreNormalization, RescaleTo01Normalization)
from fast_nnunet_tpu.ops.resampling import (
    compute_new_shape, determine_do_sep_z_and_axis, resample_data_or_seg,
    resample_data_or_seg_to_spacing, resize_segmentation, skimage_resize)


# ---- sliding window math ---------------------------------------------------
def test_steps_reference_example():
    # documented example in the reference: image 110, tile 64, step 0.5 -> 0, 23, 46
    steps = compute_steps_for_sliding_window((110,), (64,), 0.5)
    assert steps == [[0, 23, 46]]


def test_steps_exact_fit():
    steps = compute_steps_for_sliding_window((128, 128), (64, 128), 0.5)
    assert steps[0] == [0, 32, 64]
    assert steps[1] == [0]


def test_steps_cover_border():
    for size in (130, 160, 257):
        steps = compute_steps_for_sliding_window((size,), (64,), 0.5)[0]
        assert steps[0] == 0 and steps[-1] == size - 64
        assert all(b - a <= 32 for a, b in zip(steps, steps[1:]))


def test_gaussian_properties():
    g = compute_gaussian((32, 16, 16))
    assert g.shape == (32, 16, 16)
    assert g.max() == pytest.approx(1.0)
    assert (g > 0).all()
    # symmetric around center for even sizes: g[c+k] == g[c-k]
    c = 16
    np.testing.assert_allclose(g[c + 3, 8, 8], g[c - 3, 8, 8], rtol=1e-5)
    # center is max
    assert g[16, 8, 8] == g.max()


def test_tile_coords():
    coords = tile_coords_from_steps([[0, 32], [0, 48, 96]])
    assert coords.shape == (6, 2)
    assert coords[0].tolist() == [0, 0]
    assert coords[1].tolist() == [0, 48]  # last axis fastest
    assert coords[-1].tolist() == [32, 96]


# ---- cropping ----------------------------------------------------------------
def test_crop_to_nonzero():
    data = np.zeros((1, 10, 10, 10), dtype=np.float32)
    data[0, 2:8, 3:7, 1:9] = 1.0
    seg = np.zeros((1, 10, 10, 10), dtype=np.int8)
    cropped, seg_c, bbox = crop_to_nonzero(data, seg)
    assert bbox == [[2, 8], [3, 7], [1, 9]]
    assert cropped.shape == (1, 6, 4, 8)
    assert (seg_c != -1).all()  # fully nonzero inside bbox
    # holes in the mask get filled -> no -1 inside
    data2 = np.zeros((1, 10, 10, 10), dtype=np.float32)
    data2[0, 2:8, 2:8, 2:8] = 1.0
    data2[0, 4:6, 4:6, 4:6] = 0.0  # interior hole
    _, seg2, _ = crop_to_nonzero(data2)
    assert (seg2 == 0).all()


def test_crop_to_nonzero_labels_outside():
    data = np.zeros((1, 6, 6, 6), dtype=np.float32)
    data[0, 1:5, 1:5, 1:5] = 1.0
    data[0, 1, 1, 1] = 0.0  # zero corner inside bbox (not a hole)
    seg = np.zeros((1, 6, 6, 6), dtype=np.int8)
    _, seg_c, bbox = crop_to_nonzero(data, seg)
    assert seg_c[0, 0, 0, 0] == -1


def test_insert_crop_roundtrip():
    img = np.random.RandomState(0).rand(2, 8, 8, 8)
    bbox = [[1, 5], [2, 7], [0, 8]]
    crop = img[:, 1:5, 2:7, 0:8].copy()
    target = np.zeros_like(img)
    insert_crop_into_image(target, crop, bbox)
    np.testing.assert_array_equal(target[:, 1:5, 2:7, :], crop)


# ---- padding -----------------------------------------------------------------
def test_pad_nd_image_centered():
    img = np.ones((1, 10, 12, 9), dtype=np.float32)
    padded, slicer = pad_nd_image(img, (16, 16, 16), return_slicer=True)
    assert padded.shape == (1, 16, 16, 16)
    np.testing.assert_array_equal(padded[slicer], img)
    # extra voxel goes to the back: 9 -> 16 pads 3 below, 4 above
    assert slicer[3] == slice(3, 12)


def test_pad_divisible():
    img = np.ones((1, 10, 12, 9))
    padded = pad_nd_image(img, shape_must_be_divisible_by=(8, 8, 8))
    assert padded.shape == (1, 16, 16, 16)
    padded2 = pad_nd_image(np.ones((1, 16, 16, 16)), shape_must_be_divisible_by=(8, 8, 8))
    assert padded2.shape == (1, 16, 16, 16)  # already divisible: unchanged


def test_crop_and_pad_nd_out_of_bounds():
    img = np.arange(27, dtype=np.float32).reshape(1, 3, 3, 3)
    out = crop_and_pad_nd(img, [[-1, 2], [0, 3], [1, 4]])
    assert out.shape == (1, 3, 3, 3)
    assert (out[:, 0] == 0).all()          # padded region
    assert out[0, 1, 0, 0] == img[0, 0, 0, 1]


# ---- normalization -------------------------------------------------------------
def test_zscore():
    rng = np.random.RandomState(0)
    img = rng.rand(4, 5, 6).astype(np.float32) * 100
    out = ZScoreNormalization().run(img)
    assert abs(out.mean()) < 1e-4 and abs(out.std() - 1) < 1e-4


def test_zscore_masked():
    img = np.zeros((4, 4, 4), dtype=np.float32)
    img[1:3] = 5.0
    seg = np.full((4, 4, 4), -1, dtype=np.int8)
    seg[1:3] = 0
    out = ZScoreNormalization(use_mask_for_norm=True).run(img, seg)
    assert (out[0] == 0).all()  # outside mask untouched (stays 0)


def test_ct_normalization():
    props = {"mean": 100.0, "std": 50.0, "percentile_00_5": 0.0, "percentile_99_5": 200.0}
    img = np.array([[-100.0, 0.0, 100.0, 300.0]], dtype=np.float32)
    out = CTNormalization(intensityproperties=props).run(img)
    np.testing.assert_allclose(out, [[-2.0, -2.0, 0.0, 2.0]])


def test_rescale01():
    img = np.array([2.0, 4.0, 6.0], dtype=np.float32)
    np.testing.assert_allclose(RescaleTo01Normalization().run(img), [0, 0.5, 1])


# ---- resampling ------------------------------------------------------------------
def test_compute_new_shape():
    np.testing.assert_array_equal(
        compute_new_shape((100, 100, 40), (1.0, 1.0, 3.0), (2.0, 2.0, 2.0)),
        [50, 50, 60])


def test_do_sep_z_logic():
    assert determine_do_sep_z_and_axis(None, (1, 1, 5), (1, 1, 5)) == (True, 2)
    assert determine_do_sep_z_and_axis(None, (1, 1, 1), (1, 1, 1)) == (False, None)
    # two tied anisotropic axes -> disabled
    assert determine_do_sep_z_and_axis(None, (0.24, 1.25, 1.25), (0.24, 1.25, 1.25)) == (False, None)
    assert determine_do_sep_z_and_axis(True, (1, 1, 5), (1, 1, 1)) == (True, 2)
    assert determine_do_sep_z_and_axis(False, (1, 1, 5), (1, 1, 1)) == (False, None)


def test_skimage_resize_identity_and_constant():
    img = np.random.RandomState(0).rand(8, 8)
    np.testing.assert_allclose(skimage_resize(img, (8, 8), 3), img)
    const = np.full((6, 6, 6), 3.7)
    out = skimage_resize(const, (12, 9, 4), 3)
    np.testing.assert_allclose(out, 3.7, rtol=1e-6)


def test_skimage_resize_linear_ramp():
    # order-1 resize of a linear ramp stays linear in the interior
    x = np.linspace(0, 1, 16)[:, None] * np.ones((1, 16))
    out = skimage_resize(x, (32, 16), 1)
    assert out.shape == (32, 16)
    assert np.all(np.diff(out[:, 0]) >= -1e-9)  # monotone


def test_resize_segmentation_preserves_labels():
    seg = np.zeros((12, 12), dtype=np.int16)
    seg[3:9, 3:9] = 2
    seg[5:7, 5:7] = 5
    out = resize_segmentation(seg, (24, 24), 1)
    assert set(np.unique(out)) <= {0, 2, 5}
    assert out[12, 12] == 5
    assert out.dtype == seg.dtype


def test_resample_data_roundtrip_shape():
    data = np.random.RandomState(0).rand(2, 20, 24, 10).astype(np.float32)
    out = resample_data_or_seg(data, (40, 48, 20), is_seg=False, order=3)
    assert out.shape == (2, 40, 48, 20)
    assert out.dtype == np.float32
    # downsample back ~ recovers coarse structure
    back = resample_data_or_seg(out, (20, 24, 10), is_seg=False, order=1)
    assert np.corrcoef(back.ravel(), data.ravel())[0, 1] > 0.95


def test_resample_separate_z_order0():
    data = np.zeros((1, 8, 8, 4), dtype=np.float32)
    data[0, :, :, 2] = 1.0
    out = resample_data_or_seg(data, (8, 8, 8), is_seg=False, axis=2, order=1,
                               do_separate_z=True, order_z=0)
    assert out.shape == (1, 8, 8, 8)
    # order-0 along z: values are copies of in-plane slices, no blending
    assert set(np.unique(out)) <= {0.0, 1.0}


def test_resample_to_spacing_aniso():
    data = np.random.RandomState(1).rand(1, 16, 16, 6).astype(np.float32)
    out = resample_data_or_seg_to_spacing(data, (1.0, 1.0, 4.0), (1.0, 1.0, 2.0))
    assert out.shape == (1, 16, 16, 12)


def test_resample_seg_no_new_labels():
    seg = np.zeros((1, 10, 10, 10), dtype=np.int8)
    seg[0, 2:8, 2:8, 2:8] = 3
    out = resample_data_or_seg(seg, (17, 13, 23), is_seg=True, order=1)
    assert set(np.unique(out)) <= {0, 3}
