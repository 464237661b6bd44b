import numpy as np

from fast_nnunet_tpu.postprocessing.connected_components import (
    apply_postprocessing, remove_all_but_largest_component,
    remove_all_but_largest_component_from_segmentation)


def test_largest_component():
    m = np.zeros((10, 10, 10), bool)
    m[1:4, 1:4, 1:4] = True   # 27 voxels
    m[7:9, 7:9, 7:9] = True   # 8 voxels
    out = remove_all_but_largest_component(m)
    assert out[2, 2, 2] and not out[7, 7, 7]
    assert out.sum() == 27


def test_per_label_removal():
    seg = np.zeros((10, 10, 10), np.uint8)
    seg[1:4, 1:4, 1:4] = 1
    seg[7:9, 7:9, 7:9] = 1   # small blob of class 1
    seg[5, 5, 5] = 2
    out = remove_all_but_largest_component_from_segmentation(seg, [1])
    assert out[2, 2, 2] == 1 and out[7, 7, 7] == 0
    assert out[5, 5, 5] == 2  # class 2 untouched


def test_joint_region_removal():
    seg = np.zeros((10, 10, 10), np.uint8)
    seg[1:4, 1:4, 1:4] = 1
    seg[2, 2, 2] = 2          # nested class 2 inside the big blob
    seg[8, 8, 8] = 2          # isolated voxel elsewhere
    out = remove_all_but_largest_component_from_segmentation(seg, [(1, 2)])
    assert out[2, 2, 2] == 2   # kept: part of the largest joint component
    assert out[8, 8, 8] == 0   # removed


def test_apply_pipeline():
    seg = np.zeros((6, 6, 6), np.uint8)
    seg[0, 0, 0] = 1
    seg[3:5, 3:5, 3:5] = 1
    out = apply_postprocessing(
        seg, ["remove_all_but_largest_component_from_segmentation"],
        [{"labels_or_regions": [1]}])
    assert out[0, 0, 0] == 0 and out[4, 4, 4] == 1


def test_ensemble_average(tmp_path):
    import numpy as np
    from fast_nnunet_tpu.ensembling.ensemble import average_probabilities
    a = np.zeros((2, 3, 3, 3), np.float16); a[0] = 1
    b = np.zeros((2, 3, 3, 3), np.float16); b[1] = 1
    fa, fb = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    np.savez_compressed(fa, probabilities=a)
    np.savez_compressed(fb, probabilities=b)
    avg = average_probabilities([fa, fb])
    np.testing.assert_allclose(avg, 0.5)
