"""Dataset converters: synthetic source trees -> nnUNet_raw layout."""
import os

import numpy as np
import pytest

from fast_nnunet_tpu.dataset_conversion.converters import (
    convert_acdc, convert_brats21, convert_brats_labels_back,
    convert_kits2023, convert_old_nnunet_task)
from fast_nnunet_tpu.imageio.nifti import read_nifti, write_nifti
from fast_nnunet_tpu.utils.io import (join, load_json, maybe_mkdir_p,
                                      save_json, subfiles)


@pytest.fixture
def raw_env(tmp_path, monkeypatch):
    raw = tmp_path / "raw"
    raw.mkdir()
    monkeypatch.setenv("nnUNet_raw", str(raw))
    return str(raw), str(tmp_path)


def _write_vol(fname, data):
    write_nifti(fname, data.astype(np.float32))


def test_brats21(raw_env):
    raw, tmp = raw_env
    src = join(tmp, "brats_src")
    rng = np.random.RandomState(0)
    for c in ("BraTS2021_00000", "BraTS2021_00002"):
        maybe_mkdir_p(join(src, c))
        for mod in ("t1", "t1ce", "t2", "flair"):
            _write_vol(join(src, c, f"{c}_{mod}.nii.gz"), rng.rand(8, 8, 8))
        seg = rng.choice([0, 1, 2, 4], size=(8, 8, 8)).astype(np.uint8)
        write_nifti(join(src, c, f"{c}_seg.nii.gz"), seg)

    out = convert_brats21(src, dataset_id=901, name="BraTSTest")
    dj = load_json(join(out, "dataset.json"))
    assert dj["labels"]["whole tumor"] == [1, 2, 3] or \
        dj["labels"]["whole tumor"] == (1, 2, 3)
    assert dj["regions_class_order"] == [1, 2, 3] or \
        dj["regions_class_order"] == (1, 2, 3)
    assert len(subfiles(join(out, "imagesTr"), suffix=".nii.gz")) == 8
    # label remap: no 4s left, and the back-conversion restores them
    seg_conv, _ = read_nifti(join(out, "labelsTr", "BraTS2021_00000.nii.gz"))
    assert set(np.unique(seg_conv)) <= {0, 1, 2, 3}
    orig, _ = read_nifti(join(src, "BraTS2021_00000",
                              "BraTS2021_00000_seg.nii.gz"))
    np.testing.assert_array_equal(convert_brats_labels_back(seg_conv), orig)


def test_kits2023(raw_env):
    raw, tmp = raw_env
    src = join(tmp, "kits_src")
    rng = np.random.RandomState(1)
    for c in ("case_00000", "case_00001"):
        maybe_mkdir_p(join(src, c))
        _write_vol(join(src, c, "imaging.nii.gz"), rng.rand(6, 6, 6))
        write_nifti(join(src, c, "segmentation.nii.gz"),
                    rng.randint(0, 4, (6, 6, 6)).astype(np.uint8))
    out = convert_kits2023(src, dataset_id=902, name="KiTSTest")
    dj = load_json(join(out, "dataset.json"))
    assert list(dj["regions_class_order"]) == [1, 3, 2]
    assert os.path.isfile(join(out, "imagesTr", "case_00000_0000.nii.gz"))
    assert os.path.isfile(join(out, "labelsTr", "case_00001.nii.gz"))


def test_acdc(raw_env):
    raw, tmp = raw_env
    src = join(tmp, "acdc_src")
    rng = np.random.RandomState(2)
    for pat in ("patient001", "patient002"):
        d = join(src, "training", pat)
        maybe_mkdir_p(d)
        for frame in ("frame01", "frame12"):
            _write_vol(join(d, f"{pat}_{frame}.nii.gz"), rng.rand(6, 6, 6))
            write_nifti(join(d, f"{pat}_{frame}_gt.nii.gz"),
                        rng.randint(0, 4, (6, 6, 6)).astype(np.uint8))
        _write_vol(join(d, f"{pat}_4d.nii.gz"), rng.rand(6, 6, 6))
    out = convert_acdc(src, dataset_id=903, name="ACDCTest")
    dj = load_json(join(out, "dataset.json"))
    assert dj["numTraining"] == 4
    assert os.path.isfile(join(out, "imagesTr", "patient001_frame01_0000.nii.gz"))
    assert os.path.isfile(join(out, "labelsTr", "patient001_frame01.nii.gz"))
    assert not os.path.isfile(join(out, "imagesTr", "patient001_4d_0000.nii.gz"))


def test_old_nnunet_task(raw_env):
    raw, tmp = raw_env
    src = join(tmp, "Task042_Old")
    rng = np.random.RandomState(3)
    maybe_mkdir_p(join(src, "imagesTr"))
    maybe_mkdir_p(join(src, "labelsTr"))
    _write_vol(join(src, "imagesTr", "case_0000.nii.gz"), rng.rand(6, 6, 6))
    write_nifti(join(src, "labelsTr", "case.nii.gz"),
                rng.randint(0, 2, (6, 6, 6)).astype(np.uint8))
    save_json({"modality": {"0": "CT"}, "labels": {"0": "background", "1": "organ"},
               "tensorImageSize": "3D", "numTraining": 1, "numTest": 0,
               "training": [{"image": "x", "label": "y"}], "test": []},
              join(src, "dataset.json"))
    out = convert_old_nnunet_task(src, "Dataset942_Old")
    dj = load_json(join(out, "dataset.json"))
    assert dj["channel_names"] == {"0": "CT"}
    assert dj["labels"] == {"background": 0, "organ": 1}
    assert "training" not in dj and "modality" not in dj
    assert os.path.isfile(join(out, "imagesTr", "case_0000.nii.gz"))
    # refuses to overwrite
    with pytest.raises(RuntimeError):
        convert_old_nnunet_task(src, "Dataset942_Old")
