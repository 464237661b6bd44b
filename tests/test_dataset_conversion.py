"""Dataset converters: synthetic source trees -> nnUNet_raw layout."""
import os

import numpy as np
import pytest

from fast_nnunet_tpu.dataset_conversion.converters import (
    convert_abdomenatlas, convert_acdc, convert_autopet2, convert_brats21,
    convert_brats_labels_back, convert_kits2023, convert_old_nnunet_task,
    convert_ribfrac, convert_ribseg, convert_totalsegmentator_mri)
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


def test_ribfrac_and_ribseg(raw_env):
    raw, tmp = raw_env
    src = join(tmp, "rib_src")
    maybe_mkdir_p(src)
    rng = np.random.RandomState(3)
    for c in ("RibFrac1", "RibFrac2"):
        _write_vol(join(src, f"{c}-image.nii.gz"), rng.rand(6, 6, 6))
        seg = rng.choice([0, 1, 2, 3, 4, -1], size=(6, 6, 6)).astype(np.int16)
        write_nifti(join(src, f"{c}-label.nii.gz"), seg)
        write_nifti(join(src, f"{c}-rib-seg.nii.gz"),
                    rng.choice(25, size=(6, 6, 6)).astype(np.uint8))
    # a test case: image without label
    _write_vol(join(src, "RibFrac9-image.nii.gz"), rng.rand(6, 6, 6))

    out = convert_ribfrac(src, dataset_id=915, name="RibFracTest")
    dj = load_json(join(out, "dataset.json"))
    assert list(dj["labels"]["fracture"]) == [1, 2, 3, 4, 5]
    seg_conv, _ = read_nifti(join(out, "labelsTr", "RibFrac1.nii.gz"))
    assert set(np.unique(seg_conv)) <= {0, 1, 2, 3, 4, 5}
    assert -1 not in np.unique(seg_conv)
    assert len(subfiles(join(out, "imagesTs"), suffix=".nii.gz")) == 1

    out2 = convert_ribseg(src, dataset_id=918, name="RibSegTest")
    dj2 = load_json(join(out2, "dataset.json"))
    assert dj2["labels"]["rib_24"] == 24
    assert len(subfiles(join(out2, "imagesTr"), suffix=".nii.gz")) == 2


def test_abdomenatlas(raw_env):
    raw, tmp = raw_env
    src = join(tmp, "aa_src")
    rng = np.random.RandomState(4)
    for c in ("BDMAP_0001", "BDMAP_0002"):
        maybe_mkdir_p(join(src, c))
        _write_vol(join(src, c, "ct.nii.gz"), rng.rand(5, 5, 5))
        write_nifti(join(src, c, "combined_labels.nii.gz"),
                    rng.choice(10, size=(5, 5, 5)).astype(np.uint8))
    out = convert_abdomenatlas(src, dataset_id=924, name="AATest")
    dj = load_json(join(out, "dataset.json"))
    assert dj["labels"]["stomach"] == 9
    assert len(subfiles(join(out, "imagesTr"), suffix=".nii.gz")) == 2


def test_totalsegmentator_mri(raw_env):
    raw, tmp = raw_env
    src = join(tmp, "tsm_src")
    rng = np.random.RandomState(5)
    for c in ("s0001", "s0002"):
        maybe_mkdir_p(join(src, c, "segmentations"))
        _write_vol(join(src, c, "mri.nii.gz"), rng.rand(5, 5, 5))
        for s in ("liver", "spleen"):
            write_nifti(join(src, c, "segmentations", f"{s}.nii.gz"),
                        (rng.rand(5, 5, 5) > 0.7).astype(np.uint8))
    out = convert_totalsegmentator_mri(src, dataset_id=927, name="TSMTest")
    dj = load_json(join(out, "dataset.json"))
    assert dj["labels"] == {"background": 0, "liver": 1, "spleen": 2}
    assert dj["overwrite_image_reader_writer"] == "NibabelIOWithReorient"
    seg, _ = read_nifti(join(out, "labelsTr", "s0001.nii.gz"))
    assert set(np.unique(seg)) <= {0, 1, 2}


def test_autopet2(raw_env):
    raw, tmp = raw_env
    src = join(tmp, "pet_src")
    rng = np.random.RandomState(6)
    for pat in ("PETCT_a", "PETCT_b"):
        for acq in ("01", "02"):
            d = join(src, pat, acq)
            maybe_mkdir_p(d)
            _write_vol(join(d, "CTres.nii.gz"), rng.rand(4, 4, 4))
            _write_vol(join(d, "SUV.nii.gz"), rng.rand(4, 4, 4))
            write_nifti(join(d, "SEG.nii.gz"),
                        (rng.rand(4, 4, 4) > 0.8).astype(np.uint8))
    out = convert_autopet2(src, dataset_id=921, name="PETTest")
    assert len(subfiles(join(out, "imagesTr"), suffix=".nii.gz")) == 8
    splits = load_json(join(out, "splits_final.json"))
    assert len(splits) == 5
    # all acquisitions of one patient share a fold
    for sp in splits:
        val_pats = {v.rsplit("_", 1)[0] for v in sp["val"]}
        tr_pats = {t.rsplit("_", 1)[0] for t in sp["train"]}
        assert not (val_pats & tr_pats)


def test_toothfairy2(raw_env):
    from fast_nnunet_tpu.dataset_conversion.converters import (
        convert_toothfairy2, toothfairy2_label_mapping)
    from fast_nnunet_tpu.imageio.mha import write_mha
    raw, tmp = raw_env
    src = join(tmp, "tf_src")
    maybe_mkdir_p(join(src, "imagesTr"))
    maybe_mkdir_p(join(src, "labelsTr"))
    rng = np.random.RandomState(7)
    write_mha(join(src, "imagesTr", "ToothFairy2F_001_0000.mha"),
              rng.rand(6, 6, 6).astype(np.float32), (1.0, 1.0, 1.0))
    seg = rng.choice([0, 1, 11, 21, 31, 41, 48], size=(6, 6, 6)).astype(np.uint8)
    write_mha(join(src, "labelsTr", "ToothFairy2F_001.mha"), seg, (1.0, 1.0, 1.0))

    out = convert_toothfairy2(src, dataset_id=919, name="TFTest")
    m = toothfairy2_label_mapping()
    assert m[11] == 11 and m[21] == 19 and m[31] == 27 and m[41] == 35 and m[48] == 42
    conv, _ = read_nifti(join(out, "labelsTr", "ToothFairy2F_001.nii.gz"))
    assert set(np.unique(conv)) <= {0, 1, 11, 19, 27, 35, 42}


def test_brats18_hgg_lgg(raw_env):
    from fast_nnunet_tpu.dataset_conversion.converters import convert_brats18
    raw, tmp = raw_env
    src = join(tmp, "brats18_src")
    rng = np.random.RandomState(3)
    for grade, c in (("HGG", "Brats18_A_1"), ("LGG", "Brats18_B_1")):
        maybe_mkdir_p(join(src, grade, c))
        for mod in ("t1", "t1ce", "t2", "flair"):
            write_nifti(join(src, grade, c, f"{c}_{mod}.nii"),
                        rng.rand(6, 6, 6).astype(np.float32))
        seg = rng.choice([0, 1, 2, 4], size=(6, 6, 6)).astype(np.uint8)
        write_nifti(join(src, grade, c, f"{c}_seg.nii"), seg)
    out = convert_brats18(src, dataset_id=902, name="B18Test")
    dj = load_json(join(out, "dataset.json"))
    assert dj["file_ending"] == ".nii"
    assert len(subfiles(join(out, "imagesTr"), suffix=".nii")) == 8
    seg_conv, _ = read_nifti(join(out, "labelsTr", "Brats18_A_1.nii"))
    assert set(np.unique(seg_conv)) <= {0, 1, 2, 3}


def test_brats2024_gli(raw_env):
    from fast_nnunet_tpu.dataset_conversion.converters import convert_brats2024_gli
    raw, tmp = raw_env
    src = join(tmp, "gli_src")
    rng = np.random.RandomState(4)
    c = "BraTS-GLI-00000-000"
    maybe_mkdir_p(join(src, c))
    for mod in ("t1n", "t1c", "t2w", "t2f"):
        write_nifti(join(src, c, f"{c}-{mod}.nii.gz"),
                    rng.rand(6, 6, 6).astype(np.float32))
    write_nifti(join(src, c, f"{c}-seg.nii.gz"),
                rng.randint(0, 5, (6, 6, 6)).astype(np.uint8))
    out = convert_brats2024_gli(src, dataset_id=903, name="GLITest")
    dj = load_json(join(out, "dataset.json"))
    assert dj["labels"]["RC"] == 4
    assert len(subfiles(join(out, "imagesTr"), suffix=".nii.gz")) == 4


def test_ctaaorta_mha_transcode(raw_env):
    from fast_nnunet_tpu.dataset_conversion.converters import convert_ctaaorta
    from fast_nnunet_tpu.imageio.mha import write_mha
    raw, tmp = raw_env
    src = join(tmp, "aorta_src")
    maybe_mkdir_p(join(src, "images"))
    maybe_mkdir_p(join(src, "masks"))
    rng = np.random.RandomState(5)
    img = rng.rand(7, 6, 5).astype(np.float32)
    seg = rng.randint(0, 24, (7, 6, 5)).astype(np.uint8)
    write_mha(join(src, "images", "subject001_CTA.mha"), img, (1.0, 0.8, 2.0))
    write_mha(join(src, "masks", "subject001_label.mha"), seg, (1.0, 0.8, 2.0))
    out = convert_ctaaorta(src, dataset_id=904, name="AortaTest")
    dj = load_json(join(out, "dataset.json"))
    assert dj["labels"]["Zone_0"] == 1 and len(dj["labels"]) == 24
    got, hdr = read_nifti(join(out, "imagesTr", "subject001_0000.nii.gz"))
    np.testing.assert_allclose(got, img, rtol=1e-6)
    gseg, _ = read_nifti(join(out, "labelsTr", "subject001.nii.gz"))
    np.testing.assert_array_equal(gseg, seg)


def test_emidec(raw_env):
    from fast_nnunet_tpu.dataset_conversion.converters import convert_emidec
    raw, tmp = raw_env
    src = join(tmp, "emidec_src")
    rng = np.random.RandomState(6)
    for pat in ("Case_P001", "Case_P002"):
        maybe_mkdir_p(join(src, pat, "Images"))
        maybe_mkdir_p(join(src, pat, "Contours"))
        write_nifti(join(src, pat, "Images", f"{pat}.nii.gz"),
                    rng.rand(6, 6, 4).astype(np.float32))
        write_nifti(join(src, pat, "Contours", f"{pat}.nii.gz"),
                    rng.randint(0, 5, (6, 6, 4)).astype(np.uint8))
    out = convert_emidec(src, dataset_id=905, name="EmidecTest")
    dj = load_json(join(out, "dataset.json"))
    assert dj["labels"]["no_reflow"] == 4
    assert len(subfiles(join(out, "imagesTr"), suffix=".nii.gz")) == 2


def test_amos_post_challenge(raw_env):
    from fast_nnunet_tpu.dataset_conversion.converters import \
        convert_amos_post_challenge
    raw, tmp = raw_env
    src = join(tmp, "amos_src")
    rng = np.random.RandomState(7)
    for sub in ("imagesTr", "imagesVa", "imagesTs", "labelsTr", "labelsVa"):
        maybe_mkdir_p(join(src, sub))
    for name, img_dir, lab_dir in (("amos_0001", "imagesTr", "labelsTr"),
                                   ("amos_0500", "imagesVa", "labelsVa")):
        write_nifti(join(src, img_dir, f"{name}.nii.gz"),
                    rng.rand(6, 6, 4).astype(np.float32))
        write_nifti(join(src, lab_dir, f"{name}.nii.gz"),
                    rng.randint(0, 3, (6, 6, 4)).astype(np.uint8))
    write_nifti(join(src, "imagesTs", "amos_0600.nii.gz"),
                rng.rand(6, 6, 4).astype(np.float32))
    save_json({"labels": {"0": "background", "1": "spleen", "2": "liver"}},
              join(src, "dataset.json"))
    out = convert_amos_post_challenge(src, dataset_id=906, name="AmosPCTest")
    dj = load_json(join(out, "dataset.json"))
    assert dj["labels"]["liver"] == 2
    # Tr + Va merged into the training pool
    assert len(subfiles(join(out, "imagesTr"), suffix=".nii.gz")) == 2
    assert len(subfiles(join(out, "labelsTr"), suffix=".nii.gz")) == 2
    assert len(subfiles(join(out, "imagesTs"), suffix=".nii.gz")) == 1


def test_mnms_frame_extraction(raw_env):
    from fast_nnunet_tpu.dataset_conversion.converters import convert_mnms
    raw, tmp = raw_env
    src = join(tmp, "mnms_src")
    pat_dir = join(src, "Training", "Labeled", "A0S9V9")
    maybe_mkdir_p(pat_dir)
    rng = np.random.RandomState(8)
    img4d = rng.rand(6, 6, 4, 10).astype(np.float32)
    seg4d = np.zeros((6, 6, 4, 10), np.uint8)
    seg4d[..., 2] = 1  # ED frame content
    seg4d[..., 7] = 3  # ES frame content
    write_nifti(join(pat_dir, "A0S9V9_sa.nii.gz"), img4d,
                spacing=(1.2, 1.2, 8.0, 1.0))
    write_nifti(join(pat_dir, "A0S9V9_sa_gt.nii.gz"), seg4d,
                spacing=(1.2, 1.2, 8.0, 1.0))
    csv_name = "info.csv"
    with open(join(src, csv_name), "w") as f:
        f.write("External code,Vendor,ED,ES\nA0S9V9,A,2,7\n")
    out = convert_mnms(src, dataset_id=907, name="MNMsTest",
                       csv_file_name=csv_name)
    dj = load_json(join(out, "dataset.json"))
    assert dj["labels"]["RV"] == 3
    ed, hdr = read_nifti(join(out, "imagesTr", "A0S9V9_frame02_0000.nii.gz"))
    assert ed.shape == (6, 6, 4)
    np.testing.assert_allclose(ed, img4d[..., 2], rtol=1e-6)
    seg_es, _ = read_nifti(join(out, "labelsTr", "A0S9V9_frame07.nii.gz"))
    assert (seg_es == 3).all()
    assert abs(hdr["pixdim"][3] - 8.0) < 1e-6


def test_road_segmentation(raw_env):
    from PIL import Image
    from fast_nnunet_tpu.dataset_conversion.converters import \
        convert_road_segmentation
    raw, tmp = raw_env
    src = join(tmp, "roads_src")
    maybe_mkdir_p(join(src, "training", "input"))
    maybe_mkdir_p(join(src, "training", "output"))
    rng = np.random.RandomState(9)
    img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
    img[:16, :16] = 255  # a big blank-white region (256 px > min size 50)
    seg = np.zeros((32, 32), np.uint8)
    seg[:, 8] = 255  # a road crossing the blank region
    Image.fromarray(img).save(join(src, "training", "input", "img-1.png"))
    Image.fromarray(seg).save(join(src, "training", "output", "img-1.png"))
    out = convert_road_segmentation(src, dataset_id=908, name="RoadsTest")
    dj = load_json(join(out, "dataset.json"))
    assert dj["file_ending"] == ".png"
    got = np.asarray(Image.open(join(out, "labelsTr", "img-1.png")))
    # 255 -> 1, and the stretch inside the blank-white region cleared
    assert set(np.unique(got)) <= {0, 1}
    assert (got[:16, 8] == 0).all() and (got[16:, 8] == 1).all()


def test_fluo_c3dh(raw_env, monkeypatch, tmp_path):
    from fast_nnunet_tpu.dataset_conversion.converters import \
        convert_fluo_c3dh_a549_sim
    from fast_nnunet_tpu.imageio.tiff import _write_tiff_stack
    raw, tmp = raw_env
    monkeypatch.setenv("nnUNet_preprocessed", str(tmp_path / "pre"))
    maybe_mkdir_p(str(tmp_path / "pre"))
    src = join(tmp, "fluo_src")
    rng = np.random.RandomState(10)
    for seq in ("01", "02"):
        maybe_mkdir_p(join(src, seq))
        maybe_mkdir_p(join(src, seq + "_GT", "SEG"))
        for t in range(2):
            _write_tiff_stack(join(src, seq, f"t{t:03d}.tif"),
                              (rng.rand(3, 8, 8) * 100).astype(np.uint16))
            _write_tiff_stack(join(src, seq + "_GT", "SEG",
                                   f"man_seg{t:03d}.tif"),
                              rng.randint(0, 2, (3, 8, 8)).astype(np.uint16))
    out = convert_fluo_c3dh_a549_sim(src, dataset_id=909, name="FluoTest")
    dj = load_json(join(out, "dataset.json"))
    assert dj["file_ending"] == ".tif"
    # spacing sidecars written for every case
    assert len(subfiles(join(out, "imagesTr"), suffix=".json")) == 4
    from fast_nnunet_tpu.paths import get_preprocessed_folder
    splits = load_json(join(get_preprocessed_folder(), "Dataset909_FluoTest",
                            "splits_final.json"))
    assert len(splits) == 2
    assert all(c.startswith("01_") for c in splits[0]["train"])
