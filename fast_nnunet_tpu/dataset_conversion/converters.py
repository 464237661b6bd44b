"""Converters for common public datasets -> nnU-Net raw layout.

TPU-framework ports of the reference's most-used dataset recipes (ref
distillation/nnunetv2/dataset_conversion/Dataset137_BraTS21.py,
Dataset220_KiTS2023.py, Dataset218_Amos2022_task1.py, Dataset027_ACDC.py,
convert_raw_dataset_from_old_nnunet_format.py), built on our pure-numpy
NIfTI IO instead of SimpleITK. Each converter writes
``nnUNet_raw/DatasetXXX_Name/{imagesTr,labelsTr}`` + a v2 ``dataset.json``.
"""
import argparse
import shutil
from copy import deepcopy
from typing import Optional

import numpy as np

from ..imageio.nifti import read_nifti, write_nifti
from ..utils.dataset_io import generate_dataset_json
from ..utils.io import (isdir, join, load_json, maybe_mkdir_p, save_json,
                        subdirs, subfiles)


def _out_base(dataset_id: int, name: str) -> str:
    from ..paths import get_raw_folder
    out = join(get_raw_folder(), f"Dataset{dataset_id:03d}_{name}")
    maybe_mkdir_p(join(out, "imagesTr"))
    maybe_mkdir_p(join(out, "labelsTr"))
    return out


# --------------------------------------------------------------------- BraTS
def convert_brats_labels_to_nnunet(in_file: str, out_file: str) -> None:
    """BraTS labels (0, 1, 2, 4) -> consecutive nnU-Net labels: necrosis 1->2,
    edema 2->1, enhancing 4->3 (matches the reference's remap so region
    definitions line up)."""
    seg, hdr = read_nifti(in_file)
    u = np.unique(seg)
    if not np.all(np.isin(u, [0, 1, 2, 4])):
        raise RuntimeError(f"unexpected BraTS labels {u} in {in_file}")
    out = np.zeros_like(seg, dtype=np.uint8)
    out[seg == 2] = 1
    out[seg == 1] = 2
    out[seg == 4] = 3
    write_nifti(out_file, out, header=hdr)


def convert_brats_labels_back(seg: np.ndarray) -> np.ndarray:
    """Inverse remap for submitting predictions in BraTS convention."""
    out = np.zeros_like(seg)
    out[seg == 1] = 2
    out[seg == 2] = 1
    out[seg == 3] = 4
    return out


def convert_folder_back_to_brats(input_folder: str, output_folder: str) -> None:
    maybe_mkdir_p(output_folder)
    for f in subfiles(input_folder, suffix=".nii.gz"):
        seg, hdr = read_nifti(join(input_folder, f))
        write_nifti(join(output_folder, f), convert_brats_labels_back(seg),
                    header=hdr)


def convert_brats21(brats_data_dir: str, dataset_id: int = 137,
                    name: str = "BraTS2021") -> str:
    """BraTS 2021 (also works for 2018/2019 folder layouts with per-case
    <case>_{t1,t1ce,t2,flair,seg}.nii.gz): region-based training with
    whole-tumor/tumor-core/enhancing regions."""
    out = _out_base(dataset_id, name)
    cases = subdirs(brats_data_dir, prefix="BraTS")
    for c in cases:
        for i, mod in enumerate(("t1", "t1ce", "t2", "flair")):
            shutil.copy(join(brats_data_dir, c, f"{c}_{mod}.nii.gz"),
                        join(out, "imagesTr", f"{c}_{i:04d}.nii.gz"))
        convert_brats_labels_to_nnunet(join(brats_data_dir, c, f"{c}_seg.nii.gz"),
                                       join(out, "labelsTr", f"{c}.nii.gz"))
    generate_dataset_json(
        out, channel_names={0: "T1", 1: "T1ce", 2: "T2", 3: "Flair"},
        labels={"background": 0, "whole tumor": (1, 2, 3),
                "tumor core": (2, 3), "enhancing tumor": (3,)},
        num_training_cases=len(cases), file_ending=".nii.gz",
        regions_class_order=(1, 2, 3))
    return out


# ------------------------------------------------------------------ KiTS2023
def convert_kits2023(kits_base_dir: str, dataset_id: int = 220,
                     name: str = "KiTS2023") -> str:
    """KiTS23: kidney/masses/tumor as overlapping regions, export order
    (1, 3, 2) so tumor overwrites cyst."""
    out = _out_base(dataset_id, name)
    cases = subdirs(kits_base_dir, prefix="case_")
    for c in cases:
        shutil.copy(join(kits_base_dir, c, "imaging.nii.gz"),
                    join(out, "imagesTr", f"{c}_0000.nii.gz"))
        shutil.copy(join(kits_base_dir, c, "segmentation.nii.gz"),
                    join(out, "labelsTr", f"{c}.nii.gz"))
    generate_dataset_json(
        out, channel_names={0: "CT"},
        labels={"background": 0, "kidney": (1, 2, 3), "masses": (2, 3),
                "tumor": 2},
        num_training_cases=len(cases), file_ending=".nii.gz",
        regions_class_order=(1, 3, 2))
    return out


# ------------------------------------------------------------------ AMOS2022
def convert_amos_task1(amos_base_dir: str, dataset_id: int = 218,
                       name: str = "AMOS2022_postChallenge_task1") -> str:
    """AMOS task 1 (CT only, ids < 500): 15 abdominal organs, plain labels.
    Validation images are folded into the training pool like the reference."""
    out = _out_base(dataset_id, name)
    src_json = load_json(join(amos_base_dir, "dataset.json"))
    n = 0
    for images, labels in (("imagesTr", "labelsTr"), ("imagesVa", "labelsVa")):
        if not isdir(join(amos_base_dir, images)):
            continue
        for f in subfiles(join(amos_base_dir, images), suffix=".nii.gz",
                          join=False):
            case = f[:-len(".nii.gz")]
            if int(case.split("_")[-1]) >= 500:
                continue  # ids >= 500 are MRI (task 2 handles them)
            shutil.copy(join(amos_base_dir, images, f),
                        join(out, "imagesTr", f"{case}_0000.nii.gz"))
            shutil.copy(join(amos_base_dir, labels, f),
                        join(out, "labelsTr", f))
            n += 1
    generate_dataset_json(
        out, channel_names={0: "CT"},
        labels={v: int(k) for k, v in src_json["labels"].items()},
        num_training_cases=n, file_ending=".nii.gz")
    return out


def convert_amos_task2(amos_base_dir: str, dataset_id: int = 219,
                       name: str = "AMOS2022_postChallenge_task2") -> str:
    """AMOS task 2: CT + MRI mixed; the single channel is declared nonCT so
    z-score normalization is used for every case."""
    out = _out_base(dataset_id, name)
    src_json = load_json(join(amos_base_dir, "dataset.json"))
    n = 0
    for images, labels in (("imagesTr", "labelsTr"), ("imagesVa", "labelsVa")):
        if not isdir(join(amos_base_dir, images)):
            continue
        for f in subfiles(join(amos_base_dir, images), suffix=".nii.gz",
                          join=False):
            case = f[:-len(".nii.gz")]
            shutil.copy(join(amos_base_dir, images, f),
                        join(out, "imagesTr", f"{case}_0000.nii.gz"))
            shutil.copy(join(amos_base_dir, labels, f),
                        join(out, "labelsTr", f))
            n += 1
    generate_dataset_json(
        out, channel_names={0: "nonCT"},
        labels={v: int(k) for k, v in src_json["labels"].items()},
        num_training_cases=n, file_ending=".nii.gz")
    return out


# ---------------------------------------------------------------------- ACDC
def convert_acdc(src_data_folder: str, dataset_id: int = 27,
                 name: str = "ACDC") -> str:
    """ACDC cardiac cine MRI: the ED and ES frames of each patient become
    separate training cases (the 4d series and its frames without _gt are
    skipped/copied per the reference's recipe)."""
    out = _out_base(dataset_id, name)
    maybe_mkdir_p(join(out, "imagesTs"))
    n = 0
    for patient in subdirs(join(src_data_folder, "training"), join_path=True):
        for f in subfiles(patient, suffix=".nii.gz"):
            if "_4d" in f:
                continue
            if "_gt" in f:
                shutil.copy(join(patient, f),
                            join(out, "labelsTr", f.replace("_gt", "")))
            else:
                case = f[:-len(".nii.gz")]
                shutil.copy(join(patient, f),
                            join(out, "imagesTr", f"{case}_0000.nii.gz"))
                n += 1
    if isdir(join(src_data_folder, "testing")):
        for patient in subdirs(join(src_data_folder, "testing"), join_path=True):
            for f in subfiles(patient, suffix=".nii.gz"):
                if "_4d" in f or "_gt" in f:
                    continue
                case = f[:-len(".nii.gz")]
                shutil.copy(join(patient, f),
                            join(out, "imagesTs", f"{case}_0000.nii.gz"))
    generate_dataset_json(
        out, channel_names={0: "cineMRI"},
        labels={"background": 0, "RV": 1, "MLV": 2, "LVC": 3},
        num_training_cases=n, file_ending=".nii.gz")
    return out


# ----------------------------------------------------- old nnU-Net v1 layout
def convert_old_nnunet_task(source_folder: str, target_dataset_name: str) -> str:
    """TaskXXX_YYY (nnU-Net v1 raw) -> DatasetXXX_YYY (v2): copies the image/
    label trees verbatim and rewrites dataset.json (modality->channel_names,
    inverted labels dict, drops the training/test case lists)."""
    from ..paths import get_raw_folder
    target = join(get_raw_folder(), target_dataset_name)
    if isdir(target):
        raise RuntimeError(f"{target} already exists, refusing to overwrite")
    for sub in ("imagesTr", "labelsTr", "imagesTs", "labelsTs"):
        if isdir(join(source_folder, sub)):
            shutil.copytree(join(source_folder, sub), join(target, sub))
    dj = deepcopy(load_json(join(source_folder, "dataset.json")))
    for k in ("tensorImageSize", "numTest", "training", "test"):
        dj.pop(k, None)
    dj["channel_names"] = {str(k): v for k, v in dj.pop("modality").items()}
    dj["labels"] = {v: int(k) for k, v in dj["labels"].items()}
    dj["file_ending"] = ".nii.gz"
    save_json(dj, join(target, "dataset.json"), sort_keys=False)
    return target


_CONVERTERS = {
    "brats21": convert_brats21,
    "kits2023": convert_kits2023,
    "amos_task1": convert_amos_task1,
    "amos_task2": convert_amos_task2,
    "acdc": convert_acdc,
}


def convert_old_nnunet_entry():
    p = argparse.ArgumentParser(
        description="nnU-Net v1 TaskXXX_YYY raw folder -> v2 DatasetXXX_YYY")
    p.add_argument("input_folder")
    p.add_argument("target_dataset_name",
                   help="e.g. Dataset042_Old (must not exist yet)")
    args = p.parse_args()
    out = convert_old_nnunet_task(args.input_folder, args.target_dataset_name)
    print(f"converted -> {out}")


def convert_dataset_entry():
    p = argparse.ArgumentParser(description="public-dataset -> nnUNet_raw")
    p.add_argument("recipe", choices=sorted(_CONVERTERS))
    p.add_argument("source_folder")
    p.add_argument("-d", type=int, default=None, help="override dataset id")
    args = p.parse_args()
    kwargs = {} if args.d is None else {"dataset_id": args.d}
    out = _CONVERTERS[args.recipe](args.source_folder, **kwargs)
    print(f"converted -> {out}")


if __name__ == "__main__":
    convert_dataset_entry()
