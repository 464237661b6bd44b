"""Synthetic tiny datasets for E2E tests (the reference's integration tests use
Hippocampus-derived sets, ref distillation/nnunetv2/tests/integration_tests;
we generate fully synthetic NIfTI data so no downloads are needed)."""
import os

import numpy as np

from fast_nnunet_tpu.imageio.nifti import write_nifti
from fast_nnunet_tpu.utils.dataset_io import generate_dataset_json
from fast_nnunet_tpu.utils.io import maybe_mkdir_p, join


def make_synthetic_dataset(root: str, dataset_name: str = "Dataset995_Synth",
                           n_cases: int = 6, shape=(24, 28, 20), n_classes: int = 2,
                           labels: dict = None, regions_class_order=None,
                           spacing=(1.0, 1.0, 2.0), seed: int = 0,
                           blob_radius=(2, 4), margin: int = 4,
                           separate_blobs: bool = False) -> str:
    """Creates nnUNet_raw/<dataset_name>/{imagesTr,labelsTr} + dataset.json with
    blob-shaped foreground objects. Returns the dataset folder.
    separate_blobs: rejection-sample class centers so blobs never overlap
    (overlapping blobs ADD in the image but the later class overwrites the
    label — deliberate ambiguity for robustness tests, poison for
    convergence-parity recipes)."""
    rng = np.random.RandomState(seed)
    ds_folder = join(root, dataset_name)
    maybe_mkdir_p(join(ds_folder, "imagesTr"))
    maybe_mkdir_p(join(ds_folder, "labelsTr"))

    for i in range(n_cases):
        img = rng.rand(*shape).astype(np.float32) * 0.2
        seg = np.zeros(shape, np.uint8)
        placed = []  # (center, r)
        for c in range(1, n_classes + 1):
            for _ in range(100):
                cx = rng.randint(margin, shape[0] - margin)
                cy = rng.randint(margin, shape[1] - margin)
                cz = rng.randint(margin, shape[2] - margin)
                r = rng.randint(*blob_radius)
                if not separate_blobs or all(
                        (cx - p[0]) ** 2 + (cy - p[1]) ** 2 + (cz - p[2]) ** 2
                        > (r + pr + 1) ** 2 for p, pr in placed):
                    break
            placed.append(((cx, cy, cz), r))
            xs, ys, zs = np.ogrid[:shape[0], :shape[1], :shape[2]]
            blob = ((xs - cx) ** 2 + (ys - cy) ** 2 + (zs - cz) ** 2) <= r ** 2
            img[blob] += 0.5 + 0.2 * c
            seg[blob] = c
        # a zero border so crop_to_nonzero has something to do
        img[:2] = 0
        img[-2:] = 0
        case = f"case_{i:03d}"
        write_nifti(join(ds_folder, "imagesTr", f"{case}_0000.nii.gz"), img,
                    spacing=spacing)
        write_nifti(join(ds_folder, "labelsTr", f"{case}.nii.gz"), seg,
                    spacing=spacing)

    if labels is None:
        labels = {"background": 0,
                  **{f"class_{c}": c for c in range(1, n_classes + 1)}}
    generate_dataset_json(ds_folder, {0: "CT"}, labels, n_cases, ".nii.gz",
                          regions_class_order=regions_class_order,
                          dataset_name=dataset_name)
    return ds_folder


def set_nnunet_paths(monkeypatch_or_env, tmp_root: str):
    raw = join(tmp_root, "raw")
    pre = join(tmp_root, "preprocessed")
    res = join(tmp_root, "results")
    for p in (raw, pre, res):
        maybe_mkdir_p(p)
    os.environ["nnUNet_raw"] = raw
    os.environ["nnUNet_preprocessed"] = pre
    os.environ["nnUNet_results"] = res
    return raw, pre, res
