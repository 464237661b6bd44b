"""Dataset path conventions.

Keeps the reference's environment-variable contract so users can switch
frameworks without moving data (ref: distillation/nnunetv2/paths.py:21-23).
"""
import os

nnUNet_raw = os.environ.get("nnUNet_raw")
nnUNet_preprocessed = os.environ.get("nnUNet_preprocessed")
nnUNet_results = os.environ.get("nnUNet_results")


def get_raw_folder() -> str:
    p = os.environ.get("nnUNet_raw", nnUNet_raw)
    if p is None:
        raise RuntimeError(
            "nnUNet_raw is not set. Point it at your raw dataset folder "
            "(Dataset{ID}_{Name} layout, same convention as nnU-Net v2)."
        )
    return p


def get_preprocessed_folder() -> str:
    p = os.environ.get("nnUNet_preprocessed", nnUNet_preprocessed)
    if p is None:
        raise RuntimeError("nnUNet_preprocessed is not set.")
    return p


def get_results_folder() -> str:
    p = os.environ.get("nnUNet_results", nnUNet_results)
    if p is None:
        raise RuntimeError("nnUNet_results is not set.")
    return p
