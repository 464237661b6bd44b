"""nnUNetv2_evaluate_simple and nnUNetv2_plot_overlay_pngs entry points (ref
evaluation/evaluate_predictions.py:233-250, utilities/overlay_plots.py:247)."""
import os
import sys

import numpy as np
import pytest

from fast_nnunet_tpu.imageio.nifti import write_nifti
from fast_nnunet_tpu.run.evaluate import evaluate_simple_entry, plot_overlay_entry
from fast_nnunet_tpu.utils.io import join, load_json, maybe_mkdir_p


def test_evaluate_simple_label_list(tmp_path, monkeypatch, capsys):
    gt = str(tmp_path / "gt")
    pred = str(tmp_path / "pred")
    maybe_mkdir_p(gt)
    maybe_mkdir_p(pred)
    rng = np.random.RandomState(0)
    for i in range(2):
        seg = rng.randint(0, 3, (8, 8, 8)).astype(np.uint8)
        write_nifti(join(gt, f"c{i}.nii.gz"), seg)
        # perfect prediction for case 0, all-background for case 1
        write_nifti(join(pred, f"c{i}.nii.gz"),
                    seg if i == 0 else np.zeros_like(seg))
    monkeypatch.setattr(sys, "argv",
                        ["x", gt, pred, "-l", "1", "2", "-np", "1"])
    evaluate_simple_entry()
    summary = load_json(join(pred, "summary.json"))
    dice = summary["foreground_mean"]["Dice"]
    assert 0.4 < dice < 0.6  # one perfect case, one empty case
    assert "mean fg Dice" in capsys.readouterr().out


def test_plot_overlay_entry(tmp_path, monkeypatch):
    img_dir = str(tmp_path / "img")
    seg_dir = str(tmp_path / "seg")
    out_dir = str(tmp_path / "out")
    maybe_mkdir_p(img_dir)
    maybe_mkdir_p(seg_dir)
    rng = np.random.RandomState(1)
    write_nifti(join(img_dir, "c0_0000.nii.gz"),
                rng.rand(10, 10, 6).astype(np.float32))
    seg = np.zeros((10, 10, 6), np.uint8)
    seg[3:6, 3:6, 2:4] = 1
    write_nifti(join(seg_dir, "c0.nii.gz"), seg)
    monkeypatch.setattr(sys, "argv",
                        ["x", "-i", img_dir, "-s", seg_dir, "-o", out_dir])
    plot_overlay_entry()
    assert os.path.isfile(join(out_dir, "c0.png"))
