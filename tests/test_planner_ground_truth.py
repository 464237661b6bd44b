"""Planner pinned to EXTERNAL ground truth (round-5 VERDICT #6): the
reference ships one reference-planner-produced data point — the bone_turbo
deployment config with patch 160x96x96 at target spacing
(2.0, 0.9765625, 0.9765625) for a 61-class whole-body CT model (ref
engine/config/fast_nnunet_bone_turbo.ini:5-23). Feeding our
ExperimentPlanner a whole-body-CT fingerprint consistent with that
deployment (median spacing 2.0/0.977/0.977 mm, 512x512 in-plane, ~870
slices, CT channel, 61 labels, 8 GB VRAM target) must land on the same
topology — patch, spacing, transpose, batch size — via the reference's
own rules (ref default_experiment_planner.py:300-378)."""
import json
import os

import numpy as np
import pytest


@pytest.fixture()
def wholebody_env(tmp_path, monkeypatch):
    raw = tmp_path / "raw" / "Dataset501_WholeBodyBones"
    pre = tmp_path / "pre" / "Dataset501_WholeBodyBones"
    (raw / "imagesTr").mkdir(parents=True)
    pre.mkdir(parents=True)
    monkeypatch.setenv("nnUNet_raw", str(tmp_path / "raw"))
    monkeypatch.setenv("nnUNet_preprocessed", str(tmp_path / "pre"))
    monkeypatch.setenv("nnUNet_results", str(tmp_path / "res"))
    n = 24
    dj = {"channel_names": {"0": "CT"},
          "labels": {("background" if i == 0 else f"bone_{i}"): i
                     for i in range(61)},
          "numTraining": n, "file_ending": ".nii.gz",
          "dataset": {f"case_{i:03d}": {
              "images": [f"imagesTr/case_{i:03d}_0000.nii.gz"],
              "label": f"labelsTr/case_{i:03d}.nii.gz"} for i in range(n)}}
    (raw / "dataset.json").write_text(json.dumps(dj))
    rng = np.random.RandomState(0)
    # whole-body CT at the scanner-native grid: 512x512 @ 500/512 mm
    # in-plane, 2 mm slices, ~1.6-1.9 m coverage
    fp = {"spacings": [[2.0, 0.9765625, 0.9765625]] * n,
          "shapes_after_crop": [[870 + int(rng.randint(-60, 60)), 512, 512]
                                for _ in range(n)],
          "median_relative_size_after_cropping": 0.97,
          "foreground_intensity_properties_per_channel": {"0": {
              "mean": 418.68, "std": 412.19, "percentile_00_5": -60.0,
              "percentile_99_5": 3068.0, "median": 300.0, "min": -1024.0,
              "max": 3071.0}}}
    (pre / "dataset_fingerprint.json").write_text(json.dumps(fp))
    return raw, pre


def test_planner_reproduces_bone_turbo_topology(wholebody_env):
    from fast_nnunet_tpu.planning.planner import ExperimentPlanner

    plans = ExperimentPlanner("Dataset501_WholeBodyBones").plan_experiment()
    c = plans["configurations"]["3d_fullres"]
    # the bone_turbo deployment point, verbatim
    # (ref engine/config/fast_nnunet_bone_turbo.ini:8-15)
    assert c["patch_size"] == [160, 96, 96]
    assert c["spacing"] == [2.0, 0.9765625, 0.9765625]
    # highest-spacing axis leads after transpose; here it already does
    assert plans["transpose_forward"] == [0, 1, 2]
    # VRAM-proxy rule at the 8 GB default: reference bs for this patch
    assert c["batch_size"] == 2
    # whole-body coverage >> patch -> a lowres/cascade stage must exist
    assert "3d_lowres" in plans["configurations"]
    assert "3d_cascade_fullres" in plans["configurations"]
    # CT normalization with the fingerprint's intensity properties
    assert c["normalization_schemes"] == ["CTNormalization"]


def test_planner_bone_turbo_pin_is_not_fragile_to_case_count(wholebody_env):
    """The pin must come from the median geometry, not the sample list:
    halving numTraining (dataset coverage term) keeps the same patch."""
    raw, pre = wholebody_env
    dj = json.loads((raw / "dataset.json").read_text())
    dj["numTraining"] = 12
    dj["dataset"] = {k: dj["dataset"][k]
                     for k in list(dj["dataset"])[:12]}
    (raw / "dataset.json").write_text(json.dumps(dj))
    from fast_nnunet_tpu.planning.planner import ExperimentPlanner
    plans = ExperimentPlanner("Dataset501_WholeBodyBones").plan_experiment()
    assert plans["configurations"]["3d_fullres"]["patch_size"] == [160, 96, 96]
