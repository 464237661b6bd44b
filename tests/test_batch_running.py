"""Batch-running sweep utilities (ref distillation/nnunetv2/batch_running/*)."""
import json
import os

import pytest

from fast_nnunet_tpu.utils.batch_running import (
    benchmark_results_csv, collect_results_wide, generate_benchmark_commands,
    generate_training_commands, summarize_wide)


@pytest.fixture()
def env(tmp_path, monkeypatch):
    for d in ("raw", "pre", "res"):
        (tmp_path / d).mkdir()
    monkeypatch.setenv("nnUNet_raw", str(tmp_path / "raw"))
    monkeypatch.setenv("nnUNet_preprocessed", str(tmp_path / "pre"))
    monkeypatch.setenv("nnUNet_results", str(tmp_path / "res"))
    return tmp_path


def _summary(folder, dice):
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, "summary.json"), "w") as f:
        json.dump({"foreground_mean": {"Dice": dice}}, f)


def test_collect_and_summarize_wide(env, tmp_path):
    ds = "Dataset901_A"
    base = env / "res" / ds / "NNUNetTrainer__nnUNetPlans__3d_fullres"
    for f, dice in ((0, 0.8), (1, 0.9)):
        _summary(str(base / f"fold_{f}" / "validation"), dice)
    csv = str(tmp_path / "wide.csv")
    trainers = {"NNUNetTrainer": ("nnUNetPlans",)}
    collect_results_wide(trainers, [ds], csv, folds=(0, 1))
    row = open(csv).read().strip().split(",")
    assert row[0] == ds and row[1] == "3d_fullres"
    assert row[5] == "0.8000" and row[6] == "0.9000"
    assert row[7] == "0.8500"  # fold mean

    out = str(tmp_path / "summary.csv")
    summarize_wide(csv, out, folds=(0, 1), configs=("3d_fullres",),
                   datasets=[ds], trainers=trainers)
    lines = open(out).read().strip().splitlines()
    assert lines[0] == "name,901_3d_f,mean"
    assert lines[1] == "NNUNetTrainer__nnUNetPlans,0.8500,0.8500"


def test_generate_commands_shapes():
    lines = generate_training_commands([5], folds=(0,), command_prefix="sbatch")
    assert lines == ["sbatch nnUNetv2_train 5 3d_fullres 0 "
                     "-tr NNUNetTrainer -p nnUNetPlans"]
    bench = generate_benchmark_commands([2], configurations=("2d",), folds=(0,))
    assert len(bench) == 2 and all("Benchmark_5epochs" in b for b in bench)


def test_benchmark_results_csv(env, tmp_path):
    ds = "Dataset902_B"
    folder = (env / "res" / ds /
              "NNUNetTrainerBenchmark_5epochs__nnUNetPlans__2d" / "fold_0")
    os.makedirs(folder)
    with open(folder / "benchmark_result.json", "w") as f:
        json.dump({"host__TPUv5": {"fastest_epoch": 42.5,
                                   "devices": ["TPU v5"]}}, f)
    csv = str(tmp_path / "bench.csv")
    benchmark_results_csv([ds], csv, configurations=("2d",))
    lines = open(csv).read().strip().splitlines()
    assert lines[0] == "Dataset,Trainer,Plans,Config,host__TPUv5"
    assert lines[1].endswith(",42.50")
