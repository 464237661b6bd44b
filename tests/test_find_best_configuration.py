"""Cascade-prerequisite checks and inference-command generation of
find_best_configuration (ref distillation/nnunetv2/evaluation/
find_best_configuration.py:27-80)."""
import json
import os

import pytest

from fast_nnunet_tpu.evaluation.find_best_configuration import (
    filter_available_models, generate_inference_command)


@pytest.fixture()
def env(tmp_path, monkeypatch):
    raw = tmp_path / "raw"
    pre = tmp_path / "pre"
    res = tmp_path / "res"
    for d in (raw, pre, res):
        d.mkdir()
    monkeypatch.setenv("nnUNet_raw", str(raw))
    monkeypatch.setenv("nnUNet_preprocessed", str(pre))
    monkeypatch.setenv("nnUNet_results", str(res))
    ds = "Dataset999_Fbc"
    (pre / ds).mkdir()
    plans = {
        "dataset_name": ds,
        "plans_name": "nnUNetPlans",
        "configurations": {
            "2d": {"patch_size": [8, 8]},
            "3d_fullres": {"patch_size": [8, 8, 8]},
            "3d_lowres": {"patch_size": [8, 8, 8],
                          "next_stage": "3d_cascade_fullres"},
            "3d_cascade_fullres": {"inherits_from": "3d_fullres",
                                   "previous_stage": "3d_lowres"},
        },
    }
    with open(pre / ds / "nnUNetPlans.json", "w") as f:
        json.dump(plans, f)
    return ds, res, plans


def _trained(res, ds, config, plans_dict):
    folder = res / ds / f"NNUNetTrainer__nnUNetPlans__{config}"
    folder.mkdir(parents=True)
    with open(folder / "plans.json", "w") as f:
        json.dump(plans_dict, f)
    return folder


def test_filter_skips_unplanned_configuration(env, capsys):
    ds, res, plans = env
    models = [{"plans": "nnUNetPlans", "configuration": c,
               "trainer": "NNUNetTrainer"}
              for c in ("3d_fullres", "3d_superres")]
    _trained(res, ds, "3d_fullres", plans)
    valid = filter_available_models(models, ds)
    assert [m["configuration"] for m in valid] == ["3d_fullres"]
    assert "3d_superres" in capsys.readouterr().out


def test_filter_strict_errors_on_untrained(env):
    ds, res, plans = env
    models = [{"plans": "nnUNetPlans", "configuration": "3d_lowres",
               "trainer": "NNUNetTrainer"}]
    with pytest.raises(RuntimeError, match="no output folder"):
        filter_available_models(models, ds, strict=True)
    # non-strict: skipped quietly
    assert filter_available_models(models, ds) == []


def test_cascade_inference_command_chains_prev_stage(env):
    ds, res, plans = env
    _trained(res, ds, "3d_cascade_fullres", plans)
    _trained(res, ds, "3d_lowres", plans)
    cmd = generate_inference_command(ds, "3d_cascade_fullres")
    lines = cmd.splitlines()
    assert len(lines) == 2
    assert "-c 3d_lowres" in lines[0]
    assert "-o OUTPUT_FOLDER_PREV_STAGE" in lines[0]
    assert "-c 3d_cascade_fullres" in lines[1]
    assert "-prev_stage_predictions OUTPUT_FOLDER_PREV_STAGE" in lines[1]


def test_plain_inference_command_single_line(env):
    ds, res, plans = env
    _trained(res, ds, "3d_fullres", plans)
    cmd = generate_inference_command(ds, "3d_fullres", folds=(0, 1))
    assert "\n" not in cmd
    assert "-f 0 1" in cmd and "-prev_stage" not in cmd


def test_markdown_report(tmp_path):
    from fast_nnunet_tpu.evaluation.find_best_configuration import \
        write_markdown_report
    result = {
        "dataset_name_or_id": "Dataset001_Test",
        "folds": [0, 1, 2, 3, 4],
        "considered_manually": {"3d_fullres": 0.81, "2d": 0.74,
                                "ensemble_x": 0.83},
        "best_model_or_ensemble": {
            "identifier": "ensemble_x", "source": "ensemble",
            "mean_fg_dice": 0.83, "postprocessing_fns": [],
            "mean_fg_dice_after_pp": 0.835,
        },
    }
    path = str(tmp_path / "report.md")
    write_markdown_report(result, ["nnUNetv2_predict -i IN -o OUT"], path)
    text = open(path).read()
    assert "ensemble_x" in text and "**best**" in text
    assert "0.8350" in text
    assert "nnUNetv2_predict -i IN -o OUT" in text
    # best row sorts first
    assert text.index("ensemble_x") < text.index("3d_fullres")


def test_html_report(tmp_path):
    from fast_nnunet_tpu.evaluation.find_best_configuration import \
        write_html_report
    result = {
        "dataset_name_or_id": "Dataset001_Test",
        "folds": [0, 1],
        "considered_manually": {"3d_fullres": 0.81, "2d": 0.74,
                                "ensemble_x": 0.83},
        "best_model_or_ensemble": {
            "identifier": "ensemble_x", "source": "ensemble",
            "mean_fg_dice": 0.83, "postprocessing_fns": [],
            "mean_fg_dice_after_pp": 0.835,
        },
    }
    path = str(tmp_path / "report.html")
    write_html_report(result, ["nnUNetv2_predict -i IN -o OUT <X>"], path)
    text = open(path).read()
    assert text.startswith("<!doctype html>")
    assert "ensemble_x" in text and "0.8350" in text
    assert "&lt;X&gt;" in text  # command is escaped
    # best row sorts first and carries the star marker
    assert text.index("ensemble_x") < text.index("3d_fullres")
    assert "&#9733;" in text
