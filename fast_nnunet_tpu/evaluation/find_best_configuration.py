"""Find the best configuration: accumulate CV results for trainer x plans x
config combinations, evaluate singles and 2-ensembles, pick the winner,
determine postprocessing, and emit inference instructions.

Parity: distillation/nnunetv2/evaluation/find_best_configuration.py:82-257 and
accumulate_cv_results.py.
"""
import argparse
import itertools
import os
import shutil
from typing import List, Optional

from ..core.plans import PlansManager
from ..ensembling.ensemble import ensemble_crossvalidations
from ..postprocessing.connected_components import determine_postprocessing
from ..utils.io import (isdir, isfile, join, load_json, maybe_mkdir_p, save_json,
                        subfiles)
from ..utils.misc import get_output_folder, maybe_convert_to_dataset_name
from .metrics import compute_metrics_on_folder

default_trained_models = tuple({"plans": "nnUNetPlans", "configuration": c,
                                "trainer": "NNUNetTrainer"}
                               for c in ("2d", "3d_fullres", "3d_lowres",
                                         "3d_cascade_fullres"))


def accumulate_cv_results(trained_model_folder: str, merged_output_folder: str,
                          folds: List[int], num_processes: int = 8,
                          overwrite: bool = True) -> None:
    """Copy every fold's validation predictions into one folder (each case is
    validated in exactly one fold) and evaluate it as a whole."""
    if overwrite and isdir(merged_output_folder):
        shutil.rmtree(merged_output_folder)
    maybe_mkdir_p(merged_output_folder)

    dataset_json = load_json(join(trained_model_folder, "dataset.json"))
    plans_manager = PlansManager(join(trained_model_folder, "plans.json"))
    rw = plans_manager.image_reader_writer_class()()
    fe = dataset_json["file_ending"]

    for f in folds:
        val_folder = join(trained_model_folder, f"fold_{f}", "validation")
        assert isdir(val_folder), f"fold {f} has no validation folder; " \
                                  "run training with final validation"
        for file in subfiles(val_folder, suffix=fe, join_path=False):
            shutil.copy(join(val_folder, file), join(merged_output_folder, file))

    from ..paths import get_raw_folder
    gt_folder = join(get_raw_folder(), plans_manager.dataset_name, "labelsTr")
    label_manager = plans_manager.get_label_manager(dataset_json)
    compute_metrics_on_folder(
        gt_folder, merged_output_folder, join(merged_output_folder, "summary.json"),
        rw, fe,
        label_manager.foreground_regions if label_manager.has_regions
        else label_manager.foreground_labels,
        label_manager.ignore_label, num_processes)


def find_best_configuration(dataset_name_or_id,
                            allowed_trained_models=default_trained_models,
                            allow_ensembling: bool = True,
                            num_processes: int = 8,
                            overwrite: bool = True,
                            folds: List[int] = (0, 1, 2, 3, 4)) -> dict:
    from ..paths import get_raw_folder, get_results_folder
    dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
    all_results = {}

    for model in allowed_trained_models:
        folder = get_output_folder(dataset_name, model["trainer"], model["plans"],
                                   model["configuration"])
        if not isdir(folder):
            continue
        identifier = os.path.basename(folder)
        merged = join(get_results_folder(), dataset_name, "crossval_results_folds_"
                      + "_".join(str(f) for f in folds), identifier)
        accumulate_cv_results(folder, merged, folds, num_processes, overwrite)
        summary = load_json(join(merged, "summary.json"))
        all_results[identifier] = {
            "source": "single", "folder": merged, "model": model,
            "mean_fg_dice": summary["foreground_mean"]["Dice"]}

    if allow_ensembling and len(all_results) > 1:
        singles = list(all_results.items())
        for (id_a, a), (id_b, b) in itertools.combinations(singles, 2):
            folder_a = get_output_folder(dataset_name, a["model"]["trainer"],
                                         a["model"]["plans"],
                                         a["model"]["configuration"])
            folder_b = get_output_folder(dataset_name, b["model"]["trainer"],
                                         b["model"]["plans"],
                                         b["model"]["configuration"])
            ens_id = f"ensemble___{id_a}___{id_b}"
            ens_folder = join(get_results_folder(), dataset_name,
                              "ensembles", ens_id)
            try:
                ensemble_crossvalidations([folder_a, folder_b], ens_folder,
                                          list(folds), num_processes)
            except (RuntimeError, AssertionError) as e:
                print(f"Skipping {ens_id}: {e}")
                continue
            dataset_json = load_json(join(folder_a, "dataset.json"))
            plans_manager = PlansManager(join(folder_a, "plans.json"))
            rw = plans_manager.image_reader_writer_class()()
            lm = plans_manager.get_label_manager(dataset_json)
            gt_folder = join(get_raw_folder(), dataset_name, "labelsTr")
            summary = compute_metrics_on_folder(
                gt_folder, ens_folder, join(ens_folder, "summary.json"), rw,
                dataset_json["file_ending"],
                lm.foreground_regions if lm.has_regions else lm.foreground_labels,
                lm.ignore_label, num_processes)
            all_results[ens_id] = {
                "source": "ensemble", "folder": ens_folder,
                "models": (a["model"], b["model"]),
                "mean_fg_dice": summary["foreground_mean"]["Dice"]}

    assert all_results, "no trained models found to choose from"
    best = max(all_results, key=lambda k: all_results[k]["mean_fg_dice"])
    best_entry = all_results[best]
    print(f"Best configuration: {best} "
          f"(mean fg Dice {best_entry['mean_fg_dice']:.4f})")

    # postprocessing on the best result
    some_model = best_entry.get("model") or best_entry["models"][0]
    ref_folder_for_plans = get_output_folder(
        dataset_name, some_model["trainer"], some_model["plans"],
        some_model["configuration"])
    dataset_json = load_json(join(ref_folder_for_plans, "dataset.json"))
    plans_manager = PlansManager(join(ref_folder_for_plans, "plans.json"))
    gt_folder = join(get_raw_folder(), dataset_name, "labelsTr")
    pp_fns, pp_kwargs, pp_metrics = determine_postprocessing(
        best_entry["folder"], gt_folder, plans_manager, dataset_json,
        num_processes)

    result = {
        "folds": list(folds),
        "dataset_name_or_id": str(dataset_name_or_id),
        "considered_manually": {k: v["mean_fg_dice"] for k, v in all_results.items()},
        "best_model_or_ensemble": {
            "identifier": best,
            "source": best_entry["source"],
            "mean_fg_dice": best_entry["mean_fg_dice"],
            "selected_model_or_models": best_entry.get("model")
            or list(best_entry["models"]),
            "postprocessing_fns": pp_fns,
            "postprocessing_kwargs": pp_kwargs,
            "mean_fg_dice_after_pp": pp_metrics["foreground_mean"]["Dice"],
        },
    }
    from ..paths import get_results_folder as grf
    save_json(result, join(grf(), dataset_name, "inference_information.json"),
              sort_keys=False)

    print("\n*** Inference instructions ***")
    models = best_entry.get("model")
    models = [models] if models else list(best_entry["models"])
    for m in models:
        print(f"  nnUNetv2_predict -d {dataset_name} -i INPUT -o OUTPUT -f "
              f"{' '.join(str(f) for f in folds)} -tr {m['trainer']} "
              f"-c {m['configuration']} -p {m['plans']}"
              + (" --save_probabilities" if len(models) > 1 else ""))
    if len(models) > 1:
        print("  # then: nnUNetv2_ensemble -i OUT1 OUT2 -o FINAL")
    if pp_fns:
        print("  # then apply postprocessing.json with "
              "fast_nnunet_tpu.postprocessing.apply_postprocessing_to_folder")
    return result


def find_best_configuration_entry():
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset_name_or_id")
    parser.add_argument("-p", nargs="+", default=["nnUNetPlans"])
    parser.add_argument("-c", nargs="+",
                        default=["2d", "3d_fullres", "3d_lowres",
                                 "3d_cascade_fullres"])
    parser.add_argument("-tr", nargs="+", default=["NNUNetTrainer"])
    parser.add_argument("-np", type=int, default=8)
    parser.add_argument("-f", nargs="+", type=int, default=[0, 1, 2, 3, 4])
    parser.add_argument("--disable_ensembling", action="store_true")
    args = parser.parse_args()
    models = [{"plans": p, "configuration": c, "trainer": t}
              for p in args.p for c in args.c for t in args.tr]
    find_best_configuration(args.dataset_name_or_id, models,
                            not args.disable_ensembling, args.np,
                            folds=args.f)
