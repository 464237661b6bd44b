"""Batch-running utilities: generate sweep commands and collect results
(capability parity with distillation/nnunetv2/batch_running/*: the reference
emits LSF `bsub` lines for the DKFZ cluster; we emit plain shell or optional
scheduler-prefixed lines and collect summary.json results into a CSV)."""
import argparse
import os
from typing import List, Optional, Sequence

from . import io as ffo
from .misc import get_output_folder, maybe_convert_to_dataset_name


def generate_training_commands(datasets: Sequence, configurations=("3d_fullres",),
                               folds=(0, 1, 2, 3, 4),
                               trainers=("NNUNetTrainer",),
                               plans=("nnUNetPlans",),
                               command_prefix: str = "",
                               num_gpus: int = 1) -> List[str]:
    lines = []
    for d in datasets:
        for tr in trainers:
            for p in plans:
                for c in configurations:
                    for f in folds:
                        cmd = (f"nnUNetv2_train {d} {c} {f} -tr {tr} -p {p}"
                               + (f" -num_gpus {num_gpus}" if num_gpus > 1 else ""))
                        lines.append((command_prefix + " " + cmd).strip())
    return lines


def collect_results(datasets: Sequence, output_csv: str,
                    configurations=("3d_fullres",), folds=(0, 1, 2, 3, 4),
                    trainers=("NNUNetTrainer",), plans=("nnUNetPlans",)) -> None:
    """Harvest fold validation summaries into one CSV (ref batch_running/
    collect_results_custom_Decathlon.py)."""
    rows = ["dataset,trainer,plans,configuration,fold,mean_fg_dice"]
    for d in datasets:
        name = maybe_convert_to_dataset_name(d)
        for tr in trainers:
            for p in plans:
                for c in configurations:
                    for f in folds:
                        summary = ffo.join(get_output_folder(name, tr, p, c),
                                           f"fold_{f}", "validation",
                                           "summary.json")
                        if not ffo.isfile(summary):
                            continue
                        s = ffo.load_json(summary)
                        rows.append(f"{name},{tr},{p},{c},{f},"
                                    f"{s['foreground_mean']['Dice']:.6f}")
    with open(output_csv, "w") as fh:
        fh.write("\n".join(rows) + "\n")
    print(f"Wrote {len(rows) - 1} result rows to {output_csv}")


def summarize_benchmark_results(datasets: Sequence,
                                trainers=("NNUNetTrainerBenchmark_5epochs",
                                          "NNUNetTrainerBenchmark_5epochs_noDataLoading"),
                                plans=("nnUNetPlans",),
                                configurations=("3d_fullres", "2d")) -> List[dict]:
    """Collect benchmark_result.json entries (ref batch_running/benchmarking/
    summarize_benchmark_results.py)."""
    out = []
    for d in datasets:
        name = maybe_convert_to_dataset_name(d)
        for tr in trainers:
            for p in plans:
                for c in configurations:
                    f = ffo.join(get_output_folder(name, tr, p, c), "fold_0",
                                 "benchmark_result.json")
                    if ffo.isfile(f):
                        for k, v in ffo.load_json(f).items():
                            out.append({"dataset": name, "trainer": tr,
                                        "plans": p, "configuration": c,
                                        "env": k, **v})
    return out
