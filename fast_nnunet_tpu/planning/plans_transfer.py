"""Move plans between datasets for pretraining/finetuning (ref distillation/
nnunetv2/experiment_planning/plans_for_pretraining/move_plans_between_datasets.py):
the target dataset reuses the source's architecture/patch/spacing so weights
transfer, while dataset-specific bits (normalization stats, identifiers) come
from the target."""
from copy import deepcopy
from typing import Union

from ..utils.io import isfile, join, load_json, save_json
from ..utils.misc import maybe_convert_to_dataset_name


def move_plans_between_datasets(source_dataset_name_or_id,
                                target_dataset_name_or_id,
                                source_plans_identifier: str,
                                target_plans_identifier: str = None) -> dict:
    from ..paths import get_preprocessed_folder, get_raw_folder
    if target_plans_identifier is None:
        target_plans_identifier = source_plans_identifier
    source = maybe_convert_to_dataset_name(source_dataset_name_or_id)
    target = maybe_convert_to_dataset_name(target_dataset_name_or_id)

    source_plans = load_json(join(get_preprocessed_folder(), source,
                                  source_plans_identifier + ".json"))
    target_fp_file = join(get_preprocessed_folder(), target,
                          "dataset_fingerprint.json")
    assert isfile(target_fp_file), (
        f"target fingerprint missing ({target_fp_file}); run "
        "extract_fingerprints on the target dataset first")
    target_fp = load_json(target_fp_file)
    target_dataset_json = load_json(join(get_raw_folder(), target, "dataset.json"))

    plans = deepcopy(source_plans)
    plans["dataset_name"] = target
    plans["plans_name"] = target_plans_identifier
    # dataset-specific intensity statistics must come from the target
    plans["foreground_intensity_properties_per_channel"] = \
        target_fp["foreground_intensity_properties_per_channel"]
    # data identifiers must be regenerated so preprocessed folders don't collide
    for cfg_name, cfg in plans["configurations"].items():
        if "data_identifier" in cfg:
            cfg["data_identifier"] = f"{target_plans_identifier}_{cfg_name}"

    out_file = join(get_preprocessed_folder(), target,
                    target_plans_identifier + ".json")
    save_json(plans, out_file, sort_keys=False)
    print(f"Transferred plans {source}/{source_plans_identifier} -> {out_file}")
    return plans
