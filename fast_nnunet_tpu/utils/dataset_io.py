"""Raw-dataset layout helpers (Dataset{ID}_{Name}/imagesTr|labelsTr + dataset.json),
same on-disk contract as the reference (ref distillation/nnunetv2/utilities/utils.py
get_filenames_of_train_images_and_targets and dataset_conversion/generate_dataset_json.py).
"""
import os
from typing import Dict, List, Optional

from . import io as ffo


def get_identifiers_from_splitted_dataset_folder(folder: str, file_ending: str) -> List[str]:
    files = ffo.subfiles(folder, suffix=file_ending, join_path=False)
    crop = len(file_ending) + 5  # _XXXX + ending
    return sorted(set(f[:-crop] for f in files))


def get_filenames_of_train_images_and_targets(raw_dataset_folder: str,
                                              dataset_json: Optional[dict] = None) -> Dict[str, dict]:
    if dataset_json is None:
        dataset_json = ffo.load_json(ffo.join(raw_dataset_folder, "dataset.json"))

    if "dataset" in dataset_json:  # explicit file listing
        dataset = {
            k: {"images": [os.path.abspath(ffo.join(raw_dataset_folder, i))
                           if not os.path.isabs(i) else i for i in v["images"]],
                "label": os.path.abspath(ffo.join(raw_dataset_folder, v["label"]))
                if not os.path.isabs(v["label"]) else v["label"]}
            for k, v in dataset_json["dataset"].items()}
        return dataset

    file_ending = dataset_json["file_ending"]
    num_channels = len(dataset_json.get("channel_names", dataset_json.get("modality", {0: 0})))
    identifiers = get_identifiers_from_splitted_dataset_folder(
        ffo.join(raw_dataset_folder, "imagesTr"), file_ending)
    dataset = {}
    for ident in identifiers:
        dataset[ident] = {
            "images": [ffo.join(raw_dataset_folder, "imagesTr",
                                f"{ident}_{c:04d}{file_ending}")
                       for c in range(num_channels)],
            "label": ffo.join(raw_dataset_folder, "labelsTr", ident + file_ending),
        }
    return dataset


def generate_dataset_json(output_folder: str, channel_names: dict, labels: dict,
                          num_training_cases: int, file_ending: str,
                          regions_class_order: Optional[tuple] = None,
                          dataset_name: Optional[str] = None,
                          overwrite_image_reader_writer: Optional[str] = None,
                          **kwargs) -> dict:
    """Write dataset.json (ref dataset_conversion/generate_dataset_json.py:1-111)."""
    has_regions = any(isinstance(v, (tuple, list)) and len(v) > 1
                      for v in labels.values())
    if has_regions:
        assert regions_class_order is not None, \
            "region-based labels need regions_class_order"
    dataset_json = {
        "channel_names": {str(k): v for k, v in channel_names.items()},
        "labels": labels,
        "numTraining": num_training_cases,
        "file_ending": file_ending,
    }
    if dataset_name is not None:
        dataset_json["name"] = dataset_name
    if overwrite_image_reader_writer is not None:
        dataset_json["overwrite_image_reader_writer"] = overwrite_image_reader_writer
    if regions_class_order is not None:
        dataset_json["regions_class_order"] = list(regions_class_order)
    dataset_json.update(kwargs)
    ffo.save_json(dataset_json, ffo.join(output_folder, "dataset.json"), sort_keys=False)
    return dataset_json
