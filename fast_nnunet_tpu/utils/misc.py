"""Misc utilities: CV splits, dataset naming, collation, output-folder naming.

Parity targets: distillation/nnunetv2/utilities/crossval_split.py,
dataset_name_id_conversion.py, file_path_utilities.py, helpers.py.
"""
import os
from typing import List, Union

import numpy as np

from . import io as ffo


def generate_crossval_split(train_identifiers: List[str], seed: int = 12345,
                            n_splits: int = 5) -> List[dict]:
    """Seeded k-fold split; same shuffling semantics as sklearn KFold(shuffle=True)
    which the reference uses (crossval_split.py:7), so splits_final.json matches
    for the same case list and seed."""
    ids = np.array(sorted(train_identifiers))
    n = len(ids)
    rng = np.random.RandomState(seed)
    indices = np.arange(n)
    rng.shuffle(indices)
    fold_sizes = np.full(n_splits, n // n_splits, dtype=int)
    fold_sizes[: n % n_splits] += 1
    splits = []
    current = 0
    for fold_size in fold_sizes:
        test_idx = indices[current:current + fold_size]
        train_idx = np.setdiff1d(indices, test_idx)
        splits.append({"train": [str(ids[i]) for i in train_idx],
                       "val": [str(ids[i]) for i in test_idx]})
        current += fold_size
    return splits


def maybe_convert_to_dataset_name(dataset_name_or_id: Union[str, int]) -> str:
    """'4' / 4 -> 'Dataset004_Hippocampus' by scanning nnUNet_raw/preprocessed/results."""
    if isinstance(dataset_name_or_id, str) and dataset_name_or_id.startswith("Dataset"):
        return dataset_name_or_id
    try:
        dataset_id = int(dataset_name_or_id)
    except ValueError:
        raise ValueError(f"dataset_name_or_id must be an int or 'DatasetXXX_Name', got "
                         f"{dataset_name_or_id}")
    return convert_id_to_dataset_name(dataset_id)


def convert_id_to_dataset_name(dataset_id: int) -> str:
    startswith = "Dataset%03.0d" % dataset_id
    candidates = set()
    for env in ("nnUNet_preprocessed", "nnUNet_raw", "nnUNet_results"):
        folder = os.environ.get(env)
        if folder is not None and os.path.isdir(folder):
            candidates.update(ffo.subdirs(folder, prefix=startswith, join_path=False))
    if len(candidates) == 0:
        raise RuntimeError(f"Could not find a dataset with id {dataset_id} in nnUNet_raw/"
                           f"nnUNet_preprocessed/nnUNet_results.")
    if len(candidates) > 1:
        raise RuntimeError(f"More than one dataset matches id {dataset_id}: {candidates}")
    return candidates.pop()


def convert_dataset_name_to_id(dataset_name: str) -> int:
    assert dataset_name.startswith("Dataset")
    return int(dataset_name[7:10])


def trainer_spelling_variants(trainer_name: str) -> List[str]:
    """The given trainer name plus its reference-spelling twin: the
    reference names trainers `nnUNetTrainer*` (ref distillation/nnunetv2/
    run/run_training.py:214-268) where this framework uses `NNUNetTrainer*`
    (PEP8 CapWords); both must interoperate on the CLI and on disk."""
    names = [trainer_name]
    if trainer_name.startswith("nnUNet"):
        names.append("NNUNet" + trainer_name[len("nnUNet"):])
    elif trainer_name.startswith("NNUNet"):
        names.append("nnUNet" + trainer_name[len("NNUNet"):])
    return names


def get_output_folder(dataset_name_or_id, trainer_name: str = "NNUNetTrainer",
                      plans_identifier: str = "nnUNetPlans", configuration: str = "3d_fullres",
                      fold: Union[str, int, None] = None) -> str:
    """results/<Dataset>/<Trainer__Plans__config>[/fold_X]
    (ref file_path_utilities.py:11-27). Spelling-tolerant on READ: when the
    folder under the given trainer name does not exist but the
    reference-spelled twin does (e.g. `nnUNetTrainer__nnUNetPlans__3d_fullres`
    produced by the reference, asked for as `NNUNetTrainer`), the existing
    folder is returned, so reference-trained result trees are drop-in."""
    from ..paths import get_results_folder
    base = ffo.join(get_results_folder(),
                    maybe_convert_to_dataset_name(dataset_name_or_id))
    tmp = None
    for tn in trainer_spelling_variants(trainer_name):
        cand = ffo.join(base, f"{tn}__{plans_identifier}__{configuration}")
        if tmp is None:
            tmp = cand  # canonical: the name as passed
        if ffo.isdir(cand):
            tmp = cand
            break
    if fold is not None:
        tmp = ffo.join(tmp, f"fold_{fold}")
    return tmp


def collate_outputs(outputs: List[dict]) -> dict:
    """List of per-step dicts -> dict of stacked arrays / mean-able lists
    (ref utilities/collate_outputs.py)."""
    collated = {}
    for k in outputs[0].keys():
        if np.isscalar(outputs[0][k]):
            collated[k] = np.array([o[k] for o in outputs])
        elif isinstance(outputs[0][k], np.ndarray):
            collated[k] = np.vstack([o[k][None] for o in outputs])
        else:
            raise ValueError(f"Cannot collate input of type {type(outputs[0][k])} for key {k}")
    return collated


def dummy_context():
    import contextlib
    return contextlib.nullcontext()


def enable_persistent_compile_cache() -> None:
    """Serving cold-start: first compile of a 512^3 sliding-window sweep takes
    minutes; the persistent cache makes every later process start near-instant.
    Opt out with FNN_COMPILE_CACHE=0, redirect with FNN_COMPILE_CACHE=<dir>.
    No-op when the caller already configured a cache dir."""
    import os
    target = os.environ.get("FNN_COMPILE_CACHE", "")
    if target == "0":
        return
    import jax
    if jax.config.jax_compilation_cache_dir:
        return
    if not target:
        target = os.path.join(os.path.expanduser("~"), ".cache",
                              "fast_nnunet_tpu", "jax_cache")
    os.makedirs(target, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", target)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
