"""Case preprocessing: transpose -> crop-to-nonzero -> normalize -> resample,
plus foreground-location sampling for the oversampling patch sampler.

Behavioral parity: distillation/nnunetv2/preprocessing/preprocessors/
default_preprocessor.py:45-349 (order of operations matters: normalization runs
BEFORE resampling so nonzero masks still align with the image). Host-side numpy
by design — shapes are data-dependent here; the TPU path starts at patch level.
"""
import math
import multiprocessing
from concurrent.futures import ProcessPoolExecutor, as_completed
from typing import List, Optional, Tuple, Union

import numpy as np

from ..core.plans import ConfigurationManager, PlansManager
from ..ops.cropping import crop_to_nonzero
from ..ops.normalization import get_normalization_scheme_by_class_name
from ..ops.resampling import compute_new_shape
from ..utils.io import load_json, maybe_mkdir_p, join
from ..utils.dataset_io import get_filenames_of_train_images_and_targets
from ..training.dataset import NpyCaseDataset


class DefaultPreprocessor:
    def __init__(self, verbose: bool = False):
        self.verbose = verbose

    # ------------------------------------------------------------------ core
    def run_case_npy(self, data: np.ndarray, seg: Optional[np.ndarray], properties: dict,
                     plans_manager: PlansManager,
                     configuration_manager: ConfigurationManager,
                     dataset_json: Union[dict, str]):
        if isinstance(dataset_json, str):
            dataset_json = load_json(dataset_json)
        data = data.astype(np.float32)
        if seg is not None:
            assert data.shape[1:] == seg.shape[1:], \
                "image/segmentation shape mismatch — run verify_dataset_integrity"
            seg = np.copy(seg)
        has_seg = seg is not None

        tf = plans_manager.transpose_forward
        data = data.transpose([0, *[i + 1 for i in tf]])
        if seg is not None:
            seg = seg.transpose([0, *[i + 1 for i in tf]])
        original_spacing = [properties["spacing"][i] for i in tf]

        properties["shape_before_cropping"] = data.shape[1:]
        data, seg, bbox = crop_to_nonzero(data, seg)
        properties["bbox_used_for_cropping"] = bbox
        properties["shape_after_cropping_and_before_resampling"] = data.shape[1:]

        target_spacing = list(configuration_manager.spacing)
        if len(target_spacing) < len(data.shape[1:]):
            # 2d config on 3d data: keep the between-slice spacing
            target_spacing = [original_spacing[0]] + target_spacing
        new_shape = compute_new_shape(data.shape[1:], original_spacing, target_spacing)

        # normalize BEFORE resample
        data = self._normalize(data, seg, configuration_manager,
                               plans_manager.foreground_intensity_properties_per_channel)

        data = configuration_manager.resampling_fn_data(
            data, new_shape, original_spacing, target_spacing)
        seg = configuration_manager.resampling_fn_seg(
            seg, new_shape, original_spacing, target_spacing)

        if has_seg:
            label_manager = plans_manager.get_label_manager(dataset_json)
            collect = list(label_manager.foreground_regions) if label_manager.has_regions \
                else list(label_manager.foreground_labels)
            if label_manager.has_ignore_label:
                # with partial annotations we must also be able to sample any
                # annotated voxel (incl. background): add the "everything" group
                collect.append([-1] + label_manager.all_labels)
            properties["class_locations"] = self._sample_foreground_locations(
                seg, collect, verbose=self.verbose)
            seg = self.modify_seg_fn(seg, plans_manager, dataset_json,
                                     configuration_manager)
        seg = seg.astype(np.int16 if np.max(seg) > 127 else np.int8)
        return data, seg, properties

    def run_case(self, image_files: List[str], seg_file: Optional[str],
                 plans_manager: PlansManager,
                 configuration_manager: ConfigurationManager,
                 dataset_json: Union[dict, str]):
        if isinstance(dataset_json, str):
            dataset_json = load_json(dataset_json)
        rw = plans_manager.image_reader_writer_class()()
        data, data_properties = rw.read_images(image_files)
        seg = rw.read_seg(seg_file)[0] if seg_file is not None else None
        data, seg, data_properties = self.run_case_npy(
            data, seg, data_properties, plans_manager, configuration_manager,
            dataset_json)
        return data, seg, data_properties

    def run_case_save(self, output_filename_truncated: str, image_files: List[str],
                      seg_file: Optional[str], plans_manager: PlansManager,
                      configuration_manager: ConfigurationManager,
                      dataset_json: Union[dict, str],
                      storage: str = "npy"):
        data, seg, properties = self.run_case(image_files, seg_file, plans_manager,
                                              configuration_manager, dataset_json)
        if storage == "fnnz":
            from ..training.zstd_store import ZstdCaseDataset
            ZstdCaseDataset.save_case(
                data, seg, properties, output_filename_truncated,
                patch_size=configuration_manager.patch_size)
        else:
            NpyCaseDataset.save_case(data, seg, properties,
                                     output_filename_truncated)

    # ------------------------------------------------------------------ helpers
    @staticmethod
    def _sample_foreground_locations(seg: np.ndarray, classes_or_regions,
                                     seed: int = 1234, verbose: bool = False) -> dict:
        """Precompute up-to-10k voxel coordinates per fg class/region (>=1% of the
        class, capped at 1e7 candidates) for the fg-oversampling patch sampler."""
        num_samples = 10000
        min_percent_coverage = 0.01
        rndst = np.random.RandomState(seed)
        class_locs = {}
        foreground_mask = seg != 0
        foreground_coords = np.argwhere(foreground_mask)
        seg_fg = seg[foreground_mask]
        if len(foreground_coords) > 1e7:
            take_every = math.floor(len(foreground_coords) / 1e7)
            foreground_coords = foreground_coords[::take_every]
            seg_fg = seg_fg[::take_every]
        unique_labels = set(np.unique(seg_fg).tolist())

        for c in classes_or_regions:
            k = tuple(c) if isinstance(c, (tuple, list)) else c
            members = c if isinstance(c, (tuple, list)) else [c]
            if not any(ci in unique_labels or ci == -1 for ci in members):
                class_locs[k] = []
                continue
            mask = np.zeros(len(seg_fg), dtype=bool)
            for ci in members:
                mask |= seg_fg == ci
            all_locs = foreground_coords[mask]
            if len(all_locs) == 0:
                class_locs[k] = []
                continue
            target = min(num_samples, len(all_locs))
            target = max(target, int(np.ceil(len(all_locs) * min_percent_coverage)))
            selected = all_locs[rndst.choice(len(all_locs), target, replace=False)]
            class_locs[k] = selected
            if verbose:
                print(c, target)
            seg_fg = seg_fg[~mask]
            foreground_coords = foreground_coords[~mask]
        return class_locs

    def _normalize(self, data: np.ndarray, seg: np.ndarray,
                   configuration_manager: ConfigurationManager,
                   foreground_intensity_properties_per_channel: dict) -> np.ndarray:
        for c in range(data.shape[0]):
            scheme = configuration_manager.normalization_schemes[c]
            cls = get_normalization_scheme_by_class_name(scheme)
            normalizer = cls(
                use_mask_for_norm=configuration_manager.use_mask_for_norm[c],
                intensityproperties=foreground_intensity_properties_per_channel.get(
                    str(c), foreground_intensity_properties_per_channel.get(c)))
            data[c] = normalizer.run(data[c], seg[0] if seg is not None else None)
        return data

    def modify_seg_fn(self, seg: np.ndarray, plans_manager: PlansManager,
                      dataset_json: dict,
                      configuration_manager: ConfigurationManager) -> np.ndarray:
        """Extension hook (ref default_preprocessor.py:311)."""
        return seg

    # ------------------------------------------------------------------ dataset run
    def run(self, dataset_name_or_id, configuration_name: str,
            plans_identifier: str = "nnUNetPlans", num_processes: int = 8,
            storage: Optional[str] = None) -> None:
        """Preprocess a whole dataset into nnUNet_preprocessed/<ds>/<data_identifier>.

        storage: 'npy' (memmap-able, default) or 'fnnz' (chunked-zstd,
        cache-tuned bricks — the reference's blosc2 role); defaults to the
        FNNT_STORE env var."""
        from ..paths import get_preprocessed_folder, get_raw_folder
        from ..utils.misc import maybe_convert_to_dataset_name

        dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
        preprocessed = join(get_preprocessed_folder(), dataset_name)
        plans_manager = PlansManager(join(preprocessed, plans_identifier + ".json"))
        configuration_manager = plans_manager.get_configuration(configuration_name)
        dataset_json = load_json(join(get_raw_folder(), dataset_name, "dataset.json"))
        dataset = get_filenames_of_train_images_and_targets(
            join(get_raw_folder(), dataset_name), dataset_json)

        out_folder = join(preprocessed, configuration_manager.data_identifier)
        maybe_mkdir_p(out_folder)
        if storage is None:
            import os
            storage = os.environ.get("FNNT_STORE", "npy")
        assert storage in ("npy", "fnnz"), f"unknown storage {storage!r}"

        jobs = [(join(out_folder, ident), d["images"], d["label"])
                for ident, d in dataset.items()]
        if num_processes <= 1:
            for out_trunc, images, label in jobs:
                self.run_case_save(out_trunc, images, label, plans_manager,
                                   configuration_manager, dataset_json,
                                   storage=storage)
        else:
            from ..utils.mp_env import cpu_only_child_env
            ctx = multiprocessing.get_context("spawn")
            with cpu_only_child_env(), \
                    ProcessPoolExecutor(max_workers=num_processes,
                                        mp_context=ctx) as ex:
                futures = {
                    ex.submit(_run_case_save_worker, type(self), out_trunc, images,
                              label, plans_manager.plans, configuration_name,
                              dataset_json, storage): out_trunc
                    for out_trunc, images, label in jobs}
                for fut in as_completed(futures):
                    fut.result()  # re-raise worker errors with context


def _run_case_save_worker(preproc_cls, out_trunc, images, label, plans_dict,
                          configuration_name, dataset_json, storage="npy"):
    pm = PlansManager(plans_dict)
    cm = pm.get_configuration(configuration_name)
    preproc_cls().run_case_save(out_trunc, images, label, pm, cm, dataset_json,
                                storage=storage)
