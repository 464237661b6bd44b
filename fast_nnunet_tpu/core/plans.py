"""Plans / configuration handling.

The plans JSON (``nnUNetPlans.json``) is the central experiment config; we keep
the reference's schema verbatim so plans files are interchangeable
(ref: distillation/nnunetv2/utilities/plans_handling/plans_handler.py:31-341).

Schema (top level): dataset_name, plans_name, original_median_spacing_after_transp,
original_median_shape_after_transp, image_reader_writer, transpose_forward,
transpose_backward, configurations{...}, experiment_planner_used, label_manager,
foreground_intensity_properties_per_channel.

Per configuration: data_identifier, preprocessor_name, batch_size, patch_size,
median_image_size_in_voxels, spacing, normalization_schemes, use_mask_for_norm,
resampling_fn_data/seg/probabilities (+ _kwargs), architecture{network_class_name,
arch_kwargs, _kw_requires_import}, batch_dice, and optionally inherits_from,
previous_stage, next_stage.
"""
import json
from copy import deepcopy
from functools import lru_cache
from typing import List, Optional, Tuple, Union

import numpy as np

from .labels import LabelManager


class ConfigurationManager:
    """Typed view over one (inheritance-resolved) configuration dict."""

    def __init__(self, configuration_dict: dict):
        self.configuration = configuration_dict

        # backwards compatibility with "old" (pre-arch-dict) plans, mirroring
        # the reference's conversion (plans_handler.py:40-97)
        if "architecture" not in self.configuration:
            uc = self.configuration.get("UNet_class_name", "PlainConvUNet")
            n_stages = len(self.configuration["n_conv_per_stage_encoder"])
            dim = len(self.configuration["patch_size"])
            conv_op = f"torch.nn.Conv{dim}d"
            instnorm = f"torch.nn.InstanceNorm{dim}d"
            arch_dict = {
                "network_class_name": "dynamic_network_architectures.architectures.unet." + uc,
                "arch_kwargs": {
                    "n_stages": n_stages,
                    "features_per_stage": [
                        min(self.configuration["UNet_base_num_features"] * 2 ** i,
                            self.configuration["unet_max_num_features"]) for i in range(n_stages)],
                    "conv_op": conv_op,
                    "kernel_sizes": deepcopy(self.configuration["conv_kernel_sizes"]),
                    "strides": deepcopy(self.configuration["pool_op_kernel_sizes"]),
                    "n_conv_per_stage": deepcopy(self.configuration["n_conv_per_stage_encoder"]),
                    "n_conv_per_stage_decoder": deepcopy(self.configuration["n_conv_per_stage_decoder"]),
                    "conv_bias": True,
                    "norm_op": instnorm,
                    "norm_op_kwargs": {"eps": 1e-5, "affine": True},
                    "dropout_op": None,
                    "dropout_op_kwargs": None,
                    "nonlin": "torch.nn.LeakyReLU",
                    "nonlin_kwargs": {"inplace": True},
                },
                "_kw_requires_import": ("conv_op", "norm_op", "dropout_op", "nonlin"),
            }
            self.configuration["architecture"] = arch_dict

    def __repr__(self):
        return self.configuration.__repr__()

    @property
    def data_identifier(self) -> str:
        return self.configuration["data_identifier"]

    @property
    def preprocessor_name(self) -> str:
        return self.configuration["preprocessor_name"]

    @property
    def batch_size(self) -> int:
        return self.configuration["batch_size"]

    @property
    def patch_size(self) -> List[int]:
        return list(self.configuration["patch_size"])

    @property
    def median_image_size_in_voxels(self) -> List[int]:
        return self.configuration["median_image_size_in_voxels"]

    @property
    def spacing(self) -> List[float]:
        return list(self.configuration["spacing"])

    @property
    def normalization_schemes(self) -> List[str]:
        return self.configuration["normalization_schemes"]

    @property
    def use_mask_for_norm(self) -> List[bool]:
        return self.configuration["use_mask_for_norm"]

    @property
    def network_arch_class_name(self) -> str:
        return self.configuration["architecture"]["network_class_name"]

    @property
    def network_arch_init_kwargs(self) -> dict:
        return self.configuration["architecture"]["arch_kwargs"]

    @property
    def network_arch_init_kwargs_req_import(self) -> Tuple[str, ...]:
        return tuple(self.configuration["architecture"].get("_kw_requires_import", ()))

    @property
    def pool_op_kernel_sizes(self) -> List[List[int]]:
        return [list(s) for s in self.configuration["architecture"]["arch_kwargs"]["strides"]]

    @property
    def conv_kernel_sizes(self) -> List[List[int]]:
        return [list(k) for k in self.configuration["architecture"]["arch_kwargs"]["kernel_sizes"]]

    @property
    def n_stages(self) -> int:
        return int(self.configuration["architecture"]["arch_kwargs"]["n_stages"])

    @property
    def batch_dice(self) -> bool:
        return self.configuration["batch_dice"]

    @property
    def resampling_fn_data_name(self) -> str:
        return self.configuration["resampling_fn_data"]

    @property
    def resampling_fn_data_kwargs(self) -> dict:
        return self.configuration["resampling_fn_data_kwargs"]

    @property
    def resampling_fn_seg_name(self) -> str:
        return self.configuration["resampling_fn_seg"]

    @property
    def resampling_fn_seg_kwargs(self) -> dict:
        return self.configuration["resampling_fn_seg_kwargs"]

    @property
    def resampling_fn_probabilities_name(self) -> str:
        return self.configuration["resampling_fn_probabilities"]

    @property
    def resampling_fn_probabilities_kwargs(self) -> dict:
        return self.configuration["resampling_fn_probabilities_kwargs"]

    @property
    def previous_stage_name(self) -> Optional[str]:
        return self.configuration.get("previous_stage")

    @property
    def next_stage_names(self) -> Optional[List[str]]:
        ret = self.configuration.get("next_stage")
        if ret is not None and isinstance(ret, str):
            return [ret]
        return ret

    # resolved callables — late imports to avoid circularity
    @property
    def resampling_fn_data(self):
        from ..ops.resampling import resolve_resampling_fn
        return resolve_resampling_fn(self.resampling_fn_data_name, self.resampling_fn_data_kwargs)

    @property
    def resampling_fn_seg(self):
        from ..ops.resampling import resolve_resampling_fn
        return resolve_resampling_fn(self.resampling_fn_seg_name, self.resampling_fn_seg_kwargs)

    @property
    def resampling_fn_probabilities(self):
        from ..ops.resampling import resolve_resampling_fn
        return resolve_resampling_fn(self.resampling_fn_probabilities_name,
                                     self.resampling_fn_probabilities_kwargs)


class PlansManager:
    """Loads a plans dict/JSON and hands out inheritance-resolved configurations
    (ref plans_handler.py:214-341)."""

    def __init__(self, plans: Union[str, dict]):
        if isinstance(plans, str):
            with open(plans) as f:
                plans = json.load(f)
        self.plans = plans
        self._config_cache: dict = {}
        self._label_manager_cache: dict = {}

    def __repr__(self):
        return self.plans.__repr__()

    def _resolve_configuration_inheritance(self, configuration_name: str,
                                           visited: Optional[set] = None) -> dict:
        if configuration_name not in self.plans["configurations"]:
            raise ValueError(
                f"Requested configuration {configuration_name} not found in plans "
                f"{self.plans.get('plans_name')}. Available: "
                f"{list(self.plans['configurations'].keys())}")
        configuration = dict(self.plans["configurations"][configuration_name])
        if "inherits_from" in configuration:
            parent_name = configuration["inherits_from"]
            if visited is None:
                visited = {configuration_name}
            elif parent_name in visited:
                raise RuntimeError(
                    f"Circular 'inherits_from' detected involving {parent_name} "
                    f"(chain: {visited}).")
            visited.add(parent_name)
            base = self._resolve_configuration_inheritance(parent_name, visited)
            base.update(configuration)
            configuration = base
        return configuration

    def get_configuration(self, configuration_name: str) -> ConfigurationManager:
        if configuration_name not in self._config_cache:
            cfg = self._resolve_configuration_inheritance(configuration_name)
            self._config_cache[configuration_name] = ConfigurationManager(cfg)
        return self._config_cache[configuration_name]

    @property
    def dataset_name(self) -> str:
        return self.plans["dataset_name"]

    @property
    def plans_name(self) -> str:
        return self.plans["plans_name"]

    @property
    def original_median_spacing_after_transp(self) -> List[float]:
        return self.plans["original_median_spacing_after_transp"]

    @property
    def original_median_shape_after_transp(self) -> List[int]:
        return self.plans["original_median_shape_after_transp"]

    @property
    def transpose_forward(self) -> List[int]:
        return self.plans["transpose_forward"]

    @property
    def transpose_backward(self) -> List[int]:
        return self.plans["transpose_backward"]

    @property
    def available_configurations(self) -> List[str]:
        return list(self.plans["configurations"].keys())

    @property
    def image_reader_writer_class_name(self) -> str:
        return self.plans["image_reader_writer"]

    def image_reader_writer_class(self):
        from ..imageio.registry import find_reader_writer_by_name
        return find_reader_writer_by_name(self.image_reader_writer_class_name)

    @property
    def experiment_planner_name(self) -> Optional[str]:
        return self.plans.get("experiment_planner_used")

    @property
    def label_manager_class_name(self) -> str:
        return self.plans.get("label_manager", "LabelManager")

    def get_label_manager(self, dataset_json: dict, **kwargs) -> LabelManager:
        key = id(dataset_json)
        if key not in self._label_manager_cache:
            self._label_manager_cache[key] = LabelManager(
                label_dict=dataset_json["labels"],
                regions_class_order=dataset_json.get("regions_class_order"),
                **kwargs)
        return self._label_manager_cache[key]

    @property
    def foreground_intensity_properties_per_channel(self) -> dict:
        if "foreground_intensity_properties_per_channel" not in self.plans:
            if "foreground_intensity_properties_by_modality" in self.plans:  # old name
                return self.plans["foreground_intensity_properties_by_modality"]
        return self.plans["foreground_intensity_properties_per_channel"]

    def save(self, fname: str) -> None:
        from ..utils.io import save_json
        save_json(self.plans, fname, sort_keys=False)
