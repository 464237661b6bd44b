"""Prediction export: resample logits back to original geometry, convert to
segmentation, revert crop + transpose, write with the case's reader/writer.

Parity: distillation/nnunetv2/inference/export_prediction.py:14-149.
"""
import os
from typing import Optional, Tuple, Union

import numpy as np

from ..core.labels import LabelManager
from ..core.plans import ConfigurationManager, PlansManager
from ..utils.io import load_json, save_pickle


def convert_predicted_logits_to_segmentation_with_correct_shape(
        predicted_logits: np.ndarray, plans_manager: PlansManager,
        configuration_manager: ConfigurationManager, label_manager: LabelManager,
        properties_dict: dict, return_probabilities: bool = False):
    """predicted_logits: (K, *resampled_shape) fp32 in the preprocessed
    (transposed+cropped+resampled) space."""
    old_threads = None  # numpy has no thread knob to save; kept for API shape

    # 1) resample to the shape after cropping / before resampling
    spacing_transposed = [properties_dict["spacing"][i]
                          for i in plans_manager.transpose_forward]
    current_spacing = configuration_manager.spacing
    if len(current_spacing) < len(properties_dict["shape_after_cropping_and_before_resampling"]):
        current_spacing = [spacing_transposed[0]] + list(current_spacing)
    target_spacing = spacing_transposed

    predicted_logits = configuration_manager.resampling_fn_probabilities(
        predicted_logits,
        properties_dict["shape_after_cropping_and_before_resampling"],
        current_spacing, target_spacing)

    # 2) logits -> segmentation (argmax, or sigmoid+ordered thresholding for regions)
    if return_probabilities:
        probabilities = label_manager.apply_inference_nonlin(predicted_logits)
        segmentation = label_manager.convert_probabilities_to_segmentation(probabilities)
    else:
        segmentation = label_manager.convert_logits_to_segmentation(predicted_logits)

    # 3) revert cropping
    seg_reverted = np.zeros(properties_dict["shape_before_cropping"],
                            dtype=np.uint8 if len(label_manager.foreground_labels) < 255
                            else np.uint16)
    bbox = properties_dict["bbox_used_for_cropping"]
    sl = tuple(slice(b[0], b[1]) for b in bbox)
    seg_reverted[sl] = segmentation

    # 4) revert transpose
    seg_reverted = seg_reverted.transpose(plans_manager.transpose_backward)

    if return_probabilities:
        probabilities = label_manager.revert_cropping_on_probabilities(
            probabilities, bbox, properties_dict["shape_before_cropping"])
        probabilities = probabilities.transpose(
            [0] + [i + 1 for i in plans_manager.transpose_backward])
        return seg_reverted, probabilities
    return seg_reverted


def export_prediction_from_logits(predicted_logits: np.ndarray, properties_dict: dict,
                                  configuration_manager: ConfigurationManager,
                                  plans_manager: PlansManager,
                                  dataset_json: Union[dict, str],
                                  output_file_truncated: str,
                                  save_probabilities: bool = False) -> None:
    if isinstance(dataset_json, str):
        dataset_json = load_json(dataset_json)
    label_manager = plans_manager.get_label_manager(dataset_json)
    ret = convert_predicted_logits_to_segmentation_with_correct_shape(
        predicted_logits, plans_manager, configuration_manager, label_manager,
        properties_dict, return_probabilities=save_probabilities)
    if save_probabilities:
        segmentation, probabilities = ret
        np.savez_compressed(output_file_truncated + ".npz",
                            probabilities=probabilities.astype(np.float16))
        save_pickle(properties_dict, output_file_truncated + ".pkl")
    else:
        segmentation = ret

    rw = plans_manager.image_reader_writer_class()()
    rw.write_seg(segmentation, output_file_truncated + dataset_json["file_ending"],
                 properties_dict)


def resample_and_save(predicted_logits: np.ndarray, target_shape, output_file: str,
                      plans_manager: PlansManager,
                      configuration_manager: ConfigurationManager,
                      properties_dict: dict, dataset_json: Union[dict, str]) -> None:
    """Cascade: save this stage's softmax resampled to the next stage's grid as
    the next stage's prior (ref export_prediction.py:113-149)."""
    if isinstance(dataset_json, str):
        dataset_json = load_json(dataset_json)
    spacing_transposed = [properties_dict["spacing"][i]
                          for i in plans_manager.transpose_forward]
    current_spacing = configuration_manager.spacing
    if len(current_spacing) < len(target_shape):
        current_spacing = [spacing_transposed[0]] + list(current_spacing)
    target_spacing = configuration_manager.spacing  # next stage grid spacing
    resampled = configuration_manager.resampling_fn_probabilities(
        predicted_logits, target_shape, current_spacing, target_spacing)
    label_manager = plans_manager.get_label_manager(dataset_json)
    segmentation = label_manager.convert_logits_to_segmentation(resampled)
    np.savez_compressed(output_file, seg=segmentation.astype(np.uint8))
