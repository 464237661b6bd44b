"""JHU-style predictor variant: one output file per foreground class with
immediate largest-component postprocessing — demonstrates the predictor
extension pattern (ref distillation/nnunetv2/inference/JHU_inference.py:67-197)."""
import os
from typing import Optional

import numpy as np

from ..postprocessing.connected_components import \
    remove_all_but_largest_component_from_segmentation
from ..preprocessing.preprocessor import DefaultPreprocessor
from ..utils.io import maybe_mkdir_p, join
from .export import convert_predicted_logits_to_segmentation_with_correct_shape
from .predictor import NNUNetPredictor


class JHUPredictor(NNUNetPredictor):
    """predict_from_files writes, per case, one binary mask file per foreground
    class (``<case>/<class_name>.nii.gz``), postprocessed to the largest
    connected component."""

    def predict_case_to_class_files(self, image_files, output_folder: str,
                                    apply_largest_component: bool = True) -> None:
        maybe_mkdir_p(output_folder)
        preproc = DefaultPreprocessor(verbose=self.verbose)
        data, _, props = preproc.run_case(
            image_files, None, self.plans_manager, self.configuration_manager,
            self.dataset_json)
        logits = self.predict_logits_from_preprocessed_data(data)
        seg = convert_predicted_logits_to_segmentation_with_correct_shape(
            logits, self.plans_manager, self.configuration_manager,
            self.label_manager, props)

        labels_by_name = {name: val for name, val in
                          self.dataset_json["labels"].items()
                          if name != "background" and np.isscalar(val) and val != 0}
        rw = self.plans_manager.image_reader_writer_class()()
        fe = self.dataset_json["file_ending"]
        for name, val in labels_by_name.items():
            mask = (seg == val).astype(np.uint8)
            if apply_largest_component and mask.any():
                mask = remove_all_but_largest_component_from_segmentation(
                    mask, [1]).astype(np.uint8)
            rw.write_seg(mask, join(output_folder, f"{name}{fe}"), props)
