"""FastnnUNetInferencer: lightweight config-driven inference (the module the
reference documents but does not ship, ref inference/main.py:26-27 and
docs/Inference.md:118-147: reorient -> resample -> window/normalize -> sliding
window +- mirroring -> postprocessing -> save with original geometry).

Runs from an exported StableHLO artifact (export/export_model.py) or a trained
model folder; the compute path is the jitted SlidingWindowEngine.
"""
import os
import time
from typing import List, Optional, Sequence, Union

import numpy as np

from ..imageio.nifti import NiftiIOWithReorient
from ..ops.cropping import crop_to_nonzero
from ..ops.normalization import get_normalization_scheme_by_class_name
from ..ops.resampling import compute_new_shape, resample_data_or_seg_to_shape
from ..postprocessing.connected_components import \
    remove_all_but_largest_component_from_segmentation
from ..utils.io import isfile, join, maybe_mkdir_p, subfiles
from ..utils.misc import enable_persistent_compile_cache
from .config_manager import ConfigManager


class _ArtifactNetwork:
    """Adapter giving an exported StableHLO artifact the Flax-module apply()
    interface the engine expects."""

    def __init__(self, artifact_path: str):
        import jax.export as jexport
        with open(artifact_path, "rb") as f:
            self._exported = jexport.deserialize(f.read())
        self.in_dtype = self._exported.in_avals[0].dtype

    def apply(self, params, x, deep_supervision=False):
        assert not deep_supervision
        return self._exported.call(x.astype(self.in_dtype))


class FastnnUNetInferencer:
    def __init__(self, config_file: Optional[str] = None,
                 model_folder: Optional[str] = None,
                 folds=None, tile_step_size: Optional[float] = None,
                 use_mirroring: Optional[bool] = None,
                 verbose: bool = False):
        enable_persistent_compile_cache()
        self.verbose = verbose
        self.config: Optional[ConfigManager] = None
        self.engine = None
        self.predictor = None
        self._params = None
        self._model_info = {}
        if config_file is not None:
            self.load_model(config_file, tile_step_size, use_mirroring)
        elif model_folder is not None:
            self.load_model_folder(model_folder, folds, tile_step_size,
                                   use_mirroring)

    # ------------------------------------------------------------------ loading
    def load_model(self, config_file: str, tile_step_size=None,
                   use_mirroring=None) -> None:
        """Load from a per-model JSON config + exported artifact."""
        import jax.numpy as jnp
        from ..inference.engine import SlidingWindowEngine
        cfg = ConfigManager(config_file)
        network = _ArtifactNetwork(cfg.model_path)
        num_classes = cfg.num_classes or (len(cfg.labels) if cfg.labels else None)
        assert num_classes, "config must specify num_classes or labels"
        mirroring = cfg.use_mirroring if use_mirroring is None else use_mirroring
        # artifacts exported with --tta already average flips inside the
        # traced computation: never flip again at the engine level
        if cfg.mirroring_baked_into_artifact:
            mirroring = False
        self.engine = SlidingWindowEngine(
            network, cfg.patch_size, num_classes,
            tile_step_size=tile_step_size or cfg.tile_step_size,
            use_gaussian=cfg.use_gaussian,
            mirror_axes=cfg.mirror_axes if mirroring else (),
            compute_dtype=jnp.dtype(cfg.compute_dtype)
            if cfg.compute_dtype != "bfloat16" else jnp.bfloat16,
            # artifacts have a FIXED batch dim (export -b, default 8): feed
            # exactly that many patches per call, padding short batches
            tile_batch=cfg.tile_batch, pad_to_tile_batch=True)
        self._params = [{}]  # weights are baked into the artifact
        self.config = cfg
        self._model_info = {"source": "artifact", "config_file": config_file,
                            "model_path": cfg.model_path,
                            "patch_size": list(cfg.patch_size),
                            "num_classes": num_classes}

    def load_model_folder(self, model_folder: str, folds=None,
                          tile_step_size=None, use_mirroring=None) -> None:
        """Load from a trained results folder (full predictor path)."""
        from ..inference.predictor import NNUNetPredictor
        predictor = NNUNetPredictor(
            tile_step_size=tile_step_size or 0.5,
            use_mirroring=bool(use_mirroring) if use_mirroring is not None else False,
            verbose=self.verbose)
        predictor.initialize_from_trained_model_folder(model_folder, folds)
        self.predictor = predictor
        self._model_info = {"source": "model_folder", "model_folder": model_folder,
                            "patch_size": predictor.configuration_manager.patch_size,
                            "num_classes":
                                predictor.label_manager.num_segmentation_heads}

    def get_model_info(self) -> dict:
        return dict(self._model_info)

    def predict_logits_from_preprocessed(self, data: np.ndarray) -> np.ndarray:
        """(C, *spatial) already-preprocessed volume -> logits (K, *spatial).
        The /predict_array serving endpoint (and the C++ engine) hit this."""
        if self.engine is not None:
            return self.engine.predict_logits(self._params, data)
        assert self.predictor is not None, "no model loaded"
        return self.predictor.predict_logits_from_preprocessed_data(data)

    # ------------------------------------------------------------------ predict
    def predict_single_image(self, input_file: str, output_file: str,
                             save_probabilities: bool = False,
                             largest_component_postprocessing: bool = False,
                             generate_vtk: bool = False,
                             vtk_output_file: Optional[str] = None,
                             color_file: Optional[str] = None,
                             smoothing_factor: float = 0.5,
                             decimation_factor: float = 0.2) -> dict:
        t0 = time.time()
        if self.predictor is not None:
            seg, props, rw = self._predict_via_predictor(input_file, output_file,
                                                         save_probabilities)
        else:
            seg, props, rw = self._predict_via_artifact(input_file, output_file)

        if largest_component_postprocessing:
            fg = sorted(set(np.unique(seg).tolist()) - {0})
            seg = remove_all_but_largest_component_from_segmentation(seg, fg)
            # same reader-writer that produced the original output: geometry
            # (and any reorientation restore) stays consistent
            rw.write_seg(seg, output_file, props)

        result = {"input": input_file, "output": output_file,
                  "seconds": round(time.time() - t0, 3),
                  "labels_present": sorted(int(x) for x in np.unique(seg))}
        if generate_vtk:
            from .vtk_export import VTKModelGenerator
            vtk_file = vtk_output_file or os.path.splitext(
                output_file.replace(".nii.gz", ""))[0] + ".vtk"
            gen = VTKModelGenerator(color_file=color_file)
            gen.generate_vtk_model(seg, props.get("spacing", (1, 1, 1)), vtk_file,
                                   smoothing_factor=smoothing_factor,
                                   decimation_factor=decimation_factor)
            result["vtk_model"] = vtk_file
        return result

    def _predict_via_predictor(self, input_file, output_file, save_probabilities):
        out_trunc = output_file
        fe = self.predictor.dataset_json["file_ending"]
        if out_trunc.endswith(fe):
            out_trunc = out_trunc[: -len(fe)]
        self.predictor.predict_from_files([[input_file]], [out_trunc],
                                          save_probabilities=save_probabilities)
        rw = self.predictor.plans_manager.image_reader_writer_class()()
        seg, props = rw.read_seg(out_trunc + fe)
        return seg[0], props, rw

    def _predict_via_artifact(self, input_file: str, output_file: str):
        """Documented pipeline (docs/Inference.md:118-147) on the artifact path:
        reorient-to-canonical -> transpose -> crop -> normalize -> resample ->
        sliding window -> resample back -> argmax -> uncrop -> untranspose ->
        restore original orientation -> save.

        The reference's documented step 1 is LPS canonicalization (ref
        docs/Inference.md:118-147, simpleitk_reader_writer.py:132-231); using a
        plain reader here would silently segment a non-canonically-stored NIfTI
        in voxel order against a canonically-trained model."""
        cfg = self.config
        rw = NiftiIOWithReorient()
        data, props = rw.read_images([input_file])

        tf = cfg.transpose_forward
        data = data.transpose([0, *[i + 1 for i in tf]])
        original_spacing = [props["spacing"][i] for i in tf]
        shape_before_crop = data.shape[1:]
        data, seg_mask, bbox = crop_to_nonzero(data)
        shape_after_crop = data.shape[1:]

        for c in range(data.shape[0]):
            scheme = cfg.normalization_schemes[min(c, len(cfg.normalization_schemes) - 1)]
            cls = get_normalization_scheme_by_class_name(scheme)
            ip = cfg.intensity_properties.get(str(c), next(iter(
                cfg.intensity_properties.values())))
            data[c] = cls(use_mask_for_norm=False, intensityproperties=ip).run(
                data[c], seg_mask[0])

        new_shape = compute_new_shape(shape_after_crop, original_spacing,
                                      cfg.target_spacing)
        data = resample_data_or_seg_to_shape(data, new_shape, original_spacing,
                                             cfg.target_spacing, is_seg=False,
                                             order=3, order_z=0,
                                             force_separate_z=None)

        logits = self.engine.predict_logits(self._params, data)
        logits = resample_data_or_seg_to_shape(
            logits, shape_after_crop, cfg.target_spacing, original_spacing,
            is_seg=False, order=1, order_z=0, force_separate_z=None)
        seg_cropped = logits.argmax(0).astype(np.uint8)

        seg = np.zeros(shape_before_crop, np.uint8)
        seg[tuple(slice(b[0], b[1]) for b in bbox)] = seg_cropped
        seg = seg.transpose(cfg.transpose_backward)
        rw.write_seg(seg, output_file, props)
        return seg, props, rw

    def predict_batch(self, input_folder: str, output_folder: str,
                      pattern_suffix: str = ".nii.gz", **kwargs) -> List[dict]:
        maybe_mkdir_p(output_folder)
        results = []
        for f in subfiles(input_folder, suffix=pattern_suffix, join_path=False):
            out = join(output_folder, f)
            results.append(self.predict_single_image(join(input_folder, f), out,
                                                     **kwargs))
        return results
