"""High-level predictor: restore trained models from a results folder and run
file-to-file inference.

Parity target: nnUNetPredictor (ref distillation/nnunetv2/inference/
predict_from_raw_data.py:39-767): self-describing model folders (plans.json +
dataset.json + fold checkpoints), fold auto-detection, preprocessing -> device
-> export pipeline with host-side worker overlap, continue_prediction, custom
data iterators. The device part delegates to SlidingWindowEngine (one jitted
tile loop; folds ensembled on device instead of the reference's per-fold
sliding-window re-runs).
"""
import os
import queue
import threading
from typing import List, Optional, Sequence, Tuple, Union

import jax
import numpy as np

from ..core.plans import PlansManager
from ..models.factory import build_network_from_arch_dict, get_network_from_plans
from ..models.students import build_student_arch_kwargs
from ..core.labels import determine_num_input_channels
from ..preprocessing.preprocessor import DefaultPreprocessor
from ..training.checkpoint import load_checkpoint, restore_params
from ..utils.io import isfile, isdir, join, load_json, maybe_mkdir_p, subdirs, subfiles
from .engine import SlidingWindowEngine
from .export import export_prediction_from_logits


class NNUNetPredictor:
    def __init__(self, tile_step_size: float = 0.5, use_gaussian: bool = True,
                 use_mirroring: bool = True,
                 perform_everything_on_device: bool = True,
                 device=None, verbose: bool = False,
                 allow_tqdm: bool = True):
        from ..utils.misc import enable_persistent_compile_cache
        enable_persistent_compile_cache()
        self.tile_step_size = tile_step_size
        self.use_gaussian = use_gaussian
        self.use_mirroring = use_mirroring
        self.perform_everything_on_device = perform_everything_on_device
        self.verbose = verbose

        self.plans_manager: Optional[PlansManager] = None
        self.configuration_manager = None
        self.dataset_json = None
        self.label_manager = None
        self.network = None
        self.list_of_parameters: List = []
        self.allowed_mirroring_axes: Tuple[int, ...] = ()
        self.trainer_name = None
        self.engine: Optional[SlidingWindowEngine] = None

    # ------------------------------------------------------------------ restore
    @staticmethod
    def auto_detect_available_folds(model_training_output_dir: str,
                                    checkpoint_name: str) -> List[int]:
        folds = []
        for d in subdirs(model_training_output_dir, prefix="fold_", join_path=False):
            if d == "fold_all":
                continue
            if isfile(join(model_training_output_dir, d, checkpoint_name)):
                folds.append(int(d.split("_")[-1]))
        assert folds, f"no usable folds in {model_training_output_dir}"
        return sorted(folds)

    def initialize_from_trained_model_folder(
            self, model_training_output_dir: str,
            use_folds: Union[None, Sequence[Union[int, str]]] = None,
            checkpoint_name: str = "checkpoint_final.fnnx") -> None:
        if use_folds is None:
            use_folds = self.auto_detect_available_folds(
                model_training_output_dir, checkpoint_name)
        if isinstance(use_folds, (int, str)):
            use_folds = [use_folds]

        dataset_json = load_json(join(model_training_output_dir, "dataset.json"))
        plans_manager = PlansManager(join(model_training_output_dir, "plans.json"))

        parameters = []
        configuration_name = None
        inference_axes = None
        trainer_name = None
        init_args = None
        for f in use_folds:
            f = int(f) if f != "all" else f
            ckpt = load_checkpoint(join(model_training_output_dir, f"fold_{f}",
                                        checkpoint_name))
            if configuration_name is None:
                trainer_name = ckpt.get("trainer_name", "NNUNetTrainer")
                init_args = ckpt.get("init_args", {})
                configuration_name = init_args.get("configuration", "3d_fullres")
                inference_axes = ckpt.get("inference_allowed_mirroring_axes")
            parameters.append(ckpt["network_weights"])

        configuration_manager = plans_manager.get_configuration(configuration_name)
        num_input_channels = determine_num_input_channels(
            plans_manager, configuration_manager, dataset_json)
        label_manager = plans_manager.get_label_manager(dataset_json)

        # rebuild the network exactly as the checkpoint's trainer would
        # (ref predict_from_raw_data.py:89-104: trainer_name drives the build)
        arch = configuration_manager.configuration["architecture"]
        import jax.numpy as jnp
        if trainer_name and "Distillation" in trainer_name:
            student_kwargs = build_student_arch_kwargs(
                arch["arch_kwargs"],
                init_args.get("feature_reduction_factor", 2),
                init_args.get("block_reduction_strategy", "reduce"))
            network = get_network_from_plans(
                arch["network_class_name"], student_kwargs, (),
                num_input_channels, label_manager.num_segmentation_heads,
                dtype=jnp.bfloat16)
        elif init_args and init_args.get("primus_arch"):
            # Primus trainers override the plans architecture entirely; the
            # checkpoint's init_args carry the transformer dims (see
            # AbstractPrimusTrainer._init_args). drop_path is inert at
            # inference (deterministic apply), but the static knobs must
            # match training so the param tree restores 1:1.
            from ..models.primus import Primus
            pa = init_args["primus_arch"]
            network = Primus(
                input_channels=num_input_channels,
                embed_dim=int(pa["embed_dim"]),
                patch_embed_size=tuple(int(p) for p in pa["patch_embed_size"]),
                num_classes=label_manager.num_segmentation_heads,
                depth=int(pa["depth"]), num_heads=int(pa["num_heads"]),
                patch_size=tuple(configuration_manager.patch_size),
                drop_path_rate=0.2, scale_attn_inner=True, init_values=0.1,
                dtype=jnp.bfloat16)
        else:
            network = build_network_from_arch_dict(
                arch, num_input_channels, label_manager.num_segmentation_heads,
                dtype=jnp.bfloat16)

        patch = tuple(configuration_manager.patch_size)
        template = jax.device_get(network.init(
            jax.random.PRNGKey(0), np.zeros((1, *patch, num_input_channels),
                                            np.float32), deep_supervision=False))
        self.list_of_parameters = [restore_params(template, p) for p in parameters]

        self.plans_manager = plans_manager
        self.configuration_manager = configuration_manager
        self.dataset_json = dataset_json
        self.label_manager = label_manager
        self.network = network
        self.trainer_name = trainer_name
        self.allowed_mirroring_axes = tuple(inference_axes or ())
        self._make_engine()

    def manual_initialization(self, network, plans_manager, configuration_manager,
                              parameters: List, dataset_json: dict,
                              trainer_name: str,
                              inference_allowed_mirroring_axes) -> None:
        """Used by the trainer for its own final validation (ref :131-154)."""
        self.network = network
        self.plans_manager = plans_manager
        self.configuration_manager = configuration_manager
        self.list_of_parameters = parameters
        self.dataset_json = dataset_json
        self.trainer_name = trainer_name
        self.allowed_mirroring_axes = tuple(inference_allowed_mirroring_axes or ())
        self.label_manager = plans_manager.get_label_manager(dataset_json)
        self._make_engine()

    def _make_engine(self) -> None:
        import jax.numpy as jnp
        mirror = self.allowed_mirroring_axes if self.use_mirroring else ()
        self.engine = SlidingWindowEngine(
            self.network, self.configuration_manager.patch_size,
            self.label_manager.num_segmentation_heads,
            tile_step_size=self.tile_step_size,
            use_gaussian=self.use_gaussian,
            mirror_axes=mirror,
            compute_dtype=jnp.bfloat16)

    # ------------------------------------------------------------------ file API
    def _manage_input_and_output_lists(self, list_of_lists_or_source_folder,
                                       output_folder_or_list,
                                       folder_with_segs_from_prev_stage=None,
                                       overwrite: bool = True,
                                       part_id: int = 0, num_parts: int = 1):
        from ..utils.dataset_io import get_identifiers_from_splitted_dataset_folder
        fe = self.dataset_json["file_ending"]
        if isinstance(list_of_lists_or_source_folder, str):
            idents = get_identifiers_from_splitted_dataset_folder(
                list_of_lists_or_source_folder, fe)
            num_channels = len(self.dataset_json.get(
                "channel_names", self.dataset_json.get("modality")))
            list_of_lists = [
                [join(list_of_lists_or_source_folder, f"{i}_{c:04d}{fe}")
                 for c in range(num_channels)] for i in idents]
        else:
            list_of_lists = list_of_lists_or_source_folder
            idents = [os.path.basename(x[0])[:-(len(fe) + 5)] for x in list_of_lists]

        list_of_lists = list_of_lists[part_id::num_parts]
        idents = idents[part_id::num_parts]

        if isinstance(output_folder_or_list, str):
            output_files = [join(output_folder_or_list, i) for i in idents]
        else:
            output_files = output_folder_or_list

        seg_prev = [join(folder_with_segs_from_prev_stage, i + fe)
                    if folder_with_segs_from_prev_stage is not None else None
                    for i in idents]

        if not overwrite:
            keep = [not isfile(o + fe) for o in output_files]
            list_of_lists = [l for l, k in zip(list_of_lists, keep) if k]
            output_files = [o for o, k in zip(output_files, keep) if k]
            seg_prev = [s for s, k in zip(seg_prev, keep) if k]
        return list_of_lists, output_files, seg_prev

    def predict_from_files(self, list_of_lists_or_source_folder,
                           output_folder_or_list_of_truncated_output_files,
                           save_probabilities: bool = False,
                           overwrite: bool = True,
                           num_processes_preprocessing: int = 3,
                           num_processes_segmentation_export: int = 3,
                           folder_with_segs_from_prev_stage: Optional[str] = None,
                           part_id: int = 0, num_parts: int = 1) -> None:
        """Preprocess (worker thread) -> device sliding window -> export (worker
        threads), with bounded queues for backpressure (the reference's process
        pools, ref :207-420, as threads — numpy/scipy drop the GIL)."""
        if isinstance(output_folder_or_list_of_truncated_output_files, str):
            maybe_mkdir_p(output_folder_or_list_of_truncated_output_files)
            # provenance dump (ref predict_from_raw_data_args.json, :232-240)
            from ..utils.io import save_json
            save_json({
                "input": str(list_of_lists_or_source_folder),
                "output": output_folder_or_list_of_truncated_output_files,
                "save_probabilities": save_probabilities,
                "overwrite": overwrite,
                "tile_step_size": self.tile_step_size,
                "use_gaussian": self.use_gaussian,
                "use_mirroring": self.use_mirroring,
                "mirror_axes": list(self.allowed_mirroring_axes),
                "trainer_name": self.trainer_name,
                "num_folds": len(self.list_of_parameters),
                "prev_stage": folder_with_segs_from_prev_stage,
            }, join(output_folder_or_list_of_truncated_output_files,
                    "predict_from_raw_data_args.json"), sort_keys=False)
        lists, out_files, seg_prev = self._manage_input_and_output_lists(
            list_of_lists_or_source_folder,
            output_folder_or_list_of_truncated_output_files,
            folder_with_segs_from_prev_stage, overwrite, part_id, num_parts)
        if len(lists) == 0:
            return

        preproc = DefaultPreprocessor(verbose=self.verbose)
        work_q: "queue.Queue" = queue.Queue(maxsize=2)

        def producer():
            try:
                for img_files, out_file, prev in zip(lists, out_files, seg_prev):
                    # prev-stage seg rides the seg path of run_case so it shares
                    # the image's crop bbox, skips intensity normalization and
                    # gets label-safe resampling (ref data_iterators.py:31-39)
                    data, seg, props = preproc.run_case(
                        img_files, prev, self.plans_manager,
                        self.configuration_manager, self.dataset_json)
                    if prev is not None:
                        data = self._stack_prev_stage_onehot(data, seg)
                    work_q.put((data, props, out_file))
                work_q.put(None)
            except Exception as e:
                work_q.put(e)

        export_threads: List[threading.Thread] = []
        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = work_q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            data, props, out_file = item
            logits = self.predict_logits_from_preprocessed_data(data)
            th = threading.Thread(
                target=export_prediction_from_logits,
                args=(logits, props, self.configuration_manager,
                      self.plans_manager, self.dataset_json, out_file,
                      save_probabilities), daemon=True)
            th.start()
            export_threads.append(th)
            while sum(x.is_alive() for x in export_threads) > \
                    num_processes_segmentation_export:
                export_threads[0].join(timeout=0.5)
        for th in export_threads:
            th.join()

    def _stack_prev_stage_onehot(self, data: np.ndarray,
                                 seg_prev: np.ndarray) -> np.ndarray:
        """Cascade: append one-hot previous-stage channels. ``seg_prev`` is the
        (1, *S) seg returned by run_case/run_case_npy, i.e. already cropped to
        the image bbox and label-safe-resampled (ref data_iterators.py:37-39)."""
        from ..core.labels import convert_labelmap_to_one_hot
        onehot = convert_labelmap_to_one_hot(
            seg_prev[0], self.label_manager.foreground_labels, data.dtype)
        return np.vstack([data, onehot])

    # ------------------------------------------------------------------ arrays
    def predict_logits_from_preprocessed_data(self, data: np.ndarray) -> np.ndarray:
        """(C, *spatial) preprocessed -> fold-ensembled logits (K, *spatial)."""
        return self.engine.predict_logits(self.list_of_parameters, data)

    def predict_single_npy_array(self, input_image: np.ndarray,
                                 image_properties: dict,
                                 segmentation_previous_stage: Optional[np.ndarray] = None,
                                 output_file_truncated: Optional[str] = None,
                                 save_or_return_probabilities: bool = False):
        """(C, X, Y, Z) raw array + {'spacing': ...} -> segmentation in original
        geometry (ref :423-468)."""
        preproc = DefaultPreprocessor(verbose=self.verbose)
        seg_in = None
        if segmentation_previous_stage is not None:
            # signed dtype: crop_to_nonzero labels outside-mask voxels -1
            seg_in = np.asarray(segmentation_previous_stage).astype(
                np.int16, copy=False)
            if seg_in.ndim == input_image.ndim - 1:
                seg_in = seg_in[None]
        data, seg, props = preproc.run_case_npy(
            input_image, seg_in, dict(image_properties), self.plans_manager,
            self.configuration_manager, self.dataset_json)
        if seg_in is not None:
            data = self._stack_prev_stage_onehot(data, seg)
        logits = self.predict_logits_from_preprocessed_data(data)
        if output_file_truncated is not None:
            export_prediction_from_logits(
                logits, props, self.configuration_manager, self.plans_manager,
                self.dataset_json, output_file_truncated,
                save_or_return_probabilities)
            return None
        from .export import convert_predicted_logits_to_segmentation_with_correct_shape
        ret = convert_predicted_logits_to_segmentation_with_correct_shape(
            logits, self.plans_manager, self.configuration_manager,
            self.label_manager, props,
            return_probabilities=save_or_return_probabilities)
        return ret
