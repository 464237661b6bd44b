"""Distillation training CLIs.

Parity: distillation/fast_nnunet_distillation_train.py (standard, :62-303) and
fast_nnunet_resenc_distillation_train.py (ResEnc, :68-339): teacher-fold
auto-detection by scanning fold_* dirs, default teacher folder naming,
continue-training with tolerant partial load, post-training validation.
"""
import argparse
import os
from typing import List, Optional, Sequence, Union

from ..training.distill import (NNUNetDistillationTrainer,
                                NNUNetDistillationTrainerDA5)
from ..utils.io import isdir, isfile, join, load_json
from ..utils.misc import maybe_convert_to_dataset_name


def _resolve_teacher_folder(dataset_name: str, configuration: str,
                            teacher_folder: Optional[str],
                            teacher_plans_identifier: str = "nnUNetPlans",
                            teacher_trainer: str = "NNUNetTrainer") -> str:
    if teacher_folder is not None:
        return teacher_folder
    # spelling-tolerant: reference-trained teachers live under
    # nnUNetTrainer__<plans>__<config> (ref file_path_utilities.py:11-27)
    from ..utils.misc import get_output_folder
    return get_output_folder(dataset_name, teacher_trainer,
                             teacher_plans_identifier, configuration)


def run_distillation_training(
        dataset_name_or_id, configuration: str = "3d_fullres", fold: int = 0,
        teacher_folder: Optional[str] = None,
        teacher_folds: Optional[Sequence[int]] = None,
        teacher_checkpoint: str = "checkpoint_final.fnnx",
        alpha: float = 0.3, temperature: float = 3.0,
        feature_reduction_factor: int = 2,
        block_reduction_strategy: str = "reduce",
        rotate_folds: bool = False, rotate_frequency: int = 50,
        num_epochs: Optional[int] = None,
        continue_training: bool = False,
        disable_mirroring: bool = False,
        use_da5: bool = False,
        teacher_plans_identifier: str = "nnUNetPlans",
        student_plans_identifier: str = "nnUNetPlans"):
    from ..paths import get_preprocessed_folder
    dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
    preprocessed = join(get_preprocessed_folder(), dataset_name)
    plans = load_json(join(preprocessed, student_plans_identifier + ".json"))
    dataset_json = load_json(join(preprocessed, "dataset.json"))

    teacher_folder = _resolve_teacher_folder(
        dataset_name, configuration, teacher_folder, teacher_plans_identifier)
    assert isdir(teacher_folder), f"teacher model folder missing: {teacher_folder}"

    if teacher_folds is None:
        teacher_folds = NNUNetDistillationTrainer.detect_available_teacher_folds(
            teacher_folder, (teacher_checkpoint, "checkpoint_best.fnnx"))
        print(f"Auto-detected teacher folds: {teacher_folds}")

    trainer_cls = NNUNetDistillationTrainerDA5 if use_da5 \
        else NNUNetDistillationTrainer
    trainer = trainer_cls(
        plans, configuration, fold, dataset_json,
        teacher_model_folder=teacher_folder, teacher_fold=teacher_folds,
        teacher_checkpoint_name=teacher_checkpoint,
        alpha=alpha, temperature=temperature,
        feature_reduction_factor=feature_reduction_factor,
        block_reduction_strategy=block_reduction_strategy,
        rotate_training_folds=rotate_folds,
        rotate_folds_frequency=rotate_frequency,
        student_plans_identifier=student_plans_identifier)
    if num_epochs is not None:
        trainer.num_epochs = num_epochs
    if disable_mirroring:
        trainer._make_training_transform_orig = trainer._make_training_transform

        def no_mirror_transform(patch_size, rotation, mirror_axes, dummy_2d, lm,
                                ds_scales):
            trainer.inference_allowed_mirroring_axes = ()
            return trainer._make_training_transform_orig(
                patch_size, rotation, (), dummy_2d, lm, ds_scales)

        trainer._make_training_transform = no_mirror_transform

    if continue_training:
        for name in ("checkpoint_final.fnnx", "checkpoint_latest.fnnx",
                     "checkpoint_best.fnnx"):
            p = join(trainer.output_folder, name)
            if isfile(p):
                trainer.load_student_checkpoint(p)
                break

    trainer.run_training()
    trainer.perform_actual_validation(False)
    return trainer


def _common_args(parser: argparse.ArgumentParser):
    parser.add_argument("-d", required=True, help="dataset name or id")
    parser.add_argument("-c", default="3d_fullres", help="configuration")
    parser.add_argument("-f", type=int, default=0, help="training fold")
    parser.add_argument("-t", default=None, help="teacher model folder")
    parser.add_argument("-tf", nargs="+", type=int, default=None,
                        help="teacher folds (default: auto-detect)")
    parser.add_argument("-tcp", default="checkpoint_final.fnnx",
                        help="teacher checkpoint name")
    parser.add_argument("-a", type=float, default=0.3, help="distill alpha")
    parser.add_argument("-temp", type=float, default=3.0, help="temperature")
    parser.add_argument("-r", type=int, default=2, help="feature reduction factor")
    parser.add_argument("-e", type=int, default=None, help="epochs override")
    parser.add_argument("-c_continue", action="store_true")
    parser.add_argument("--disable_mirroring", action="store_true")
    parser.add_argument("-rotate_folds", action="store_true")
    parser.add_argument("-rotate_freq", type=int, default=50)
    parser.add_argument("--use_da5", action="store_true")


def distillation_train_entry():
    parser = argparse.ArgumentParser(
        description="3D probability-map knowledge distillation (standard UNet)")
    _common_args(parser)
    args = parser.parse_args()
    run_distillation_training(
        args.d, args.c, args.f, args.t, args.tf, args.tcp, args.a, args.temp,
        args.r, rotate_folds=args.rotate_folds, rotate_frequency=args.rotate_freq,
        num_epochs=args.e, continue_training=args.c_continue,
        disable_mirroring=args.disable_mirroring, use_da5=args.use_da5)


def resenc_distillation_train_entry():
    parser = argparse.ArgumentParser(
        description="knowledge distillation for ResEnc teachers")
    _common_args(parser)
    parser.add_argument("-tpl", default="nnUNetResEncUNetLPlans",
                        help="teacher plans identifier")
    parser.add_argument("-spl", default="nnUNetPlans",
                        help="student plans identifier ('ResEnc' substring keeps "
                             "a residual-encoder student)")
    parser.add_argument("-bs", default="reduce",
                        choices=("reduce", "keep", "increase", "adaptive"),
                        help="block reduction strategy")
    args = parser.parse_args()
    run_distillation_training(
        args.d, args.c, args.f, args.t, args.tf, args.tcp, args.a, args.temp,
        args.r, block_reduction_strategy=args.bs,
        rotate_folds=args.rotate_folds, rotate_frequency=args.rotate_freq,
        num_epochs=args.e, continue_training=args.c_continue,
        disable_mirroring=args.disable_mirroring, use_da5=args.use_da5,
        teacher_plans_identifier=args.tpl, student_plans_identifier=args.spl)
