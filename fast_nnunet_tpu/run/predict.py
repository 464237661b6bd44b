"""Prediction CLI (nnUNetv2_predict parity, ref distillation/nnunetv2/inference/
predict_from_raw_data.py:776-1059)."""
import argparse
import os

from ..inference.predictor import NNUNetPredictor
from ..utils.io import join
from ..utils.misc import get_output_folder, maybe_convert_to_dataset_name


def predict_entry_point():
    parser = argparse.ArgumentParser(description="fast-nnunet-tpu inference")
    parser.add_argument("-i", required=True, help="input folder")
    parser.add_argument("-o", required=True, help="output folder")
    parser.add_argument("-d", required=True, help="dataset name or id")
    parser.add_argument("-p", default="nnUNetPlans")
    parser.add_argument("-tr", default="NNUNetTrainer")
    parser.add_argument("-c", required=True, help="configuration")
    parser.add_argument("-f", nargs="+", default=None, help="folds (default: auto)")
    parser.add_argument("-step_size", type=float, default=0.5)
    parser.add_argument("--disable_tta", action="store_true")
    parser.add_argument("--save_probabilities", action="store_true")
    parser.add_argument("--continue_prediction", action="store_true")
    parser.add_argument("-chk", default="checkpoint_final.fnnx")
    parser.add_argument("-npp", type=int, default=3)
    parser.add_argument("-nps", type=int, default=3)
    parser.add_argument("-prev_stage_predictions", default=None)
    parser.add_argument("-num_parts", type=int, default=1)
    parser.add_argument("-part_id", type=int, default=0)
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("-device", default="tpu",
                        help="accepted for CLI parity (tpu|cpu); set "
                             "JAX_PLATFORMS to actually switch backends")
    parser.add_argument("--disable_progress_bar", action="store_true",
                        help="accepted for CLI parity (we log per case)")
    args = parser.parse_args()

    model_folder = get_output_folder(args.d, args.tr, args.p, args.c)
    predictor = NNUNetPredictor(tile_step_size=args.step_size,
                                use_gaussian=True,
                                use_mirroring=not args.disable_tta,
                                verbose=args.verbose)
    predictor.initialize_from_trained_model_folder(
        model_folder,
        use_folds=args.f,
        checkpoint_name=args.chk)
    predictor.predict_from_files(
        args.i, args.o,
        save_probabilities=args.save_probabilities,
        overwrite=not args.continue_prediction,
        num_processes_preprocessing=args.npp,
        num_processes_segmentation_export=args.nps,
        folder_with_segs_from_prev_stage=args.prev_stage_predictions,
        part_id=args.part_id, num_parts=args.num_parts)


def predict_entry_point_modelfolder():
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", required=True)
    parser.add_argument("-o", required=True)
    parser.add_argument("-m", required=True, help="model folder")
    parser.add_argument("-f", nargs="+", default=None)
    parser.add_argument("-step_size", type=float, default=0.5)
    parser.add_argument("--disable_tta", action="store_true")
    parser.add_argument("--save_probabilities", action="store_true")
    parser.add_argument("--continue_prediction", action="store_true")
    parser.add_argument("-chk", default="checkpoint_final.fnnx")
    args = parser.parse_args()

    predictor = NNUNetPredictor(tile_step_size=args.step_size,
                                use_mirroring=not args.disable_tta)
    predictor.initialize_from_trained_model_folder(args.m, args.f, args.chk)
    predictor.predict_from_files(args.i, args.o,
                                 save_probabilities=args.save_probabilities,
                                 overwrite=not args.continue_prediction)
