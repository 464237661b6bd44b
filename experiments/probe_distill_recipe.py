"""Recipe probe for tests/test_distill_parity.py: how fast do the tiny
teacher and the r=2 distilled student converge on the synthetic-blob task
with/without augmentation, and what does each epoch cost on this box?

Run: JAX_PLATFORMS=cpu python experiments/probe_distill_recipe.py [--noda]
"""
import argparse
import os
import sys
import tempfile
import time
from types import MethodType

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from helpers import make_synthetic_dataset, set_nnunet_paths  # noqa: E402

DS = "Dataset987_KDR"
SHAPE = (20, 24, 20)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--noda", action="store_true")
    ap.add_argument("--teacher_epochs", type=int, default=20)
    ap.add_argument("--student_epochs", type=int, default=40)
    ap.add_argument("--alpha", type=float, default=0.3)
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--radius", type=int, nargs=2, default=[2, 4])
    ap.add_argument("--n_train", type=int, default=6)
    ap.add_argument("--n_test", type=int, default=2)
    ap.add_argument("--temperature", type=float, default=3.0)
    ap.add_argument("--features", type=int, default=8,
                    help="teacher stage-0 width f -> [f, 2f, 4f]; the r=2 "
                         "student then gets [max(f//2,8), f, 2f]")
    ap.add_argument("--shape", type=int, nargs=3, default=list(SHAPE))
    ap.add_argument("--separate", action="store_true",
                    help="non-overlapping class blobs (clean labels)")
    args = ap.parse_args()

    import jax.numpy as jnp
    root = tempfile.mkdtemp(prefix="kdr")
    raw, pre, res = set_nnunet_paths(None, root)
    rad = tuple(args.radius)
    shape = tuple(args.shape)
    make_synthetic_dataset(raw, DS, n_cases=args.n_train, shape=shape, n_classes=2,
                           seed=0, spacing=(1.0, 1.0, 1.0),
                           blob_radius=rad, margin=rad[1] + 1,
                           separate_blobs=args.separate)
    held = make_synthetic_dataset(raw, "Dataset986_KDRT", n_cases=args.n_test,
                                  shape=shape, n_classes=2, seed=123,
                                  spacing=(1.0, 1.0, 1.0),
                                  blob_radius=rad, margin=rad[1] + 1,
                                  separate_blobs=args.separate)

    from fast_nnunet_tpu.planning.fingerprint import \
        DatasetFingerprintExtractor
    from fast_nnunet_tpu.planning.planner import ExperimentPlanner
    from fast_nnunet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from fast_nnunet_tpu.training.trainer import NNUNetTrainer
    from fast_nnunet_tpu.training.trainer_variants import NNUNetTrainerNoDA
    from fast_nnunet_tpu.training.distill import NNUNetDistillationTrainer
    from fast_nnunet_tpu.utils.io import load_json, join

    DatasetFingerprintExtractor(DS, num_processes=1).run()
    plans = ExperimentPlanner(DS).plan_experiment()
    cfg = plans["configurations"]["3d_fullres"]
    cfg["patch_size"] = [16, 16, 16]
    cfg["batch_size"] = 2
    cfg["architecture"]["network_class_name"] = \
        "dynamic_network_architectures.architectures.unet.PlainConvUNet"
    cfg["architecture"]["arch_kwargs"].update({
        "n_stages": 3,
        "features_per_stage": [args.features, 2 * args.features,
                               4 * args.features],
        "kernel_sizes": [[3, 3, 3]] * 3,
        "strides": [[1, 1, 1]] + [[2, 2, 2]] * 2,
        "n_conv_per_stage": [2, 2, 2], "n_conv_per_stage_decoder": [2, 2]})
    DefaultPreprocessor().run(DS, "3d_fullres", num_processes=1)
    dj = load_json(join(raw, DS, "dataset.json"))

    def noda(tr):
        if args.noda:
            tr._make_training_transform = MethodType(
                NNUNetTrainerNoDA._make_training_transform, tr)
        return tr

    t0 = time.time()
    teacher = noda(NNUNetTrainer(plans, "3d_fullres", 0, dj))
    teacher.num_epochs = args.teacher_epochs
    teacher.num_iterations_per_epoch = args.iters
    teacher.num_val_iterations_per_epoch = 1
    teacher.compute_dtype = jnp.float32
    teacher.run_training()
    t_teacher = time.time() - t0

    t0 = time.time()
    student = noda(NNUNetDistillationTrainer(
        plans, "3d_fullres", 0, dj,
        teacher_model_folder=teacher.output_folder_base, teacher_fold=[0],
        alpha=args.alpha, temperature=args.temperature,
        feature_reduction_factor=2))
    student.num_epochs = args.student_epochs
    student.num_iterations_per_epoch = args.iters
    student.num_val_iterations_per_epoch = 1
    student.compute_dtype = jnp.float32
    student.run_training()
    t_student = time.time() - t0

    from fast_nnunet_tpu.imageio.nifti import NiftiIO
    from fast_nnunet_tpu.inference.predictor import NNUNetPredictor

    def fg_dice(pred, ref):
        ds = []
        for c in (1, 2):
            p, r = pred == c, ref == c
            if r.sum():
                ds.append(2.0 * (p & r).sum() / (p.sum() + r.sum()))
        return float(np.mean(ds))

    def pdice(folder, ds_dir, n):
        p = NNUNetPredictor(use_mirroring=False)
        p.initialize_from_trained_model_folder(folder, use_folds=[0])
        p.engine.compute_dtype = jnp.float32
        rw = NiftiIO()
        out = []
        for i in range(n):
            case = f"case_{i:03d}"
            data, props = rw.read_images(
                [join(ds_dir, "imagesTr", f"{case}_0000.nii.gz")])
            ref, _ = rw.read_seg(join(ds_dir, "labelsTr", f"{case}.nii.gz"))
            seg = p.predict_single_npy_array(data, props)
            out.append(fg_dice(np.asarray(seg), ref[0]))
        return float(np.mean(out))

    train_dir = join(raw, DS)
    t_train = pdice(teacher.output_folder_base, train_dir, args.n_train)
    td = pdice(teacher.output_folder_base, held, args.n_test)
    s_train = pdice(student.output_folder_base, train_dir, args.n_train)
    sd = pdice(student.output_folder_base, held, args.n_test)
    print(f"TRAIN-set dice: teacher {t_train:.4f}  student {s_train:.4f}")
    print(f"\nRESULT noda={args.noda} alpha={args.alpha} T={args.temperature} "
          f"radius={rad} f={args.features} "
          f"t_epochs={args.teacher_epochs} s_epochs={args.student_epochs}")
    print(f"teacher dice={td:.4f} wall={t_teacher:.0f}s  "
          f"student dice={sd:.4f} wall={t_student:.0f}s  "
          f"gap={td - sd:+.4f}")


if __name__ == "__main__":
    main()
