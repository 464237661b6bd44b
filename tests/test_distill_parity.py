"""Distillation Dice parity: the reference claims an r=2 distilled student
loses < 0.5 Dice points vs its teacher (ref docs/Inference.md:168-169,
"<0.5% Dice loss" at width reduction r=2). This test DEMONSTRATES that
contract end-to-end on structured synthetic data: train a teacher to
convergence, distill an r=2 student from its probability maps, predict both
on held-out cases through the real predictor, and pin

    student foreground Dice >= teacher foreground Dice - 0.005

Recipe notes (experiments/probe_distill_recipe.py, round-4 sweeps):
- Non-overlapping class blobs (separate_blobs=True): overlapping blobs ADD
  in the image while the later class overwrites the label, and that label
  ambiguity caps both nets and punishes the smaller student (+0.04..0.09
  gap); with clean labels the distilled student GENERALIZES BETTER than its
  teacher (probe: student 0.938 vs teacher 0.881 held-out).
- nnUNet_n_proc_DA=1 makes training bit-deterministic: batch order no
  longer depends on prefetch-thread scheduling (two identical probe runs
  reproduced dice to 4 decimals), so this test is stable, not a coin flip.
- 30 training cases: the round-4 diagnostic showed the student-teacher gap
  lives in GENERALIZATION (train gap 0.017 vs held-out gap 0.086 at 10
  cases); more layouts close it.
Hyperparameters are the REFERENCE DEFAULTS (alpha=0.3, T=3.0 — ref
README.md:97); round-5 measured student 0.9024 vs teacher 0.8975 held-out
at these settings (student wins). Marked slow (~12 min quiet / ~18 min on
a contended 1-core CI box at 30 teacher + 45 student epochs).
"""
import os

import numpy as np
import pytest

from .helpers import make_synthetic_dataset, set_nnunet_paths

pytestmark = pytest.mark.slow

DS = "Dataset989_KDP"
HELD = "Dataset988_KDPTEST"
N_TRAIN = 30
N_TEST = 6
SHAPE = (28, 32, 28)
RADIUS = (5, 7)
# isotropic: anisotropic test spacing makes the planner resample z and the
# interpolation blur on blob boundaries caps held-out Dice (round-4 probes)
SPACING = (1.0, 1.0, 1.0)
EPOCHS_TEACHER = 30
EPOCHS_STUDENT = 45
ITERS = 25
# reference-default distillation hyperparameters (ref README.md:97):
# loss = alpha * KD(T=3.0) + (1-alpha) * seg, alpha=0.3
ALPHA = 0.3


def _fg_dice(pred: np.ndarray, ref: np.ndarray, n_classes: int) -> float:
    """Mean foreground Dice over classes present in the reference."""
    dices = []
    for c in range(1, n_classes + 1):
        p, r = pred == c, ref == c
        if r.sum() == 0:
            continue
        dices.append(2.0 * (p & r).sum() / (p.sum() + r.sum()))
    return float(np.mean(dices))


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    import jax.numpy as jnp
    # single DA prefetch worker -> deterministic batch order (see module
    # docstring); restored after the module so other suites keep their
    # cpu-count-derived default
    prev = os.environ.get("nnUNet_n_proc_DA")
    os.environ["nnUNet_n_proc_DA"] = "1"
    root = str(tmp_path_factory.mktemp("kdparity"))
    raw, pre, res = set_nnunet_paths(None, root)
    make_synthetic_dataset(raw, DS, n_cases=N_TRAIN, shape=SHAPE,
                           n_classes=2, seed=0, spacing=SPACING,
                           blob_radius=RADIUS, margin=RADIUS[1] + 1,
                           separate_blobs=True)
    held = make_synthetic_dataset(raw, HELD, n_cases=N_TEST, shape=SHAPE,
                                  n_classes=2, seed=123, spacing=SPACING,
                                  blob_radius=RADIUS, margin=RADIUS[1] + 1,
                                  separate_blobs=True)

    from fast_nnunet_tpu.planning.fingerprint import \
        DatasetFingerprintExtractor
    from fast_nnunet_tpu.planning.planner import ExperimentPlanner
    from fast_nnunet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from fast_nnunet_tpu.training.trainer import NNUNetTrainer
    from fast_nnunet_tpu.utils.io import load_json, join

    DatasetFingerprintExtractor(DS, num_processes=1).run()
    plans = ExperimentPlanner(DS).plan_experiment()
    # pin a small fixed architecture: the planner's default net for this
    # volume is several times slower to train on the 1-core CI box and no
    # more accurate on the blob task (round-4 recipe experiments)
    cfg = plans["configurations"]["3d_fullres"]
    cfg["patch_size"] = [16, 16, 16]
    cfg["batch_size"] = 2
    cfg["architecture"]["network_class_name"] = \
        "dynamic_network_architectures.architectures.unet.PlainConvUNet"
    cfg["architecture"]["arch_kwargs"].update({
        "n_stages": 3, "features_per_stage": [16, 32, 64],
        "kernel_sizes": [[3, 3, 3]] * 3,
        "strides": [[1, 1, 1]] + [[2, 2, 2]] * 2,
        "n_conv_per_stage": [2, 2, 2], "n_conv_per_stage_decoder": [2, 2]})
    DefaultPreprocessor().run(DS, "3d_fullres", num_processes=1)
    dj = load_json(join(raw, DS, "dataset.json"))

    teacher = NNUNetTrainer(plans, "3d_fullres", 0, dj)
    teacher.num_epochs = EPOCHS_TEACHER
    teacher.num_iterations_per_epoch = ITERS
    teacher.num_val_iterations_per_epoch = 1
    teacher.compute_dtype = jnp.float32
    teacher.run_training()

    yield {"root": root, "raw": raw, "plans": plans, "dj": dj, "held": held,
           "teacher_folder": teacher.output_folder_base}
    if prev is None:
        os.environ.pop("nnUNet_n_proc_DA", None)
    else:
        os.environ["nnUNet_n_proc_DA"] = prev


def _predict_dice(model_folder: str, held_ds: str) -> float:
    import jax.numpy as jnp
    from fast_nnunet_tpu.imageio.nifti import NiftiIO
    from fast_nnunet_tpu.inference.predictor import NNUNetPredictor
    from fast_nnunet_tpu.utils.io import join

    p = NNUNetPredictor(use_mirroring=False)
    p.initialize_from_trained_model_folder(model_folder, use_folds=[0])
    p.engine.compute_dtype = jnp.float32
    rw = NiftiIO()
    dices = []
    for i in range(N_TEST):
        case = f"case_{i:03d}"
        data, props = rw.read_images(
            [join(held_ds, "imagesTr", f"{case}_0000.nii.gz")])
        ref, _ = rw.read_seg(join(held_ds, "labelsTr", f"{case}.nii.gz"))
        seg = p.predict_single_npy_array(data, props)
        dices.append(_fg_dice(np.asarray(seg), ref[0], 2))
    return float(np.mean(dices))


def test_student_dice_tracks_teacher(env):
    """The reference's distillation contract, reproduced: r=2 student within
    0.5 Dice points of its teacher on held-out data (probe measured the
    student BEATING the teacher by ~6 points on this recipe)."""
    import jax.numpy as jnp
    from fast_nnunet_tpu.training.distill import NNUNetDistillationTrainer

    student = NNUNetDistillationTrainer(
        env["plans"], "3d_fullres", 0, env["dj"],
        teacher_model_folder=env["teacher_folder"], teacher_fold=[0],
        alpha=ALPHA, temperature=3.0, feature_reduction_factor=2)
    student.num_epochs = EPOCHS_STUDENT
    student.num_iterations_per_epoch = ITERS
    student.num_val_iterations_per_epoch = 1
    student.compute_dtype = jnp.float32
    student.run_training()

    teacher_dice = _predict_dice(env["teacher_folder"], env["held"])
    student_dice = _predict_dice(student.output_folder_base, env["held"])
    print(f"\nheld-out fg dice: teacher {teacher_dice:.4f} "
          f"student {student_dice:.4f}")

    # the teacher must have actually learned the task, else "parity" is
    # vacuous (two random nets agree at Dice ~0)
    assert teacher_dice > 0.7, f"teacher failed to converge: {teacher_dice}"
    assert student_dice >= teacher_dice - 0.005, \
        f"student {student_dice:.4f} vs teacher {teacher_dice:.4f} — " \
        f"distillation lost more than the reference's 0.5-pt contract"
