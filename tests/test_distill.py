"""Distillation: teacher ensemble -> Lite student with KL + seg loss."""
import numpy as np
import pytest

from .helpers import make_synthetic_dataset, set_nnunet_paths


def test_distillation_loss_properties():
    import jax
    import jax.numpy as jnp
    from fast_nnunet_tpu.training.distill import distillation_loss

    rng = np.random.RandomState(0)
    t = jnp.asarray(rng.randn(2, 4, 4, 4, 3).astype(np.float32))
    # identical logits -> zero KL
    assert float(distillation_loss(t, t, 3.0)) == pytest.approx(0.0, abs=1e-6)
    s = jnp.asarray(rng.randn(2, 4, 4, 4, 3).astype(np.float32))
    kl = float(distillation_loss(s, t, 3.0))
    assert kl > 0
    # temperature scaling: higher T -> softer targets -> smaller raw KL but x T^2
    kl_t1 = float(distillation_loss(s, t, 1.0))
    assert np.isfinite(kl_t1)


@pytest.fixture(scope="module")
def distill_env(tmp_path_factory):
    import jax.numpy as jnp
    root = str(tmp_path_factory.mktemp("distill"))
    raw, pre, res = set_nnunet_paths(None, root)
    make_synthetic_dataset(raw, "Dataset994_KD", n_cases=6, shape=(18, 20, 16))

    from fast_nnunet_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from fast_nnunet_tpu.planning.planner import ExperimentPlanner
    from fast_nnunet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from fast_nnunet_tpu.training.trainer import NNUNetTrainer
    from fast_nnunet_tpu.utils.io import load_json, join

    DatasetFingerprintExtractor("Dataset994_KD", num_processes=1).run()
    plans = ExperimentPlanner("Dataset994_KD").plan_experiment()
    DefaultPreprocessor().run("Dataset994_KD", "3d_fullres", num_processes=1)
    dj = load_json(join(raw, "Dataset994_KD", "dataset.json"))

    # train 2 teacher folds very briefly
    for fold in (0, 1):
        t = NNUNetTrainer(plans, "3d_fullres", fold, dj)
        t.num_epochs = 1
        t.num_iterations_per_epoch = 2
        t.num_val_iterations_per_epoch = 1
        t.compute_dtype = jnp.float32
        t.run_training()
    return {"root": root, "raw": raw, "res": res, "plans": plans, "dj": dj,
            "teacher_folder": t.output_folder_base}


@pytest.mark.slow
def test_distillation_training(distill_env):
    import jax
    import jax.numpy as jnp
    from fast_nnunet_tpu.training.distill import NNUNetDistillationTrainer
    from fast_nnunet_tpu.utils.io import isfile, join

    folds = NNUNetDistillationTrainer.detect_available_teacher_folds(
        distill_env["teacher_folder"])
    assert folds == [0, 1]

    tr = NNUNetDistillationTrainer(
        distill_env["plans"], "3d_fullres", 0, distill_env["dj"],
        teacher_model_folder=distill_env["teacher_folder"], teacher_fold=folds,
        alpha=0.3, temperature=3.0, feature_reduction_factor=2)
    tr.num_epochs = 1
    tr.num_iterations_per_epoch = 2
    tr.num_val_iterations_per_epoch = 1
    tr.compute_dtype = jnp.float32
    tr.run_training()

    assert len(tr.logger.logging["train_seg_losses"]) == 1
    assert len(tr.logger.logging["train_distill_losses"]) == 1
    assert np.isfinite(tr.logger.logging["train_distill_losses"][0])
    assert isfile(join(tr.output_folder, "checkpoint_final.fnnx"))

    # student has fewer params than teacher
    n_student = sum(p.size for p in jax.tree_util.tree_leaves(tr.train_state.params))
    n_teacher = sum(p.size for p in
                    jax.tree_util.tree_leaves(tr.teacher_params_stacked)) // len(folds)
    assert n_student < 0.35 * n_teacher

    # partial (tolerant) checkpoint reload
    tr2 = NNUNetDistillationTrainer(
        distill_env["plans"], "3d_fullres", 0, distill_env["dj"],
        teacher_model_folder=distill_env["teacher_folder"], teacher_fold=folds)
    tr2.num_epochs = 1
    tr2.compute_dtype = jnp.float32
    n_loaded, n_total = tr2.load_student_checkpoint(
        join(tr.output_folder, "checkpoint_final.fnnx"))
    assert n_loaded == n_total  # same architecture: everything matches


def test_da5_augmenter_runs():
    from fast_nnunet_tpu.training.augment_da5 import DA5TrainingAugmenter
    rng = np.random.RandomState(0)
    aug = DA5TrainingAugmenter((16, 16, 16), (-0.5, 0.5), (0, 1, 2),
                               ds_scales=[(1, 1, 1), (0.5, 0.5, 0.5)])
    found_shapes = set()
    for i in range(5):
        data = rng.rand(1, 20, 20, 20).astype(np.float32)
        seg = (rng.rand(1, 20, 20, 20) > 0.7).astype(np.int8)
        out, targets = aug(data, seg, np.random.RandomState(i))
        assert out.shape == (1, 16, 16, 16)
        assert targets[0].shape == (1, 16, 16, 16)
        assert targets[1].shape == (1, 8, 8, 8)
        assert np.isfinite(out).all()
