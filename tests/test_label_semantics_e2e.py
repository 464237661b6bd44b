"""The reference's integration-test label-semantics matrix (SURVEY §4: plain
labels / ignore label / regions / regions+ignore, ref tests/integration_tests/
Dataset99*.py) as fast synthetic E2E runs: plan -> preprocess -> 1 short epoch
-> validation summary, for each label regime."""
import numpy as np
import pytest

from .helpers import make_synthetic_dataset, set_nnunet_paths

pytestmark = pytest.mark.slow


def _run_pipeline(raw, name, labels, regions_class_order=None, n_classes=2,
                  seg_mutator=None):
    import jax.numpy as jnp
    from fast_nnunet_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from fast_nnunet_tpu.planning.planner import ExperimentPlanner
    from fast_nnunet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from fast_nnunet_tpu.training.trainer import NNUNetTrainer
    from fast_nnunet_tpu.utils.io import load_json, join

    make_synthetic_dataset(raw, name, n_cases=5, shape=(18, 20, 16),
                           n_classes=n_classes, labels=labels,
                           regions_class_order=regions_class_order)
    if seg_mutator is not None:
        seg_mutator(join(raw, name, "labelsTr"))

    DatasetFingerprintExtractor(name, num_processes=1).run()
    plans = ExperimentPlanner(name).plan_experiment()
    DefaultPreprocessor().run(name, "3d_fullres", num_processes=1)
    dj = load_json(join(raw, name, "dataset.json"))
    tr = NNUNetTrainer(plans, "3d_fullres", 0, dj)
    tr.num_epochs = 1
    tr.num_iterations_per_epoch = 2
    tr.num_val_iterations_per_epoch = 1
    tr.compute_dtype = jnp.float32
    tr.run_training()
    metrics = tr.perform_actual_validation()
    return tr, metrics


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("labelmatrix"))
    return set_nnunet_paths(None, root)


def test_plain_labels(env):
    raw, _, _ = env
    tr, metrics = _run_pipeline(raw, "Dataset999_Plain",
                                {"background": 0, "a": 1, "b": 2})
    assert not tr.label_manager.has_regions
    assert not tr.label_manager.has_ignore_label
    assert "foreground_mean" in metrics


def test_ignore_label(env):
    raw, _, _ = env

    def add_ignore(labels_folder):
        from fast_nnunet_tpu.imageio.nifti import read_nifti, write_nifti
        from fast_nnunet_tpu.utils.io import subfiles
        for f in subfiles(labels_folder, suffix=".nii.gz", join_path=True):
            seg, hdr = read_nifti(f)
            seg = seg.astype(np.uint8)
            seg[:3] = 3  # ignore label region
            write_nifti(f, seg, header=hdr)

    tr, metrics = _run_pipeline(
        raw, "Dataset998_Ignore",
        {"background": 0, "a": 1, "b": 2, "ignore": 3},
        seg_mutator=add_ignore)
    assert tr.label_manager.has_ignore_label
    assert tr.label_manager.ignore_label == 3
    assert np.isfinite(tr.logger.logging["train_losses"][0])


def test_regions(env):
    raw, _, _ = env
    tr, metrics = _run_pipeline(
        raw, "Dataset997_Regions",
        {"background": 0, "whole": (1, 2), "core": 2},
        regions_class_order=(1, 2))
    assert tr.label_manager.has_regions
    assert tr.label_manager.num_segmentation_heads == 2
    assert np.isfinite(tr.logger.logging["train_losses"][0])
    # region metrics are keyed by tuple-encoded strings
    assert "(1, 2)" in metrics["mean"] or "2" in metrics["mean"]


def test_regions_with_ignore(env):
    raw, _, _ = env

    def add_ignore(labels_folder):
        from fast_nnunet_tpu.imageio.nifti import read_nifti, write_nifti
        from fast_nnunet_tpu.utils.io import subfiles
        for f in subfiles(labels_folder, suffix=".nii.gz", join_path=True):
            seg, hdr = read_nifti(f)
            seg = seg.astype(np.uint8)
            seg[-2:] = 3
            write_nifti(f, seg, header=hdr)

    tr, metrics = _run_pipeline(
        raw, "Dataset996_RegIgn",
        {"background": 0, "whole": (1, 2), "core": 2, "ignore": 3},
        regions_class_order=(1, 2), seg_mutator=add_ignore)
    assert tr.label_manager.has_regions and tr.label_manager.has_ignore_label
    assert np.isfinite(tr.logger.logging["train_losses"][0])
