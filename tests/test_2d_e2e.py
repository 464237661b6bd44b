"""2D configuration end-to-end: plan -> preprocess 2d -> train -> predict a 3D
NIfTI slice-wise (ref inference/predict_from_raw_data.py:506-538 — a 2d config
must be able to segment 3D volumes)."""
import sys

import numpy as np
import pytest

from .helpers import make_synthetic_dataset, set_nnunet_paths

pytestmark = pytest.mark.slow


def test_2d_train_and_predict_3d_volume(tmp_path_factory, monkeypatch):
    import jax.numpy as jnp
    root = str(tmp_path_factory.mktemp("e2e2d"))
    raw, pre, res = set_nnunet_paths(None, root)
    ds = make_synthetic_dataset(raw, "Dataset989_2D", n_cases=5,
                                shape=(10, 24, 20))

    from fast_nnunet_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from fast_nnunet_tpu.planning.planner import ExperimentPlanner
    from fast_nnunet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from fast_nnunet_tpu.training.trainer import NNUNetTrainer
    from fast_nnunet_tpu.utils.io import (isfile, join, load_json,
                                          maybe_mkdir_p, save_json)

    DatasetFingerprintExtractor("Dataset989_2D", num_processes=1).run()
    plans = ExperimentPlanner("Dataset989_2D").plan_experiment()
    assert "2d" in plans["configurations"]
    plans["configurations"]["2d"]["batch_size"] = 2  # keep the test tiny
    save_json(plans, join(pre, "Dataset989_2D", "nnUNetPlans.json"),
              sort_keys=False)
    DefaultPreprocessor().run("Dataset989_2D", "2d", num_processes=1)
    dj = load_json(join(raw, "Dataset989_2D", "dataset.json"))

    t = NNUNetTrainer(plans, "2d", 0, dj)
    assert len(t.configuration_manager.patch_size) == 2
    t.num_epochs = 1
    t.num_iterations_per_epoch = 2
    t.num_val_iterations_per_epoch = 1
    t.compute_dtype = jnp.float32
    t.run_training()
    assert np.isfinite(t.logger.logging["train_losses"][0])

    # predict a 3D test volume through the CLI with -c 2d
    import shutil
    maybe_mkdir_p(join(ds, "imagesTs"))
    shutil.copy(join(ds, "imagesTr", "case_000_0000.nii.gz"),
                join(ds, "imagesTs", "ts_000_0000.nii.gz"))
    from fast_nnunet_tpu.run.predict import predict_entry_point
    out = join(root, "predicted_2d")
    monkeypatch.setattr(sys, "argv", [
        "nnUNetv2_predict", "-i", join(ds, "imagesTs"), "-o", out,
        "-d", "989", "-c", "2d", "-f", "0", "--disable_tta"])
    predict_entry_point()

    assert isfile(join(out, "ts_000.nii.gz"))
    from fast_nnunet_tpu.imageio.nifti import NiftiIO
    img, iprops = NiftiIO().read_images(
        [join(ds, "imagesTs", "ts_000_0000.nii.gz")])
    seg, props = NiftiIO().read_seg(join(out, "ts_000.nii.gz"))
    assert seg.shape == img.shape
    assert props["spacing"] == iprops["spacing"]
    assert set(np.unique(seg).tolist()) <= {0, 1, 2}
