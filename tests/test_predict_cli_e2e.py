"""Drive the prediction CLI end-to-end: train briefly, then nnUNetv2_predict
equivalents over imagesTs, including continue_prediction and fold ensembling."""
import os
import sys

import numpy as np
import pytest

from .helpers import make_synthetic_dataset, set_nnunet_paths

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    import jax.numpy as jnp
    root = str(tmp_path_factory.mktemp("predcli"))
    raw, pre, res = set_nnunet_paths(None, root)
    ds = make_synthetic_dataset(raw, "Dataset990_PC", n_cases=5,
                                shape=(18, 20, 16))
    # imagesTs: reuse two training images
    from fast_nnunet_tpu.utils.io import maybe_mkdir_p, join
    import shutil
    maybe_mkdir_p(join(ds, "imagesTs"))
    for i in range(2):
        shutil.copy(join(ds, "imagesTr", f"case_{i:03d}_0000.nii.gz"),
                    join(ds, "imagesTs", f"ts_{i:03d}_0000.nii.gz"))

    from fast_nnunet_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from fast_nnunet_tpu.planning.planner import ExperimentPlanner
    from fast_nnunet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from fast_nnunet_tpu.training.trainer import NNUNetTrainer
    from fast_nnunet_tpu.utils.io import load_json

    DatasetFingerprintExtractor("Dataset990_PC", num_processes=1).run()
    plans = ExperimentPlanner("Dataset990_PC").plan_experiment()
    DefaultPreprocessor().run("Dataset990_PC", "3d_fullres", num_processes=1)
    dj = load_json(join(raw, "Dataset990_PC", "dataset.json"))
    for fold in (0, 1):
        t = NNUNetTrainer(plans, "3d_fullres", fold, dj)
        t.num_epochs = 1
        t.num_iterations_per_epoch = 2
        t.num_val_iterations_per_epoch = 1
        t.compute_dtype = jnp.float32
        t.run_training()
    return {"root": root, "raw": raw, "res": res, "ds": ds,
            "model_folder": t.output_folder_base}


def test_predict_cli(trained, monkeypatch):
    from fast_nnunet_tpu.run.predict import predict_entry_point
    from fast_nnunet_tpu.utils.io import join, isfile, load_json

    out = join(trained["root"], "predicted")
    argv = ["nnUNetv2_predict", "-i", join(trained["ds"], "imagesTs"),
            "-o", out, "-d", "990", "-c", "3d_fullres", "-f", "0", "1",
            "--disable_tta"]
    monkeypatch.setattr(sys, "argv", argv)
    predict_entry_point()

    assert isfile(join(out, "ts_000.nii.gz"))
    assert isfile(join(out, "ts_001.nii.gz"))
    assert isfile(join(out, "predict_from_raw_data_args.json"))
    args_dump = load_json(join(out, "predict_from_raw_data_args.json"))
    assert args_dump["num_folds"] == 2

    # output matches the input's geometry exactly
    from fast_nnunet_tpu.imageio.nifti import NiftiIO
    img, iprops = NiftiIO().read_images(
        [join(trained["ds"], "imagesTs", "ts_000_0000.nii.gz")])
    seg, props = NiftiIO().read_seg(join(out, "ts_000.nii.gz"))
    assert seg.shape == img.shape
    assert props["spacing"] == iprops["spacing"]
    assert set(np.unique(seg).tolist()) <= {0, 1, 2}

    # continue_prediction: skips existing outputs without error
    argv2 = argv + ["--continue_prediction"]
    monkeypatch.setattr(sys, "argv", argv2)
    predict_entry_point()


def test_predict_single_npy(trained):
    from fast_nnunet_tpu.inference.predictor import NNUNetPredictor
    from fast_nnunet_tpu.imageio.nifti import NiftiIO
    from fast_nnunet_tpu.utils.io import join
    import jax.numpy as jnp

    predictor = NNUNetPredictor(use_mirroring=False)
    predictor.initialize_from_trained_model_folder(trained["model_folder"],
                                                   use_folds=[0])
    predictor.engine.compute_dtype = jnp.float32
    img, props = NiftiIO().read_images(
        [join(trained["ds"], "imagesTs", "ts_000_0000.nii.gz")])
    seg = predictor.predict_single_npy_array(img, props)
    assert seg.shape == img.shape[1:]
