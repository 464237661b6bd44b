"""Cascade: lowres stage -> predicted_next_stage deposits -> cascade-fullres
stage consumes them as one-hot input channels (the reference exercises this via
add_lowres_and_cascade.py in its integration tests)."""
import numpy as np
import pytest

from .helpers import make_synthetic_dataset, set_nnunet_paths


@pytest.mark.slow
def test_cascade_training(tmp_path_factory):
    import jax.numpy as jnp
    root = str(tmp_path_factory.mktemp("cascade"))
    raw, pre, res = set_nnunet_paths(None, root)
    make_synthetic_dataset(raw, "Dataset991_CSC", n_cases=5, shape=(18, 20, 16))

    from fast_nnunet_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from fast_nnunet_tpu.planning.planner import ExperimentPlanner
    from fast_nnunet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from fast_nnunet_tpu.training.trainer import NNUNetTrainer
    from fast_nnunet_tpu.utils.io import load_json, save_json, join, subfiles

    DatasetFingerprintExtractor("Dataset991_CSC", num_processes=1).run()
    plans = ExperimentPlanner("Dataset991_CSC").plan_experiment()
    # tiny datasets don't trigger lowres creation: inject the cascade configs
    # like the reference's add_lowres_and_cascade.py does
    plans["configurations"]["3d_lowres"] = {
        "inherits_from": "3d_fullres",
        "next_stage": "3d_cascade_fullres",
    }
    plans["configurations"]["3d_cascade_fullres"] = {
        "inherits_from": "3d_fullres",
        "previous_stage": "3d_lowres",
    }
    save_json(plans, join(pre, "Dataset991_CSC", "nnUNetPlans.json"),
              sort_keys=False)
    DefaultPreprocessor().run("Dataset991_CSC", "3d_fullres", num_processes=1)
    dj = load_json(join(raw, "Dataset991_CSC", "dataset.json"))

    def small(tr):
        tr.num_epochs = 1
        tr.num_iterations_per_epoch = 2
        tr.num_val_iterations_per_epoch = 1
        tr.compute_dtype = jnp.float32
        return tr

    # stage 1: lowres on fold 'all' -> every case gets a next-stage deposit
    t1 = small(NNUNetTrainer(plans, "3d_lowres", "all", dj))
    t1.run_training()
    t1.perform_actual_validation()
    deposits = subfiles(join(t1.output_folder_base, "predicted_next_stage",
                             "3d_cascade_fullres"), suffix=".npz",
                        join_path=False)
    assert len(deposits) == 5

    # stage 2: cascade-fullres consumes the deposits as extra channels
    t2 = small(NNUNetTrainer(plans, "3d_cascade_fullres", 0, dj))
    assert t2.is_cascaded
    t2.run_training()
    assert t2.num_input_channels == 1 + len(t2.label_manager.foreground_labels)
    assert np.isfinite(t2.logger.logging["train_losses"][0])
    metrics = t2.perform_actual_validation()
    assert "foreground_mean" in metrics

    # ---- cascade inference: predict_from_files with prev-stage predictions
    # (ref predict_from_raw_data.py --prev_stage_predictions path)
    import shutil
    from fast_nnunet_tpu.inference.predictor import NNUNetPredictor
    from fast_nnunet_tpu.imageio.nifti import NiftiIO
    from fast_nnunet_tpu.utils.io import isfile, maybe_mkdir_p

    ds = join(raw, "Dataset991_CSC")
    maybe_mkdir_p(join(ds, "imagesTs"))
    for i in range(2):
        shutil.copy(join(ds, "imagesTr", f"case_{i:03d}_0000.nii.gz"),
                    join(ds, "imagesTs", f"ts_{i:03d}_0000.nii.gz"))

    lowres_out = join(root, "pred_lowres")
    p1 = NNUNetPredictor(use_mirroring=False, verbose=False)
    p1.initialize_from_trained_model_folder(t1.output_folder_base,
                                            use_folds=("all",))
    p1.predict_from_files(join(ds, "imagesTs"), lowres_out)
    assert isfile(join(lowres_out, "ts_000.nii.gz"))

    cascade_out = join(root, "pred_cascade")
    p2 = NNUNetPredictor(use_mirroring=False, verbose=False)
    p2.initialize_from_trained_model_folder(t2.output_folder_base, use_folds=(0,))
    p2.predict_from_files(join(ds, "imagesTs"), cascade_out,
                          folder_with_segs_from_prev_stage=lowres_out)
    img, iprops = NiftiIO().read_images(
        [join(ds, "imagesTs", "ts_000_0000.nii.gz")])
    seg, _ = NiftiIO().read_seg(join(cascade_out, "ts_000.nii.gz"))
    assert seg.shape == img.shape
    assert set(np.unique(seg).tolist()) <= {0, 1, 2}


def test_prev_stage_seg_rides_seg_path(tmp_path):
    """The prev-stage labelmap must share the image crop, skip intensity
    normalization and resample label-safely — i.e. its one-hot channels must
    retain foreground (regression for intensity-normalizing it as image data)."""
    import jax  # noqa: F401  (backend selected by conftest)
    from fast_nnunet_tpu.core.plans import PlansManager
    from fast_nnunet_tpu.inference.data_iterators import (
        preprocessing_iterator_fromnpy)
    from tests.test_plans import make_plans

    plans = make_plans()
    pm = PlansManager(plans)
    cm = pm.get_configuration("3d_fullres")
    dj = {"labels": {"background": 0, "a": 1, "b": 2},
          "file_ending": ".nii.gz"}

    rng = np.random.RandomState(0)
    img = rng.rand(1, 20, 22, 18).astype(np.float32) * 800 - 100
    prev = np.zeros((20, 22, 18), np.uint8)
    prev[5:10, 6:11, 4:9] = 1
    prev[12:15, 12:15, 10:13] = 2
    props = {"spacing": [1.0, 1.0, 1.0]}

    items = list(preprocessing_iterator_fromnpy(
        [img], [prev], [props], None, pm, dj, cm, num_processes=1))
    data = items[0]["data"]
    # image channel + one one-hot channel per foreground label
    assert data.shape[0] == 3
    # one-hot channels are binary and non-empty (label-safe, un-normalized)
    for ch in (1, 2):
        vals = set(np.unique(data[ch]).tolist())
        assert vals <= {0.0, 1.0}
        assert data[ch].sum() > 0
