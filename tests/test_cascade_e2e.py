"""Cascade: lowres stage -> predicted_next_stage deposits -> cascade-fullres
stage consumes them as one-hot input channels (the reference exercises this via
add_lowres_and_cascade.py in its integration tests)."""
import numpy as np
import pytest

from .helpers import make_synthetic_dataset, set_nnunet_paths


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
