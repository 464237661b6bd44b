"""End-to-end: synthetic dataset -> fingerprint -> plan -> preprocess -> short
training -> checkpoint roundtrip -> sliding-window validation + summary.json
(the reference's integration-test pipeline, SURVEY §4, shrunk to seconds)."""
import os

import numpy as np
import pytest

from .helpers import make_synthetic_dataset, set_nnunet_paths

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trained_env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    raw, pre, res = set_nnunet_paths(None, root)
    make_synthetic_dataset(raw, "Dataset996_E2E", n_cases=6, shape=(20, 22, 18))

    from fast_nnunet_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from fast_nnunet_tpu.planning.planner import ExperimentPlanner
    from fast_nnunet_tpu.preprocessing.preprocessor import DefaultPreprocessor

    DatasetFingerprintExtractor("Dataset996_E2E", num_processes=1).run()
    plans = ExperimentPlanner("Dataset996_E2E").plan_experiment()
    DefaultPreprocessor().run("Dataset996_E2E", "3d_fullres", num_processes=1)
    return {"root": root, "raw": raw, "pre": pre, "res": res, "plans": plans}


def _make_trainer(trained_env, fold=0):
    import jax.numpy as jnp
    from fast_nnunet_tpu.training.trainer import NNUNetTrainer
    from fast_nnunet_tpu.utils.io import load_json, join

    dataset_json = load_json(join(trained_env["raw"], "Dataset996_E2E",
                                  "dataset.json"))
    trainer = NNUNetTrainer(trained_env["plans"], "3d_fullres", fold, dataset_json)
    trainer.num_epochs = 2
    trainer.num_iterations_per_epoch = 3
    trainer.num_val_iterations_per_epoch = 2
    trainer.compute_dtype = jnp.float32  # tiny shapes: avoid bf16 flakiness on CPU
    return trainer


def test_training_e2e(trained_env):
    from fast_nnunet_tpu.utils.io import join, isfile, load_json

    trainer = _make_trainer(trained_env)
    trainer.run_training()

    assert isfile(join(trainer.output_folder, "checkpoint_final.fnnx"))
    assert isfile(join(trainer.output_folder_base, "plans.json"))
    assert len(trainer.logger.logging["train_losses"]) == 2
    assert all(np.isfinite(trainer.logger.logging["train_losses"]))

    # checkpoint roundtrip into a fresh trainer
    t2 = _make_trainer(trained_env)
    t2.load_checkpoint(join(trainer.output_folder, "checkpoint_final.fnnx"))
    assert t2.current_epoch == 2
    assert t2._best_ema is not None

    # optimizer state resumed: SGD momentum trace is nonzero and matches the
    # saved trainer's, and the step counter carried over (momentum-true resume)
    import jax
    saved_tr = jax.device_get(trainer.train_state.opt_state)
    loaded_tr = jax.device_get(t2.train_state.opt_state)
    leaves_s = jax.tree_util.tree_leaves(saved_tr)
    leaves_l = jax.tree_util.tree_leaves(loaded_tr)
    assert len(leaves_s) == len(leaves_l)
    assert any(np.any(np.asarray(x) != 0) for x in leaves_l)
    for a, b in zip(leaves_s, leaves_l):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(jax.device_get(t2.train_state.step)) == \
        int(jax.device_get(trainer.train_state.step)) > 0

    # final validation produces a summary.json with finite metrics
    metrics = t2.perform_actual_validation()
    assert isfile(join(t2.output_folder, "validation", "summary.json"))
    assert "foreground_mean" in metrics
    assert np.isfinite(metrics["foreground_mean"]["Dice"]) or \
        np.isnan(metrics["foreground_mean"]["Dice"])


def test_split_determinism(trained_env):
    trainer = _make_trainer(trained_env)
    tr1, val1 = trainer.do_split()
    tr2, val2 = trainer.do_split()
    assert tr1 == tr2 and val1 == val2
    assert len(set(tr1) & set(val1)) == 0
    assert len(tr1) + len(val1) == 6
