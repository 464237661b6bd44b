"""Generate the committed golden-checkpoint regression fixture.

The reference ships a golden CT + output pair
(ref distillation/nnunetv2/tests/example_data/) but NO trained checkpoint, so
nothing pins actual masks across engine rewrites. This script trains a tiny
synthetic config FOR REAL (deterministic seeds, a few minutes on CPU), then
freezes: the trained model folder, one held-out input image, and the predicted
mask. tests/test_golden_checkpoint.py asserts every serving path (predictor,
raw engine, fast-inference, C++ PJRT engine) keeps reproducing that mask
bit-for-bit.

Run from the repo root (CPU):
    JAX_PLATFORMS=cpu python tests/fixtures/generate_golden_checkpoint.py
"""
import os
import shutil
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "golden_ckpt")
DATASET = "Dataset988_GOLD"

# small-but-real training schedule: enough steps that the net segments the
# synthetic blobs confidently (no argmax ties), still ~2 min on CPU
NUM_EPOCHS = 15
ITERS_PER_EPOCH = 25

ARCH_KWARGS = {
    "n_stages": 3, "features_per_stage": [8, 16, 32],
    "conv_op": "torch.nn.modules.conv.Conv3d",
    "kernel_sizes": [[3, 3, 3]] * 3,
    "strides": [[1, 1, 1]] + [[2, 2, 2]] * 2,
    "n_conv_per_stage": [2, 2, 2], "n_conv_per_stage_decoder": [2, 2],
    "conv_bias": True,
    "norm_op": "torch.nn.modules.instancenorm.InstanceNorm3d",
    "norm_op_kwargs": {"eps": 1e-5, "affine": True},
    "dropout_op": None, "dropout_op_kwargs": None,
    "nonlin": "torch.nn.LeakyReLU", "nonlin_kwargs": {"inplace": True},
}


def main():
    # the ambient sitecustomize pins jax_platforms='axon,cpu' (TPU tunnel);
    # the env var alone is not enough — override the config after import so
    # the fixture is CPU-computed, exactly like the tests that replay it
    # (same recipe as tests/conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from tests.helpers import make_synthetic_dataset, set_nnunet_paths
    from fast_nnunet_tpu.imageio.nifti import write_nifti
    from fast_nnunet_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from fast_nnunet_tpu.planning.planner import ExperimentPlanner
    from fast_nnunet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from fast_nnunet_tpu.training.trainer import NNUNetTrainer
    from fast_nnunet_tpu.utils.io import join, load_json, maybe_mkdir_p

    root = tempfile.mkdtemp(prefix="golden_ckpt_")
    raw, pre, res = set_nnunet_paths(None, root)
    make_synthetic_dataset(raw, DATASET, n_cases=6, shape=(18, 20, 16),
                           n_classes=2, seed=3)

    DatasetFingerprintExtractor(DATASET, num_processes=1).run()
    plans = ExperimentPlanner(DATASET).plan_experiment()
    DefaultPreprocessor().run(DATASET, "3d_fullres", num_processes=1)

    # pin the architecture + patch so the committed checkpoint stays tiny and
    # independent of future planner heuristics
    cfg = plans["configurations"]["3d_fullres"]
    cfg["patch_size"] = [16, 16, 16]
    cfg["batch_size"] = 2
    cfg["architecture"]["network_class_name"] = \
        "dynamic_network_architectures.architectures.unet.PlainConvUNet"
    cfg["architecture"]["arch_kwargs"] = ARCH_KWARGS

    dj = load_json(join(raw, DATASET, "dataset.json"))
    tr = NNUNetTrainer(plans, "3d_fullres", 0, dj)
    tr.num_epochs = NUM_EPOCHS
    tr.num_iterations_per_epoch = ITERS_PER_EPOCH
    tr.num_val_iterations_per_epoch = 2
    tr.compute_dtype = jnp.float32
    tr.run_training()

    # freeze: model folder (plans/dataset/checkpoint only)
    if os.path.isdir(FIXTURE_DIR):
        shutil.rmtree(FIXTURE_DIR)
    model_dst = join(FIXTURE_DIR, "model")
    maybe_mkdir_p(join(model_dst, "fold_0"))
    for f in ("plans.json", "dataset.json"):
        shutil.copy(join(tr.output_folder_base, f), join(model_dst, f))
    shutil.copy(join(tr.output_folder_base, "fold_0", "checkpoint_final.fnnx"),
                join(model_dst, "fold_0", "checkpoint_final.fnnx"))

    # held-out input: deterministic blobs NOT in the training set
    rng = np.random.RandomState(988)
    shape = (18, 20, 16)
    img = rng.rand(*shape).astype(np.float32) * 0.2
    for c, r in ((1, 3), (2, 2)):
        cx, cy, cz = rng.randint(5, 13), rng.randint(5, 15), rng.randint(5, 11)
        xs, ys, zs = np.ogrid[:shape[0], :shape[1], :shape[2]]
        blob = ((xs - cx) ** 2 + (ys - cy) ** 2 + (zs - cz) ** 2) <= r ** 2
        img[blob] += 0.5 + 0.2 * c
    img[:2] = 0
    img[-2:] = 0
    input_file = join(FIXTURE_DIR, "input_0000.nii.gz")
    write_nifti(input_file, img, spacing=(1.0, 1.0, 2.0))

    # expected mask: the predictor path, fold 0, no mirroring, fp32
    from fast_nnunet_tpu.imageio.nifti import NiftiIO
    from fast_nnunet_tpu.inference.predictor import NNUNetPredictor
    predictor = NNUNetPredictor(use_mirroring=False)
    predictor.initialize_from_trained_model_folder(model_dst, use_folds=[0])
    predictor.engine.compute_dtype = jnp.float32
    data, props = NiftiIO().read_images([input_file])
    seg = predictor.predict_single_npy_array(data, props)
    labels, counts = np.unique(seg, return_counts=True)
    print("expected mask labels:", dict(zip(labels.tolist(), counts.tolist())))
    assert len(labels) >= 3, "trained net misses a class — train longer"
    # through the reader-writer so the on-disk layout is the standard
    # (i, j, k) convention every serving path writes
    NiftiIO().write_seg(seg.astype(np.uint8),
                        join(FIXTURE_DIR, "expected_mask.nii.gz"), props)
    print("fixture written to", FIXTURE_DIR)


if __name__ == "__main__":
    main()
