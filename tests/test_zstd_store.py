"""Chunked-zstd case store (.fnnz): brick-slicing parity with numpy, format
round-trip, store auto-detection, and an fnnz-backed train smoke (the role the
reference's blosc2 store plays, ref nnunet_dataset.py:209-298)."""
import numpy as np
import pytest

zstd = pytest.importorskip("zstandard")

from fast_nnunet_tpu.training.zstd_store import (BrickReader, ZstdCaseDataset,
                                                 compute_brick_shape, write_fnnz)
from fast_nnunet_tpu.training.dataset import infer_dataset_class, NpyCaseDataset


def test_brick_shape_heuristic():
    b = compute_brick_shape((1, 512, 512, 512), (96, 96, 160), 4)
    assert all(x >= 8 for x in b)
    assert int(np.prod(b)) * 4 <= 1 << 20
    # bricks never exceed the image
    b2 = compute_brick_shape((2, 10, 12, 8), (96, 96, 160), 4)
    assert all(x <= s for x, s in zip(b2, (10, 12, 8)))


def test_roundtrip_and_random_slices(tmp_path):
    rng = np.random.RandomState(0)
    arr = rng.randn(2, 37, 53, 29).astype(np.float32)
    path = str(tmp_path / "case.fnnz")
    write_fnnz(path, arr, patch_size=(16, 16, 16))
    r = BrickReader(path)
    assert r.shape == arr.shape and r.dtype == arr.dtype
    np.testing.assert_array_equal(np.asarray(r), arr)
    for _ in range(20):
        lo = [rng.randint(0, s) for s in arr.shape[1:]]
        hi = [rng.randint(l + 1, s + 1) for l, s in zip(lo, arr.shape[1:])]
        sl = (slice(None),) + tuple(slice(l, h) for l, h in zip(lo, hi))
        np.testing.assert_array_equal(r[sl], arr[sl])
    # partial-axis indexing like crop_and_pad_nd produces
    np.testing.assert_array_equal(r[:, 3:19], arr[:, 3:19])


def test_dataset_roundtrip_and_autodetect(tmp_path):
    rng = np.random.RandomState(1)
    data = rng.rand(1, 20, 22, 18).astype(np.float32)
    seg = (rng.rand(1, 20, 22, 18) * 3).astype(np.int8)
    props = {"spacing": [1.0, 1.0, 2.0], "class_locations": {1: []}}
    ZstdCaseDataset.save_case(data, seg, props, str(tmp_path / "caseA"),
                              patch_size=(16, 16, 16))
    assert infer_dataset_class(str(tmp_path)) is ZstdCaseDataset
    ds = ZstdCaseDataset(str(tmp_path))
    assert ds.keys() == ["caseA"]
    d2, s2, p2 = ds.load_case("caseA", mmap=False)
    np.testing.assert_array_equal(d2, data)
    np.testing.assert_array_equal(s2, seg)
    assert p2["spacing"] == props["spacing"]
    # lazy path supports shape + slicing without a full read
    d3, s3, _ = ds.load_case("caseA")
    assert d3.shape == data.shape
    np.testing.assert_array_equal(d3[:, 2:9, 1:5, 0:7], data[:, 2:9, 1:5, 0:7])


def test_compression_actually_compresses(tmp_path):
    # smooth (correlated) data like CT must compress well
    x = np.linspace(0, 1, 64 * 64 * 64, dtype=np.float32).reshape(1, 64, 64, 64)
    path = str(tmp_path / "smooth.fnnz")
    write_fnnz(path, x, patch_size=(32, 32, 32))
    import os
    assert os.path.getsize(path) < x.nbytes / 3


@pytest.mark.slow
def test_fnnz_train_smoke(tmp_path_factory, monkeypatch):
    """plan -> preprocess -store fnnz -> 1-epoch train runs on the fnnz store."""
    import jax.numpy as jnp
    from tests.helpers import make_synthetic_dataset, set_nnunet_paths

    root = str(tmp_path_factory.mktemp("fnnz"))
    raw, pre, res = set_nnunet_paths(None, root)
    make_synthetic_dataset(raw, "Dataset987_ZS", n_cases=4, shape=(16, 18, 14))

    from fast_nnunet_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from fast_nnunet_tpu.planning.planner import ExperimentPlanner
    from fast_nnunet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from fast_nnunet_tpu.training.trainer import NNUNetTrainer
    from fast_nnunet_tpu.utils.io import join, load_json, subfiles

    DatasetFingerprintExtractor("Dataset987_ZS", num_processes=1).run()
    plans = ExperimentPlanner("Dataset987_ZS").plan_experiment()
    DefaultPreprocessor().run("Dataset987_ZS", "3d_fullres", num_processes=1,
                              storage="fnnz")
    folder = join(pre, "Dataset987_ZS",
                  plans["configurations"]["3d_fullres"]["data_identifier"])
    assert subfiles(folder, suffix=".fnnz")
    assert not subfiles(folder, suffix=".npy")

    dj = load_json(join(raw, "Dataset987_ZS", "dataset.json"))
    t = NNUNetTrainer(plans, "3d_fullres", 0, dj)
    t.num_epochs = 1
    t.num_iterations_per_epoch = 2
    t.num_val_iterations_per_epoch = 1
    t.compute_dtype = jnp.float32
    t.run_training()
    assert np.isfinite(t.logger.logging["train_losses"][0])
